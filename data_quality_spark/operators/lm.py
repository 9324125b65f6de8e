"""Corpus-trained n-gram language model: Stupid Backoff perplexity.

The TRAINED counterpart of ``functions.text``'s static char-bigram
perplexity (the "KenLM-style" scoring a curation gate runs): train a
token-bigram model on one split of the corpus, score the held-out split,
flag high-perplexity documents.  The smoothing is Stupid Backoff
(Brants et al. 2007, "Large Language Models in Machine Translation" —
THE distributed web-scale n-gram LM design):

    S(w2 | w1) = c(w1 w2) / c(w1)        if c(w1 w2) > 0
               = 0.4 · c(w2) / N          else if c(w2) > 0
               = 0.4 · 1 / N              else (unseen word floor)

Scale shape (the point of the design — Brants'07 keeps count tables
distributed and scores by joins, never by a materialized model file):

- Count tables ARE DataFrames: unigrams (w, c) and bigrams (w1, w2, c)
  aggregate map-side (partial counts before the exchange); the corpus
  never shuffles as documents.  ``min_count`` pruning is Brants'07's
  count-threshold pruning.
- Log arithmetic is minted DRIVER-side over the DISTINCT COUNT VALUES
  sliver (the bm25 driver-learned-literals pattern): k distinct positive
  counts with total mass N satisfy k(k+1)/2 <= N, so the sliver is
  <= sqrt(2N) rows (~1.4M at 10^12 tokens, tiny vs the vocab) and
  broadcast-joins back.  The JVM's ``ln`` (not correctly-rounded by
  spec) is never used.
- Every score contribution is fixed-point: L(c) = floor(ln(c)·2^20+0.5).
  Multiplying by 2^20 is EXACT in IEEE doubles (pure exponent shift), so
  cross-engine bit-equality of L reduces to libm-ln parity between
  CPython and DuckDB — the same verified claim bm25's idf rests on.
  Hits score q = L(c12) − L(c1); backoffs q = A + L(c2) − L(N) with
  A = floor(ln(0.4)·2^20+0.5); the floor is A − L(N).  Per-document
  NLL is then an EXACT INTEGER sum Σ ct·q — order-free, hash-stable.
- Scoring joins key on (w1, w2) / w2 — AQE picks broadcast vs shuffle
  by the pruned tables' actual size; the per-doc relation carries one
  row per DISTINCT bigram (grouped first), not per token position.
- The high-perplexity flag is a cross-multiplied integer comparison
  (nll_fx > thresh_fx · n_bigrams): no float ever decides.

Reference analog: none — extends the quality-scoring family (SURVEY §2
A-rules; quality_model.py's trained classifier) with the trained-LM
member the north-star pipeline names.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "BackoffLM",
    "LN_SCALE",
    "BACKOFF_ALPHA",
    "ln_fx",
    "train_backoff_lm",
    "score_backoff",
    "lm_perplexity",
]

# fixed-point scale for log contributions.  |q| <= ln(N)+|ln 0.4| < 32
# nats at 10^12 tokens -> |q_fx| < 2^25; a 10^9-token document sums to
# < 2^55 — comfortably inside int64.
LN_SCALE = 1 << 20
BACKOFF_ALPHA = 0.4


def ln_fx(x: float) -> int:
    """floor(ln(x)·2^20 + 0.5) with CPython's correctly-rounded libm ln
    (the law the DuckDB twin replays verbatim; ·2^20 is exact)."""
    return int(math.floor(math.log(x) * LN_SCALE + 0.5))


@dataclass
class BackoffLM:
    """A trained model: two score tables + the scalar constants."""

    bigram_scores: DataFrame  # (w1, w2, q_fx)   hits: L(c12) − L(c1)
    unigram_scores: DataFrame  # (w, qb_fx)      backoff: A + L(c) − L(N)
    n_tokens: int
    floor_fx: int  # unseen-word contribution: A − L(N)


def _tokens(text_col: str):
    """The corpus token law shared with docs.py / retrieval.py:
    lowercase, trim, split on whitespace runs; NULL/blank → empty."""
    t = F.trim(F.lower(F.col(text_col)))
    return F.when(
        F.col(text_col).isNull() | (F.length(t) == 0),
        F.array().cast("array<string>"),
    ).otherwise(F.split(t, r"\s+"))


def _bigram_pairs(tk: str):
    """array<struct<w1,w2>> of consecutive token pairs (0-based subscripts;
    guarded — Spark's sequence() runs DESCENDING when stop < start)."""
    pairs = F.expr(
        f"transform(sequence(0, size({tk}) - 2),"
        f" i -> struct({tk}[i] as w1, {tk}[i + 1] as w2))"
    )
    return F.when(F.size(F.col(tk)) >= 2, pairs).otherwise(
        F.expr("array()").cast("array<struct<w1:string,w2:string>>")
    )


def train_backoff_lm(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
    alpha: float = BACKOFF_ALPHA,
) -> BackoffLM:
    """Count, prune, and mint the fixed-point score tables.

    N (total train tokens) is computed BEFORE pruning, as Brants'07
    prescribes; the two `.collect()`s here are the vocabulary-scale
    total (1 row) and the distinct-count sliver (<= sqrt(2N) rows).
    """
    spark = docs.sparkSession
    base = docs.select(_tokens(text_col).alias("__tk")).where(
        F.size("__tk") > 0
    )
    uni0 = (
        base.select(F.explode("__tk").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    uni0 = uni0.persist()
    n_tokens = int(uni0.agg(F.sum("c")).collect()[0][0] or 0)
    if n_tokens == 0:
        uni0.unpersist()
        raise ValueError("training split has no tokens")
    uni = uni0.where(F.col("c") >= min_count)
    big = (
        base.select(F.explode(_bigram_pairs("__tk")).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .where(F.col("c12") >= min_count)
    )
    big = big.persist()
    # distinct-count sliver -> driver-minted L table (broadcast back)
    cvals = sorted(
        {r[0] for r in uni.select("c").distinct().collect()}
        | {r[0] for r in big.select("c12").distinct().collect()}
    )
    ltab = spark.createDataFrame(
        [(int(c), ln_fx(float(c))) for c in cvals], "c long, lfx long"
    )
    a_fx = ln_fx(alpha)
    ln_n = ln_fx(float(n_tokens))
    uni1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    l12t = ltab.select(F.col("c").alias("c12"), F.col("lfx").alias("l12"))
    l1t = ltab.select(F.col("c").alias("c1"), F.col("lfx").alias("l1"))
    bigram_scores = (
        big.join(uni1, "w1")  # inner is lossless: c12 >= min_count ⇒ c1 >= min_count
        .join(F.broadcast(l12t), "c12")
        .join(F.broadcast(l1t), "c1")
        .select("w1", "w2", (F.col("l12") - F.col("l1")).alias("q_fx"))
    )
    unigram_scores = (
        uni.join(F.broadcast(ltab), "c")
        .select(
            "w",
            (F.lit(a_fx) + F.col("lfx") - F.lit(ln_n)).alias("qb_fx"),
        )
    )
    return BackoffLM(
        bigram_scores=bigram_scores,
        unigram_scores=unigram_scores,
        n_tokens=n_tokens,
        floor_fx=a_fx - ln_n,
    )


def score_backoff(
    docs: DataFrame,
    lm: BackoffLM,
    id_col: str = "doc_id",
    text_col: str = "text",
    ppl_threshold: float = 64.0,
) -> DataFrame:
    """Per-document NLL as an exact integer sum.

    Returns (id, n_bigrams, oov_bigrams, nll_fx, high_ppl); documents
    with < 2 tokens score (0, 0, 0, false).  ``high_ppl`` is the exact
    cross-multiplied law nll_fx > ln_fx(ppl_threshold) · n_bigrams.
    """
    thresh_fx = ln_fx(ppl_threshold)
    ids = docs.select(F.col(id_col))
    per_big = (
        docs.select(F.col(id_col), _tokens(text_col).alias("__tk"))
        .select(F.col(id_col), F.explode(_bigram_pairs("__tk")).alias("p"))
        .select(F.col(id_col), "p.w1", "p.w2")
        .groupBy(id_col, "w1", "w2")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    scored = (
        per_big.join(lm.bigram_scores, ["w1", "w2"], "left")
        .join(
            lm.unigram_scores.select(
                F.col("w").alias("w2"), F.col("qb_fx")
            ),
            "w2",
            "left",
        )
        .withColumn(
            "contrib",
            F.coalesce(F.col("q_fx"), F.col("qb_fx"), F.lit(lm.floor_fx)),
        )
        .withColumn(
            "oov",
            F.when(
                F.col("q_fx").isNull() & F.col("qb_fx").isNull(), F.col("ct")
            ).otherwise(F.lit(0)),
        )
        .groupBy(id_col)
        .agg(
            F.sum("ct").alias("n_bigrams"),
            (-F.sum(F.col("ct") * F.col("contrib"))).alias("nll_fx"),
            F.sum("oov").alias("oov_bigrams"),
        )
    )
    return (
        ids.join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("oov_bigrams", F.lit(0)).cast("long").alias("oov_bigrams"),
            F.coalesce("nll_fx", F.lit(0)).cast("long").alias("nll_fx"),
            F.coalesce(
                F.col("nll_fx") > F.lit(thresh_fx) * F.col("n_bigrams"),
                F.lit(False),
            ).alias("high_ppl"),
        )
    )


def lm_perplexity(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    holdout_mod: int = 10,
    holdout_rem: int = 0,
    min_count: int = 2,
    ppl_threshold: float = 64.0,
) -> DataFrame:
    """End-to-end: train on id % mod != rem, score the held-out split."""
    train = docs.where(F.col(id_col) % holdout_mod != holdout_rem)
    held = docs.where(F.col(id_col) % holdout_mod == holdout_rem)
    lm = train_backoff_lm(train, text_col=text_col, min_count=min_count)
    return score_backoff(
        held, lm, id_col=id_col, text_col=text_col, ppl_threshold=ppl_threshold
    )
