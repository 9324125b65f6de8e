"""DSIR-style data selection: hashed n-gram importance weights toward a
target distribution (Xie et al. 2023, "Data Selection for Language Models
via Importance Resampling" — public method, re-derived for Catalyst).

Method: featurize every doc as hashed word n-gram counts over ``B``
buckets (``pmod(xxhash64(gram), B)``); estimate Laplace-smoothed bucket
distributions p̂ (target corpus) and q̂ (raw corpus); per-doc importance
log-weight = Σ_g [log p̂(b_g) − log q̂(b_g)] over the doc's gram buckets;
select the top-k.

Determinism discipline (what makes the differential oracle exact):
- bucket counts are exact integers (one explode + one B-key aggregate
  with map-side partials — the only corpus-wide shuffle, and it carries
  (int bucket, long count));
- the B log-ratio weights are computed ONCE driver-side in Python
  (``math.log``) and QUANTIZED to fixed point (round(w · 2^20) — the
  repo's exact-integer discipline): a doc's score is then an exact LONG
  sum, order-independent under any partitioning or aggregation plan,
  where a float fold would either pin the association (HOFs — correct
  but interpreted, ~8 µs/gram) or race it (a shuffled float SUM);
  ``log_w`` is the single exact division sum/2^20 at the end;
- scoring is one explode + one doc-keyed codegen hash aggregate with
  map-side partials (ints only), left-joined back so zero-gram docs
  keep a 0.0 row;
- selection is top-k by (log_w DESC, id) — ``TakeOrderedAndProject``,
  per-partition partial top-k, no global sort.

The paper's Gumbel resampling replaces deterministic top-k with
top-k of log_w + Gumbel noise; engines disagree on ``log`` ULPs, so the
noisy variant is provided (seeded, md5-based) but the oracled surface is
the deterministic one.

Scale notes: learning shuffles only B-keyed partial counts; scoring
shuffles (id, int) partials on the doc key plus the join back to the doc
relation (ints only — documents never shuffle); the quantized weight
array rides along as a B-int literal (codegen'd O(1) element_at — the
interpreted-HOF fold it replaced cost ~8 µs/gram); at very large B swap
the literal for a broadcast join on bucket — the seam is
``dsir_log_weights(weights=...)``.

Reference analog: none (selection is a training-pipeline op); nearest
shape is sampling.token_budget_sample (deterministic hash-order
selection).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "gram_bucket_rows",
    "bucket_counts",
    "learn_log_ratio_weights",
    "learn_log_ratio_weights_sliced",
    "quantize_weights",
    "dsir_log_weights",
    "dsir_pipeline",
    "dsir_select",
]

DEFAULT_BUCKETS = 1024
NGRAM_SIZES = (1, 2)


def _token_array(text_col: str) -> Column:
    t = F.trim(F.col(text_col))
    return F.when(
        F.col(text_col).isNull() | (F.length(t) == F.lit(0)),
        F.array().cast("array<string>"),
    ).otherwise(F.split(t, r"\s+"))


def gram_bucket_rows(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = DEFAULT_BUCKETS,
    ngram_sizes: tuple[int, ...] = NGRAM_SIZES,
    carry: list[str] | None = None,
) -> DataFrame:
    """(__id, bucket [, carry...]) — one row per word n-gram occurrence,
    bucket = pmod(xxhash64(gram), B).  The SAME relation feeds both the
    distribution learning and the per-doc scoring, so the two can never
    use different featurizations.

    Built entirely in whole-stage codegen: one posexplode + a window
    ``lead`` per extra gram size (an interpreted-HOF formulation over
    per-doc arrays measured ~8 µs/gram — 16 s for a 1M-gram corpus —
    against < 1 s for this shape).  Tokens shuffle once on the doc id
    (the window), the partitioning every downstream per-doc aggregate
    reuses."""
    from pyspark.sql import Window

    carry = carry or []
    toks = _token_array(text_col)
    base = (
        docs.where(F.size(toks) > 0)
        .select(F.col(id_col).alias("__id"), *carry, F.posexplode(toks))
        .withColumnsRenamed({"pos": "__pos", "col": "__w"})
    )
    max_n = max(ngram_sizes)
    if max_n > 1:
        w = Window.partitionBy("__id").orderBy("__pos")
        base = base.select(
            "__id", "__pos", "__w", *carry,
            *[F.lead("__w", k).over(w).alias(f"__l{k}")
              for k in range(1, max_n)],
        )
    parts = []
    for n in ngram_sizes:
        if n == 1:
            gram = F.col("__w")
            rel = base
        else:
            gram = F.concat_ws(
                " ", F.col("__w"), *[F.col(f"__l{k}") for k in range(1, n)]
            )
            rel = base.where(F.col(f"__l{n - 1}").isNotNull())
        parts.append(
            rel.select(
                "__id",
                F.pmod(F.xxhash64(gram), F.lit(num_buckets))
                .cast("int")
                .alias("bucket"),
                *carry,
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def bucket_counts(
    docs: DataFrame,
    text_col: str = "text",
    num_buckets: int = DEFAULT_BUCKETS,
    ngram_sizes: tuple[int, ...] = NGRAM_SIZES,
    id_col: str = "doc_id",
) -> DataFrame:
    """(bucket, cnt) exact-integer gram-bucket histogram; one explode +
    one B-key aggregate."""
    return (
        gram_bucket_rows(docs, id_col, text_col, num_buckets, ngram_sizes)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def _weights_from_counts(
    t_counts: dict[int, int],
    r_counts: dict[int, int],
    num_buckets: int,
) -> list[float]:
    t_total = sum(t_counts.values())
    r_total = sum(r_counts.values())
    return [
        math.log((t_counts.get(b, 0) + 1) / (t_total + num_buckets))
        - math.log((r_counts.get(b, 0) + 1) / (r_total + num_buckets))
        for b in range(num_buckets)
    ]


def learn_log_ratio_weights(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    num_buckets: int = DEFAULT_BUCKETS,
    ngram_sizes: tuple[int, ...] = NGRAM_SIZES,
    id_col: str = "doc_id",
) -> list[float]:
    """Driver-side Laplace-smoothed log p̂/q̂ per bucket.  The two count
    collections are B-row actions; the math is plain Python so the twin
    shares every double bit-for-bit."""
    t_counts = {
        r["bucket"]: r["cnt"]
        for r in bucket_counts(target, text_col, num_buckets, ngram_sizes,
                               id_col=id_col).collect()
    }
    r_counts = {
        r["bucket"]: r["cnt"]
        for r in bucket_counts(raw, text_col, num_buckets, ngram_sizes,
                               id_col=id_col).collect()
    }
    return _weights_from_counts(t_counts, r_counts, num_buckets)


def learn_log_ratio_weights_sliced(
    raw: DataFrame,
    is_target: Column,
    text_col: str = "text",
    num_buckets: int = DEFAULT_BUCKETS,
    ngram_sizes: tuple[int, ...] = NGRAM_SIZES,
    id_col: str = "doc_id",
) -> list[float]:
    """Same weights as :func:`learn_log_ratio_weights` when the target is
    a SLICE of the raw corpus (the common case — "resemble the high-
    quality subset"), but learned in ONE explode + ONE B-key aggregate:
    each gram carries its row's target flag and the aggregate folds both
    histograms at once, halving the learning scan cost."""
    grams = gram_bucket_rows(
        raw.withColumn("__t", is_target),
        id_col=id_col,
        text_col=text_col,
        num_buckets=num_buckets,
        ngram_sizes=ngram_sizes,
        carry=["__t"],
    )
    return _learn_from_gram_rows(grams, num_buckets)


def _learn_from_gram_rows(grams: DataFrame, num_buckets: int) -> list[float]:
    """One B-key aggregate over a (bucket, __t) gram relation."""
    rows = (
        grams.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum(F.when(F.col("__t"), 1).otherwise(0))
            .cast("long")
            .alias("t_cnt"),
        )
        .collect()
    )
    r_counts = {r["bucket"]: r["cnt"] for r in rows}
    t_counts = {r["bucket"]: r["t_cnt"] for r in rows if r["t_cnt"] > 0}
    return _weights_from_counts(t_counts, r_counts, num_buckets)


FIXED_POINT_BITS = 20


def quantize_weights(weights: list[float]) -> list[int]:
    """round(w · 2^20) — the shared fixed-point law (operator and twin
    call this same function)."""
    scale = 1 << FIXED_POINT_BITS
    return [int(round(w * scale)) for w in weights]


def dsir_log_weights(
    docs: DataFrame,
    target: DataFrame | None = None,
    weights: list[float] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = DEFAULT_BUCKETS,
    ngram_sizes: tuple[int, ...] = NGRAM_SIZES,
) -> DataFrame:
    """docs + (n_grams, log_w): per-doc importance log-weight as an exact
    fixed-point integer sum over the gram buckets (quantized weights —
    see the module determinism notes).  Pass ``target`` to learn weights
    here, or precomputed float ``weights`` (length B)."""
    if weights is None:
        if target is None:
            raise ValueError("need target corpus or precomputed weights")
        weights = learn_log_ratio_weights(
            target, docs, text_col, num_buckets, ngram_sizes,
            id_col=id_col,
        )
    if len(weights) != num_buckets:
        raise ValueError("weights length != num_buckets")
    grams = gram_bucket_rows(docs, id_col, text_col, num_buckets, ngram_sizes)
    return _score_gram_rows(docs, grams, weights, id_col)


def _score_gram_rows(
    docs: DataFrame,
    grams: DataFrame,
    weights: list[float],
    id_col: str,
) -> DataFrame:
    qw = quantize_weights(weights)
    w_lit = F.lit(qw)
    scored = (
        grams.groupBy(F.col("__id").alias("__sid"))
        .agg(
            F.count(F.lit(1)).cast("int").alias("__ng"),
            F.sum(F.element_at(w_lit, F.col("bucket") + F.lit(1)))
            .cast("long")
            .alias("__q"),
        )
    )
    scale = float(1 << FIXED_POINT_BITS)
    joined = docs.join(scored, docs[id_col] == scored["__sid"], "left")
    return joined.select(
        *docs.columns,
        F.coalesce(F.col("__ng"), F.lit(0)).alias("n_grams"),
        (F.coalesce(F.col("__q"), F.lit(0)) / F.lit(scale)).alias("log_w"),
    )


def dsir_pipeline(
    docs: DataFrame,
    is_target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = DEFAULT_BUCKETS,
    ngram_sizes: tuple[int, ...] = NGRAM_SIZES,
) -> DataFrame:
    """Learn-and-score in ONE gram materialization: the exploded gram
    relation persists across the learning collect and the scoring
    aggregate, so the corpus pays the tokenize/hash pass once."""
    from pyspark.storagelevel import StorageLevel

    grams = gram_bucket_rows(
        docs.withColumn("__t", is_target),
        id_col=id_col,
        text_col=text_col,
        num_buckets=num_buckets,
        ngram_sizes=ngram_sizes,
        carry=["__t"],
    ).persist(StorageLevel.MEMORY_AND_DISK)
    weights = _learn_from_gram_rows(grams, num_buckets)
    return _score_gram_rows(docs, grams.drop("__t"), weights, id_col)


def dsir_select(
    weighted: DataFrame,
    k: int,
    id_col: str = "doc_id",
    gumbel_seed: int | None = None,
) -> DataFrame:
    """Top-k selection by importance.  Deterministic by default
    (log_w DESC, id ASC — the oracled surface); with ``gumbel_seed`` the
    paper's Gumbel-noised resampling (md5-uniform, engine-local ``log``
    ULPs — rows-only guarantees)."""
    score = F.col("log_w")
    if gumbel_seed is not None:
        u = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col(id_col).cast("string"),
                            F.lit(f":{gumbel_seed}"),
                        )
                    ),
                    1,
                    12,
                ),
                16,
                10,
            ).cast("long")
            + F.lit(0.5)
        ) / F.lit(float(16**12))
        score = score + -F.log(-F.log(u))
    return weighted.orderBy(score.desc(), F.col(id_col).asc()).limit(k)
