"""Linear document-quality scorer: the CCNet/GPT-3-style quality
classifier re-expressed as a fixed Catalyst expression tree.

The production pattern for web-corpus curation (CCNet's fastText
wiki-vs-crawl model, GPT-3's quality classifier, Gopher's filter
appendix): train a light linear classifier offline, ship the weights,
score every document, gate on the score.  At 10^12 documents the cost
is the SCORING pass, and a linear model over cheap per-doc features
needs no Python at all:

- every feature is an exact-integer count ratio computed by built-in
  Column expressions inside whole-stage codegen (no UDF, no shuffle,
  one scan);
- the dot product is a FIXED left-associated chain of IEEE-double
  multiply/adds.  IEEE ops are deterministic, so any engine evaluating
  the same tree produces bit-identical doubles — the DuckDB twin does,
  and the differential oracle hashes raw unrounded scores.

``WEIGHTS`` are hand-set stand-ins carrying the documented signs of the
trained models (stopword mass up, digit/symbol mass down, longer docs
up to a cap); a real deployment replaces them with offline logistic-
regression output — the engine contract this operator pins down is the
scoring plan, which does not change with the weight values.

Reference analog: the reference's threshold ladders are single-column
rules (``/root/reference/src/data_quality/advanced_analysis.py:331-339``
bucketing); this is the same decide-by-scalar shape generalized to a
weighted multi-feature score.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .docs import _ALL_STOPWORDS, token_count_col

__all__ = [
    "quality_score", "quality_score_col", "quality_score_stats",
    "score_buckets", "learn_cutoffs", "bucket_by_cutoffs",
    "WEIGHTS", "LEN_CAP",
]

# (bias, w_stopword_frac, w_len_capped, w_digit_frac, w_special_frac)
WEIGHTS = (-0.6, 1.8, 0.8, -2.5, -2.0)
LEN_CAP = 64  # tokens; beyond this, length stops adding evidence

# the special-character class the gate's charclass rule uses
# (dialect-safe subset: literal ranges, no \w)
_SPECIAL_KEEP = r"[A-Za-z0-9À-ÿ \t\n\r]"


def quality_score_col(text_col: str = "text") -> Column:
    """The score as a Column expression (see :func:`quality_score`) — the
    form other fused audits embed without materializing columns."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    toks = F.split(F.trim(F.lower(text)), r"\s+")
    nt = token_count_col(F.col(text_col))
    stop_arr = F.array(*[F.lit(m) for m in _ALL_STOPWORDS])
    ns = F.when(nt == 0, F.lit(0)).otherwise(
        F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    )
    nc = F.length(text)
    nd = nc - F.length(F.regexp_replace(text, r"[0-9]", ""))
    nsp = F.length(F.regexp_replace(text, _SPECIAL_KEEP, ""))

    def frac(num: Column, den: Column) -> Column:
        return F.when(den > 0, num / den).otherwise(F.lit(0.0))

    f_stop = frac(ns, nt)
    f_len = F.least(nt, F.lit(LEN_CAP)) / F.lit(float(LEN_CAP))
    f_digit = frac(nd, nc)
    f_special = frac(nsp, nc)
    b, w_stop, w_len, w_digit, w_special = WEIGHTS
    return (
        (
            (
                (F.lit(b) + (F.lit(w_stop) * f_stop))
                + (F.lit(w_len) * f_len)
            )
            + (F.lit(w_digit) * f_digit)
        )
        + (F.lit(w_special) * f_special)
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``q_score`` (double) and ``q_keep`` (score > 0) to ``docs``.

    Features (all exact-integer ratios, 0.0 on empty docs):
    stopword-token fraction, capped token count, digit-char fraction,
    special-char fraction.  Score = fixed left-associated linear chain —
    see module docstring for why this is engine-bit-identical.
    """
    return docs.withColumn("q_score", quality_score_col(text_col)).withColumn(
        "q_keep", F.col("q_score") > F.lit(0.0)
    )


def score_buckets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "lang",
    n_buckets: int = 3,
) -> DataFrame:
    """CCNet-style per-language head/middle/tail partition (Wenzek et al.
    2020): score every document with the linear model, then cut each
    language into ``n_buckets`` equal-population quantile buckets —
    bucket 1 ("head") is the best-scoring third, bucket ``n_buckets``
    ("tail") the worst.  CCNet keeps head+middle for pretraining and
    drops (or down-weights) the tail; the bucket column is that decision
    as data.

    Exact formulation: ANSI ``ntile`` per group ordered by
    ``(q_score DESC, id)`` — the score is engine-bit-identical (see
    module docstring) and the id tiebreak makes the assignment fully
    deterministic, so the bucket of every document is differential-
    checkable.  This is the verification path: it implies a per-group
    sort.  The production path at 10^12 rows is :func:`learn_cutoffs` +
    :func:`bucket_by_cutoffs` — boundary scores learned from a one-pass
    approximate-quantile aggregate, then a map-side comparison with NO
    sort and NO shuffle of the corpus (exactly how CCNet applies
    perplexity cutoffs computed on a sample).
    """
    scored = quality_score(docs, text_col=text_col)
    w = Window.partitionBy(group_col).orderBy(
        F.desc("q_score"), F.asc(id_col)
    )
    idx = F.ntile(n_buckets).over(w)
    return scored.withColumn("bucket_idx", idx).withColumn(
        "bucket",
        F.when(F.col("bucket_idx") == 1, F.lit("head"))
        .when(F.col("bucket_idx") == n_buckets, F.lit("tail"))
        .otherwise(F.lit("middle")),
    )


def learn_cutoffs(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "lang",
    n_buckets: int = 3,
    accuracy: int = 10_000,
) -> dict:
    """Per-group descending bucket-boundary scores from ONE approximate-
    quantile aggregate (percentile_approx, Greenwald-Khanna sketch —
    mergeable, map-side partials, output O(groups)).  Returns
    ``{group: [b1 > b2 > ...]}`` for :func:`bucket_by_cutoffs`."""
    probs = [i / n_buckets for i in range(n_buckets - 1, 0, -1)]
    rows = (
        quality_score(docs, text_col=text_col)
        .groupBy(group_col)
        .agg(
            F.percentile_approx(
                "q_score", probs, F.lit(accuracy)
            ).alias("qs")
        )
        .collect()
    )
    return {r[group_col]: list(r.qs) for r in rows}


def bucket_by_cutoffs(
    docs: DataFrame,
    cutoffs: dict,
    text_col: str = "text",
    group_col: str = "lang",
) -> DataFrame:
    """The scale path of :func:`score_buckets`: bucket by comparing each
    score against the group's learned boundaries — pure map-side column
    arithmetic, no sort, no shuffle (the cutoff table is a when-chain of
    literals; at higher group cardinality, a broadcast join).  Bucket
    boundaries are approximate where the sketch is; interior documents
    land exactly as the ntile path would."""
    n_buckets = len(next(iter(cutoffs.values()))) + 1 if cutoffs else 1
    scored = quality_score(docs, text_col=text_col)
    idx: Column = F.lit(1)
    for grp, bounds in sorted(cutoffs.items()):
        below = sum(
            (F.col("q_score") < F.lit(float(b))).cast("int") for b in bounds
        )
        idx = F.when(F.col(group_col) == grp, 1 + below).otherwise(idx)
    return scored.withColumn("bucket_idx", idx.cast("int")).withColumn(
        "bucket",
        F.when(F.col("bucket_idx") == 1, F.lit("head"))
        .when(F.col("bucket_idx") == n_buckets, F.lit("tail"))
        .otherwise(F.lit("middle")),
    )


def quality_score_stats(docs: DataFrame, group_col: str = "lang") -> DataFrame:
    """Per-group keep tally over :func:`quality_score` — integer-exact
    rollup (no float aggregation, so it stays engine-reproducible)."""
    scored = quality_score(docs)
    return (
        scored.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.col("q_keep").cast("int")).cast("long").alias("n_keep"),
        )
        .orderBy(group_col)
    )
