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
    "FEATURES", "quality_features", "train_logistic", "fit_quality_weights",
    "score_with_weights", "classifier_report", "classifier_calibration",
    "TRAIN_SAMPLE", "TRAIN_ITERS", "TRAIN_LR",
]

# (bias, w_stopword_frac, w_len_capped, w_digit_frac, w_special_frac)
WEIGHTS = (-0.6, 1.8, 0.8, -2.5, -2.0)
LEN_CAP = 64  # tokens; beyond this, length stops adding evidence

# the special-character class the gate's charclass rule uses
# (dialect-safe subset: literal ranges, no \w)
_SPECIAL_KEEP = r"[A-Za-z0-9À-ÿ \t\n\r]"


# feature order is part of the model spec (weights index into it)
FEATURES = ("stopword_frac", "len_capped", "digit_frac", "special_frac")


def quality_features(text_col: str = "text") -> dict[str, Column]:
    """The scorer's four features as named Column expressions, each an
    exact-integer ratio (0.0 on empty docs) and therefore bit-identical
    in any engine: stopword-token fraction, capped token count, digit-
    char fraction, special-char fraction."""
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

    return {
        "stopword_frac": frac(ns, nt),
        "len_capped": F.least(nt, F.lit(LEN_CAP)) / F.lit(float(LEN_CAP)),
        "digit_frac": frac(nd, nc),
        "special_frac": frac(nsp, nc),
    }


def _linear_chain(weights, feats: dict[str, Column]) -> Column:
    """bias + Σ w_j·f_j as a FIXED left-associated chain — the
    engine-bit-identical form (module docstring)."""
    z = F.lit(float(weights[0]))
    for j, name in enumerate(FEATURES):
        z = z + (F.lit(float(weights[j + 1])) * feats[name])
    return z


def quality_score_col(text_col: str = "text") -> Column:
    """The score as a Column expression (see :func:`quality_score`) — the
    form other fused audits embed without materializing columns."""
    return _linear_chain(WEIGHTS, quality_features(text_col))


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


# ---------------------------------------------------------------------------
# Trained classifier: the "real deployment replaces WEIGHTS with offline
# logistic-regression output" path, made concrete and deterministic.
#
# Pattern (CCNet / GPT-3 quality classifier): labels come from an existing
# rule family (weak supervision — here the Gopher pass/fail conjunction),
# training runs DRIVER-side on a bounded deterministic sample (the IVF
# "TakeOrdered sample + learned literals" shape), and the learned weights
# ship back into the same fixed Catalyst scoring chain.  At 10^12 docs the
# scoring pass is the cost, and it is unchanged: one scan, no UDF, no
# shuffle.  Every step is bit-reproducible:
#   - sample: order by (xxhash64(doc_id), doc_id), limit N — exact;
#   - features: exact-integer ratios (identical doubles in any engine);
#   - training: full-batch gradient descent, plain Python floats, fold
#     order = doc_id ascending, fixed iters/lr — a written spec the
#     differential twin re-implements;
#   - decision: z > 0 (sign test — no executor-side exp()).
# ---------------------------------------------------------------------------

TRAIN_SAMPLE = 512   # driver-side sample rows (bounded, deterministic)
TRAIN_ITERS = 300    # full-batch GD iterations
TRAIN_LR = 2.0       # learning rate (features all live in [0, 1])


def train_logistic(rows, iters: int = TRAIN_ITERS, lr: float = TRAIN_LR):
    """Deterministic full-batch logistic regression — the written spec.

    ``rows`` = [(id, y, (f_1..f_k)), ...]; folded in ascending-id order
    with plain left-associated float accumulation.  z = ((bias + w1·f1)
    + w2·f2) + ...; p = 1/(1+exp(−z)); gradient g_j = Σ_i (p_i − y_i)·f_ij;
    update w_j ← w_j − lr·(g_j/m).  No numpy — association order is part
    of the spec so an independent twin lands on the same bits.
    """
    import math

    rows = sorted(rows, key=lambda r: r[0])
    if not rows:
        raise ValueError("empty training sample")
    m = float(len(rows))
    k = len(rows[0][2])
    w = [0.0] * (k + 1)
    for _ in range(iters):
        g = [0.0] * (k + 1)
        for _id, y, x in rows:
            z = w[0]
            for j in range(k):
                z = z + (w[j + 1] * x[j])
            p = 1.0 / (1.0 + math.exp(-z))
            e = p - float(y)
            g[0] = g[0] + e
            for j in range(k):
                g[j + 1] = g[j + 1] + (e * x[j])
        for j in range(k + 1):
            w[j] = w[j] - (lr * (g[j] / m))
    return tuple(w)


def fit_quality_weights(
    docs: DataFrame,
    label_col: str,
    sample_n: int = TRAIN_SAMPLE,
    iters: int = TRAIN_ITERS,
    lr: float = TRAIN_LR,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Learn (bias, w_stopword, w_len, w_digit, w_special) from a boolean
    ``label_col`` on a bounded deterministic sample.  The sample is the
    ``sample_n`` smallest (xxhash64(id), id) rows — a uniform pseudo-random
    slice Spark executes as TakeOrderedAndProject (per-partition partial
    top-k; the corpus never shuffles, the driver sees ``sample_n`` rows).
    NULL-labeled rows are excluded before sampling — a weak-supervision
    label derived from nullable columns can be NULL, and the trainer
    needs a decided row."""
    feats = quality_features(text_col)
    sample = (
        docs.where(F.col(label_col).isNotNull())
        .select(
            F.col(id_col).alias("__id"),
            F.col(label_col).cast("int").alias("__y"),
            *[c.alias(n) for n, c in feats.items()],
        )
        .orderBy(F.xxhash64(F.col("__id")), F.col("__id"))
        .limit(sample_n)
        .collect()
    )
    rows = [
        (r["__id"], r["__y"], tuple(r[n] for n in FEATURES)) for r in sample
    ]
    return train_logistic(rows, iters=iters, lr=lr)


def score_with_weights(
    docs: DataFrame, weights, text_col: str = "text"
) -> DataFrame:
    """Adds ``clf_score`` (the raw logit z — monotone in the probability)
    and ``clf_keep`` (z > 0 ⇔ p > ½).  Same plan shape as
    :func:`quality_score`: one scan, whole-stage codegen, no Python."""
    z = _linear_chain(weights, quality_features(text_col))
    return docs.withColumn("clf_score", z).withColumn(
        "clf_keep", F.col("clf_score") > F.lit(0.0)
    )


def classifier_report(
    docs: DataFrame, label_col: str, weights, text_col: str = "text"
) -> DataFrame:
    """(metric, value) relation: the learned weights plus the confusion
    of the classifier's sign test against ``label_col`` over the FULL
    corpus — one fused aggregate, one scan.  Counts are exact integers;
    weights are the bit-exact training output.  NULL-labeled rows are
    excluded up front so the four confusion cells always sum to ``n``
    (a NULL label would silently vanish from the cells but not the
    count)."""
    spark = docs.sparkSession
    scored = score_with_weights(
        docs.where(F.col(label_col).isNotNull()), weights, text_col)
    y = F.col(label_col).cast("boolean")
    pred = F.col("clf_keep")
    cnt = lambda c: F.sum(c.cast("int")).cast("double")  # noqa: E731
    conf = scored.agg(
        cnt(pred & y).alias("tp"),
        cnt(pred & ~y).alias("fp"),
        cnt(~pred & y).alias("fn"),
        cnt(~pred & ~y).alias("tn"),
        F.count(F.lit(1)).cast("double").alias("n"),
    )
    long = conf.selectExpr(
        "stack(5, 'tp', tp, 'fp', fp, 'fn', fn, 'tn', tn, 'n', n) "
        "AS (metric, value)"
    )
    wrows = [("w_bias", float(weights[0]))] + [
        (f"w_{name}", float(weights[j + 1])) for j, name in enumerate(FEATURES)
    ]
    wdf = spark.createDataFrame(wrows, "metric string, value double")
    return wdf.unionByName(long).orderBy("metric")


def classifier_calibration(
    docs: DataFrame,
    label_col: str,
    weights,
    n_buckets: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Calibration curve for a trained classifier: exact score-quantile
    buckets (best first) × observed label rate — the accuracy-tradeoff-
    as-data pattern (ann_recall / lsh_tuning) applied to the quality
    model.  A well-ordered classifier shows pass_rate falling with the
    bucket index; the curve IS the evidence, reported as a relation.

    Exact formulation (verification path): global ``ntile`` ordered by
    (clf_score DESC, id) — fully deterministic, differential-checkable.
    Implies one sort; the 10^12-row production path applies
    :func:`learn_cutoffs`-style sampled boundaries instead (same law as
    CCNet buckets).
    """
    scored = score_with_weights(docs, weights, text_col)
    w = Window.orderBy(F.desc("clf_score"), F.asc(id_col))
    b = scored.withColumn("bucket", F.ntile(n_buckets).over(w))
    y = F.col(label_col).cast("boolean")
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(y.cast("int")).cast("long").alias("n_pass"),
            (
                F.sum(y.cast("int")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("pass_rate"),
            F.min("clf_score").alias("min_score"),
            F.max("clf_score").alias("max_score"),
        )
        .orderBy("bucket")
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
    land exactly as the ntile path would.

    A group ABSENT from ``cutoffs`` (a language that appeared after
    ``learn_cutoffs`` ran) — or a NULL group — gets bucket_idx NULL /
    bucket 'unknown': an unvetted group must surface for re-learning,
    never silently land in 'head' as top-quality data."""
    n_buckets = len(next(iter(cutoffs.values()))) + 1 if cutoffs else 1
    scored = quality_score(docs, text_col=text_col)
    idx: Column = F.lit(None).cast("int")
    for grp, bounds in sorted(cutoffs.items()):
        below = sum(
            (F.col("q_score") < F.lit(float(b))).cast("int") for b in bounds
        )
        idx = F.when(F.col(group_col) == grp, 1 + below).otherwise(idx)
    return scored.withColumn("bucket_idx", idx.cast("int")).withColumn(
        "bucket",
        F.when(F.col("bucket_idx").isNull(), F.lit("unknown"))
        .when(F.col("bucket_idx") == 1, F.lit("head"))
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
