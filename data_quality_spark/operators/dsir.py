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
  with map-side partials — the only corpus shuffle, and it carries
  (int bucket, long count));
- the B log-ratio weights are computed ONCE driver-side in Python
  (``math.log``) and enter the plan as an array literal, so Spark and
  the pure-Python twin fold the SAME doubles;
- each doc's log-weight is a left fold over its gram buckets in document
  order (``aggregate`` HOF) — a fixed association, bit-stable across
  partitionings, unlike a shuffled float SUM;
- selection is top-k by (log_w DESC, id) — ``TakeOrderedAndProject``,
  per-partition partial top-k, no global sort.

The paper's Gumbel resampling replaces deterministic top-k with
top-k of log_w + Gumbel noise; engines disagree on ``log`` ULPs, so the
noisy variant is provided (seeded, md5-based) but the oracled surface is
the deterministic one.

Scale notes: learning shuffles only B-keyed partial counts; scoring is
map-side (the weight array broadcasts as an 8·B-byte literal); at very
large B swap the literal for a broadcast join on bucket — the seam is
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
    "gram_buckets_col",
    "bucket_counts",
    "learn_log_ratio_weights",
    "learn_log_ratio_weights_sliced",
    "dsir_log_weights",
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


def gram_buckets_col(
    text_col: str,
    num_buckets: int = DEFAULT_BUCKETS,
    ngram_sizes: tuple[int, ...] = NGRAM_SIZES,
) -> Column:
    """Per-doc hashed gram bucket array, document order (all sizes
    concatenated, n=1 grams first).  The SAME column feeds both the
    distribution learning (exploded) and the per-doc scoring (folded),
    so the two can never use different featurizations."""
    arr = _token_array(text_col)

    def _bucketer(gfn):
        # NOTE: pyspark HOF lambdas dispatch on parameter count — close
        # over the gram builder, never pass it as a default arg.
        return lambda i: F.pmod(F.xxhash64(gfn(i)), F.lit(num_buckets)).cast(
            "int"
        )

    parts = []
    for n in ngram_sizes:
        gram = (
            (lambda i: F.element_at(arr, i + 1))
            if n == 1
            else (lambda i, n=n: F.array_join(F.slice(arr, i + 1, n), " "))
        )
        parts.append(
            F.when(
                F.size(arr) >= F.lit(n),
                F.transform(
                    F.sequence(F.lit(0), F.size(arr) - F.lit(n)),
                    _bucketer(gram),
                ),
            ).otherwise(F.array().cast("array<int>"))
        )
    out = parts[0]
    for p in parts[1:]:
        out = F.concat(out, p)
    return out


def bucket_counts(
    docs: DataFrame,
    text_col: str = "text",
    num_buckets: int = DEFAULT_BUCKETS,
    ngram_sizes: tuple[int, ...] = NGRAM_SIZES,
) -> DataFrame:
    """(bucket, cnt) exact-integer gram-bucket histogram; one explode +
    one B-key aggregate."""
    return (
        docs.select(
            F.explode(
                gram_buckets_col(text_col, num_buckets, ngram_sizes)
            ).alias("bucket")
        )
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
) -> list[float]:
    """Driver-side Laplace-smoothed log p̂/q̂ per bucket.  The two count
    collections are B-row actions; the math is plain Python so the twin
    shares every double bit-for-bit."""
    t_counts = {
        r["bucket"]: r["cnt"]
        for r in bucket_counts(target, text_col, num_buckets, ngram_sizes).collect()
    }
    r_counts = {
        r["bucket"]: r["cnt"]
        for r in bucket_counts(raw, text_col, num_buckets, ngram_sizes).collect()
    }
    return _weights_from_counts(t_counts, r_counts, num_buckets)


def learn_log_ratio_weights_sliced(
    raw: DataFrame,
    is_target: Column,
    text_col: str = "text",
    num_buckets: int = DEFAULT_BUCKETS,
    ngram_sizes: tuple[int, ...] = NGRAM_SIZES,
) -> list[float]:
    """Same weights as :func:`learn_log_ratio_weights` when the target is
    a SLICE of the raw corpus (the common case — "resemble the high-
    quality subset"), but learned in ONE explode + ONE B-key aggregate:
    each gram carries its row's target flag and the aggregate folds both
    histograms at once, halving the learning scan cost."""
    grams = raw.select(
        is_target.alias("__t"),
        F.explode(
            gram_buckets_col(text_col, num_buckets, ngram_sizes)
        ).alias("bucket"),
    )
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


def dsir_log_weights(
    docs: DataFrame,
    target: DataFrame | None = None,
    weights: list[float] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = DEFAULT_BUCKETS,
    ngram_sizes: tuple[int, ...] = NGRAM_SIZES,
) -> DataFrame:
    """docs + (n_grams, log_w): per-doc importance log-weight as a
    document-order left fold over the gram buckets.  Pass ``target`` to
    learn weights here, or precomputed ``weights`` (length B)."""
    if weights is None:
        if target is None:
            raise ValueError("need target corpus or precomputed weights")
        weights = learn_log_ratio_weights(
            target, docs, text_col, num_buckets, ngram_sizes
        )
    if len(weights) != num_buckets:
        raise ValueError("weights length != num_buckets")
    w_lit = F.array(*[F.lit(float(w)) for w in weights])
    buckets = gram_buckets_col(text_col, num_buckets, ngram_sizes)
    return docs.withColumn("__b", buckets).select(
        *docs.columns,
        F.size("__b").alias("n_grams"),
        F.aggregate(
            "__b",
            F.lit(0.0),
            lambda a, b: a + F.element_at(w_lit, b + F.lit(1)),
        ).alias("log_w"),
    )


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
