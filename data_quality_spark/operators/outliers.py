"""Robust per-group outlier audit: exact integer median/MAD law.

Outlier trimming is a standard curation step (drop documents with
absurd lengths, clips with impossible durations) — but mean/stddev
fences are themselves dragged by the outliers they're meant to catch,
and a float z-score law is engine- and order-dependent.  The robust
statistics literature's answer is median absolute deviation:

    flag(x)  ⇔  |x - median| · den  >  num · MAD

with the fence ``k = num/den`` applied by INTEGER cross-multiplication
(the repo's threshold law — no float ever decides a flag when the
value column is integral).  ``k = 5`` approximates a 3.4σ fence on
normal data (MAD ≈ 0.6745σ); both medians are the deterministic LOWER
median — the value at 1-indexed position (n+1)//2 in (value, id)
order — so the whole law is exact, portable, and tie-stable.

Engine shape: medians come from per-group ``row_number`` windows (one
exchange per pass, partitioned on the group key — never a global
sort), the (group → median, MAD) relation is group-cardinality-small
and joins back broadcast-style under AQE.  Two window passes + one
small join; at 10^12 rows the windows distribute per group and the
skew dial is the grouping itself (a single astronomically hot group
should be profiled, not windowed — the same caveat as every exact
median).  For approximate fences at extreme scale swap
``approx_percentile``; this operator exists for when the flags must
be reproducible bit-for-bit.

Reference analog: none (the reference's range rule A4 takes static
bounds); this is the data-derived fence the advisor would hand A4.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["robust_outlier_flags", "robust_outlier_audit"]


def _lower_median(
    df: DataFrame,
    value_col: str,
    by: Sequence[str],
    id_col: str,
    out_name: str,
) -> DataFrame:
    """(by..., out_name): the deterministic lower median per group —
    value at 1-indexed position (n+1)//2 in (value, id) order."""
    by = list(by)
    w = Window.partitionBy(*by).orderBy(F.col(value_col).asc(),
                                        F.col(id_col).asc())
    ranked = df.select(
        *by, value_col, id_col,
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(Window.partitionBy(*by)).alias("__n"),
    )
    return ranked.where(
        F.col("__rn") == F.expr("(__n + 1) div 2")
    ).select(*by, F.col(value_col).alias(out_name))


def robust_outlier_flags(
    df: DataFrame,
    value_col: str,
    by: Sequence[str] = (),
    id_col: str = "doc_id",
    k_num: int = 5,
    k_den: int = 1,
) -> DataFrame:
    """All input columns + ``med``, ``mad``, ``is_outlier``.

    NULL values are never outliers (they are the completeness family's
    business, not the fence's).  A group whose MAD is 0 (over half the
    group identical) flags exactly the values different from the
    median — the degenerate case's only consistent reading.
    """
    by = list(by)
    vals = df.where(F.col(value_col).isNotNull())
    med = _lower_median(vals, value_col, by, id_col, "med")
    dev = (
        vals.join(med, by) if by else vals.crossJoin(med)
    ).withColumn("__dev", F.abs(F.col(value_col) - F.col("med")))
    mad = _lower_median(dev, "__dev", by, id_col, "mad")
    fenced = (dev.join(mad, by) if by else dev.crossJoin(mad))
    flagged = fenced.withColumn(
        "is_outlier",
        F.col("__dev") * F.lit(k_den) > F.lit(k_num) * F.col("mad"),
    ).drop("__dev")
    nulls = df.where(F.col(value_col).isNull()).withColumns({
        "med": F.lit(None).cast(flagged.schema["med"].dataType),
        "mad": F.lit(None).cast(flagged.schema["mad"].dataType),
        "is_outlier": F.lit(False),
    })
    return flagged.unionByName(nulls)


def robust_outlier_audit(
    df: DataFrame,
    value_col: str,
    by: Sequence[str] = (),
    id_col: str = "doc_id",
    k_num: int = 5,
    k_den: int = 1,
) -> DataFrame:
    """Per-group fence report: (by... ▸ n, n_null, med, mad,
    n_outliers, worst) — ``worst`` is the largest absolute deviation
    among flagged rows (NULL when the group has none), the reviewer's
    entry point.  One aggregate over the flags relation."""
    by = list(by)
    flags = robust_outlier_flags(df, value_col, by, id_col, k_num, k_den)
    dev = F.abs(F.col(value_col) - F.col("med"))
    return flags.groupBy(*by).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(value_col).isNull().cast("long")).cast("long")
        .alias("n_null"),
        F.max("med").alias("med"),
        F.max("mad").alias("mad"),
        F.sum(F.col("is_outlier").cast("long")).cast("long")
        .alias("n_outliers"),
        F.max(F.when(F.col("is_outlier"), dev)).alias("worst"),
    )
