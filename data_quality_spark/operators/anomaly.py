"""Trend anomaly detection with an EXACT integer z-test.

The reference's monitoring stack rolls metrics up by day
(``benchmark_storage.py:282-346`` quality score); the question it stops
short of is "which day is statistically anomalous?".  The classic
|z| > k test on daily counts is float-fragile across engines (stddev is
a sum-of-squares race), so this operator keeps the whole decision in
integer arithmetic:

    |x − μ| > k·σ   ⇔   (n·x − S)² > k²·(n·Q − S²)

with S = Σx, Q = Σx² over the n days of the series — counts are
integers, so both sides are exact BIGINT expressions any engine
evaluates identically.  No float ever decides a flag; floats appear
only in the reported (rounded) mean/z for humans.

Shape: one aggregate per series key (the only shuffle) + a broadcast-
sized join back onto the daily rows (#series rows — tiny); at 10^12
events the daily rollup that feeds this is already partial/final.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["count_anomalies"]


def count_anomalies(
    daily: DataFrame,
    key: list[str],
    value_col: str,
    *,
    k: int = 3,
) -> DataFrame:
    """Flag rows of a per-key daily relation whose integer ``value_col``
    deviates more than ``k`` population standard deviations from the
    key's own mean.  Returns the input plus (n_days, mean, z,
    is_anomaly); the flag is decided in exact integer arithmetic, and
    mean/z are single float64 expressions over exact integers — bit-
    identical in any IEEE engine, no rounding needed."""
    v = F.col(value_col).cast("long")
    stats = daily.groupBy(*key).agg(
        F.count(F.lit(1)).alias("__n__"),
        F.sum(v).alias("__s__"),
        F.sum(v * v).alias("__q__"),
    )
    j = daily.join(F.broadcast(stats), key)
    n = F.col("__n__")
    s = F.col("__s__")
    q = F.col("__q__")
    dev = n * v - s                       # n·x − S, exact
    var_n2 = n * q - s * s                # n²·σ² = n·Q − S², exact
    flag = (dev * dev) > (F.lit(k * k) * var_n2)
    mean = s.cast("double") / n.cast("double")
    z = F.when(
        var_n2 > 0,
        dev.cast("double") / F.sqrt(var_n2.cast("double")),
    )  # NULL when the series is constant — z undefined, flag False
    return (
        j.withColumn("n_days", n)
        .withColumn("mean", mean)
        .withColumn("z", z)
        .withColumn("is_anomaly", flag & (var_n2 > 0))
        .drop("__n__", "__s__", "__q__")
    )
