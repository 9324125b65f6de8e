"""Cross-snapshot drift report: per-column change rates + profile deltas
between two versions of a table, in ONE join + ONE fused aggregate.

``snapshot_diff`` answers *which rows* moved; ``profile_columns``
answers *what a column looks like*.  The monitoring dashboard question
is their composition: per column, how many matched rows changed value,
and how did the column's null mass / cardinality / mean shift between
versions.  Computing it naively costs three scans (two profiles + a
diff); here the old-side and new-side profile statistics are folded
into the SAME aggregate as the diff, over the SAME null-safe full-outer
join output — every old row and every new row appears exactly once on
its side of the join, so conditional aggregates over the markers
recover both per-version profiles exactly.

At 10^12 rows the join is the irreducible cost (bucketed/co-partitioned
storage makes it exchange-free; AQE handles skew); ``approx=True``
swaps exact ``count_distinct`` (which plans an Expand — k+1× the
exchange for k columns) for HyperLogLog++, the right trade at scale.

Reference analog: composes the shapes of ``benchmark_storage.py:184-279``
(issue-pattern first/last MERGE bookkeeping) and
``advanced_analysis.py:300-368`` (per-column completeness), applied
day-over-day to the data itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .profiling import _NUMERIC

__all__ = ["drift_report"]


def drift_report(
    old: DataFrame,
    new: DataFrame,
    key: list[str],
    compare: list[str] | None = None,
    *,
    by: list[str] | None = None,
    approx: bool = False,
) -> DataFrame:
    """One row per compared column (× ``by`` group when given):

    ([by...,] column, n_old, n_new, n_added, n_removed, n_matched,
     n_changed, chg_rate, null_old, null_new, distinct_old, distinct_new,
     mean_old, mean_new, mean_delta)

    ``n_changed`` counts matched rows whose value differs null-safely;
    ``chg_rate`` = n_changed / n_matched (0.0 when nothing matched).
    ``mean_*`` are NULL for non-numeric columns.  Integer means are exact
    (integer sums), hence engine-reproducible; profile doubles with
    ``approx`` cardinalities only, or accept plan-dependent last-ulp means.

    ``by`` names stable grouping columns (e.g. lang/source): group value
    is ``coalesce(new, old)`` per joined row, so added/removed rows land
    in their present side's group — still one join + one aggregate, just
    keyed.
    """
    by = list(by or [])
    if compare is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare = [c for c in shared if c not in set(key) and c not in set(by)]
    fields = {f.name: f.dataType for f in old.schema.fields}
    o = old.select(
        key + by + compare + [F.lit(True).alias("__in_old__")]).alias("o")
    n = new.select(
        key + by + compare + [F.lit(True).alias("__in_new__")]).alias("n")
    cond = None
    for k in key:
        eq = F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}"))
        cond = eq if cond is None else cond & eq
    j = o.join(n, cond, "full_outer")
    in_old = F.col("o.__in_old__").isNotNull()
    in_new = F.col("n.__in_new__").isNotNull()
    distinct = F.approx_count_distinct if approx else F.count_distinct

    aggs = [
        F.count(F.when(in_old, 1)).alias("__n_old__"),
        F.count(F.when(in_new, 1)).alias("__n_new__"),
        F.count(F.when(~in_old, 1)).alias("__n_added__"),
        F.count(F.when(~in_new, 1)).alias("__n_removed__"),
        F.count(F.when(in_old & in_new, 1)).alias("__n_matched__"),
    ]
    for c in compare:
        oc, nc = F.col(f"o.{c}"), F.col(f"n.{c}")
        aggs.append(
            F.count(
                F.when(in_old & in_new & ~oc.eqNullSafe(nc), 1)
            ).alias(f"chg:{c}")
        )
        aggs.append(F.count(F.when(in_old & oc.isNull(), 1)).alias(f"no:{c}"))
        aggs.append(F.count(F.when(in_new & nc.isNull(), 1)).alias(f"nn:{c}"))
        aggs.append(distinct(F.when(in_old, oc)).alias(f"do:{c}"))
        aggs.append(distinct(F.when(in_new, nc)).alias(f"dn:{c}"))
        if isinstance(fields[c], _NUMERIC):
            # integral columns sum in the integer domain (exact, hence
            # bit-identical across engines); float columns accept the
            # plan-dependent last ulp of a double sum
            integral = isinstance(
                fields[c],
                (T.ByteType, T.ShortType, T.IntegerType, T.LongType),
            )
            od = oc if integral else oc.cast("double")
            nd = nc if integral else nc.cast("double")
            aggs.append(
                (F.sum(F.when(in_old, od)).cast("double")
                 / F.count(F.when(in_old, oc))).alias(f"mo:{c}")
            )
            aggs.append(
                (F.sum(F.when(in_new, nd)).cast("double")
                 / F.count(F.when(in_new, nc))).alias(f"mn:{c}")
            )
    if by:
        group_cols = [
            F.coalesce(F.col(f"n.{b}"), F.col(f"o.{b}")).alias(b) for b in by
        ]
        wide = j.groupBy(*group_cols).agg(*aggs)
    else:
        wide = j.agg(*aggs)

    null_d = F.lit(None).cast(T.DoubleType())
    structs = []
    for c in compare:
        num = isinstance(fields[c], _NUMERIC)
        mo = F.col(f"mo:{c}") if num else null_d
        mn = F.col(f"mn:{c}") if num else null_d
        matched = F.col("__n_matched__")
        structs.append(F.struct(
            F.lit(c).alias("column"),
            F.col("__n_old__").alias("n_old"),
            F.col("__n_new__").alias("n_new"),
            F.col("__n_added__").alias("n_added"),
            F.col("__n_removed__").alias("n_removed"),
            matched.alias("n_matched"),
            F.col(f"chg:{c}").alias("n_changed"),
            F.when(matched > 0, F.col(f"chg:{c}") / matched)
            .otherwise(F.lit(0.0)).alias("chg_rate"),
            F.col(f"no:{c}").alias("null_old"),
            F.col(f"nn:{c}").alias("null_new"),
            F.col(f"do:{c}").alias("distinct_old"),
            F.col(f"dn:{c}").alias("distinct_new"),
            mo.alias("mean_old"),
            mn.alias("mean_new"),
            (mn - mo).alias("mean_delta"),
        ))
    return wide.select(
        *by, F.explode(F.array(*structs)).alias("d")
    ).select(*by, "d.*")
