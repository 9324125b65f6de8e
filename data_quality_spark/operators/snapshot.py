"""Snapshot diff: what changed between two versions of a table.

The monitoring question the reference's issue-pattern history answers in
time ("when did this issue first appear") has a data twin: *which rows*
appeared / disappeared / changed between yesterday's snapshot and
today's.  A training-corpus pipeline asks it constantly — did the
re-crawl add documents, did a fix mutate transcripts, did an upstream
bug silently drop a partition.

Shape: ONE null-safe full-outer join on the key (the only shuffle) and
ONE fused aggregate that computes the status tally and every per-column
change count in the same pass — no per-column jobs, no second scan.
At 10^12 rows the join is the irreducible cost; co-partitioned/bucketed
storage makes it exchange-free, and AQE handles skewed keys.

Reference analog: no snapshot diff exists in the reference; nearest is
``benchmark_storage.py:184-279`` (issue-pattern first/last-detected
MERGE) — this is the same MERGE bookkeeping applied to the data itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["snapshot_diff_rows", "snapshot_diff"]


def _col_changed(old_c: Column, new_c: Column) -> Column:
    """Null-safe inequality: NULL→value, value→NULL and value→value'
    all count as a change; NULL→NULL does not."""
    return ~old_c.eqNullSafe(new_c)


def snapshot_diff_rows(
    old: DataFrame,
    new: DataFrame,
    key: list[str],
    compare: list[str] | None = None,
) -> DataFrame:
    """Row-level diff relation: key columns + ``status`` ∈
    {added, removed, changed, unchanged} + one ``chg_<col>`` boolean per
    compared column (NULL for added/removed rows).

    ``compare`` defaults to every non-key column present in BOTH frames.
    """
    if compare is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare = [c for c in shared if c not in set(key)]
    # presence markers, not key-null checks: a row whose KEY is NULL on
    # both sides still matches (eqNullSafe join) and must read as matched
    o = old.select(
        key + compare + [F.lit(True).alias("__in_old__")]).alias("o")
    n = new.select(
        key + compare + [F.lit(True).alias("__in_new__")]).alias("n")
    cond = None
    for k in key:
        eq = F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}"))
        cond = eq if cond is None else cond & eq
    j = o.join(n, cond, "full_outer")
    in_old = F.col("o.__in_old__").isNotNull()
    in_new = F.col("n.__in_new__").isNotNull()
    chg = [
        _col_changed(F.col(f"o.{c}"), F.col(f"n.{c}")).alias(f"chg_{c}")
        for c in compare
    ]
    any_chg = None
    for c in compare:
        x = _col_changed(F.col(f"o.{c}"), F.col(f"n.{c}"))
        any_chg = x if any_chg is None else any_chg | x
    status = (
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("removed"))
        .when(any_chg if any_chg is not None else F.lit(False),
              F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    keyed = [
        F.coalesce(F.col(f"n.{k}"), F.col(f"o.{k}")).alias(k) for k in key
    ]
    flagged = [
        F.when(in_old & in_new, c).otherwise(F.lit(None)).alias(f"chg_{name}")
        for c, name in zip(chg, compare)
    ]
    return j.select(*keyed, status.alias("status"), *flagged)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: list[str],
    compare: list[str] | None = None,
) -> DataFrame:
    """Long-format diff summary: one row per status
    (``metric='status:<s>'``) and one per compared column
    (``metric='column:<c>'`` counting value changes among matched rows),
    all from ONE fused aggregate over the joined relation."""
    if compare is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare = [c for c in shared if c not in set(key)]
    rows = snapshot_diff_rows(old, new, key, compare)
    aggs = [
        F.count(F.when(F.col("status") == s, 1)).alias(f"status:{s}")
        for s in ("added", "removed", "changed", "unchanged")
    ] + [
        F.count(F.when(F.col(f"chg_{c}"), 1)).alias(f"column:{c}")
        for c in compare
    ]
    wide = rows.agg(*aggs)
    names = [f"status:{s}" for s in ("added", "removed", "changed",
                                     "unchanged")]
    names += [f"column:{c}" for c in compare]
    stack = ", ".join(f"'{m}', `{m}`" for m in names)
    return wide.selectExpr(
        f"stack({len(names)}, {stack}) as (metric, n_rows)"
    )
