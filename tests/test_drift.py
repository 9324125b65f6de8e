"""drift_report semantics on seeded frames: null-safe change counting,
added/removed accounting, per-version profile stats recovered from the
single join, approx mode, and non-numeric mean suppression."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_quality_spark.operators.drift import drift_report


@pytest.fixture(scope="module")
def frames(spark):
    old = spark.createDataFrame(
        [
            (1, 10, "a"),
            (2, None, "b"),     # null → 7 in new: change
            (3, 30, None),      # removed
            (4, 40, "d"),       # value change 40 → 41
            (5, None, "e"),     # null → null: NOT a change
        ],
        "k int, v int, s string",
    )
    new = spark.createDataFrame(
        [
            (1, 10, "a"),       # unchanged
            (2, 7, "b"),
            (4, 41, "d"),
            (5, None, "e"),
            (6, 60, "f"),       # added
        ],
        "k int, v int, s string",
    )
    return old, new


def test_report_values(spark, frames):
    old, new = frames
    rep = {
        r["column"]: r
        for r in drift_report(old, new, ["k"]).collect()
    }
    assert set(rep) == {"v", "s"}
    for r in rep.values():
        assert r["n_old"] == 5 and r["n_new"] == 5
        assert r["n_added"] == 1 and r["n_removed"] == 1
        assert r["n_matched"] == 4
    v = rep["v"]
    # changes among matched: null→7 and 40→41; null→null is not a change
    assert v["n_changed"] == 2
    assert v["chg_rate"] == pytest.approx(0.5)
    assert v["null_old"] == 2 and v["null_new"] == 1
    assert v["distinct_old"] == 3 and v["distinct_new"] == 4
    # exact integer means: (10+30+40)/3 and (10+7+41+60)/4
    assert v["mean_old"] == pytest.approx(80 / 3)
    assert v["mean_new"] == pytest.approx(118 / 4)
    assert v["mean_delta"] == pytest.approx(118 / 4 - 80 / 3)
    s = rep["s"]
    assert s["n_changed"] == 0
    assert s["null_old"] == 1 and s["null_new"] == 0
    assert s["mean_old"] is None and s["mean_delta"] is None


def test_compare_subset_and_approx(spark, frames):
    old, new = frames
    rows = drift_report(old, new, ["k"], compare=["v"], approx=True).collect()
    assert len(rows) == 1 and rows[0]["column"] == "v"
    # HLL++ on tiny cardinalities is exact
    assert rows[0]["distinct_old"] == 3 and rows[0]["distinct_new"] == 4


def test_single_join_single_aggregate_plan(spark, frames):
    old, new = frames
    plan = drift_report(old, new, ["k"])._jdf.queryExecution().executedPlan().toString()
    # exactly one join, no re-scan of either side beyond the join inputs
    assert plan.count("Join") >= 1
    n_joins = sum(
        1 for ln in plan.splitlines()
        if "SortMergeJoin" in ln or "BroadcastHashJoin" in ln
        or "ShuffledHashJoin" in ln
    )
    assert n_joins == 1


def test_grouped_drift(spark, frames):
    """by=['g'] splits the report per group with added/removed rows landing
    in their present side's group; totals reconcile with the global report."""
    old, new = frames
    old_g = old.withColumn("g", (F.col("k") % 2 == 0).cast("string"))
    new_g = new.withColumn("g", (F.col("k") % 2 == 0).cast("string"))
    grouped = drift_report(old_g, new_g, ["k"], compare=["v"], by=["g"])
    rows = {r["g"]: r for r in grouped.collect()}
    assert set(rows) == {"true", "false"}
    glob = drift_report(old_g, new_g, ["k"], compare=["v"]).collect()[0]
    for m in ("n_old", "n_new", "n_added", "n_removed", "n_matched",
              "n_changed", "null_old", "null_new"):
        assert sum(r[m] for r in rows.values()) == glob[m], m
    # row 6 (added, k even) lands in group 'true'
    assert rows["true"]["n_added"] == 1 and rows["false"]["n_added"] == 0
