"""Snapshot-diff and column-profiling operator contracts.

The DuckDB twins prove engine agreement on real tables; these tests pin
the semantic corners: NULL transitions, composite keys, all-null
columns, and the exact/approx distinct trade.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


@pytest.mark.usefixtures("spark")
class TestSnapshotDiff:
    def _frames(self, spark):
        old = spark.createDataFrame(
            [Row(k=1, v="a", w=10),
             Row(k=2, v="b", w=20),
             Row(k=3, v="c", w=30),
             Row(k=4, v=None, w=40),
             Row(k=5, v="e", w=50)])
        new = spark.createDataFrame(
            [Row(k=1, v="a", w=10),        # unchanged
             Row(k=2, v="B", w=20),        # changed: v
             Row(k=3, v="c", w=99),        # changed: w
             Row(k=4, v=None, w=40),       # unchanged (NULL == NULL)
             Row(k=6, v="f", w=60)])       # added; k=5 removed
        return old, new

    def test_statuses_and_column_counts(self, spark):
        from data_quality_spark.operators.snapshot import snapshot_diff

        old, new = self._frames(spark)
        got = {r["metric"]: r["n_rows"]
               for r in snapshot_diff(old, new, ["k"]).collect()}
        assert got == {
            "status:added": 1, "status:removed": 1,
            "status:changed": 2, "status:unchanged": 2,
            "column:v": 1, "column:w": 1,
        }

    def test_null_transitions_count_as_changes(self, spark):
        from data_quality_spark.operators.snapshot import snapshot_diff

        old = spark.createDataFrame([Row(k=1, v="x"), Row(k=2, v=None)])
        new = spark.createDataFrame([Row(k=1, v=None), Row(k=2, v="y")])
        got = {r["metric"]: r["n_rows"]
               for r in snapshot_diff(old, new, ["k"]).collect()}
        assert got["status:changed"] == 2
        assert got["column:v"] == 2

    def test_composite_key(self, spark):
        from data_quality_spark.operators.snapshot import snapshot_diff

        old = spark.createDataFrame(
            [Row(a=1, b="x", v=1), Row(a=1, b="y", v=2)])
        new = spark.createDataFrame(
            [Row(a=1, b="x", v=1), Row(a=2, b="y", v=2)])
        got = {r["metric"]: r["n_rows"]
               for r in snapshot_diff(old, new, ["a", "b"]).collect()}
        assert got["status:added"] == 1
        assert got["status:removed"] == 1
        assert got["status:unchanged"] == 1

    def test_row_level_relation(self, spark):
        from data_quality_spark.operators.snapshot import snapshot_diff_rows

        old, new = self._frames(spark)
        rows = {r["k"]: r for r in
                snapshot_diff_rows(old, new, ["k"]).collect()}
        assert rows[1]["status"] == "unchanged"
        assert rows[2]["status"] == "changed" and rows[2]["chg_v"]
        assert not rows[2]["chg_w"]
        assert rows[5]["status"] == "removed"
        assert rows[5]["chg_v"] is None  # no counterpart to compare
        assert rows[6]["status"] == "added"

    def test_single_join_single_aggregate(self, spark):
        from data_quality_spark.operators.snapshot import snapshot_diff

        old, new = self._frames(spark)
        plan = snapshot_diff(old, new, ["k"])._jdf.queryExecution() \
            .optimizedPlan().toString()
        assert plan.count("Join FullOuter") == 1
        # the status tally and all column counts live in one Aggregate
        assert plan.count("Aggregate") == 1


@pytest.mark.usefixtures("spark")
class TestProfileColumns:
    def _df(self, spark):
        return spark.createDataFrame(
            [Row(i=1, s="aa", z=None),
             Row(i=2, s="bbbb", z=None),
             Row(i=2, s=None, z=None),
             Row(i=None, s="cc", z=None)],
            "i int, s string, z string")

    def test_profile_values(self, spark):
        from data_quality_spark.operators.profiling import profile_columns

        out = {r["column"]: r for r in
               profile_columns(self._df(spark)).collect()}
        i = out["i"]
        assert (i["dtype"], i["n_rows"], i["n_null"], i["n_distinct"]) == (
            "numeric", 4, 1, 2)
        assert (i["min_num"], i["max_num"], i["mean"]) == (1.0, 2.0, 5 / 3)
        assert i["min_len"] is None
        s = out["s"]
        assert (s["dtype"], s["n_null"], s["n_distinct"]) == ("string", 1, 3)
        assert (s["min_len"], s["max_len"], s["avg_len"]) == (2, 4, 8 / 3)
        assert s["min_num"] is None
        z = out["z"]  # all-NULL column: stats NULL, counts defined
        assert (z["n_null"], z["n_distinct"]) == (4, 0)
        assert z["min_len"] is None and z["avg_len"] is None

    def test_approx_tracks_exact(self, spark):
        from data_quality_spark.operators.profiling import profile_columns

        df = spark.range(5000).select(
            F.col("id").alias("i"),
            (F.col("id") % 137).cast("string").alias("s"))
        exact = {r["column"]: r["n_distinct"]
                 for r in profile_columns(df).collect()}
        approx = {r["column"]: r["n_distinct"]
                  for r in profile_columns(df, approx=True).collect()}
        assert exact == {"i": 5000, "s": 137}
        for c in exact:
            # default HLL++ rsd is 0.05; 3σ bound keeps this deterministic
            assert abs(approx[c] - exact[c]) <= 0.15 * exact[c]

    def test_approx_avoids_expand(self, spark):
        from data_quality_spark.operators.profiling import profile_columns

        df = self._df(spark)
        exact_plan = profile_columns(df)._jdf.queryExecution() \
            .optimizedPlan().toString()
        approx_plan = profile_columns(df, approx=True)._jdf \
            .queryExecution().optimizedPlan().toString()
        assert "Expand" in exact_plan      # k-way replication: exact cost
        assert "Expand" not in approx_plan  # HLL++: plain partial/final
