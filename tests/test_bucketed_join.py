"""Bucketed-table co-located join: the shuffle-avoidance pattern for
repeated large joins (SURVEY §4: 'bucketing for co-located joins')."""

from __future__ import annotations

import pytest

from data_quality_spark.sources.io import write_bucketed


@pytest.mark.slow
def test_bucketed_join_has_no_exchange(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    try:
        left = spark.range(0, 10_000).selectExpr(
            "id as clip_key", "id % 7 as lang_bucket"
        )
        right = spark.range(0, 10_000).selectExpr(
            "id as clip_key", "cast(id % 100 as double) as score"
        )
        write_bucketed(left, "bkt_left", "clip_key", num_buckets=8)
        write_bucketed(right, "bkt_right", "clip_key", num_buckets=8)
        joined = spark.table("bkt_left").join(spark.table("bkt_right"), "clip_key")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # both sides read pre-bucketed: SortMergeJoin with NO Exchange
        assert "Exchange" not in plan, plan
        assert joined.count() == 10_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")
