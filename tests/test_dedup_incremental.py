"""Incremental dedup (anti-join against a fingerprint index) contract."""

from __future__ import annotations

import pytest
from pyspark.sql import Row


@pytest.mark.usefixtures("spark")
class TestDedupAgainstIndex:
    def test_known_content_dropped_new_content_kept(self, spark):
        from data_quality_spark.operators.dedup import (
            build_dedup_index,
            dedup_against_index,
        )

        history = spark.createDataFrame(
            [Row(doc_id=1, text="alpha"), Row(doc_id=2, text="beta")])
        index = build_dedup_index(history)
        new = spark.createDataFrame(
            [Row(doc_id=10, text="alpha"),   # already indexed → dropped
             Row(doc_id=11, text="gamma"),   # new → kept
             Row(doc_id=12, text="beta"),    # already indexed → dropped
             Row(doc_id=13, text=None)])     # NULL text → always kept
        out = dedup_against_index(new, index).toPandas()
        assert sorted(out["doc_id"]) == [11, 13]
        # survivors keep their full original rows
        assert set(out.columns) == {"doc_id", "text"}

    def test_index_is_distinct_and_null_free(self, spark):
        from data_quality_spark.operators.dedup import build_dedup_index

        history = spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in
             enumerate(["x", "x", "y", None, "y"])])
        idx = build_dedup_index(history).toPandas()
        assert len(idx) == 2  # x, y once each; NULL contributes nothing
        assert idx["fp"].notna().all()

    def test_growing_index_converges(self, spark):
        """The incremental loop: survivors' fingerprints append to the
        index; replaying the same batch then yields zero survivors with
        non-NULL text."""
        from pyspark.sql import functions as F

        from data_quality_spark.operators.dedup import (
            build_dedup_index,
            dedup_against_index,
        )

        batch = spark.createDataFrame(
            [Row(doc_id=i, text=f"doc {i % 7}") for i in range(20)])
        index = build_dedup_index(spark.createDataFrame(
            [Row(doc_id=0, text="doc 0")]))
        first = dedup_against_index(batch, index)
        grown = index.unionByName(build_dedup_index(first)).distinct()
        second = dedup_against_index(batch, grown)
        assert second.filter(F.col("text").isNotNull()).count() == 0
