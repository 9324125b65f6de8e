"""Tests: storage-direct gate path (featurize_files / gate_files) and the
distributed corpus generator — both must agree exactly with their
driver-side counterparts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_quality_spark.plans.schemas import CLIPS_SCHEMA
from data_quality_spark.pipeline import gate, gate_files
from data_quality_spark.synth import generate_clips, generate_clips_distributed


@pytest.fixture(scope="module")
def bronze_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("bronze") / "clips")
    pdf = generate_clips(400, seed=5)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    spark.createDataFrame(pdf[cols], CLIPS_SCHEMA).repartition(4).write.parquet(path)
    return path


def test_gate_files_matches_gate(spark, bronze_path):
    via_jvm = gate(spark.read.parquet(bronze_path)).select(
        "clip_id", "decision", "scrubbed", F.round("ppl", 9).alias("ppl_r")
    )
    via_files = gate_files(spark, bronze_path).select(
        "clip_id",
        F.col("decision").alias("d2"),
        F.col("scrubbed").alias("s2"),
        F.round("ppl", 9).alias("p2"),
    )
    joined = via_jvm.join(via_files, "clip_id")
    assert joined.count() == 400
    mismatches = joined.filter(
        (F.col("decision") != F.col("d2"))
        | (F.col("scrubbed") != F.col("s2"))
        | (F.col("ppl_r") != F.col("p2"))
    ).count()
    assert mismatches == 0


def test_gate_files_drops_payload(spark, bronze_path):
    out = gate_files(spark, bronze_path)
    assert "bytes" not in out.columns
    assert {"decision", "scrubbed", "lang_pred", "rms_db"} <= set(out.columns)


def test_featurize_files_partition_columns(spark, tmp_path):
    from data_quality_spark.pipeline import featurize_files

    pdf = generate_clips(120, seed=6)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    path = str(tmp_path / "part_bronze")
    spark.createDataFrame(pdf[cols], CLIPS_SCHEMA).write.partitionBy(
        "ingest_day"
    ).parquet(path)

    out = featurize_files(spark, path)
    assert "ingest_day" in out.columns          # reconstructed from dir names
    assert out.count() == 120
    days = {r.ingest_day for r in out.select("ingest_day").distinct().collect()}
    assert days == set(pdf["ingest_day"].unique())

    one_day = sorted(days)[0]
    pruned = featurize_files(
        spark, path, partition_filter=lambda pv: pv.get("ingest_day") == one_day
    )
    assert pruned.count() == int((pdf["ingest_day"] == one_day).sum())


def test_generate_clips_distributed_deterministic(spark):
    a = generate_clips_distributed(spark, 101, seed=9, partitions=4)
    b = generate_clips_distributed(spark, 101, seed=9, partitions=4)
    assert a.count() == 101
    ra = sorted(
        (r.clip_id, r.codec, r.sr_hz, r.transcript) for r in a.collect()
    )
    rb = sorted(
        (r.clip_id, r.codec, r.sr_hz, r.transcript) for r in b.collect()
    )
    assert ra == rb
    # distinct ids across shards
    assert len({x[0] for x in ra}) == 101


def test_generate_clips_distributed_has_defect_mix(spark):
    df = generate_clips_distributed(spark, 400, seed=10, partitions=8)
    decided = gate(df)
    counts = dict(
        decided.groupBy("decision").count().rdd.map(tuple).collect()
    )
    assert counts.get("keep", 0) > 0 and counts.get("drop", 0) > 0
