"""Kill/resume test: a killed gate run resumes without recomputing finished
partitions (north-rule resumability law)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_quality_spark.runner import (
    list_ingest_days,
    run_gate_pipeline,
    write_clips,
)
from data_quality_spark.sources.io import LineageLedger, read_metrics
from data_quality_spark.synth import generate_clips


@pytest.fixture(scope="module")
def clips_path(spark, tmp_path_factory):
    pdf = generate_clips(600, seed=11)
    path = str(tmp_path_factory.mktemp("clips") / "bronze")
    write_clips(spark, pdf, path)
    return path


def test_partition_layout(spark, clips_path):
    days = list_ingest_days(spark, clips_path)
    assert len(days) == 7 and days[0] == "2026-01-01"


def test_full_run_then_noop_resume(spark, clips_path, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("out") / "gate1")
    r1 = run_gate_pipeline(spark, clips_path, out)
    assert r1["completed"] and r1["days"] == 7 and r1["rows_in"] == 600
    assert 0 < r1["rows_kept"] < 600
    # second run: everything done → nothing recomputed
    r2 = run_gate_pipeline(spark, clips_path, out)
    assert r2["days"] == 0 and r2["skipped"] == 7 and r2["rows_in"] == 0
    # silver output exists, partitioned by day+lang
    silver = spark.read.parquet(os.path.join(out, "silver"))
    assert silver.count() == r1["rows_kept"]
    assert set(silver.select("decision").distinct().toPandas()["decision"]) == {"keep"}
    # metrics recorded per day + batch throughput
    m = read_metrics(spark, out).toPandas()
    assert (m["metric"] == "clips_per_sec").any()
    assert int(m[m["metric"] == "rows_in"]["value"].sum()) == 600


def test_featurize_executes_once_per_batch(spark, clips_path, tmp_path_factory):
    """The gate DAG must run ONE pass per batch: per-day counts come from
    observe() metrics on the write action, not a second collect() that would
    re-decode every clip (the 100-TB double-compute trap)."""
    out = str(tmp_path_factory.mktemp("out") / "gate_once")
    decoded = spark.sparkContext.accumulator(0)
    r = run_gate_pipeline(spark, clips_path, out, decode_counter=decoded)
    assert r["completed"] and r["rows_in"] == 600
    assert decoded.value == 600  # would be 1200 if the DAG executed twice


def test_three_way_graylist_partitions(spark, clips_path, tmp_path_factory):
    """three_way=True surfaces decide3's graylist as an output partition in
    the SAME single write (decision is one more partition column), with
    per-day graylist metrics; accept+graylist+reject partitions the input."""
    from data_quality_spark.pipeline import _text_heuristics, decide3, featurize

    out = str(tmp_path_factory.mktemp("out") / "gate3")
    decoded = spark.sparkContext.accumulator(0)
    r = run_gate_pipeline(
        spark, clips_path, out, decode_counter=decoded, three_way=True
    )
    assert r["completed"] and r["rows_in"] == 600
    assert decoded.value == 600  # one featurize pass despite two outputs
    gated = spark.read.parquet(os.path.join(out, "gated"))
    got = {
        row["decision"]: row["n"]
        for row in gated.groupBy("decision")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(got) <= {"accept", "graylist"} and "accept" in got
    assert got["accept"] == r["rows_kept"]
    assert got.get("graylist", 0) == r.get("rows_graylist", 0)
    # batch-path equivalence: same decide3 over the same bronze
    want = (
        decide3(_text_heuristics(featurize(spark.read.parquet(clips_path))))
        .groupBy("decision")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    want_map = {row["decision"]: row["n"] for row in want}
    assert want_map.get("accept", 0) == got["accept"]
    assert want_map.get("graylist", 0) == got.get("graylist", 0)
    # metrics carry the graylist series
    m = read_metrics(spark, out).toPandas()
    assert (m["metric"] == "rows_graylist").any()


def test_kill_and_resume_without_recompute(spark, clips_path, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("out") / "gate2")
    # process 3 days per batch, die after the first batch
    r1 = run_gate_pipeline(
        spark, clips_path, out, days_per_batch=3, fail_after_batches=1
    )
    assert not r1["completed"] and r1["days"] == 3
    ledger = LineageLedger(out, "gate")
    done_after_kill = [d for d in list_ingest_days(spark, clips_path) if ledger.status(d) == "done"]
    assert len(done_after_kill) == 3
    # resume: only the remaining 4 days are processed
    r2 = run_gate_pipeline(spark, clips_path, out, days_per_batch=3)
    assert r2["completed"] and r2["days"] == 4 and r2["skipped"] == 3
    # total coverage adds up with no overlap
    total = r1["rows_in"] + r2["rows_in"]
    assert total == 600
    silver = spark.read.parquet(os.path.join(out, "silver"))
    assert silver.select("clip_id").distinct().count() == silver.count()
