"""Training-input writer (run_feature_pipeline) laws.

Mirrors the gate/segment runners' contract: partition-incremental with a
lineage ledger (kill/resume without recompute), one decode pass per
batch proven by accumulator, per-day metrics via observe() on the single
write action.  Product correctness: the written feature bytes are
byte-identical to a plain mel_features run over the same bronze.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_quality_spark.operators.audio_mel import mel_features
from data_quality_spark.runner import (
    list_ingest_days,
    run_feature_pipeline,
    write_clips,
)
from data_quality_spark.sources.io import read_metrics
from data_quality_spark.synth import generate_clips


@pytest.fixture(scope="module")
def clips_path(spark, tmp_path_factory):
    pdf = generate_clips(300, seed=29)
    path = str(tmp_path_factory.mktemp("clips") / "bronze")
    write_clips(spark, pdf, path)
    return path


def test_full_run_then_noop_resume(spark, clips_path, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("out") / "mel1")
    r1 = run_feature_pipeline(spark, clips_path, out)
    assert r1["completed"] and r1["days"] == 7 and r1["clips_in"] == 300
    assert r1["frames_out"] > 0
    r2 = run_feature_pipeline(spark, clips_path, out)
    assert r2["days"] == 0 and r2["skipped"] == 7 and r2["clips_in"] == 0
    feats = spark.read.parquet(os.path.join(out, "features"))
    assert feats.count() == 300
    days = {r["ingest_day"]
            for r in feats.select("ingest_day").distinct().collect()}
    assert days == set(list_ingest_days(spark, clips_path))
    m = read_metrics(spark, out).toPandas()
    assert (m["metric"] == "frames_per_sec").any()
    assert int(m[m["metric"] == "clips_in"]["value"].sum()) == 300
    assert int(m[m["metric"] == "frames_out"]["value"].sum()) == r1[
        "frames_out"]


def test_kill_resume_no_recompute(spark, clips_path, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("out") / "mel2")
    counter = spark.sparkContext.accumulator(0)
    r1 = run_feature_pipeline(
        spark, clips_path, out, days_per_batch=3,
        fail_after_batches=1, decode_counter=counter,
    )
    assert not r1["completed"] and 0 < r1["days"] <= 3
    first = counter.value
    assert first == r1["clips_in"]
    r2 = run_feature_pipeline(
        spark, clips_path, out, decode_counter=counter
    )
    assert r2["completed"]
    # resumed run decoded ONLY the pending days — totals cover the corpus
    assert counter.value == 300
    assert r1["clips_in"] + r2["clips_in"] == 300
    feats = spark.read.parquet(os.path.join(out, "features"))
    assert feats.count() == 300


def test_product_matches_batch_operator(spark, clips_path, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("out") / "mel3")
    run_feature_pipeline(spark, clips_path, out)
    written = {
        r.clip_id: (r.n_frames, bytes(r.feat))
        for r in spark.read.parquet(os.path.join(out, "features")).collect()
    }
    direct = {
        r.clip_id: (r.n_frames, bytes(r.feat))
        for r in mel_features(spark.read.parquet(clips_path)).collect()
    }
    assert written == direct


def test_cli_features(spark, clips_path, tmp_path_factory, capsys,
                      monkeypatch):
    import json

    import data_quality_spark.cli as cli

    monkeypatch.setattr("pyspark.sql.SparkSession.stop", lambda self: None)
    out = str(tmp_path_factory.mktemp("out") / "mel_cli")
    code = cli.main(
        ["features", "--input", clips_path, "--output", out]
    )
    res = json.loads(capsys.readouterr().out)
    assert code == 0 and res["completed"] and res["clips_in"] == 300
    assert spark.read.parquet(os.path.join(out, "features")).count() == 300
