"""Tests: multimodal binary-column plumbing (mapInPandas feature extraction
with real audio + stubbed image/video) and the Structured-Streaming gate
wrapper (availableNow drain over a synthetic corpus)."""

from __future__ import annotations

import numpy as np
import pytest

from data_quality_spark.functions import audio as A
from data_quality_spark.functions import multimodal as M


@pytest.fixture(scope="module")
def media_df(spark):
    sig = np.sin(2 * np.pi * 440 * np.arange(16000) / 16000) * 0.5
    rows = [
        ("a1", "audio", A.encode_pcm16(sig), {"codec": "pcm16", "sr_hz": "16000"}),
        ("a2", "audio", b"\x00" * 7, {"codec": "opus", "sr_hz": "16000"}),  # bad codec
        ("i1", "image", b"\x89PNG fake payload", {"w": "32", "h": "32"}),
        ("v1", "video", b"\x00\x00ftyp fake", {"frames": "10"}),
        ("x1", "blob", b"??", None),  # unknown kind
    ]
    return spark.createDataFrame(rows, M.MEDIA_SCHEMA)


def test_extract_media_features_fake_decode(media_df):
    out = {r.media_id: r for r in M.extract_media_features(media_df, fake_decode=True).collect()}
    assert len(out) == 5
    a1 = out["a1"]
    assert a1.ok and len(a1.feature) == M.N_FEATURES
    assert abs(a1.feature[4] - 16000.0) < 1e-9      # n_samples
    assert a1.feature[0] > -15.0                     # rms_db of a -9dB tone
    assert not out["a2"].ok and out["a2"].feature is None  # decode failure
    assert out["i1"].ok and out["v1"].ok             # stubs fire in fake mode
    assert not out["x1"].ok                          # unknown kind
    # deterministic fake features: same payload+kind → same vector
    again = {r.media_id: r for r in M.extract_media_features(media_df, fake_decode=True).collect()}
    assert again["i1"].feature == out["i1"].feature


def test_extract_media_features_real_mode_stubs_fail_soft(media_df):
    out = {r.media_id: r for r in M.extract_media_features(media_df, fake_decode=False).collect()}
    assert out["a1"].ok                  # audio path is real either way
    assert not out["i1"].ok              # NotImplementedError → ok=False
    assert not out["v1"].ok


def test_decode_image_stub_raises():
    with pytest.raises(NotImplementedError):
        M.decode_image(b"x", None, fake=False)
    with pytest.raises(NotImplementedError):
        M.sample_video_frames(b"x", None, fake=False)


def test_stream_gate_availablenow(spark, tmp_path):
    from data_quality_spark.plans.schemas import CLIPS_SCHEMA
    from data_quality_spark.streaming.gate_stream import stream_gate
    from data_quality_spark.synth import generate_clips

    pdf = generate_clips(120, seed=11)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    src = str(tmp_path / "bronze")
    out = str(tmp_path / "out")
    spark.createDataFrame(pdf[cols], CLIPS_SCHEMA).write.parquet(src)

    res = stream_gate(spark, src, out)
    assert res["rows_in"] == 120
    assert 0 < res["rows_kept"] < 120
    silver = spark.read.parquet(f"{out}/silver_stream")
    assert silver.count() == res["rows_kept"]
    assert "bytes" not in silver.columns

    # second drain: checkpoint says nothing new → no recompute
    res2 = stream_gate(spark, src, out)
    assert res2["rows_in"] == 0


def test_stream_gate_featurize_once_per_batch(spark, tmp_path):
    """The stream sink obeys the batch runner's one-action law: in/kept
    counts come from observe() on the write action, so featurize (decode —
    the expensive stage) runs exactly ONE pass per micro-batch with no
    persist crutch."""
    from data_quality_spark.plans.schemas import CLIPS_SCHEMA
    from data_quality_spark.streaming.gate_stream import stream_gate
    from data_quality_spark.synth import generate_clips

    pdf = generate_clips(100, seed=17)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    src = str(tmp_path / "bronze")
    out = str(tmp_path / "out")
    spark.createDataFrame(pdf[cols], CLIPS_SCHEMA).write.parquet(src)

    decoded = spark.sparkContext.accumulator(0)
    res = stream_gate(spark, src, out, decode_counter=decoded)
    assert res["rows_in"] == 100
    assert decoded.value == 100  # 200 would mean a second featurize pass


def test_stream_gate_multi_batch_no_partition_loss(spark, tmp_path):
    """A run spanning several micro-batches must keep every batch's rows:
    the same ingest_day arrives in multiple batches, so a shared
    dynamic-partition-overwrite sink would silently drop all but the last
    batch's rows for that day (per-batch subdirectories prevent it)."""
    from data_quality_spark.pipeline import gate
    from data_quality_spark.plans.schemas import CLIPS_SCHEMA
    from data_quality_spark.streaming.gate_stream import stream_gate
    from data_quality_spark.synth import generate_clips

    pdf = generate_clips(160, seed=13)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    src = str(tmp_path / "bronze")
    out = str(tmp_path / "out")
    bronze = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA)
    # 4 source files, 1 file per trigger → 4 micro-batches, every batch
    # carrying every ingest_day
    bronze.repartition(4).write.parquet(src)

    res = stream_gate(spark, src, out, max_files_per_trigger=1)
    assert res["batches"] >= 2
    assert res["rows_in"] == 160

    want_kept = gate(spark.read.parquet(src)).filter("decision = 'keep'").count()
    silver = spark.read.parquet(f"{out}/silver_stream")
    assert res["rows_kept"] == want_kept
    assert silver.count() == want_kept  # no batch overwrote another
    assert silver.select("clip_id").distinct().count() == want_kept
    assert "batch_id" in silver.columns


def test_analysis_report():
    from data_quality_spark.plans.analysis import analyze_issues

    issues = [
        {"table": "t", "column": "id", "issue_type": "nulls", "count": 5,
         "severity": "critical"},
        {"table": "t", "column": "code", "issue_type": "duplicate", "count": 2,
         "severity": "warning"},
    ]
    a = analyze_issues(issues)
    assert a.severity_assessment == "high"
    assert any("t.id" in x for x in a.recommended_actions)
    assert a.confidence_score < 1.0
    clean = analyze_issues([])
    assert clean.severity_assessment == "none" and clean.confidence_score == 1.0


def test_windowed_counts_stream_matches_batch(spark, tmp_path):
    from datetime import datetime, timedelta

    from data_quality_spark.streaming.windowed import windowed_counts

    base = datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        (base + timedelta(seconds=s), kind)
        for s in range(0, 300, 7)
        for kind in (["click"] if s % 3 else ["view"])
    ]
    src_dir = str(tmp_path / "ev")
    out_dir = str(tmp_path / "ev_out")
    df = spark.createDataFrame(rows, "ts timestamp, event_type string")
    df.write.parquet(src_dir)

    stream = (
        spark.readStream.schema(df.schema).parquet(src_dir)
    )
    q = (
        windowed_counts(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.window_start, r.event_type): r.n_events
        for r in spark.read.parquet(out_dir).collect()
    }
    want = {
        (r.window_start, r.event_type): r.n_events
        for r in windowed_counts(df).collect()
    }
    # append mode emits only windows the watermark closed; every emitted
    # window must match the batch result exactly, and most windows close
    # (stream end advances the watermark past all but the last windows)
    assert got
    assert all(want[k] == v for k, v in got.items())


def test_stream_gate_v2_profile(spark, tmp_path):
    """profile='v2' streams the audio-metric gate; totals match the batch
    gate_v2 over the same bronze (the per-row section is stateless)."""
    from pyspark.sql import functions as F

    from data_quality_spark.pipeline import gate_v2
    from data_quality_spark.plans.schemas import CLIPS_SCHEMA
    from data_quality_spark.streaming.gate_stream import stream_gate
    from data_quality_spark.synth import generate_clips

    pdf = generate_clips(120, seed=11)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    src = str(tmp_path / "bronze")
    out = str(tmp_path / "out")
    spark.createDataFrame(pdf[cols], CLIPS_SCHEMA).write.parquet(src)

    res = stream_gate(spark, src, out, profile="v2")
    assert res["rows_in"] == 120
    want_keep = (
        gate_v2(spark.read.parquet(src))
        .filter(F.col("decision") == "keep").count()
    )
    assert res["rows_kept"] == want_keep
    silver = spark.read.parquet(f"{out}/silver_stream")
    assert "snr_db" in silver.columns and silver.count() == want_keep
