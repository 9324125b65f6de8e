"""Training-manifest writer (run_segment_pipeline) laws.

Mirrors the gate runner's contract: partition-incremental with a lineage
ledger (kill/resume without recompute), one decode pass per batch proven
by accumulator, per-day metrics via observe() on the single write action.
Product correctness: the written segments are byte-identical to an
extract_segments run over the same bronze, and every payload is the
pcm16 slice the VAD law dictates.
"""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_quality_spark.operators.audio_vad import extract_segments
from data_quality_spark.runner import (
    list_ingest_days,
    run_segment_pipeline,
    write_clips,
)
from data_quality_spark.sources.io import LineageLedger, read_metrics
from data_quality_spark.synth import generate_clips

MIN_DUR_MS = 200


@pytest.fixture(scope="module")
def clips_path(spark, tmp_path_factory):
    pdf = generate_clips(400, seed=23)
    path = str(tmp_path_factory.mktemp("clips") / "bronze")
    write_clips(spark, pdf, path)
    return path


def test_full_run_then_noop_resume(spark, clips_path, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("out") / "seg1")
    r1 = run_segment_pipeline(spark, clips_path, out, min_dur_ms=MIN_DUR_MS)
    assert r1["completed"] and r1["days"] == 7 and r1["clips_in"] == 400
    assert r1["segments_out"] > 0
    r2 = run_segment_pipeline(spark, clips_path, out, min_dur_ms=MIN_DUR_MS)
    assert r2["days"] == 0 and r2["skipped"] == 7 and r2["clips_in"] == 0
    segs = spark.read.parquet(os.path.join(out, "segments"))
    assert segs.count() == r1["segments_out"]
    # partition column survives the roundtrip, all 7 days present
    days = {r["ingest_day"] for r in segs.select("ingest_day").distinct().collect()}
    assert days == set(list_ingest_days(spark, clips_path))
    m = read_metrics(spark, out).toPandas()
    assert (m["metric"] == "segments_per_sec").any()
    assert int(m[m["metric"] == "clips_in"]["value"].sum()) == 400
    assert int(m[m["metric"] == "segments_out"]["value"].sum()) == r1["segments_out"]


def test_product_matches_batch_operator(spark, clips_path, tmp_path_factory):
    """The runner adds orchestration, not semantics: written rows equal a
    plain extract_segments over the same bronze, payload bytes included."""
    out = str(tmp_path_factory.mktemp("out") / "seg_eq")
    run_segment_pipeline(spark, clips_path, out, min_dur_ms=MIN_DUR_MS)
    got = (
        spark.read.parquet(os.path.join(out, "segments"))
        .select("clip_id", "seg_idx", "start_ms", "dur_ms",
                F.xxhash64("bytes").alias("payload_hash"))
        .toPandas()
        .sort_values(["clip_id", "seg_idx"])
        .reset_index(drop=True)
    )
    want = (
        extract_segments(
            spark.read.parquet(clips_path), min_dur_ms=MIN_DUR_MS
        )
        .select("clip_id", "seg_idx", "start_ms", "dur_ms",
                F.xxhash64("bytes").alias("payload_hash"))
        .toPandas()
        .sort_values(["clip_id", "seg_idx"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    for c in got.columns:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


def test_decode_executes_once_per_run(spark, clips_path, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("out") / "seg_once")
    decoded = spark.sparkContext.accumulator(0)
    r = run_segment_pipeline(
        spark, clips_path, out, min_dur_ms=MIN_DUR_MS, decode_counter=decoded
    )
    assert r["completed"] and r["clips_in"] == 400
    # the observe() metrics ride the single write action; decodable clips
    # are decoded exactly once (the accumulator counts batch rows entering
    # the chunker stage)
    assert decoded.value == 400


def test_kill_and_resume_without_recompute(spark, clips_path, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("out") / "seg2")
    r1 = run_segment_pipeline(
        spark, clips_path, out, min_dur_ms=MIN_DUR_MS,
        days_per_batch=3, fail_after_batches=1,
    )
    assert not r1["completed"] and r1["days"] == 3
    ledger = LineageLedger(out, "segments")
    done = [d for d in list_ingest_days(spark, clips_path)
            if ledger.status(d) == "done"]
    assert len(done) == 3
    r2 = run_segment_pipeline(
        spark, clips_path, out, min_dur_ms=MIN_DUR_MS, days_per_batch=3
    )
    assert r2["completed"] and r2["days"] == 4 and r2["skipped"] == 3
    assert r1["clips_in"] + r2["clips_in"] == 400
    segs = spark.read.parquet(os.path.join(out, "segments"))
    # no duplicate segments across the two runs
    assert (
        segs.select("clip_id", "seg_idx").distinct().count() == segs.count()
    )


def test_payload_is_exact_pcm16_slice(spark, clips_path, tmp_path_factory):
    """Spot-check the product payload against a driver-side decode of the
    source clip: the segment's bytes are the int16 slice on the VAD's
    sample bounds."""
    from data_quality_spark.functions.audio import _decode_i16
    from data_quality_spark.functions.vad import vad_segments

    out = str(tmp_path_factory.mktemp("out") / "seg3")
    run_segment_pipeline(spark, clips_path, out, min_dur_ms=MIN_DUR_MS)
    seg = (
        spark.read.parquet(os.path.join(out, "segments"))
        .orderBy("clip_id", "seg_idx").limit(5).collect()
    )
    bronze = spark.read.parquet(clips_path)
    for row in seg:
        src = bronze.filter(F.col("clip_id") == row["clip_id"]).first()
        q = _decode_i16(src["bytes"], src["codec"], src["sr_hz"])
        segs_py = [
            s for s in vad_segments(
                q.astype(np.float32) / np.float32(32767.0), src["sr_hz"]
            )
            if s["dur_ms"] >= MIN_DUR_MS and s["seg_idx"] == row["seg_idx"]
        ]
        assert len(segs_py) == 1
        s = segs_py[0]
        want = np.ascontiguousarray(
            q[s["start_sample"]:s["end_sample"]], dtype="<i2"
        ).tobytes()
        assert row["bytes"] == want


def test_segments_compose_with_audio_audit(spark, clips_path, tmp_path_factory):
    """The chunker's product is itself a clips table: the fused audio
    audit runs over it unchanged (pcm16-normalized payloads all decode),
    and per-segment stats match a driver-side kernel run — per-utterance
    quality gating is pure composition."""
    import numpy as np
    from pyspark.sql import functions as F

    from data_quality_spark.functions.audio import clip_stats_i16
    from data_quality_spark.operators.audio_audit import audio_audit

    out = str(tmp_path_factory.mktemp("out") / "seg_audit")
    run_segment_pipeline(spark, clips_path, out, min_dur_ms=MIN_DUR_MS)
    segs = (
        spark.read.parquet(os.path.join(out, "segments"))
        .withColumn(
            "seg_id",
            F.concat_ws("#", "clip_id", F.col("seg_idx").cast("string")),
        )
        .withColumn("codec", F.lit("pcm16"))
    )
    audit_in = segs.select(
        F.col("seg_id").alias("clip_id"), "bytes", "sr_hz", "codec"
    )
    audit = {r["clip_id"]: r for r in audio_audit(audit_in).collect()}
    assert len(audit) == segs.count()
    assert all(r["ok"] for r in audit.values())
    sample = segs.orderBy("seg_id").limit(5).collect()
    for s in sample:
        q = np.frombuffer(s["bytes"], dtype="<i2")
        st = clip_stats_i16(q, s["sr_hz"])
        r = audit[s["seg_id"]]
        assert r["n_samples"] == q.size
        assert r["rms_db"] == st["rms_db"]


def test_utterance_audit_query_vs_twin(spark, sf_dir):
    """The oracled per-utterance audit query: Spark's chunker→audit
    composition matches the independent VAD-scan + flag-ladder twin."""
    import __spark_entry__ as e
    from data_quality_spark.oracles import _utterance_audit_expected

    from data_quality_spark.operators.audio_audit import AUDIT_RULES

    got = e.q_utterance_audit(spark, sf_dir).collect()
    exp = _utterance_audit_expected(300, seed=42, min_dur_ms=MIN_DUR_MS)
    assert len(got) == len(exp["issue_type"]) == len(AUDIT_RULES)
    assert exp["total"][0] > 100  # the corpus actually fans out
    for r, idx in zip(got, sorted(range(len(got)),
                                  key=lambda k: exp["issue_type"][k])):
        for col in ("table", "column", "issue_type", "count", "total",
                    "percent", "severity", "description"):
            assert r[col] == exp[col][idx], (r["issue_type"], col)


def test_utterance_gate_query_vs_twin(spark, sf_dir):
    """The oracled per-utterance GATE query: Spark's chunker→featurize_v2
    →audio-ladder composition matches the independent VAD-scan +
    shared-kernel + explicit-ladder twin row by row."""
    import __spark_entry__ as e
    from data_quality_spark.oracles import _utterance_gate_expected
    from data_quality_spark.pipeline import UTTERANCE_DROP_RULES

    got = e.q_utterance_gate(spark, sf_dir).collect()
    exp = _utterance_gate_expected(300, seed=42, min_dur_ms=MIN_DUR_MS)
    assert len(got) == len(exp["clip_id"]) > 100  # the corpus fans out
    order = sorted(
        range(len(exp["clip_id"])),
        key=lambda k: (exp["clip_id"][k], exp["start_ms"][k]),
    )
    n_drop = 0
    for r, idx in zip(got, order):
        for col in ("clip_id", "start_ms", "dur_ms", "decision",
                    "decision_reason"):
            assert r[col] == exp[col][idx], (r["clip_id"], col)
        if r["decision"] == "drop":
            n_drop += 1
            assert r["decision_reason"] in UTTERANCE_DROP_RULES
        else:
            assert r["decision_reason"] is None
    assert 0 < n_drop < len(got)  # both classes exercised


def test_trim_silence_laws(spark, sf_dir):
    """Trim transform: span bounds are the first/last VAD segment's exact
    sample bounds (driver-kernel re-derivation), interior pauses kept
    (n_out ≥ any single segment), no-activity rows pass through empty."""
    import __spark_entry__ as e
    from data_quality_spark.functions.audio import _decode_i16
    from data_quality_spark.functions.vad import vad_segments
    from data_quality_spark.operators.audio_vad import trim_silence

    clips = e._clips_df(spark, n=120)
    rows = {r["clip_id"]: r for r in trim_silence(clips).collect()}
    assert len(rows) == 120  # exactly one output row per input row
    src = {r["clip_id"]: r for r in clips.collect()}
    n_trimmed = 0
    for cid, r in sorted(rows.items())[:40]:
        s = src[cid]
        try:
            q = _decode_i16(s["bytes"], s["codec"], s["sr_hz"])
        except (ValueError, TypeError):
            assert not r["ok"] and not r["trimmed"] and r["n_out"] == 0
            continue
        segs = list(vad_segments(
            q.astype(np.float32) / np.float32(32767.0), s["sr_hz"]))
        if not segs:
            assert not r["trimmed"] and r["n_out"] == 0
            assert r["bytes"] == b""
            continue
        n_trimmed += 1
        s0 = segs[0]["start_sample"]
        s1 = segs[-1]["end_sample"]
        want = np.ascontiguousarray(q[s0:s1], dtype="<i2").tobytes()
        assert r["bytes"] == want
        assert r["n_out"] == s1 - s0 <= r["n_in"]
        # interior pauses are kept: the span covers every segment
        assert all(s0 <= g["start_sample"] and g["end_sample"] <= s1
                   for g in segs)
    assert n_trimmed > 10
