"""Augmented-copy writer (training-data producer).

Byte determinism across partitionings, per-spec transform laws
(exact speed length, achieved noise SNR, gain scaling), undecodable
totality, and downstream consumability (the audit family runs on the
augmented corpus unchanged).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from data_quality_spark.functions import audio as A
from data_quality_spark.functions.augment import augment_i16
from data_quality_spark.functions.resample import output_length
from data_quality_spark.operators.audio_augment import augment_clips
from data_quality_spark.plans.schemas import CLIPS_SCHEMA
from data_quality_spark.synth import generate_clips

SR = 16000


def _speech_like(seed=3, dur_s=2.0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(SR * dur_s)) / SR
    x = 0.3 * np.sin(2 * np.pi * 220.0 * t) * (
        0.5 + 0.5 * np.sin(2 * np.pi * 3.0 * t)
    )
    x += 0.01 * rng.standard_normal(t.size)
    return np.clip(np.rint(x * 32767), -32768, 32767).astype(np.int16)


def test_kernel_laws():
    q = _speech_like()
    # gain: linear scaling law
    y, _ = augment_i16(q, SR, "c1", "gain-6db", {"kind": "gain", "db": -6.0})
    g = 10.0 ** (-6.0 / 20.0)
    assert np.array_equal(
        y, np.clip(np.rint(q.astype(np.float64) * g), -32768, 32767)
        .astype(np.int16)
    )
    # noise: achieved SNR within 1 dB of target; seeded → reproducible
    y1, _ = augment_i16(q, SR, "c1", "noise20db",
                        {"kind": "noise", "snr_db": 20.0})
    y2, _ = augment_i16(q, SR, "c1", "noise20db",
                        {"kind": "noise", "snr_db": 20.0})
    assert np.array_equal(y1, y2)
    yo, _ = augment_i16(q, SR, "OTHER", "noise20db",
                        {"kind": "noise", "snr_db": 20.0})
    assert not np.array_equal(y1, yo)  # realization is per-clip
    noise = y1.astype(np.float64) - q.astype(np.float64)
    snr = 10 * np.log10(np.mean(q.astype(np.float64) ** 2)
                        / np.mean(noise ** 2))
    assert abs(snr - 20.0) < 1.0, snr
    # speed: exact polyphase output length
    y, dur = augment_i16(q, SR, "c1", "speed1.1",
                         {"kind": "speed", "num": 11, "den": 10})
    assert y.size == output_length(q.size, 10, 11)
    assert dur == int(round(y.size * 1000 / SR))
    # stretch: ~1/rate duration
    y, _ = augment_i16(q, SR, "c1", "stretch0.9",
                       {"kind": "stretch", "rate": 0.9})
    assert abs(y.size - q.size / 0.9) < 2048
    # reverb: same length, seeded-reproducible, peak never exceeds input
    y1, d1 = augment_i16(q, SR, "c1", "reverb0.6",
                         {"kind": "reverb", "rt60_s": 0.6})
    y2, _ = augment_i16(q, SR, "c1", "reverb0.6",
                        {"kind": "reverb", "rt60_s": 0.6})
    assert np.array_equal(y1, y2) and y1.size == q.size
    assert int(np.max(np.abs(y1))) <= int(np.max(np.abs(q)))


def test_operator_determinism_and_totality(spark):
    pdf = generate_clips(80, seed=31)
    cols = [f.name for f in CLIPS_SCHEMA.fields]

    def run(parts):
        df = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA)
        df = df.repartition(parts) if parts > 1 else df.coalesce(1)
        return {
            r.clip_id: (r.h, r.dur_ms) for r in
            augment_clips(df).select(
                "clip_id", F.xxhash64("bytes").alias("h"), "dur_ms"
            ).collect()
        }

    a, b = run(7), run(1)
    assert a == b and len(a) > 0
    # only decodable sources fan out, each into all 4 specs
    n_decodable = 0
    for _, r in pdf.iterrows():
        try:
            A._decode_i16(r["bytes"], r["codec"], r["sr_hz"])
            if r["sr_hz"] and r["sr_hz"] > 0:
                n_decodable += 1
        except (ValueError, TypeError):
            pass
    assert len(a) == 5 * n_decodable


def test_augmented_corpus_feeds_the_audit(spark):
    """Schema validity by consumption: the fused audio audit runs on
    the augmented corpus unchanged."""
    from data_quality_spark.operators.audio_audit import (
        audio_audit,
        audit_issues,
    )

    pdf = generate_clips(40, seed=31)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    clips = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA)
    aug = augment_clips(clips).select(cols)
    issues = audit_issues(audio_audit(aug)).collect()
    assert len(issues) > 0


def test_cli_augment(spark, tmp_path, capsys, monkeypatch):
    import json

    import data_quality_spark.cli as cli

    monkeypatch.setattr("pyspark.sql.SparkSession.stop", lambda self: None)
    tables = tmp_path / "tables"
    tables.mkdir()
    pdf = generate_clips(30, seed=31)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    spark.createDataFrame(pdf[cols], CLIPS_SCHEMA).coalesce(2).write.parquet(
        str(tables / "clips.parquet")
    )
    out = tmp_path / "aug"
    assert cli.main(
        ["augment", "--tables", str(tables), "--table", "clips",
         "--output", str(out), "--specs", "gain-6db,noise20db"]
    ) == 0
    res = json.loads(capsys.readouterr().out)
    assert set(res["per_spec"]) == {"gain-6db", "noise20db"}
    assert res["n_augmented"] == sum(res["per_spec"].values()) > 0
    # unknown spec → exit 2
    assert cli.main(
        ["augment", "--tables", str(tables), "--table", "clips",
         "--output", str(out), "--specs", "nope"]
    ) == 2


def test_detectors_catch_augmented_copies(spark):
    """Producer–auditor coherence: each augmented copy is recovered by
    the detector family that owns its perturbation axis — gain by the
    re-encode-invariant fingerprints, speed by the speed-dup detector,
    noise by the noise-robust mel-embedding matcher."""
    from data_quality_spark.operators.audio_dedup import (
        clip_fingerprints,
        fingerprint_near_dup,
    )
    from data_quality_spark.operators.audio_embed import embed_near_dup
    from data_quality_spark.operators.audio_speed import (
        clip_profiles,
        speed_dup_confirm,
        speed_dup_pairs,
    )
    from data_quality_spark.synth import make_audio_voice_corpus

    # speech-like sources (voice corpus), augmented with one spec each
    pdf = make_audio_voice_corpus(4, 1, seed=13)
    pdf = pdf[pdf.clip_id.str.startswith("vc")]
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    clips = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA)

    def with_aug(name, params):
        aug = augment_clips(clips, specs=((name, params),)).select(cols)
        return clips.unionByName(aug)

    # gain copies: fingerprint family (gain-invariant by construction)
    both = with_aug("gain-6db", {"kind": "gain", "db": -6.0})
    pairs = fingerprint_near_dup(clip_fingerprints(both)).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    for cid in pdf.clip_id:
        assert (cid, f"{cid}~gain-6db") in got, cid

    # noise copies: mel-embedding matcher (fingerprints fail here by
    # design — that boundary is measured in audio_noise_robustness)
    both = with_aug("noise20db", {"kind": "noise", "snr_db": 20.0})
    pairs = embed_near_dup(both).collect()
    got = set()
    for r in pairs:
        got.add((r.id_a, r.id_b))
        got.add((r.id_b, r.id_a))
    hits = sum(
        (cid, f"{cid}~noise20db") in got for cid in pdf.clip_id
    )
    assert hits >= len(pdf) - 1, (hits, len(pdf))

    # speed copies: the speed-dup detector confirms the rational factor
    both = with_aug("speed1.1", {"kind": "speed", "num": 11, "den": 10})
    confirmed = (
        speed_dup_confirm(both, speed_dup_pairs(clip_profiles(both)))
        .filter(F.col("confirmed"))
        .collect()
    )
    got = set()
    for r in confirmed:
        got.add((r.id_a, r.id_b))
        got.add((r.id_b, r.id_a))
    hits = sum(
        (cid, f"{cid}~speed1.1") in got for cid in pdf.clip_id
    )
    assert hits >= len(pdf) - 1, (hits, len(pdf))


def test_reverb_augment_caught_by_reverb_detector(spark):
    """The fourth coherence loop: reverb-augmented copies of dry burst
    clips are flagged by the blind-RT60 detector (and their dry sources
    are not) — with the rt60 estimate tracking the spec."""
    from data_quality_spark.operators.audio_reverb import reverb_flags
    from data_quality_spark.synth import make_audio_reverb_corpus

    pdf = make_audio_reverb_corpus(60, seed=42)
    pdf = pdf[pdf.defect == "dry_bursts"]
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    clips = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA)
    aug = augment_clips(
        clips, specs=(("reverb0.6", {"kind": "reverb", "rt60_s": 0.6}),)
    ).select(cols)
    out = {r.clip_id: r for r in
           reverb_flags(clips.unionByName(aug)).collect()}
    for cid in pdf.clip_id:
        assert not out[cid].is_reverberant, cid
        wet = out[f"{cid}~reverb0.6"]
        assert wet.is_reverberant, (cid, wet)
        assert 0.35 <= wet.rt60_est <= 1.0, wet.rt60_est
