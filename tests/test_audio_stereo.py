"""Channel-layout audit: seeded-defect recall with ZERO false flags,
the exact integer decision laws, container dispatch (mono codecs /
corrupt payloads), and the fused issue relation."""

from __future__ import annotations

import numpy as np
import pytest

from data_quality_spark.functions.stereo import (
    IMBALANCE_DB,
    decode_wav_frames,
    derive_stereo,
    encode_wav_stereo,
    stereo_sums,
)


def _frames(left, right):
    return np.stack([np.asarray(left, dtype=np.int16),
                     np.asarray(right, dtype=np.int16)], axis=1)


def test_roundtrip_and_parser_strictness():
    rng = np.random.default_rng(7)
    left = rng.integers(-20000, 20000, 500).astype(np.int16)
    right = rng.integers(-20000, 20000, 500).astype(np.int16)
    frames, ch, sr = decode_wav_frames(encode_wav_stereo(left, right, 16000))
    assert ch == 2 and sr == 16000
    assert np.array_equal(frames[:, 0], left)
    assert np.array_equal(frames[:, 1], right)
    with pytest.raises(ValueError):
        decode_wav_frames(b"\x00" * 100)
    with pytest.raises(ValueError):
        decode_wav_frames(None)


def test_exact_sums_and_negation_edge():
    # -32768 must not "match" its own negation in the anti law
    left = np.array([-32768, 100, -100], dtype=np.int16)
    right = np.array([-32768, -100, 100], dtype=np.int16)
    s = stereo_sums(_frames(left, right))
    assert s["n_anti"] == 1  # only the -32768 pair differs from R=-L
    assert s["n_diff"] == 2
    d = derive_stereo(s["n_samples"], s["sum_l"], s["sum_r"], s["ss_l"],
                      s["ss_r"], s["s_lr"])
    assert d["balance_db"] == pytest.approx(0.0)


def test_derive_matches_naive_float_reference():
    rng = np.random.default_rng(11)
    left = rng.integers(-30000, 30000, 4000).astype(np.int16)
    right = (left // 2 + rng.integers(-500, 500, 4000)).astype(np.int16)
    s = stereo_sums(_frames(left, right))
    d = derive_stereo(s["n_samples"], s["sum_l"], s["sum_r"], s["ss_l"],
                      s["ss_r"], s["s_lr"])
    ref_corr = float(np.corrcoef(left.astype(np.float64),
                                 right.astype(np.float64))[0, 1])
    assert d["corr"] == pytest.approx(ref_corr, abs=1e-12)
    ref_bal = 10 * np.log10(np.sum(left.astype(np.float64) ** 2)
                            / np.sum(right.astype(np.float64) ** 2))
    assert d["balance_db"] == pytest.approx(ref_bal, abs=1e-12)


def test_seeded_corpus_recall_and_zero_false_flags(spark):
    from data_quality_spark.operators.audio_stereo import stereo_flags
    from data_quality_spark.plans.schemas import CLIPS_SCHEMA
    from data_quality_spark.synth import make_audio_stereo_corpus

    pdf = make_audio_stereo_corpus(300, seed=42)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    clips = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA)
    flags = {r["clip_id"]: r.asDict()
             for r in stereo_flags(clips).collect()}
    truth = {r["clip_id"]: r.get("defect") for _, r in pdf.iterrows()}

    flag_of = {
        "dual_mono": "dual_mono",
        "phase_invert": "phase_inverted",
        "dead_left": "dead_channel",
        "dead_right": "dead_channel",
        "imbalance": "imbalanced",
    }
    n_defects = 0
    for cid, cls in truth.items():
        row = flags[cid]
        if cls in flag_of:
            n_defects += 1
            assert row[flag_of[cls]], (cid, cls, row)
            # ...and ONLY the seeded flag (dead L is vacuously not dual)
            others = {v for k, v in flag_of.items() if v != flag_of[cls]}
            assert not any(row[o] for o in others), (cid, cls, row)
        elif cls == "stereo_none":
            assert row["n_ch"] == 2
            assert not any(
                row[f] for f in
                ("dual_mono", "phase_inverted", "dead_channel", "imbalanced")
            ), (cid, row)
            # healthy stereo: channels related but never identical; corr
            # itself is a metric, not a law — a delay of ~half a tone's
            # period legitimately lands anywhere in [-1, 1), so only
            # measurability is asserted (the exact laws carry the flags)
            assert row["n_diff"] > 0, (cid, row)
            assert row["corr"] is not None, (cid, row)
        else:
            # untouched pass-through rows: mono codecs or corrupt
            assert row["n_ch"] in (0, 1), (cid, cls, row)
            assert not any(
                row[f] for f in
                ("dual_mono", "phase_inverted", "dead_channel", "imbalanced")
            )
    assert n_defects >= 30  # the corpus actually seeds a population

    # dead_side attribution matches the seeded side
    for cid, cls in truth.items():
        if cls == "dead_left":
            assert flags[cid]["dead_side"] == "L"
        elif cls == "dead_right":
            assert flags[cid]["dead_side"] == "R"

    # seeded imbalance sits well past the line; naturals well inside it
    for cid, cls in truth.items():
        bal = flags[cid]["balance_db"]
        if cls == "imbalance":
            assert abs(bal) >= IMBALANCE_DB + 4
        elif cls == "stereo_none":
            assert abs(bal) <= IMBALANCE_DB - 2


def test_issue_relation_matches_flag_counts(spark):
    from data_quality_spark.operators.audio_stereo import (
        stereo_flags,
        stereo_issues,
    )
    from data_quality_spark.plans.schemas import CLIPS_SCHEMA
    from data_quality_spark.synth import make_audio_stereo_corpus

    pdf = make_audio_stereo_corpus(120, seed=7)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    clips = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA)
    flags = stereo_flags(clips).collect()
    issues = {r["issue_type"]: r.asDict()
              for r in stereo_issues(stereo_flags(clips)).collect()}
    assert set(issues) == {
        "dead_channel", "phase_inverted", "dual_mono", "imbalanced",
        "not_stereo", "undecodable",
    }
    for name, col in [("dead_channel", "dead_channel"),
                      ("phase_inverted", "phase_inverted"),
                      ("dual_mono", "dual_mono"),
                      ("imbalanced", "imbalanced")]:
        want = sum(1 for r in flags if r[col])
        assert issues[name]["count"] == want, name
        assert issues[name]["total"] == len(flags)
    assert issues["not_stereo"]["count"] == sum(
        1 for r in flags if r["n_ch"] == 1
    )
    assert issues["undecodable"]["count"] == sum(
        1 for r in flags if r["n_ch"] == 0
    )
    # severity escalates only when the defect is present
    assert issues["dead_channel"]["severity"] in ("critical", "info")
    if issues["dead_channel"]["count"] > 0:
        assert issues["dead_channel"]["severity"] == "critical"


def test_downmix_modes_and_exact_mid(spark):
    from data_quality_spark.operators.audio_stereo import downmix_mono
    from data_quality_spark.plans.schemas import CLIPS_SCHEMA
    from data_quality_spark.synth import make_audio_stereo_corpus

    pdf = make_audio_stereo_corpus(200, seed=42)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    clips = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA)
    got = {r["clip_id"]: r.asDict() for r in downmix_mono(clips).collect()}
    truth = {r["clip_id"]: r.get("defect") for _, r in pdf.iterrows()}

    want_mode = {
        "dual_mono": "take_left_dual",
        "phase_invert": "take_left_inverted",
        "dead_left": "take_live",
        "dead_right": "take_live",
        "stereo_none": "mid",
    }
    for cid, cls in truth.items():
        row = got[cid]
        if cls in want_mode:
            assert row["downmix_mode"] == want_mode[cls], (cid, cls, row)
            assert row["codec"] == "pcm16" and row["bytes"] is not None
        elif cls == "imbalance":
            assert row["downmix_mode"] == "mid"

    # repair semantics: the phase-inverted clip keeps its content — a
    # naive (L+R)/2 would be digital silence
    inv = next(cid for cid, cls in truth.items() if cls == "phase_invert")
    mono = np.frombuffer(bytes(got[inv]["bytes"]), dtype="<i2")
    assert np.any(mono), "inverted clip downmixed to silence"
    # dead-channel clips keep the LIVE side's content
    dl = next(cid for cid, cls in truth.items() if cls == "dead_left")
    mono = np.frombuffer(bytes(got[dl]["bytes"]), dtype="<i2")
    assert np.any(mono)


def test_downmix_mid_floors_negative_odd_sums(spark):
    from data_quality_spark.operators.audio_stereo import downmix_mono
    from data_quality_spark.plans.schemas import CLIPS_SCHEMA

    left = np.array([-3, 3, -1, 100] * 32, dtype=np.int16)
    right = np.array([-4, 4, 2, 101] * 32, dtype=np.int16)
    row = ("edge", encode_wav_stereo(left, right, 8000), 8000,
           int(round(len(left) / 8.0)), "wav", "t", "2024-01-01")
    clips = spark.createDataFrame([row], CLIPS_SCHEMA)
    out = downmix_mono(clips).collect()[0]
    mono = np.frombuffer(bytes(out["bytes"]), dtype="<i2")
    # (-3 + -4) >> 1 == -4 (floor, NOT truncation toward zero)
    assert list(mono[:4]) == [-4, 3, 0, 100]
    assert out["downmix_mode"] == "mid" and out["sr_hz"] == 8000


def test_downmix_composes_with_mono_audit(spark):
    """The normalized output is a valid mono clips table: the fused
    audio audit decodes every downmixed payload."""
    from data_quality_spark.operators.audio_audit import audio_audit
    from data_quality_spark.operators.audio_stereo import downmix_mono
    from data_quality_spark.plans.schemas import CLIPS_SCHEMA
    from data_quality_spark.synth import make_audio_stereo_corpus

    pdf = make_audio_stereo_corpus(80, seed=5)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    clips = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA)
    mono = downmix_mono(clips).where("bytes IS NOT NULL")
    core = ["clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript"]
    audited = audio_audit(mono.select(*core)).collect()
    assert len(audited) == mono.count()
    assert all(r["ok"] for r in audited)


def test_cli_audit_stereo(tmp_path, spark, capsys, monkeypatch):
    import json

    import data_quality_spark.cli as cli
    from data_quality_spark.plans.schemas import CLIPS_SCHEMA
    from data_quality_spark.synth import make_audio_stereo_corpus

    monkeypatch.setattr("pyspark.sql.SparkSession.stop", lambda self: None)
    tables = tmp_path / "tables"
    tables.mkdir()
    pdf = make_audio_stereo_corpus(60, seed=3)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    spark.createDataFrame(pdf[cols], CLIPS_SCHEMA).coalesce(1) \
        .write.parquet(str(tables / "clips.parquet"))
    code = cli.main(
        ["audit", "--tables", str(tables), "--table", "clips",
         "--kind", "stereo", "--format", "json", "--fail-on", "none"]
    )
    rows = {r["issue_type"]: r for r in json.loads(capsys.readouterr().out)}
    assert code == 0
    assert rows["dead_channel"]["count"] > 0
    assert rows["dual_mono"]["count"] > 0
    assert rows["dead_channel"]["total"] == 60
