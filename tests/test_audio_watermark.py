"""Provenance-watermark detection: chip-sequence laws (prefix stability,
balance, key separation), embed/detect round trip incl. lossy µ-law
transcoding and additive noise, zero false flags on clean corpora,
seeded-corpus recall/specificity, kernel-vs-pure-Python bit parity, and
the operator/issue contracts."""

from __future__ import annotations

import math

import numpy as np
import pytest

from data_quality_spark.functions import audio as A
from data_quality_spark.functions.watermark import (
    WM_EMBED_DIV,
    WM_KEY_DEFAULT,
    WM_MIN_SAMPLES,
    WM_TAU,
    embed_watermark,
    is_watermarked_from,
    pn_chips,
    watermark_stats,
)
from data_quality_spark.synth import WM_KEY_OTHER, make_audio_watermark_corpus

KEY_B = 0x1234_5678_9ABC_DEF0


def _dec(row):
    try:
        return A._decode_i16(row["bytes"], row["codec"], row["sr_hz"])
    except (ValueError, TypeError):
        return np.zeros(0, dtype=np.int16)


def _speechish(sr: int, secs: float, seed: int = 3) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * secs)) / sr
    x = sum(
        a * np.sin(2 * np.pi * f * t + ph)
        for a, f, ph in zip((0.3, 0.2, 0.1), (180.0, 410.0, 950.0), (0.0, 1.1, 2.7))
    )
    x = x + 0.01 * rng.normal(0, 1, len(t))
    return np.clip(np.rint(x * 0.6 * 32767), -32768, 32767).astype(np.int16)


# ------------------------------------------------------------ chip laws


def test_chips_prefix_stable_and_balanced():
    a = pn_chips(KEY_B, 1000).copy()
    b = pn_chips(KEY_B, 100_000)  # grows the cache
    assert np.array_equal(a, b[:1000])
    assert set(np.unique(b)) == {-1, 1}
    # a PN sequence is near-balanced: |mean| well under 1/sqrt(n) * 5
    assert abs(int(b.astype(np.int64).sum())) < 5 * int(math.isqrt(len(b)))


def test_chips_key_separation():
    a = pn_chips(WM_KEY_DEFAULT, 50_000).astype(np.int64)
    b = pn_chips(KEY_B, 50_000).astype(np.int64)
    # cross-correlation of two keys' carriers is null-distributed
    assert abs(int(np.dot(a, b))) < 6 * int(math.isqrt(50_000))


# --------------------------------------------------- embed/detect laws


def test_embed_detect_round_trip_and_snr():
    q = _speechish(16_000, 2.0)
    m = embed_watermark(q, WM_KEY_DEFAULT)
    st = watermark_stats(m, WM_KEY_DEFAULT)
    assert is_watermarked_from(st["n_samples"], st["wm_corr"], st["energy"])
    # margin: detection sigma ~ sqrt(n)/WM_EMBED_DIV >> WM_TAU
    sigma = math.sqrt(st["sigma_q2"] / 2**20)
    assert sigma > 1.5 * WM_TAU
    # the mark is WM_EMBED_DIV^2 below signal power (~21.6 dB): inaudible-ish
    diff = m.astype(np.int64) - q.astype(np.int64)
    snr_db = 10 * math.log10(
        float(np.dot(q.astype(np.int64), q.astype(np.int64)))
        / max(float(np.dot(diff, diff)), 1.0)
    )
    assert 18.0 <= snr_db <= 26.0, snr_db


def test_clean_audio_never_flags():
    for seed in range(8):
        q = _speechish(16_000, 2.5, seed=seed)
        st = watermark_stats(q, WM_KEY_DEFAULT)
        assert not is_watermarked_from(st["n_samples"], st["wm_corr"], st["energy"])


def test_wrong_key_reads_unmarked():
    q = _speechish(16_000, 2.0)
    m = embed_watermark(q, KEY_B)
    st = watermark_stats(m, WM_KEY_DEFAULT)
    assert not is_watermarked_from(st["n_samples"], st["wm_corr"], st["energy"])


def test_short_clip_reports_but_never_flags():
    q = embed_watermark(_speechish(8_000, 1.0), WM_KEY_DEFAULT)  # 8000 < floor
    st = watermark_stats(q, WM_KEY_DEFAULT)
    assert st["n_samples"] < WM_MIN_SAMPLES
    assert st["sigma_q2"] is not None  # the statistic still reports
    assert not is_watermarked_from(st["n_samples"], st["wm_corr"], st["energy"])


def test_survives_mulaw_transcode_and_noise():
    q = _speechish(16_000, 2.0)
    m = embed_watermark(q, WM_KEY_DEFAULT)
    # lossy µ-law round trip
    back = A._decode_i16(
        A.encode_mulaw(m.astype(np.float64) / 32767.0), "mulaw", 16_000
    )
    st = watermark_stats(back, WM_KEY_DEFAULT)
    assert is_watermarked_from(st["n_samples"], st["wm_corr"], st["energy"])
    # additive noise at 20 dB SNR
    rng = np.random.default_rng(11)
    px = float(np.mean((m.astype(np.float64) / 32768.0) ** 2))
    noisy = np.clip(
        m.astype(np.float64) / 32768.0
        + rng.standard_normal(len(m)) * math.sqrt(px / 100.0),
        -1.0,
        0.999969,
    )
    qn = A._decode_i16(A.encode_pcm16(noisy), "pcm16", 16_000)
    st2 = watermark_stats(qn, WM_KEY_DEFAULT)
    assert is_watermarked_from(st2["n_samples"], st2["wm_corr"], st2["energy"])


# ------------------------------------------------------- seeded corpus


def test_seeded_corpus_recall_and_specificity():
    pdf = make_audio_watermark_corpus(300, seed=42)
    got = {"wm": [0, 0], "foreign": [0, 0], "clean": [0, 0]}
    for _, r in pdf.iterrows():
        st = watermark_stats(_dec(r), WM_KEY_DEFAULT)
        flag = is_watermarked_from(st["n_samples"], st["wm_corr"], st["energy"])
        if r["defect"] in ("wm_key", "wm_key_mulaw"):
            got["wm"][flag] += 1
        elif r["defect"] == "wm_other":
            got["foreign"][flag] += 1
        else:
            got["clean"][flag] += 1
    assert got["wm"][0] == 0 and got["wm"][1] > 30, got  # 100% recall
    assert got["foreign"][1] == 0 and got["foreign"][0] > 10, got
    assert got["clean"][1] == 0, got  # zero false flags


def test_foreign_key_detectable_under_its_own_key():
    pdf = make_audio_watermark_corpus(300, seed=42)
    rows = pdf[pdf["defect"] == "wm_other"]
    assert len(rows) > 0
    for _, r in rows.iterrows():
        st = watermark_stats(_dec(r), WM_KEY_OTHER)
        assert is_watermarked_from(st["n_samples"], st["wm_corr"], st["energy"])


# ------------------------------------------------ twin parity + operator


def test_twin_bit_parity():
    from data_quality_spark.oracles import _audio_watermark_expected

    exp = _audio_watermark_expected(n=60, seed=42)
    pdf = make_audio_watermark_corpus(60, seed=42).sort_values("clip_id")
    for i, (_, r) in enumerate(pdf.iterrows()):
        st = watermark_stats(_dec(r), WM_KEY_DEFAULT)
        assert exp["clip_id"][i] == r["clip_id"]
        assert exp["n_samples"][i] == st["n_samples"]
        assert exp["wm_corr"][i] == st["wm_corr"]
        assert exp["energy"][i] == st["energy"]
        assert exp["sigma_q2"][i] == st["sigma_q2"]


def test_operator_and_issues(spark):
    from data_quality_spark.operators.audio_watermark import (
        watermark_flags,
        watermark_issues,
    )
    from data_quality_spark.plans.schemas import CLIPS_SCHEMA

    pdf = make_audio_watermark_corpus(90, seed=42)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    df = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA).repartition(4, "clip_id")
    flags = watermark_flags(df)
    rows = {r["clip_id"]: r for r in flags.collect()}
    n_marked = 0
    for _, r in pdf.iterrows():
        st = watermark_stats(_dec(r), WM_KEY_DEFAULT)
        got = rows[r["clip_id"]]
        assert got["wm_corr"] == st["wm_corr"], r["clip_id"]
        assert got["energy"] == st["energy"]
        want = is_watermarked_from(st["n_samples"], st["wm_corr"], st["energy"])
        assert got["is_watermarked"] == want, r["clip_id"]
        n_marked += int(want)
    issues = {r["issue_type"]: r for r in watermark_issues(flags).collect()}
    iss = issues["provenance_watermark"]
    assert iss["count"] == n_marked and iss["total"] == len(pdf)
    assert iss["severity"] == ("warning" if n_marked else "info")


# ----------------------------------------------------- embed-side operator


def test_mark_clips_roundtrip_and_passthrough(spark):
    from data_quality_spark.operators.audio_watermark import (
        mark_clips,
        watermark_flags,
    )
    from data_quality_spark.plans.schemas import CLIPS_SCHEMA
    from data_quality_spark.synth import generate_clips

    pdf = generate_clips(90, seed=42)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    df = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA).repartition(4, "clip_id")
    marked = mark_clips(df)
    out = {r["clip_id"]: r for r in marked.collect()}
    n_marked = 0
    for _, r in pdf.iterrows():
        got = out[r["clip_id"]]
        q = _dec(r)
        eligible = len(q) >= WM_MIN_SAMPLES
        assert got["marked"] == eligible, r["clip_id"]
        # pass-through columns untouched
        assert got["transcript"] == r["transcript"]
        assert got["sr_hz"] == r["sr_hz"] and got["dur_ms"] == r["dur_ms"]
        if eligible:
            n_marked += 1
            assert got["codec"] == "pcm16"
            # exact embed law: bytes are embed_watermark's int16 verbatim
            want = embed_watermark(q, WM_KEY_DEFAULT).astype("<i2").tobytes()
            assert bytes(got["bytes"]) == want, r["clip_id"]
        else:
            assert got["codec"] == r["codec"]
            if r["bytes"] is None:
                assert got["bytes"] is None
            else:
                assert bytes(got["bytes"]) == bytes(r["bytes"])
    assert n_marked > 20
    # detect over the marked table, marked carried through the Arrow pass:
    # the roundtrip invariant is exact equality of the two flags
    flags = watermark_flags(marked, carry_cols=("marked",)).collect()
    assert len(flags) == len(pdf)
    for row in flags:
        assert row["marked"] == row["is_watermarked"], row["clip_id"]


def test_mark_roundtrip_twin_bit_parity(spark):
    from data_quality_spark.oracles import _audio_mark_roundtrip_expected
    from data_quality_spark.operators.audio_watermark import (
        mark_clips,
        watermark_flags,
    )
    from data_quality_spark.plans.schemas import CLIPS_SCHEMA
    from data_quality_spark.synth import generate_clips

    exp = _audio_mark_roundtrip_expected(n=60, seed=42)
    pdf = generate_clips(60, seed=42)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    df = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA).repartition(4, "clip_id")
    got = (
        watermark_flags(mark_clips(df), carry_cols=("marked",))
        .orderBy("clip_id")
        .collect()
    )
    assert [r["clip_id"] for r in got] == exp["clip_id"]
    for i, r in enumerate(got):
        assert r["marked"] == exp["marked"][i]
        assert r["n_samples"] == exp["n_samples"][i]
        assert r["wm_corr"] == exp["wm_corr"][i], r["clip_id"]
        assert r["energy"] == exp["energy"][i]
        assert r["sigma_q2"] == exp["sigma_q2"][i]
        assert r["is_watermarked"] == exp["is_watermarked"][i]


def test_robustness_curve(spark):
    """The robustness-curve invariants on a small corpus: full detection
    for marked clips under clean / noise>=5dB / mulaw, zero control false
    positives everywhere, and detection dead under the 9/10 resample
    (carrier misalignment — the designed failure boundary)."""
    from pyspark.sql import functions as F

    from data_quality_spark.operators.audio_watermark import (
        watermark_detection_curve,
        watermark_flags,
    )
    from data_quality_spark.plans.schemas import CLIPS_SCHEMA
    from data_quality_spark.synth import make_audio_wm_robust_corpus

    pdf = make_audio_wm_robust_corpus(40, seed=7)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    df = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA).repartition(4, "clip_id")
    flags = watermark_flags(df).withColumns({
        "config": F.element_at(F.split("clip_id", "_"), -1),
        "armed": F.element_at(F.split("clip_id", "_"), -2) == F.lit("m"),
    })
    curve = {
        (r["config"], r["armed"]): r
        for r in watermark_detection_curve(flags, "config", "armed").collect()
    }
    assert len(curve) == 12
    for (cfg, armed), r in curve.items():
        assert r["n_clips"] > 0
        if not armed or cfg == "resample":
            assert r["n_detected"] == 0, (cfg, armed)
            assert r["min_sigma_q2"] is None
        elif cfg in ("snr5", "snr10"):
            # the margin boundary: near-total but seed-dependent
            assert r["n_detected"] >= 0.9 * r["n_clips"], (cfg, armed)
            assert r["min_sigma_q2"] is not None and r["min_sigma_q2"] > 0
        else:
            assert r["n_detected"] == r["n_clips"], (cfg, armed)
            assert r["detect_rate_r"] == 1.0
            assert r["min_sigma_q2"] is not None and r["min_sigma_q2"] > 0


def test_robustness_twin_parity(spark):
    from pyspark.sql import functions as F

    from data_quality_spark.operators.audio_watermark import (
        watermark_detection_curve,
        watermark_flags,
    )
    from data_quality_spark.oracles import _audio_wm_robust_expected
    from data_quality_spark.plans.schemas import CLIPS_SCHEMA
    from data_quality_spark.synth import make_audio_wm_robust_corpus

    exp = _audio_wm_robust_expected(n=40, seed=42)
    pdf = make_audio_wm_robust_corpus(40, seed=42)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    df = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA).repartition(4, "clip_id")
    flags = watermark_flags(df).withColumns({
        "config": F.element_at(F.split("clip_id", "_"), -1),
        "armed": F.element_at(F.split("clip_id", "_"), -2) == F.lit("m"),
    })
    got = (
        watermark_detection_curve(flags, "config", "armed")
        .orderBy("config", "armed")
        .collect()
    )
    assert len(got) == len(exp["config"])
    for i, r in enumerate(got):
        assert r["config"] == exp["config"][i]
        assert r["armed"] == exp["armed"][i]
        assert r["n_clips"] == exp["n_clips"][i]
        assert r["n_detected"] == exp["n_detected"][i]
        assert r["detect_rate_r"] == exp["detect_rate_r"][i]
        assert r["min_sigma_q2"] == exp["min_sigma_q2"][i]
