"""Wow/flutter detection: constructed-modulation recovery, rate
attribution, stability of clean carriers, the periodicity guard, and
the operator contract on the seeded corpus."""

from __future__ import annotations

import numpy as np
import pytest

from data_quality_spark.functions.flutter import (
    DEV_FLAG_PCT,
    MOD_MIN_FRAC,
    flutter_stats,
)


def _tone(sr: int, secs: float, freqs=((0.5, 997.0), (0.2, 1810.0))):
    t = np.arange(int(sr * secs)) / sr
    x = np.zeros_like(t)
    for amp, f in freqs:
        x = x + amp * np.sin(2 * np.pi * f * t)
    x = x + 0.005 * np.random.default_rng(0).normal(0, 1, len(t))
    return x


def _wowify(x: np.ndarray, sr: int, m: float, fm: float) -> np.ndarray:
    n = len(x)
    t = np.arange(n, dtype=np.float64)
    phi = t + m * sr / (2 * np.pi * fm) * (1 - np.cos(2 * np.pi * fm * t / sr))
    return np.interp(np.clip(phi, 0, n - 1), t, x)


def _flag(st) -> bool:
    return bool(
        st["dev_pct"] is not None
        and st["mod_frac"] is not None
        and st["dev_pct"] >= DEV_FLAG_PCT
        and st["mod_frac"] >= MOD_MIN_FRAC
    )


@pytest.mark.parametrize("sr", [8000, 16000, 44100])
@pytest.mark.parametrize("m,fm", [(0.01, 1.5), (0.02, 8.0)])
def test_seeded_modulation_detected_and_attributed(sr, m, fm):
    st = flutter_stats(_wowify(_tone(sr, 4.0), sr, m, fm), sr)
    assert _flag(st), st
    # rate attributed to within one modulation bin (~0.25 Hz over 4 s)
    assert st["mod_hz"] == pytest.approx(fm, abs=0.5)
    # depth in the right ballpark (m/sqrt(2) * 100, minus frame averaging)
    assert st["dev_pct"] > 0.4 * m * 100


def test_clean_carrier_not_flagged():
    for sr in (8000, 44100):
        st = flutter_stats(_tone(sr, 4.0), sr)
        assert st["n_track"] > 0
        assert st["dev_pct"] < 0.01, st  # ~0.001% tracker noise
        assert not _flag(st)


def test_aperiodic_deviation_not_flagged():
    # a one-off linear drift is NOT transport flutter: deviation exists
    # but is not concentrated at one modulation frequency
    sr = 16000
    n = int(sr * 4.0)
    t = np.arange(n, dtype=np.float64)
    # quadratic phase → slow linear frequency ramp of ~1.5%
    x = np.sin(2 * np.pi * 997.0 * t / sr * (1 + 0.0075 * t / n))
    st = flutter_stats(x, sr)
    if st["dev_pct"] is not None and st["dev_pct"] >= DEV_FLAG_PCT:
        assert st["mod_frac"] < MOD_MIN_FRAC, st
    assert not _flag(st)


def test_short_or_silent_not_evaluable():
    assert flutter_stats(np.zeros(0), 16000)["n_frames"] == 0
    st = flutter_stats(np.zeros(16000 * 2), 16000)
    assert st["n_track"] == 0 and st["dev_pct"] is None
    assert flutter_stats(np.ones(100), 0)["n_frames"] == 0


def test_seeded_corpus_recall_and_false_flags(spark):
    from data_quality_spark.operators.audio_flutter import flutter_flags
    from data_quality_spark.plans.schemas import CLIPS_SCHEMA
    from data_quality_spark.synth import make_audio_flutter_corpus

    pdf = make_audio_flutter_corpus(300, seed=42)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    clips = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA)
    flags = {r["clip_id"]: r.asDict() for r in flutter_flags(clips).collect()}
    seeded = [
        r["clip_id"] for _, r in pdf.iterrows()
        if isinstance(r.get("defect"), str)
        and (r["defect"].startswith("wow") or r["defect"].startswith("flutter"))
    ]
    assert len(seeded) >= 30
    caught = [c for c in seeded if flags[c]["is_flutter"]]
    # evaluable seeded clips must be caught; clips without a stable
    # carrier (noise-dominated content) are admissible misses
    evaluable = [c for c in seeded if flags[c]["n_track"] > 0]
    assert len(evaluable) >= 0.8 * len(seeded)
    assert all(flags[c]["is_flutter"] for c in evaluable), [
        (c, flags[c]) for c in evaluable if not flags[c]["is_flutter"]
    ]
    assert len(caught) >= 0.8 * len(seeded), (len(caught), len(seeded))
    # zero false flags on the untouched corpus
    false = [c for c, r in flags.items() if r["is_flutter"] and c not in seeded]
    assert false == [], false


def test_issue_relation_counts(spark):
    from data_quality_spark.operators.audio_flutter import (
        flutter_flags,
        flutter_issues,
    )
    from data_quality_spark.plans.schemas import CLIPS_SCHEMA
    from data_quality_spark.synth import make_audio_flutter_corpus

    pdf = make_audio_flutter_corpus(120, seed=7)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    clips = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA)
    flags = flutter_flags(clips).collect()
    issues = {r["issue_type"]: r.asDict()
              for r in flutter_issues(flutter_flags(clips)).collect()}
    assert issues["wow_flutter"]["count"] == sum(
        1 for r in flags if r["is_flutter"]
    )
    assert issues["wow_flutter"]["total"] == len(flags)
    if issues["wow_flutter"]["count"] > 0:
        assert issues["wow_flutter"]["severity"] == "warning"
