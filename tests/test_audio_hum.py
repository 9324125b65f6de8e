"""Mains-hum detection: constructed-hum recovery, grid attribution,
line-vs-spread discrimination, Goertzel cross-check of the comb bins,
and the operator contract."""

from __future__ import annotations

import math

import numpy as np
import pytest

from data_quality_spark.functions.spectral import (
    HUM_FRAME,
    HUM_MIN_CONTRAST,
    HUM_MIN_FRAC,
    hum_stats,
)


def _mk(sr: int, secs: float, parts) -> np.ndarray:
    t = np.arange(int(sr * secs)) / sr
    x = np.zeros_like(t)
    for amp, f in parts:
        x = x + amp * np.sin(2 * np.pi * f * t)
    return np.clip(x, -1.0, 0.999969)


def _flag(st) -> bool:
    return bool(
        st["hum_frac"] is not None
        and st["hum_frac"] >= HUM_MIN_FRAC
        and st["hum_contrast"] >= HUM_MIN_CONTRAST
    )


@pytest.mark.parametrize("sr", [8000, 16000])
@pytest.mark.parametrize("f0", [50, 60])
def test_pure_hum_detected_and_attributed(sr, f0):
    x = _mk(sr, 2.0, [(0.5, 1000.0), (0.08, f0), (0.04, 2 * f0), (0.02, 3 * f0)])
    st = hum_stats(x, sr)
    assert _flag(st)
    assert st["hum_hz"] == float(f0)


def test_clean_speechlike_not_flagged():
    # spread low-frequency energy (no line): 30 sinusoids 25..200 Hz
    sr = 16000
    parts = [(0.02, 25.0 + 6.0 * i) for i in range(30)] + [(0.3, 900.0)]
    st = hum_stats(_mk(sr, 2.0, parts), sr)
    assert st["hum_frac"] is not None
    assert not _flag(st), (st["hum_frac"], st["hum_contrast"])


def test_short_or_silent_not_evaluable():
    assert hum_stats(np.zeros(100), 16000)["n_frames"] == 0
    st = hum_stats(np.zeros(HUM_FRAME * 2), 16000)
    assert st["n_frames"] == 2 and st["hum_frac"] is None
    assert hum_stats(np.zeros(HUM_FRAME), 0)["n_frames"] == 0


def test_comb_bins_match_goertzel():
    # independent check of the comb accounting: Goertzel single-bin DFT
    # power on the windowed frame equals the rfft bin power
    sr, f0 = 16000, 60
    x = _mk(sr, 1.0, [(0.2, f0), (0.1, 777.0)])[:HUM_FRAME]
    from data_quality_spark.functions.spectral import _hann

    xw = x * _hann(HUM_FRAME)
    spec = np.fft.rfft(xw)
    for k in (int(round(f0 * HUM_FRAME / sr)),):
        w = 2 * math.pi * k / HUM_FRAME
        s_prev = s_prev2 = 0.0
        for v in xw:
            s = v + 2 * math.cos(w) * s_prev - s_prev2
            s_prev2, s_prev = s_prev, s
        power = (
            s_prev * s_prev + s_prev2 * s_prev2
            - 2 * math.cos(w) * s_prev * s_prev2
        )
        ref = spec[k].real ** 2 + spec[k].imag ** 2
        assert abs(power - ref) <= 1e-6 * max(ref, 1.0)


def test_seeded_corpus_recall_and_admissible_classes(spark):
    from data_quality_spark.operators.audio_hum import hum_flags
    from data_quality_spark.plans.schemas import CLIPS_SCHEMA
    from data_quality_spark.synth import make_audio_hum_corpus

    pdf = make_audio_hum_corpus(300, seed=42)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    df = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA)
    flags = {r["clip_id"]: r for r in hum_flags(df).collect()}
    defects = {
        r["clip_id"]: r["defect"]
        for _, r in pdf.iterrows()
        if isinstance(r.get("defect"), str) and r["defect"].startswith("hum")
    }
    caught = [c for c in defects if flags[c]["is_hum"]]
    missed = [c for c in defects if not flags[c]["is_hum"]]
    natural = [
        c for c, r in flags.items() if r["is_hum"] and c not in defects
    ]
    assert len(caught) >= 44          # 46/48 measured; margin for param drift
    assert len(missed) <= 4           # admissible: comb buried by off-grid low content
    assert len(natural) <= 3          # genuine on-grid stationary lines
    # grid attribution exact on every caught clip
    for c in caught:
        assert int(flags[c]["hum_hz"]) == int(defects[c][3:])
