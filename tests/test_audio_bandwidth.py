"""Effective-bandwidth / upsample-detection contract.

The differential oracle (explicit loop + fsum vs vectorized rfft +
pairwise sums) proves engine agreement; these tests pin the physics:
what fills the deep top band, what empties it, and where the
measurability gate sits.
"""

from __future__ import annotations

import numpy as np
import pytest

from data_quality_spark.functions.resample import resample_poly
from data_quality_spark.functions.spectral import (
    HF_BAND_FRAC,
    bandwidth_stats,
)
from data_quality_spark.operators.audio_bandwidth import (
    MAX_UPSAMPLED_HF_DB,
    MIN_MEASURABLE_RMS,
)

SR = 16000


def native(secs: float = 2.0, amp: float = 0.3, noise: float = 0.01,
           seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(int(secs * SR)) / SR
    x = amp * np.sin(2 * np.pi * 1000 * t) + rng.normal(0, noise, t.size)
    return x.astype(np.float32)


def upsampled(secs: float = 2.0, amp: float = 0.3, noise: float = 0.01,
              seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(int(secs * SR // 2)) / (SR // 2)
    x = amp * np.sin(2 * np.pi * 1000 * t) + rng.normal(0, noise, t.size)
    return resample_poly(x.astype(np.float64), SR // 2, SR).astype(np.float32)


class TestKernel:
    def test_native_noise_floor_fills_deep_band(self):
        st = bandwidth_stats(native(), SR)
        assert st["hf_db"] > MAX_UPSAMPLED_HF_DB
        assert st["rms"] > MIN_MEASURABLE_RMS

    def test_upsampled_deep_band_is_empty(self):
        st = bandwidth_stats(upsampled(), SR)
        assert st["hf_db"] < MAX_UPSAMPLED_HF_DB - 5.0

    def test_gap_is_wide(self):
        # the decision gap between the two constructions stays > 15 dB
        a = bandwidth_stats(native(), SR)["hf_db"]
        b = bandwidth_stats(upsampled(), SR)["hf_db"]
        assert a - b > 15.0

    def test_near_nyquist_tone_does_not_leak(self):
        # a strong 7.5 kHz tone IS deep-band content; and with Hann
        # windowing a strong 3.9 kHz tone must NOT leak into it
        t = np.arange(2 * SR) / SR
        hi = (0.5 * np.sin(2 * np.pi * 7500 * t)).astype(np.float32)
        assert bandwidth_stats(hi, SR)["hf_db"] > -1.0
        lo = (0.5 * np.sin(2 * np.pi * 3900 * t)).astype(np.float32)
        assert bandwidth_stats(lo, SR)["hf_db"] < MAX_UPSAMPLED_HF_DB
        # deep band starts at 0.4·sr = 6400, clear of the 3.9k tone
        assert HF_BAND_FRAC * SR == 6400

    def test_rolloff_tracks_content(self):
        st_lo = bandwidth_stats(upsampled(), SR)
        st_hi = bandwidth_stats(native(), SR)
        assert st_lo["rolloff99_hz"] < 4200
        assert st_hi["rolloff99_hz"] > st_lo["rolloff99_hz"] - 1

    def test_degenerate(self):
        empty = bandwidth_stats(np.zeros(0, dtype=np.float32), SR)
        assert empty["n_frames"] == 0 and empty["hf_db"] is None
        silent = bandwidth_stats(np.zeros(SR, dtype=np.float32), SR)
        assert silent["rms"] == 0.0 and silent["hf_db"] is None
        assert bandwidth_stats(native(), 0)["n_frames"] == 0


@pytest.mark.usefixtures("spark")
class TestOperator:
    def test_ground_truth_discrimination(self, spark):
        """After normalize_sr to 16 kHz, the flag recovers the true
        original sample rate for every measurable, non-clipped clip —
        and never fires on native-16k content."""
        from data_quality_spark.operators.audio_bandwidth import (
            bandwidth_flags,
            clip_bandwidth,
        )
        from data_quality_spark.operators.audio_resample import normalize_sr
        from data_quality_spark.plans.schemas import CLIPS_SCHEMA
        from data_quality_spark.synth import generate_clips

        pdf = generate_clips(300, seed=11)
        df = spark.createDataFrame(
            pdf[[f.name for f in CLIPS_SCHEMA.fields]], CLIPS_SCHEMA)
        out = bandwidth_flags(
            clip_bandwidth(normalize_sr(df, 16000))
        ).toPandas().set_index("clip_id")
        meta = pdf.set_index("clip_id").reindex(out.index)
        measurable = out["rms"].notna() & (out["rms"] >= MIN_MEASURABLE_RMS)
        # no false positives on native 16 kHz
        natives = out[(meta["sr_hz"] == 16000) & measurable]
        assert len(natives) > 30
        assert not natives["upsampled"].any()
        # full recall on measurable, non-clipped 8 kHz-origin clips
        eight = out[(meta["sr_hz"] == 8000) & measurable
                    & (meta["defect"] != "clipped")]
        assert len(eight) > 100
        assert eight["upsampled"].all()
        # documented false negative: re-clipping regenerates HF
        clipped = out[(meta["sr_hz"] == 8000) & (meta["defect"] == "clipped")]
        if len(clipped):
            assert not clipped["upsampled"].any()
