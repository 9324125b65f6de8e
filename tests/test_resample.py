"""Polyphase resampler: math pinned to the definition, operator contract.

Layered evidence, weakest assumption first:
1. polyphase execution == literal zero-stuff→convolve→decimate definition
   (SNR > 120 dB — reduction order is the only difference);
2. analytic invariants: identity, DC gain, tone round-trip SNR ≥ 30 dB
   (the BASELINE.json per-row bar, met with ~30 dB to spare);
3. the normalize_sr operator rewrites payloads consistently and never
   touches rows it cannot decode.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_quality_spark.functions.resample import (
    output_length,
    resample_poly,
)
from data_quality_spark.oracles import _resample_definition

RATIOS = [(8000, 16000), (16000, 8000), (44100, 16000), (16000, 44100),
          (22050, 16000), (11025, 16000)]


def snr_db(ref: np.ndarray, err: np.ndarray) -> float:
    p = float(np.mean(np.square(ref)))
    e = float(np.mean(np.square(err)))
    return 10.0 * np.log10(p / max(e, 1e-300))


class TestKernelVsDefinition:
    @pytest.mark.parametrize("sr_in,sr_out", RATIOS)
    def test_matches_definition(self, sr_in, sr_out):
        rng = np.random.default_rng(1)
        x = rng.normal(0, 0.3, 12345)
        a = resample_poly(x, sr_in, sr_out)
        b = _resample_definition(x, sr_in, sr_out)
        assert a.shape == b.shape == (output_length(x.size, sr_out // np.gcd(sr_in, sr_out), sr_in // np.gcd(sr_in, sr_out)),)
        assert snr_db(b, a - b) > 120.0

    @settings(max_examples=25, deadline=None)
    @given(
        n=st.integers(1, 4000),
        seed=st.integers(0, 2**31),
        ratio=st.sampled_from(RATIOS),
    )
    def test_matches_definition_fuzz(self, n, seed, ratio):
        rng = np.random.default_rng(seed)
        x = rng.normal(0, 0.5, n)
        a = resample_poly(x, *ratio)
        b = _resample_definition(x, *ratio)
        assert a.shape == b.shape
        if np.any(b):
            assert snr_db(b, a - b) > 120.0


class TestAnalyticInvariants:
    def test_identity_same_rate(self):
        x = np.random.default_rng(2).normal(0, 0.3, 1000)
        y = resample_poly(x, 16000, 16000)
        assert np.array_equal(x, y) and y is not x

    def test_dc_gain(self):
        # per-phase gain of the single-prototype design ripples at ~5e-4
        # (-66 dB) — same as scipy.signal.resample_poly; the invariant is
        # level preservation, not bit-exactness
        x = np.full(8000, 0.25)
        y = resample_poly(x, 8000, 16000)
        mid = y[1000:-1000]
        assert np.allclose(mid, 0.25, atol=1e-3)
        assert abs(float(np.mean(mid)) - 0.25) < 1e-5

    @pytest.mark.parametrize("sr_in,sr_out", [(8000, 16000), (16000, 8000),
                                              (16000, 44100)])
    @pytest.mark.parametrize("f", [220.0, 440.0, 1000.0, 3000.0])
    def test_tone_snr_30db(self, sr_in, sr_out, f):
        n = sr_in  # 1 second
        x = 0.5 * np.sin(2 * np.pi * f * np.arange(n) / sr_in)
        y = resample_poly(x, sr_in, sr_out)
        ref = 0.5 * np.sin(2 * np.pi * f * np.arange(y.size) / sr_out)
        m = slice(400, y.size - 400)  # skip edge transients
        assert snr_db(ref[m], y[m] - ref[m]) >= 30.0

    def test_downsample_kills_above_nyquist(self):
        # 6 kHz tone cannot exist at 8 kHz output; the lowpass must kill it
        sr_in, sr_out = 16000, 8000
        x = 0.5 * np.sin(2 * np.pi * 6000.0 * np.arange(sr_in) / sr_in)
        y = resample_poly(x, sr_in, sr_out)
        assert float(np.sqrt(np.mean(np.square(y[400:-400])))) < 0.01

    def test_bad_rates_raise(self):
        with pytest.raises(ValueError):
            resample_poly(np.zeros(10), 0, 16000)
        with pytest.raises(ValueError):
            resample_poly(np.zeros(10), 16000, -1)


@pytest.mark.usefixtures("spark")
class TestNormalizeOperator:
    def _clips(self, spark, n=150, seed=13):
        from data_quality_spark.plans.schemas import CLIPS_SCHEMA
        from data_quality_spark.synth import generate_clips

        pdf = generate_clips(n, seed=seed)
        return pdf, spark.createDataFrame(
            pdf[[f.name for f in CLIPS_SCHEMA.fields]], CLIPS_SCHEMA)

    def test_normalize_sr_contract(self, spark):
        from data_quality_spark.functions.audio import _decode_i16
        from data_quality_spark.operators.audio_resample import normalize_sr

        pdf, df = self._clips(spark)
        out = normalize_sr(df, 16000).toPandas().set_index("clip_id")
        src = pdf.set_index("clip_id")
        assert len(out) == len(src)
        res = out[out["resampled"]]
        assert len(res) > 100  # most of the corpus decodes
        assert (res["sr_hz"] == 16000).all()
        assert (res["codec"] == "pcm16").all()
        for cid, row in res.iterrows():
            y = _decode_i16(row["bytes"], "pcm16", 16000)
            assert row["dur_ms"] == round(len(y) * 1000 / 16000)
        # untouched rows are byte-identical pass-throughs
        kept = out[~out["resampled"]]
        assert len(kept) > 0
        for cid, row in kept.iterrows():
            o = src.loc[cid]
            assert row["sr_hz"] == o["sr_hz"] and row["codec"] == o["codec"]
            same_bytes = (row["bytes"] is None and o["bytes"] is None) or \
                (row["bytes"] == o["bytes"])
            assert same_bytes

    def test_normalized_waveform_matches_kernel(self, spark):
        from data_quality_spark.functions.audio import _decode_i16
        from data_quality_spark.operators.audio_resample import normalize_sr

        pdf, df = self._clips(spark, n=60, seed=3)
        out = normalize_sr(df, 16000).toPandas().set_index("clip_id")
        src = pdf.set_index("clip_id")
        checked = 0
        for cid, row in out[out["resampled"]].iterrows():
            o = src.loc[cid]
            q = _decode_i16(o["bytes"], o["codec"], o["sr_hz"])
            x = (q.astype(np.float32) / np.float32(32767.0)).astype(np.float64)
            want = resample_poly(x, int(o["sr_hz"]), 16000)
            got = _decode_i16(row["bytes"], "pcm16", 16000)
            assert got.size == want.size
            # exact: re-encode is clip(rint(x*32767), -32768, 32767)
            want_q = np.clip(np.rint(want * 32767.0), -32768, 32767)
            assert np.array_equal(got.astype(np.float64), want_q)
            checked += 1
        assert checked > 40
