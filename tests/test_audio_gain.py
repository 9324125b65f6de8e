"""Loudness normalization: kernel laws, operator parity, transform safety.

Correctness model: the two-constraint gain (RMS target, peak ceiling) has
machine-checkable laws — post-gain RMS hits the target within quantization
noise unless the ceiling binds, the post-gain peak never exceeds the
ceiling (modulo the one rounding LSB), silence and undecodable rows pass
through byte-identical — and the Spark operators must agree with the bare
kernel row-by-row."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_quality_spark.functions.audio import encode_pcm16, _decode_i16
from data_quality_spark.functions.gain import (
    PEAK_CEILING_DB,
    TARGET_RMS_DB,
    apply_gain_i16,
    gain_factor,
    rms_db_i16,
)
from data_quality_spark.plans.schemas import CLIPS_SCHEMA
from data_quality_spark.synth import generate_clips

CLIP_COLS = [f.name for f in CLIPS_SCHEMA.fields]


def _tone(amp: float, n: int = 8000, sr: int = 8000, f: float = 440.0):
    t = np.arange(n) / sr
    return np.clip(np.rint(amp * 32767.0 * np.sin(2 * np.pi * f * t)),
                   -32768, 32767).astype(np.int16)


class TestKernel:
    def test_rms_target_reached(self):
        q = _tone(0.05)  # quiet tone, crest factor sqrt(2): ceiling slack
        g = gain_factor(q)
        y, n_clip = apply_gain_i16(q, g)
        assert n_clip == 0
        got = rms_db_i16(y)
        assert abs(got - TARGET_RMS_DB) < 0.05  # quantization only

    def test_peak_ceiling_binds_for_spiky_clip(self):
        # one huge spike + near-silence: RMS gain alone would blow the peak
        q = np.zeros(8000, dtype=np.int16)
        q[100] = 8000
        g = gain_factor(q)
        y, n_clip = apply_gain_i16(q, g)
        peak_db = 20 * math.log10(np.max(np.abs(y.astype(np.float64)))
                                  / 32767.0)
        assert peak_db <= PEAK_CEILING_DB + 0.01
        assert rms_db_i16(y) < TARGET_RMS_DB  # ceiling-limited
        assert n_clip == 0

    def test_loud_clip_attenuated(self):
        q = _tone(0.9)
        g = gain_factor(q)
        assert g < 1.0
        y, _ = apply_gain_i16(q, g)
        assert abs(rms_db_i16(y) - TARGET_RMS_DB) < 0.05

    def test_silence_and_empty_undefined(self):
        assert gain_factor(np.zeros(100, dtype=np.int16)) is None
        assert gain_factor(np.zeros(0, dtype=np.int16)) is None
        assert rms_db_i16(np.zeros(100, dtype=np.int16)) is None

    def test_gain_matches_decode_encode_path(self):
        # integer-domain apply == decode -> scale float -> encode_pcm16
        rng = np.random.default_rng(3)
        q = rng.integers(-20000, 20000, 4096).astype(np.int16)
        g = gain_factor(q)
        y, _ = apply_gain_i16(q, g)
        ref = encode_pcm16(q.astype(np.float64) / 32767.0 * g)
        assert y.tobytes() == ref

    def test_clip_count(self):
        q = _tone(0.9, n=100)
        y, n_clip = apply_gain_i16(q, 2.0)
        assert n_clip == int(np.count_nonzero(
            np.abs(np.rint(q.astype(np.float64) * 2.0)) > 32767))
        assert n_clip > 0
        assert np.max(y) <= 32767 and np.min(y) >= -32768


class TestOperators:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        pdf = generate_clips(150, seed=23)
        return spark.createDataFrame(pdf[CLIP_COLS], CLIPS_SCHEMA), pdf

    def test_gain_stats_matches_kernel(self, corpus):
        from data_quality_spark.operators.audio_gain import gain_stats

        df, pdf = corpus
        out = gain_stats(df).toPandas().set_index("clip_id")
        for _, r in pdf.iterrows():
            row = out.loc[r["clip_id"]]
            try:
                q = _decode_i16(r["bytes"], r["codec"], r["sr_hz"])
            except (ValueError, TypeError):
                assert not row["ok"] and not row["gained"]
                continue
            assert row["ok"]
            g = gain_factor(q)
            if g is None:
                assert not row["gained"]
                continue
            assert row["gained"]
            assert row["gain"] == pytest.approx(g, abs=0, rel=1e-12)
            y, n_clip = apply_gain_i16(q, g)
            assert row["n_clipped"] == n_clip
            assert row["rms_out_db"] == pytest.approx(rms_db_i16(y),
                                                      rel=1e-12)

    def test_gained_rows_hit_target_or_ceiling(self, corpus):
        from data_quality_spark.operators.audio_gain import gain_stats

        df, _ = corpus
        out = gain_stats(df).toPandas()
        gained = out[out["gained"]]
        assert len(gained) > 50
        # every gained row is within quantization of the target, or is
        # ceiling-limited strictly below it
        near = (gained["rms_out_db"] - TARGET_RMS_DB).abs() < 0.1
        below = gained["rms_out_db"] < TARGET_RMS_DB
        assert (near | below).all()

    def test_normalize_gain_payloads(self, corpus):
        from data_quality_spark.operators.audio_gain import normalize_gain

        df, pdf = corpus
        out = normalize_gain(df).toPandas().set_index("clip_id")
        n_gained = 0
        for _, r in pdf.iterrows():
            row = out.loc[r["clip_id"]]
            try:
                q = _decode_i16(r["bytes"], r["codec"], r["sr_hz"])
                g = gain_factor(q)
            except (ValueError, TypeError):
                g = None
            if g is None:
                # byte-identical passthrough, codec untouched
                assert not row["gained"]
                assert bytes(row["bytes"]) == bytes(r["bytes"])
                assert row["codec"] == r["codec"]
                continue
            n_gained += 1
            assert row["gained"] and row["codec"] == "pcm16"
            y, _ = apply_gain_i16(q, g)
            assert bytes(row["bytes"]) == y.tobytes()
        assert n_gained > 50

    def test_oracle_twin_agrees(self, spark):
        """The independent sqrt/20log10 oracle and the Spark relation must
        agree after 5dp rounding — the same comparison the driver hashes.
        (5dp, not 6: the committed corpus has values within 1e-9 of a 6dp
        half-step, rejected by the generation-time boundary guard.)"""
        import pyarrow as pa

        from data_quality_spark.oracles import _audio_gain_expected
        from data_quality_spark.operators.audio_gain import gain_stats

        pdf = generate_clips(120, seed=42)
        df = spark.createDataFrame(pdf[CLIP_COLS], CLIPS_SCHEMA)
        got = (
            gain_stats(df)
            .select(
                "clip_id", "ok", "gained",
                F.round("gain", 5).alias("gain_r"),
                F.round("rms_in_db", 5).alias("rms_in_db_r"),
                F.round("rms_out_db", 5).alias("rms_out_db_r"),
                "n_clipped")
            .orderBy("clip_id")
            .toPandas()
        )
        want = pa.Table.from_pydict(
            _audio_gain_expected(n=120, seed=42)).to_pandas()
        assert list(got["clip_id"]) == list(want["clip_id"])
        for c in ("ok", "gained", "n_clipped"):
            assert list(got[c]) == list(want[c]), c
        for c in ("gain_r", "rms_in_db_r", "rms_out_db_r"):
            ga, wa = got[c].to_numpy(), want[c].to_numpy()
            mask = ~np.isnan(wa.astype(float))
            assert np.array_equal(np.isnan(ga.astype(float)), ~mask), c
            assert np.array_equal(ga[mask], wa[mask]), c
