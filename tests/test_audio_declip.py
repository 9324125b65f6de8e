"""Declipping repair (cubic-Hermite rail-run reconstruction).

Seeded-defect style: constructed over-driven programs must IMPROVE
(never regress) against their carried pre-clip truth, clean rows must
pass through byte-identical, and the law's geometry — run detection,
physical floor, boundary/length skip rules, headroom attenuation — is
pinned here while the ``audio_declip`` differential oracle replays the
whole law scalar-by-scalar for the bit-exact payload hash check.
"""

from __future__ import annotations

import numpy as np
import pytest

from data_quality_spark.functions.declip import (
    DEFAULT_MAX_RUN_LEN,
    clipped_runs,
    declip_i16,
)
from data_quality_spark.synth import make_audio_declip_corpus

SR = 16000


def _clipped_sine(amp=1.6, f=220.0, dur=1.0):
    t = np.arange(int(SR * dur)) / SR
    true = amp * 32767.0 * np.sin(2 * np.pi * f * t)
    q = np.clip(np.rint(true), -32768, 32767).astype("<i2")
    return true, q


def _snr(ref, est):
    g = np.dot(est, ref) / np.dot(ref, ref)
    err = est - g * ref
    return 10 * np.log10(np.dot(est, est) / max(np.dot(err, err), 1e-30))


class TestKernel:
    def test_run_detection(self):
        q = np.array([0, 32767, 32767, 5, -32768, 7, 32766, -32767],
                     dtype=np.int16)
        assert clipped_runs(q) == [(1, 3, 1), (4, 5, -1)]
        # guard widens the rail band
        assert (6, 7, 1) in clipped_runs(q, guard=1)
        assert (7, 8, -1) in clipped_runs(q, guard=1)

    def test_sine_recovery(self):
        true, q = _clipped_sine()
        y, st = declip_i16(q, max_run_len=int(SR * 0.002))
        assert st["n_repaired"] == st["n_runs"] > 100
        assert _snr(true, y.astype(float)) > _snr(true, q.astype(float)) + 20

    def test_physical_floor(self):
        # reconstruction never moves a railed sample toward zero
        _, q = _clipped_sine()
        y, st = declip_i16(q, max_run_len=int(SR * 0.002))
        railed_pos = q == 32767
        assert st["atten"] < 1.0
        # pre-attenuation the floor holds; post-attenuation the repaired
        # samples still sit at/above the attenuated rail
        assert np.all(y[railed_pos] >= np.rint(32767 * st["atten"]) - 1)

    def test_boundary_runs_skipped(self):
        q = np.full(10, 32767, dtype=np.int16)
        q[4:7] = [100, 200, 100]
        y, st = declip_i16(q)
        assert st["n_runs"] == 2 and st["n_repaired"] == 0
        assert y is q  # nothing repaired → same object (zero-copy seam)

    def test_long_runs_left_at_rail(self):
        true, q = _clipped_sine(amp=3.0, f=100.0)  # long deep runs
        _, st = declip_i16(q, max_run_len=4)
        assert st["n_runs"] > 0
        assert st["n_repaired"] < st["n_runs"]
        _, st_all = declip_i16(q, max_run_len=10**6)
        assert st_all["n_repaired"] > st["n_repaired"]

    def test_totality(self):
        y, st = declip_i16(np.zeros(0, dtype=np.int16))
        assert st["n_runs"] == 0 and y.size == 0
        q = (1000 * np.sin(np.arange(100))).astype(np.int16)
        y, st = declip_i16(q)
        assert st["n_railed"] == 0 and y is q


class TestOperator:
    @pytest.fixture(scope="class")
    def repaired(self, spark):
        from data_quality_spark.operators.audio_declip import declip_audio
        from data_quality_spark.plans.schemas import CLIPS_SCHEMA

        pdf = make_audio_declip_corpus(120, seed=7)
        cols = [f.name for f in CLIPS_SCHEMA.fields]
        clips = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA)
        rows = {r.clip_id: r for r in declip_audio(clips).collect()}
        return rows, pdf

    def test_seeded_classes_repaired(self, repaired):
        rows, pdf = repaired
        tags = dict(zip(pdf.clip_id, pdf.defect))
        hard = [r for c, r in rows.items() if tags[c] == "declip_hard"]
        mild = [r for c, r in rows.items() if tags[c] == "declip_mild"]
        assert len(hard) >= 10 and len(mild) >= 10
        assert all(r.declipped and r.n_repaired > 0 for r in hard)
        assert all(r.n_railed > 100 for r in hard)
        assert all(r.declipped for r in mild)
        assert all(r.codec == "pcm16" for r in hard + mild)

    def test_snr_never_regresses_and_improves(self, repaired):
        from data_quality_spark.functions.audio import _decode_i16

        rows, pdf = repaired
        gains = {"declip_hard": [], "declip_mild": []}
        for _, src in pdf.iterrows():
            if src["defect"] not in gains:
                continue
            r = rows[src["clip_id"]]
            q = _decode_i16(src["bytes"], src["codec"], src["sr_hz"])
            y = np.frombuffer(r.bytes, dtype="<i2")
            truth = src["truth"]
            gains[src["defect"]].append(
                _snr(truth, y.astype(float)) - _snr(truth, q.astype(float)))
        for k, v in gains.items():
            assert min(v) > -0.1, (k, min(v))  # never materially worse
        assert np.mean(gains["declip_hard"]) > 1.0
        assert np.mean(gains["declip_mild"]) > 2.0

    def test_clean_rows_pass_through_byte_identical(self, repaired):
        rows, pdf = repaired
        src_bytes = dict(zip(pdf.clip_id, pdf.bytes))
        tags = dict(zip(pdf.clip_id, pdf.defect))
        clean = [c for c, t in tags.items()
                 if t not in ("declip_hard", "declip_mild", "clipped")]
        assert clean
        for c in clean:
            r = rows[c]
            if r.n_repaired == 0:
                assert not r.declipped
                if src_bytes[c] is None:
                    assert r.bytes is None
                else:
                    assert bytes(r.bytes) == bytes(src_bytes[c])

    def test_undecodable_totality(self, repaired):
        rows, pdf = repaired
        tags = dict(zip(pdf.clip_id, pdf.defect))
        bad = [rows[c] for c, t in tags.items()
               if t in ("codec_unknown", "corrupt_wav")]
        assert bad
        assert all(not r.ok and not r.declipped and r.atten is None
                   for r in bad)

    def test_sr_cap_derivation(self, spark):
        """max_run_ms converts through the row's sr: the same railed run
        length is repairable at 16 kHz (8-sample cap) but skipped when the
        row claims no sr and the run exceeds DEFAULT_MAX_RUN_LEN."""
        from data_quality_spark.operators.audio_declip import declip_audio
        from data_quality_spark.plans.schemas import CLIPS_SCHEMA
        import pandas as pd

        t = np.arange(SR) / SR
        true = 1.3 * 32767.0 * np.sin(2 * np.pi * 400 * t)
        q = np.clip(np.rint(true), -32768, 32767).astype("<i2")
        pdf = pd.DataFrame({
            "clip_id": ["a", "b"],
            "bytes": [q.tobytes(), q.tobytes()],
            "sr_hz": [SR, 0],
            "dur_ms": [1000, 1000],
            "codec": ["pcm16", "pcm16"],
            "transcript": ["x", "x"],
            "ingest_day": ["2025-01-01", "2025-01-01"],
        })
        cols = [f.name for f in CLIPS_SCHEMA.fields]
        clips = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA)
        out = {r.clip_id: r for r in
               declip_audio(clips, max_run_ms=1.0).collect()}
        # 400 Hz at 1.3× rails 9-sample runs: inside the 16-sample cap
        # the 16 kHz row derives (1 ms), outside the 8-sample fallback
        # the sr=0 row gets — same bytes, opposite outcome
        assert out["a"].max_run == 9
        assert out["a"].n_repaired == out["a"].n_runs > 0
        assert out["b"].ok and out["b"].n_runs == out["a"].n_runs
        assert out["b"].n_repaired == 0 and not out["b"].declipped
        assert DEFAULT_MAX_RUN_LEN == 8
