"""True-peak (inter-sample over) audit.

Seeded-defect style: the corpus constructs the textbook hidden-over
class (fs/4 sine at 45° — samples ≤ 0.71·A, reconstruction = A), a
hot-but-legal class, and a clipped flat-top; the laws are exact-integer
so every assertion is sharp.
"""

from __future__ import annotations

import numpy as np
import pytest

from data_quality_spark.functions.truepeak import (
    FS_Q15,
    RAIL_I16,
    TP_L,
    TP_LIMIT_Q15,
    TP_TAPS_Q15,
    truepeak_stats,
)
from data_quality_spark.synth import make_audio_truepeak_corpus


def _zero_stuff_tp(q: np.ndarray) -> int:
    zs = np.zeros(TP_L * q.size, dtype=np.int64)
    zs[::TP_L] = q.astype(np.int64)
    return int(np.abs(np.convolve(zs, TP_TAPS_Q15)).max())


class TestKernel:
    def test_spec_table_gains(self):
        # per-phase DC gain ≈ unity in Q15 — the interpolator does not
        # recolor level
        for p in range(TP_L):
            assert abs(int(TP_TAPS_Q15[p::TP_L].sum()) - 32768) <= 2

    def test_polyphase_equals_literal_definition(self):
        # the kernel's 4 phase convolutions are term-for-term the
        # zero-stuff full convolution — exact over random int16
        rng = np.random.default_rng(11)
        for n in (1, 2, 7, 100, 4096):
            q = rng.integers(-32768, 32768, n).astype(np.int16)
            st = truepeak_stats(q)
            assert st["tp_q15"] == _zero_stuff_tp(q)
            assert st["sample_peak"] == int(np.abs(q.astype(int)).max())

    def test_hidden_over_construction(self):
        # fs/4 at 45°, A = 36000: samples ≤ 25456, true peak ≈ A
        t = np.arange(16000, dtype=np.float64)
        q = np.rint(36000 * np.sin(0.5 * np.pi * t + np.pi / 4)).astype(
            np.int16
        )
        st = truepeak_stats(q)
        assert st["sample_peak"] < RAIL_I16
        assert st["tp_q15"] > FS_Q15  # over full scale
        # reconstruction within 1% of the analog amplitude
        assert abs(st["tp_q15"] / 32768 - 36000) < 360

    def test_empty_clip_is_total(self):
        st = truepeak_stats(np.zeros(0, dtype=np.int16))
        assert st == {"n_samples": 0, "sample_peak": None, "tp_q15": None}


class TestOperator:
    @pytest.fixture(scope="class")
    def flagged(self, spark):
        from data_quality_spark.operators.audio_truepeak import (
            truepeak_flags,
        )
        from data_quality_spark.plans.schemas import CLIPS_SCHEMA

        pdf = make_audio_truepeak_corpus(120, seed=7)
        cols = [f.name for f in CLIPS_SCHEMA.fields]
        clips = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA)
        rows = {r.clip_id: r for r in truepeak_flags(clips).collect()}
        tags = dict(zip(pdf.clip_id, pdf.defect))
        return rows, tags

    def test_seeded_classes(self, flagged):
        rows, tags = flagged
        seen = set()
        for cid, r in rows.items():
            tag = tags[cid]
            if tag == "tp_isp":
                assert r.is_tp_over and r.is_hidden_over and r.is_hot
            elif tag == "tp_hot":
                assert r.is_hot and not r.is_tp_over
            elif tag == "tp_rail":
                assert r.is_tp_over and not r.is_hidden_over
                assert r.sample_peak >= RAIL_I16
            else:
                # halved clean clips and pass-through undecodables can
                # never reach the −1 dBTP limit
                assert not (r.is_tp_over or r.is_hidden_over or r.is_hot)
            seen.add(tag)
        assert {"tp_isp", "tp_hot", "tp_rail"} <= seen

    def test_undecodable_rows_never_flag(self, flagged):
        rows, tags = flagged
        dead = [r for r in rows.values() if r.n_samples == 0]
        assert dead, "corpus should carry undecodable pass-through rows"
        for r in dead:
            assert r.tp_q15 is None and r.sample_peak is None
            assert not (r.is_tp_over or r.is_hidden_over or r.is_hot)

    def test_dbtp_reporting_column(self, flagged):
        rows, tags = flagged
        for cid, r in rows.items():
            if tags[cid] == "tp_isp":
                # up to ~+1.7 dBTP: the abrupt sine onset rings the
                # interpolator a few % past the analog amplitude
                assert 0.0 < r.tp_dbtp < 2.5
            elif tags[cid] == "tp_hot":
                assert -1.0 < r.tp_dbtp < 0.0

    def test_issue_relation(self, spark, flagged):
        from data_quality_spark.operators.audio_truepeak import (
            truepeak_flags,
            truepeak_issues,
        )
        from data_quality_spark.plans.schemas import CLIPS_SCHEMA

        pdf = make_audio_truepeak_corpus(120, seed=7)
        cols = [f.name for f in CLIPS_SCHEMA.fields]
        clips = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA)
        issues = {
            r.issue_type: r
            for r in truepeak_issues(truepeak_flags(clips)).collect()
        }
        rows, tags = flagged
        n_over = sum(1 for r in rows.values() if r.is_tp_over)
        n_hot_only = sum(
            1 for r in rows.values() if r.is_hot and not r.is_tp_over
        )
        assert issues["true_peak_over"]["count"] == n_over
        assert issues["true_peak_over"].severity == "critical"
        assert issues["true_peak_hot"]["count"] == n_hot_only
        assert issues["true_peak_over"].total == 120
