"""Dropout / stuck-sample / DC-offset detection.

The vectorized diff-boundary kernel is checked against the naive
per-sample state machine (`oracles._dropout_naive`) on hand-built defect
arrays and random fuzz; the Spark operator is checked for flag laws,
decode-failure totality, and batch-layout invariance.
"""

from __future__ import annotations

import numpy as np
import pytest

from data_quality_spark.functions.audio import encode_mulaw, encode_pcm16
from data_quality_spark.functions.dropout import dropout_stats_i16
from data_quality_spark.oracles import _dropout_naive

SR = 16000
MIN_RUN = (SR * 30) // 1000  # 480 samples at the default 30 ms


def _sig(n, seed=0, lo=-2000, hi=2000):
    rng = np.random.default_rng(seed)
    x = rng.integers(lo, hi, n).astype(np.int16)
    x[x == 0] = 17  # keep the background zero-free
    return x


class TestKernel:
    def test_interior_dropout_counted_edges_excluded(self):
        x = _sig(SR)
        x[:600] = 0          # leading silence: excluded
        x[5000:5600] = 0     # interior 600 ≥ 480: dropout
        x[-700:] = 0         # trailing silence: excluded
        st = dropout_stats_i16(x, SR)
        assert st["n_dropouts"] == 1
        assert st["dropout_samples"] == 600
        assert st["max_zero_run"] == 700

    def test_threshold_law_exact(self):
        x = _sig(SR)
        x[2000 : 2000 + MIN_RUN - 1] = 0
        assert dropout_stats_i16(x, SR)["n_dropouts"] == 0
        x = _sig(SR)
        x[2000 : 2000 + MIN_RUN] = 0
        assert dropout_stats_i16(x, SR)["n_dropouts"] == 1

    def test_sr_zero_counts_every_interior_run(self):
        x = _sig(1000)
        x[100:103] = 0
        assert dropout_stats_i16(x, 0)["n_dropouts"] == 1

    def test_stuck_run_nonzero_only(self):
        x = _sig(4000)
        x[1000:1200] = 7777
        st = dropout_stats_i16(x, SR)
        assert st["max_const_run"] == 200
        # an all-zero plateau is a dropout, not a stuck run
        y = np.zeros(4000, dtype=np.int16)
        assert dropout_stats_i16(y, SR)["max_const_run"] == 0

    def test_dc_sum_exact(self):
        x = np.full(1000, 800, dtype=np.int16)
        assert dropout_stats_i16(x, SR)["dc_sum"] == 800_000

    def test_empty_and_degenerate_totality(self):
        z = dropout_stats_i16(np.zeros(0, dtype=np.int16), SR)
        assert z["n_samples"] == 0 and z["max_const_run"] == 0
        one = dropout_stats_i16(np.array([5], dtype=np.int16), SR)
        assert one["max_const_run"] == 1 and one["max_zero_run"] == 0

    @pytest.mark.parametrize("seed", range(8))
    def test_fuzz_vs_naive_state_machine(self, seed):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(1, 5000))
        x = rng.integers(-50, 50, n).astype(np.int16)  # dense zero/const runs
        for _ in range(int(rng.integers(0, 6))):       # seeded long runs
            s = int(rng.integers(0, n))
            ln = int(rng.integers(1, max(n // 3, 2)))
            x[s : s + ln] = int(rng.integers(-3, 4))
        sr = int(rng.choice([0, 50, 16000]))
        assert dropout_stats_i16(x, sr) == _dropout_naive(x, sr)

    def test_survives_mulaw_roundtrip(self):
        # exact zeros survive µ-law encode/decode, so dropouts stay visible
        from data_quality_spark.functions.audio import _decode_i16

        x = _sig(SR)
        x[4000:4600] = 0
        q = _decode_i16(encode_mulaw(x.astype(np.float64) / 32767.0), "mulaw", SR)
        assert dropout_stats_i16(q, SR)["n_dropouts"] == 1


class TestOperator:
    @pytest.fixture(scope="class")
    def stats(self, spark):
        from data_quality_spark.operators.audio_dropout import (
            clip_dropout,
            dropout_flags,
        )

        dc = np.full(2000, 1200, dtype=np.int16)  # |mean|=1200 > 655.36
        stuck = _sig(3000, seed=1)
        stuck[500:600] = 9999
        drop = _sig(SR, seed=2)
        drop[6000:6600] = 0
        rows = [
            ("c_dc", encode_pcm16(dc.astype(np.float64) / 32767.0), SR, "pcm16"),
            ("c_stuck", encode_pcm16(stuck.astype(np.float64) / 32767.0), SR, "pcm16"),
            ("c_drop", encode_pcm16(drop.astype(np.float64) / 32767.0), SR, "pcm16"),
            ("c_bad", b"\x00\x01\x02", SR, "what"),
        ]
        df = spark.createDataFrame(
            rows, "clip_id string, bytes binary, sr_hz int, codec string"
        )
        out = dropout_flags(clip_dropout(df))
        return {r["clip_id"]: r.asDict() for r in out.collect()}

    def test_flags(self, stats):
        assert stats["c_dc"]["has_dc_offset"] and not stats["c_dc"]["has_dropout"]
        assert stats["c_stuck"]["has_stuck"]
        assert stats["c_drop"]["has_dropout"] and not stats["c_drop"]["has_stuck"]

    def test_decode_failure_is_total(self, stats):
        bad = stats["c_bad"]
        assert bad["ok"] is False
        assert bad["n_samples"] is None and bad["has_dropout"] is None

    def test_exact_integers(self, stats):
        assert stats["c_dc"]["dc_sum"] == 2000 * 1200
        assert stats["c_stuck"]["max_const_run"] == 100
        assert stats["c_drop"]["dropout_samples"] == 600

    def test_partitioning_invariance(self, spark):
        from data_quality_spark.operators.audio_dropout import clip_dropout

        rng = np.random.default_rng(3)
        rows = []
        for i in range(12):
            x = _sig(2000, seed=10 + i)
            if i % 3 == 0:
                x[700 : 700 + MIN_RUN // 4] = 0
            rows.append(
                (f"c{i:02d}", encode_pcm16(x.astype(np.float64) / 32767.0), 2000, "pcm16")
            )
        df = spark.createDataFrame(
            rows, "clip_id string, bytes binary, sr_hz int, codec string"
        )
        one = sorted(map(tuple, clip_dropout(df.coalesce(1)).collect()))
        many = sorted(map(tuple, clip_dropout(df.repartition(5)).collect()))
        assert one == many
