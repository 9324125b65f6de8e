"""Exact-integer z-test anomaly contract."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row


@pytest.mark.usefixtures("spark")
class TestCountAnomalies:
    def _run(self, spark, values, k=3):
        from data_quality_spark.operators.anomaly import count_anomalies

        daily = spark.createDataFrame(
            [Row(key="a", day=f"d{i:02d}", v=int(x))
             for i, x in enumerate(values)])
        return (count_anomalies(daily, ["key"], "v", k=k)
                .orderBy("day").collect())

    def test_spike_is_flagged_and_baseline_is_not(self, spark):
        # k=2: a single spike inflates its own sigma (self-masking), so a
        # 5x spike over a 7-day window sits at |z| ~ 2.45
        rows = self._run(spark, [100, 102, 98, 101, 99, 100, 500], k=2)
        assert [r["is_anomaly"] for r in rows] == [False] * 6 + [True]
        spike = rows[-1]
        assert spike["z"] > 2.0
        assert spike["n_days"] == 7

    def test_constant_series_never_flags(self, spark):
        rows = self._run(spark, [7, 7, 7, 7])
        assert all(not r["is_anomaly"] for r in rows)
        assert all(r["z"] is None for r in rows)
        assert all(r["mean"] == 7.0 for r in rows)

    def test_integer_decision_matches_float_z(self, spark):
        # the integer inequality must agree with the float z-test it
        # rewrites, on a series with values straddling the threshold
        import numpy as np

        rng = np.random.default_rng(3)
        vals = [int(v) for v in rng.integers(50, 150, 40)]
        vals += [400, 0]
        rows = self._run(spark, vals, k=2)
        n = len(vals)
        mu = sum(vals) / n
        sigma = math.sqrt(sum((v - mu) ** 2 for v in vals) / n)
        for r, v in zip(rows, vals):
            want = abs(v - mu) > 2 * sigma
            assert bool(r["is_anomaly"]) == want
            if r["z"] is not None:
                assert abs(r["z"] - (v - mu) / sigma) < 1e-9

    def test_low_side_anomaly(self, spark):
        rows = self._run(spark, [100, 101, 99, 100, 100, 2], k=2)
        assert rows[-1]["is_anomaly"] and rows[-1]["z"] < -2.0

    def test_multiple_series_are_independent(self, spark):
        from data_quality_spark.operators.anomaly import count_anomalies

        # note: with 5 points a lone spike sits at |z| -> 2 from below as
        # it grows (self-masking limit sqrt(n-1)); mix a second high day
        # into spiky so the spike clears k=2 decisively
        daily = spark.createDataFrame(
            [Row(key="steady", day=f"d{i}", v=v)
             for i, v in enumerate([10, 11, 9, 10])]
            + [Row(key="spiky", day=f"d{i}", v=v)
               for i, v in enumerate([10, 11, 9, 10, 60, 70, 9, 11, 10, 300])])
        out = count_anomalies(daily, ["key"], "v", k=2).collect()
        flags = {(r["key"], r["day"]): r["is_anomaly"] for r in out}
        assert flags[("spiky", "d9")]
        assert not any(f for (k, _), f in flags.items() if k == "steady")
