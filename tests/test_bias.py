"""Filter-bias audit (operators/bias.py): statistical behavior tests.

The Wilson guard is the point of the operator — a low OBSERVED rate in a
tiny group must not flag, while the same rate in a large group must.
Parity of the double algebra itself is covered by the driver oracles
(q: keep_rate_bias strict DuckDB twin, q: gate_bias pure-Python twin);
here we pin the decision semantics on constructed corpora.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_quality_spark.operators.bias import keep_rate_bias


def _mk(spark, groups):
    """groups: dict name -> (n, n_keep) built as one boolean relation."""
    rows = []
    for g, (n, k) in groups.items():
        rows += [(g, i < k) for i in range(n)]
    return spark.createDataFrame(rows, "grp string, keep boolean")


def test_large_biased_group_flags_small_one_does_not(spark):
    # rest of corpus keeps at 80%; both suspect groups observe 40% —
    # far under the four-fifths bar (0.8 * 0.8 = 0.64) — but only the
    # large group's Wilson upper bound clears the noise test
    df = _mk(
        spark,
        {
            "rest": (1000, 800),
            "big_low": (500, 200),   # wilson_up(0.4, n=500) ≈ 0.444 < 0.64
            "tiny_low": (5, 2),      # wilson_up(0.4, n=5) ≈ 0.83 > 0.64
        },
    )
    out = {
        r["grp"]: r.asDict()
        for r in keep_rate_bias(df, "keep", ["grp"]).collect()
    }
    assert out["big_low"]["biased_low"] is True
    assert out["tiny_low"]["biased_low"] is False
    assert out["rest"]["biased_low"] is False
    # the statistic columns are coherent
    b = out["big_low"]
    assert b["n"] == 500 and b["n_keep"] == 200
    assert math.isclose(b["keep_rate"], 0.4)
    assert b["wilson_low"] < 0.4 < b["wilson_up"]
    # comparator excludes the group itself: rest_rate pools the OTHER two
    expected_rest = (800 + 2) / (1000 + 5)
    assert math.isclose(b["rest_rate"], expected_rest)
    assert math.isclose(b["impact_ratio"], 0.4 / expected_rest)


def test_single_group_has_no_comparator(spark):
    df = _mk(spark, {"only": (50, 10)})
    row = keep_rate_bias(df, "keep", ["grp"]).collect()[0]
    assert row["rest_rate"] is None
    assert row["impact_ratio"] is None
    assert row["biased_low"] is False


def test_wilson_bounds_match_closed_form(spark):
    df = _mk(spark, {"a": (100, 30), "b": (100, 90)})
    row = {
        r["grp"]: r for r in keep_rate_bias(df, "keep", ["grp"]).collect()
    }["a"]
    z = 1.96
    p, n = 0.3, 100.0
    denom = 1 + z * z / n
    center = p + z * z / (2 * n)
    half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
    assert math.isclose(row["wilson_low"], (center - half) / denom,
                        rel_tol=1e-12)
    assert math.isclose(row["wilson_up"], (center + half) / denom,
                        rel_tol=1e-12)


def test_zero_keep_group_bounds_stay_in_unit_interval(spark):
    df = _mk(spark, {"dead": (23, 0), "ok": (200, 190)})
    row = {
        r["grp"]: r for r in keep_rate_bias(df, "keep", ["grp"]).collect()
    }["dead"]
    assert row["keep_rate"] == 0.0
    assert -1e-15 <= row["wilson_low"] <= row["wilson_up"] <= 1.0
    assert row["biased_low"] is True  # n=23 at 0% vs 95% rest is decisive


def test_plan_is_one_exchange_plus_broadcast(spark):
    df = _mk(spark, {"a": (30, 10), "b": (40, 30)})
    plan = keep_rate_bias(df, "keep", ["grp"])._jdf.queryExecution() \
        .executedPlan().toString()
    # the corpus aggregates once; the totals come back via broadcast,
    # never a second scan-side exchange
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
