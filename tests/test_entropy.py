"""Character-entropy audit: closed-form laws on constructed strings,
count correctness vs Counter, fixed-point exactness vs a pure-Python
replay, class separation, guards, and the issue contract.  (The strict
DuckDB twin itself is exercised by scripts/check_oracle.py and the
driver; these tests pin the law.)"""

from __future__ import annotations

import math
from collections import Counter

import pytest

from data_quality_spark.operators.entropy import (
    ENT_ALPHABET,
    ENT_HIGH_Q,
    ENT_LOW_Q,
    ENT_MIN_CHARS,
    ENT_SCALE,
    char_entropy_flags,
    char_entropy_stats,
    entropy_issues,
)


def _py_entropy(text: str | None):
    """Pure-Python replay of the fixed-point law."""
    t = (text or "").lower()
    n = len(t)
    if n == 0:
        return 0, None, None
    cnt = Counter(c if c in _ALPHASET else "<o>" for c in t)
    s = sum(
        math.floor(c * math.log2(c) * ENT_SCALE + 0.5) for c in cnt.values() if c > 0
    )
    ent_num = math.floor(n * math.log2(n) * ENT_SCALE + 0.5) - s
    return n, ent_num, math.floor(ent_num / n)


_ALPHASET = set(ENT_ALPHABET)

CASES = [
    "the quick brown fox jumps over the lazy dog again and again today",
    "ha" * 150,
    "aAbB" * 40,          # lowercased → 2 symbols, 1 bit
    "√π∆" * 30,           # all-other bucket → 0 bits
    "",
    None,
    "Hi!",
    "0123456789 .,!?'" * 8,
]


def test_pure_python_law_on_two_symbol_string():
    n, ent_num, eq = _py_entropy("ha" * 150)
    # exactly 1 bit/char: H = log2(300) - (2*150*log2(150))/300 = 1
    assert abs(eq / ENT_SCALE - 1.0) < 1e-5
    n, ent_num, eq = _py_entropy("√π∆" * 30)  # single (other) symbol class
    assert eq == 0


def test_spark_matches_python_replay(spark):
    rows = [(i, t) for i, t in enumerate(CASES)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in char_entropy_stats(df).collect()}
    for i, t in rows:
        n, ent_num, eq = _py_entropy(t)
        r = got[i]
        assert r["n_chars_ent"] == n, (i, t)
        assert r["ent_num"] == ent_num, (i, t)
        assert r["entropy_q"] == eq, (i, t)


def test_flags_and_guards(spark):
    import base64
    import hashlib

    junk = "".join(
        base64.b64encode(
            bytes.fromhex(hashlib.md5(f"9#{i}".encode()).hexdigest())
        ).decode()
        for i in range(10)
    )
    rows = [
        (0, "the quick brown fox jumps over the lazy dog near the old barn"),
        (1, "ha" * 150),       # low
        (2, junk),             # high
        (3, "ha" * 10),        # low entropy but < MIN_CHARS → no flag
        (4, None),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in char_entropy_flags(df).collect()}
    assert not got[0]["is_low_entropy"] and not got[0]["is_high_entropy"]
    assert got[1]["is_low_entropy"] and not got[1]["is_high_entropy"]
    assert got[2]["is_high_entropy"] and not got[2]["is_low_entropy"]
    assert got[3]["n_chars_ent"] < ENT_MIN_CHARS
    assert not got[3]["is_low_entropy"]
    assert not got[4]["is_low_entropy"] and not got[4]["is_high_entropy"]
    issues = {r["issue_type"]: r for r in entropy_issues(
        char_entropy_flags(df)).collect()}
    assert issues["entropy_low"]["count"] == 1
    assert issues["entropy_high"]["count"] == 1
    assert issues["entropy_low"]["severity"] == "warning"
    assert issues["entropy_high"]["total"] == len(rows)


def test_zero_shuffle_plan(spark):
    """The histogram must be a pure expression tree — no Exchange."""
    df = spark.createDataFrame([(1, "abc")], ["doc_id", "text"])
    plan = char_entropy_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_threshold_sanity():
    assert ENT_LOW_Q == (5 << 20) // 2
    assert ENT_HIGH_Q == (23 << 20) // 5
    # prose band (3.7-4.2 bits) sits strictly between the thresholds
    assert ENT_LOW_Q < math.floor(3.7 * ENT_SCALE)
    assert math.floor(4.23 * ENT_SCALE) < ENT_HIGH_Q
