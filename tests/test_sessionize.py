"""Tests for gap-based event sessionization (window operators)."""

from __future__ import annotations

from datetime import datetime

from data_quality_spark.operators.events import (
    session_stats,
    sessionize,
    user_session_counts,
)


def _ts(minute: int):
    return datetime(2026, 1, 1, 10, minute)


def test_sessionize_gap_boundaries(spark):
    rows = [
        (1, _ts(0)), (1, _ts(10)), (1, _ts(45)),   # 10' then 35' gap → 2 sessions
        (2, _ts(5)),                                # single event → 1 session
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    s = sessionize(df, gap_minutes=30)
    got = {(r.user_id, r.ts.minute): r.session_idx for r in s.collect()}
    assert got[(1, 0)] == 1 and got[(1, 10)] == 1 and got[(1, 45)] == 2
    assert got[(2, 5)] == 1

    counts = {r.user_id: (r.n_sessions, r.n_events)
              for r in user_session_counts(df, gap_minutes=30).collect()}
    assert counts == {1: (2, 3), 2: (1, 1)}


def test_exact_gap_is_same_session(spark):
    # gap strictly greater than the threshold starts a new session; an
    # exactly-30-minute gap stays in-session (ts > prev + 30' is false)
    rows = [(1, _ts(0)), (1, _ts(30))]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    counts = user_session_counts(df, gap_minutes=30).collect()[0]
    assert counts.n_sessions == 1


def test_null_timestamps_excluded(spark):
    # NULL-ts events belong to no session; without the filter Spark's
    # NULLS FIRST vs DuckDB's NULLS LAST window ordering diverges
    rows = [(1, _ts(0)), (1, None), (1, None), (1, _ts(10))]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    r = user_session_counts(df, gap_minutes=30).collect()[0]
    assert (r.n_sessions, r.n_events) == (1, 2)


def test_session_stats(spark):
    rows = [(1, _ts(0)), (1, _ts(10)), (1, _ts(45))]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    stats = {
        r.session_idx: (r.n_events, r.duration_s)
        for r in session_stats(sessionize(df, gap_minutes=30)).collect()
    }
    assert stats[1] == (2, 600.0)
    assert stats[2] == (1, 0.0)
