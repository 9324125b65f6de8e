"""Issue-pattern MERGE + daily-trend quality score (ref benchmark_storage.py
:173-279, :282-346 semantics), driven through the relational re-expression
in operators/history.py."""

from __future__ import annotations

from data_quality_spark.operators.history import (
    daily_trends,
    upsert_issue_patterns,
)

ISSUE_SCHEMA = (
    "table string, column string, issue_type string, count long, "
    "total long, percent double, severity string, description string"
)


def _issues(spark, rows):
    return spark.createDataFrame(rows, ISSUE_SCHEMA)


def test_upsert_insert_then_update(spark):
    s1 = _issues(spark, [
        ("t", "a", "nulls", 10, 100, 10.0, "warning", "d"),
        ("t", "b", "nulls", 3, 100, 3.0, "critical", "d"),
    ])
    p1 = upsert_issue_patterns(None, s1, "2024-01-01 00:00:00")
    got1 = {(r["table"], r["column"]): r.asDict() for r in p1.collect()}
    a1 = got1[("t", "a")]
    assert a1["detection_count"] == 1 and not a1["resolved"]
    assert a1["current_count"] == a1["max_count_seen"] == 10
    assert str(a1["first_detected"]) == "2024-01-01 00:00:00"

    # scan 2: 'a' re-detected LOWER and escalated; 'b' not detected; 'c' new
    s2 = _issues(spark, [
        ("t", "a", "nulls", 4, 100, 4.0, "critical", "d"),
        ("t", "c", "orphan", 7, 100, 7.0, "warning", "d"),
    ])
    p2 = upsert_issue_patterns(p1, s2, "2024-01-02 00:00:00")
    got = {(r["table"], r["column"]): r.asDict() for r in p2.collect()}
    a = got[("t", "a")]
    # UPDATE arm (ref :206-248): count +1, current = latest, max = running max
    assert a["detection_count"] == 2
    assert a["current_count"] == 4 and a["max_count_seen"] == 10
    assert a["current_percentage"] == 4.0 and a["max_percentage_seen"] == 10.0
    assert a["current_severity"] == "critical"
    assert a["max_severity_seen"] == "critical"
    assert str(a["first_detected"]) == "2024-01-01 00:00:00"
    assert str(a["last_detected"]) == "2024-01-02 00:00:00"
    b = got[("t", "b")]
    # untouched pattern keeps every stored value
    assert b["detection_count"] == 1
    assert str(b["last_detected"]) == "2024-01-01 00:00:00"
    c = got[("t", "c")]
    # INSERT arm (ref :249-279)
    assert c["detection_count"] == 1 and c["max_count_seen"] == 7


def test_upsert_severity_max_is_sticky(spark):
    """A pattern that was once critical stays max_severity_seen=critical
    even when the current scan reports it as warning (ref :212-220)."""
    s1 = _issues(spark, [("t", "a", "nulls", 9, 10, 90.0, "critical", "d")])
    s2 = _issues(spark, [("t", "a", "nulls", 1, 10, 10.0, "warning", "d")])
    p = upsert_issue_patterns(
        upsert_issue_patterns(None, s1, "2024-01-01 00:00:00"),
        s2, "2024-01-02 00:00:00",
    )
    row = p.collect()[0]
    assert row["current_severity"] == "warning"
    assert row["max_severity_seen"] == "critical"
    assert row["max_percentage_seen"] == 90.0


def test_pattern_store_roundtrip(spark, tmp_path):
    """PatternStore persists the MERGE across process-style boundaries:
    scan 1 recorded, scan 2 merged on re-read, atomic directory swap."""
    from data_quality_spark.sources.io import PatternStore

    store = PatternStore(str(tmp_path))
    assert store.read(spark) is None
    s1 = _issues(spark, [("t", "a", "nulls", 10, 100, 10.0, "warning", "d")])
    p1 = store.record_scan(spark, s1, "2024-01-01 00:00:00")
    assert p1.count() == 1
    # fresh read (as a new run would) then merge scan 2
    s2 = _issues(spark, [("t", "a", "nulls", 2, 100, 2.0, "critical", "d"),
                         ("t", "b", "orphan", 1, 100, 1.0, "warning", "d")])
    p2 = store.record_scan(spark, s2, "2024-01-02 00:00:00")
    got = {(r["table"], r["column"]): r.asDict() for r in p2.collect()}
    a = got[("t", "a")]
    assert a["detection_count"] == 2 and a["max_count_seen"] == 10
    assert a["current_count"] == 2 and a["max_severity_seen"] == "critical"
    assert got[("t", "b")]["detection_count"] == 1
    # store survives a re-open
    assert PatternStore(str(tmp_path)).read(spark).count() == 2


def test_daily_trends_piecewise_score(spark):
    bench = spark.createDataFrame(
        [
            # day 1: clean scan (100) + warning-only scan (80-2*3=74)
            ("2024-01-01 01:00:00", 0, 0, 100, True),
            ("2024-01-01 02:00:00", 0, 3, 300, True),
            # day 2: critical scan (50-10*2=30), not deployment safe
            ("2024-01-02 01:00:00", 2, 5, 200, False),
        ],
        "scan_timestamp string, critical_issues long, warning_issues long, "
        "scan_duration_ms long, deployment_safe boolean",
    ).selectExpr(
        "CAST(scan_timestamp AS timestamp) AS scan_timestamp",
        "critical_issues", "warning_issues", "scan_duration_ms",
        "deployment_safe",
    )
    rows = {r["date_recorded"]: r.asDict() for r in daily_trends(bench).collect()}
    d1, d2 = rows["2024-01-01"], rows["2024-01-02"]
    assert d1["scans_performed"] == 2 and d2["scans_performed"] == 1
    assert d1["quality_score"] == (100.0 + 74.0) / 2    # ref :301-305
    assert d2["quality_score"] == 30.0
    assert d1["deployment_success_rate"] == 100.0
    assert d2["deployment_success_rate"] == 0.0
    assert d1["avg_scan_time_ms"] == 200.0
    assert d1["avg_warning_issues"] == 1.5
