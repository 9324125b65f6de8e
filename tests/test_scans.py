"""Unit tests for the fused rule compiler + scans, mirroring the reference's
seeded-defect style (/root/reference/tests/test_quality_scanner.py:85-150)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_quality_spark.operators import (
    compile_rules,
    completeness,
    health_check,
    scan_duplicate_groups,
    scan_duplicates,
    scan_nulls,
    scan_orphans,
    severity_summary,
)
from data_quality_spark.operators.rules import Rule
from data_quality_spark.plans.report import exit_code_for
from data_quality_spark.plans.schemas import Severity


def users_df(spark):
    # 4 rows, 2 null emails → nulls count=2 total=4 percent=50.0
    # (golden counts per FIXTURES.md group A / reference test seeding)
    return spark.createDataFrame(
        [
            (1, "a@x.com", "US"),
            (2, None, "US"),
            (3, None, "DE"),
            (4, "d@x.com", None),
        ],
        "user_id long, email string, country string",
    )


def test_scan_nulls_counts_and_severity(spark):
    issues = {r["column"]: r.asDict() for r in scan_nulls(users_df(spark), "users").collect()}
    assert "email" in issues
    e = issues["email"]
    assert e["count"] == 2 and e["total"] == 4 and e["percent"] == 50.0
    assert e["issue_type"] == "nulls"
    # F9 (quality_scanner.py:572-585): only id/key/isrc cols are critical;
    # email at exactly 50% nulls is not >50% → info
    assert e["severity"] == Severity.INFO.value
    # user_id has no nulls → no issue emitted (reference emits only count>0)
    assert "user_id" not in issues


def test_null_severity_non_key_column(spark):
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "x"), (4, None)], "pk long, note string"
    )
    rows = scan_nulls(df, "t", columns=["note"]).collect()
    assert rows[0]["severity"] == Severity.WARNING.value  # 75% > 50%
    rows2 = scan_nulls(
        spark.createDataFrame([(1, None), (2, "x"), (3, "y"), (4, "z")], "pk long, note string"),
        "t",
        columns=["note"],
    ).collect()
    assert rows2[0]["severity"] == Severity.INFO.value  # 25% ≤ 50%


def test_scan_orphans_anti_join(spark):
    parent = spark.createDataFrame([(1,), (2,)], "id long")
    child = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 99), (13, None)], "cid long, parent_id long"
    )
    issues = scan_orphans(
        {"child": child, "parent": parent},
        {"child": [("parent_id", "parent", "id")]},
    ).collect()
    assert len(issues) == 1
    i = issues[0].asDict()
    # NULL fk is NOT an orphan (reference guards fk IS NOT NULL)
    assert i["count"] == 1 and i["total"] == 4
    assert i["severity"] == Severity.CRITICAL.value
    assert i["issue_type"] == "orphan"


def test_scan_duplicates_extra_rows_vs_groups(spark):
    df = spark.createDataFrame(
        [(1, "AA-AAA-00-00001"), (2, "AA-AAA-00-00001"), (3, "AA-AAA-00-00001"),
         (4, "BB-BBB-00-00002"), (5, None)],
        "id long, isrc string",
    )
    # A7: extra rows = count(isrc) - count(distinct isrc) = 4 - 2 = 2
    a7 = {r["column"]: r["count"] for r in scan_duplicates(df, "t", ["isrc"]).collect()}
    assert a7["isrc"] == 2
    # A8: duplicate groups = 1 (only the triple)
    a8 = scan_duplicate_groups(df, "t", ["isrc"]).collect()
    assert a8[0]["count"] == 1


def test_completeness_triple_one_pass(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, ""), (3, None), (4, "y")], "id long, v string"
    )
    rows = {r["column"]: r.asDict() for r in completeness(df, "t").collect()}
    v = rows["v"]
    assert v["filled_count"] == 2 and v["null_count"] == 1 and v["empty_string_count"] == 1
    assert v["fill_percentage"] == 50.0 and v["category"] == "poor"
    assert rows["id"]["category"] == "perfect"


def test_compile_rules_scoped_and_range(spark):
    # range rule over non-null scope, ref checkpoints.py:178-214
    df = spark.createDataFrame(
        [(0.5,), (1.5,), (-0.1,), (None,)], "confidence double"
    )
    rules = [
        Rule(
            name="confidence_range",
            column="confidence",
            predicate=lambda d: (d.confidence < 0) | (d.confidence > 1),
            scope=lambda d: d.confidence.isNotNull(),
            severity=Severity.CRITICAL.value,
        )
    ]
    r = compile_rules(df, "parsed", rules).collect()[0].asDict()
    assert r["count"] == 2 and r["total"] == 3  # scoped denominator


def test_health_check_report_and_exit_codes(spark):
    parent = spark.createDataFrame([(1, "p")], "id long, name string")
    child = spark.createDataFrame(
        [(1, 1, None), (2, 99, "c")], "cid long, parent_id long, email string"
    )
    rep = health_check(
        {"parent": parent, "child": child},
        {"child": [("parent_id", "parent", "id")]},
    )
    assert not rep.all_good
    assert rep.summary["critical"] >= 1
    assert rep.scan_time_ms > 0
    assert exit_code_for(rep) == 2
    assert exit_code_for(rep, fail_on="none") == 0


def test_severity_summary(spark):
    df = spark.createDataFrame(
        [(1, None), (2, None)], "some_id long, email string"
    )
    issues = scan_nulls(df, "t")
    s = {r["severity"]: r["n_issues"] for r in severity_summary(issues).collect()}
    # email 100% null → >50% → warning (F9); some_id has no nulls → no issue
    assert s.get("warning", 0) == 1 and len(s) == 1


def test_scan_duplicates_approx_close_to_exact(spark, sf_dir):
    from data_quality_spark.operators.scans import scan_duplicates, scan_duplicates_approx

    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exact = {
        r["column"]: r["count"]
        for r in scan_duplicates(df, "lineitem", ["l_orderkey"], keep_zero=True).collect()
    }
    approx = {
        r["column"]: r["count"]
        for r in scan_duplicates_approx(df, "lineitem", ["l_orderkey"], keep_zero=True).collect()
    }
    ex, ap = exact["l_orderkey"], approx["l_orderkey"]
    assert ex > 0
    assert abs(ap - ex) <= max(0.05 * ex, 10)   # HLL++ within a few % + slack


def test_profile_numeric_one_pass(spark, sf_dir):
    from data_quality_spark.operators.scans import profile_numeric

    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    prof = {
        r["column"]: r
        for r in profile_numeric(df, "lineitem", ["l_quantity", "l_discount"]).collect()
    }
    q = prof["l_quantity"]
    assert q["nulls"] == 0 and q["non_null"] == df.count()
    assert 1.0 <= q["min"] < q["p50"] < q["p99"] <= q["max"] <= 50.0
    assert q["min"] <= q["mean"] <= q["max"] and q["stddev"] > 0
    d = prof["l_discount"]
    assert 0.0 <= d["min"] <= d["max"] <= 0.1 + 1e-9


def test_scan_freshness(spark, sf_dir):
    from data_quality_spark.operators.scans import scan_freshness

    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    # events span Jan-Feb 2024; as_of a few hours after the max → info
    fresh = scan_freshness(df, "events", "ts", "2024-03-01 00:00:00",
                           warn_hours=24 * 60, crit_hours=24 * 365).collect()[0]
    assert fresh["issue_type"] == "freshness"
    assert fresh["percent"] > 0          # lag hours
    assert fresh["severity"] == "info"
    stale = scan_freshness(df, "events", "ts", "2024-03-01 00:00:00",
                           warn_hours=1.0, crit_hours=2.0).collect()[0]
    assert stale["severity"] == "critical"


def test_freshness_null_lag_is_critical(spark):
    """An empty table / all-NULL ts is the WORST staleness case and must
    gate critical, not fall through the thresholds to info."""
    from data_quality_spark.operators.scans import scan_freshness

    empty = spark.createDataFrame([], "ts timestamp")
    r = scan_freshness(empty, "t", "ts", "2024-01-01 00:00:00").collect()[0]
    assert r["severity"] == "critical"
    assert "no timestamped rows" in r["description"]
    allnull = spark.createDataFrame([(None,), (None,)], "ts timestamp")
    r2 = scan_freshness(allnull, "t", "ts", "2024-01-01 00:00:00").collect()[0]
    assert r2["severity"] == "critical" and r2["total"] == 0


def test_orphan_scan_single_pass_over_child(spark):
    """Scale property: ALL of a child's FKs resolve in ONE pass — the plan
    contains exactly one scan of the child relation (chained left joins +
    fused aggregate), and no forced broadcast hint survives in the parsed
    plan (strategy is Catalyst/AQE's choice)."""
    from data_quality_spark.operators.scans import scan_orphans

    child = spark.createDataFrame(
        [(1, 10, 100), (2, 99, 100), (3, 10, 999)],
        "id long, a_id long, b_id long",
    )
    pa_ = spark.createDataFrame([(10,)], "pk long")
    pb = spark.createDataFrame([(100,)], "pk long")
    issues = scan_orphans(
        {"child": child, "pa": pa_, "pb": pb},
        {"child": [("a_id", "pa", "pk"), ("b_id", "pb", "pk")]},
    )
    got = {r["column"]: r["count"] for r in issues.collect()}
    assert got == {"a_id": 1, "b_id": 1}
    plan = issues._jdf.queryExecution().optimizedPlan().toString()
    # the child LocalRelation/Scan appears once; each parent once
    assert plan.count("a_id") >= 1
    assert "ResolvedHint" not in plan and "broadcast" not in plan.lower()
    # one fused counting aggregate + one dedup aggregate per parent —
    # NOT one aggregate per FK over the child
    n_aggs = plan.count("Aggregate")
    assert n_aggs <= 1 + 2
