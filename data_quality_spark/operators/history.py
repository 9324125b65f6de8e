"""Issue-pattern history (MERGE-style upsert) + daily quality trends.

The reference tracks each (database, table, column, issue_type) pattern
across scans — first/last detected, detection count, current vs max
count/percent/severity — via a per-issue SELECT-then-UPDATE/INSERT loop
(``/root/reference/src/data_quality/benchmark_storage.py:173-279``), and
rolls scans up into daily trends with a piecewise 0-100 quality score
(``benchmark_storage.py:282-346``).

Spark-first re-expression: the upsert is ONE relational merge — the new
scan's issues are projected into pattern shape and unioned with the
existing pattern table, then a single ``groupBy(pattern key)`` resolves
every MERGE rule with ordinary aggregates (``min`` first-detected, ``max``
last-detected, ``sum`` detection counts, ``max_by(value, last_detected)``
for the "current_*" columns, plain ``max`` for the "max_*_seen" columns,
rank-max for severity).  No per-issue driver round trips: the pattern
relation is O(#distinct issue patterns) — thousands of rows at 100 TB —
and the merge is one tiny shuffle on the pattern key.  On a real catalog
this maps 1:1 onto ``MERGE INTO`` (Iceberg); the parquet fallback persists
via read-union-rewrite of the same relation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "PATTERN_KEY",
    "issues_as_patterns",
    "upsert_issue_patterns",
    "daily_trends",
    "quality_score_col",
]

PATTERN_KEY = ["table", "column", "issue_type"]

# ref benchmark_storage.py:213 — severity_order = {info:1, warning:2, critical:3}
def _sev_array() -> Column:
    # built lazily: Column construction needs an active SparkContext
    return F.array(F.lit("info"), F.lit("warning"), F.lit("critical"))


def _sev_rank(col: Column) -> Column:
    # unknown severities rank lowest, matching the reference's .get(sev, 1)
    return F.coalesce(F.array_position(_sev_array(), col).cast("int"), F.lit(1))


def issues_as_patterns(issues: DataFrame, scan_ts: str) -> DataFrame:
    """Project one scan's QualityIssue relation into pattern shape — the
    INSERT arm of the reference's upsert (benchmark_storage.py:249-279):
    first = last = this scan, detection_count = 1, current = max = scanned
    values, resolved = FALSE."""
    ts = F.lit(scan_ts).cast("timestamp")
    return issues.select(
        "table",
        "column",
        "issue_type",
        ts.alias("first_detected"),
        ts.alias("last_detected"),
        F.lit(1).cast("long").alias("detection_count"),
        F.col("severity").alias("current_severity"),
        F.col("severity").alias("max_severity_seen"),
        F.col("count").cast("long").alias("current_count"),
        F.col("count").cast("long").alias("max_count_seen"),
        F.col("percent").cast("double").alias("current_percentage"),
        F.col("percent").cast("double").alias("max_percentage_seen"),
        F.lit(False).alias("resolved"),
    )


def upsert_issue_patterns(
    existing: DataFrame | None, issues: DataFrame, scan_ts: str
) -> DataFrame:
    """MERGE one scan into the pattern table (ref benchmark_storage.py:
    184-279) as a single union + keyed aggregate:

    - ``first_detected`` = min over arms (existing keeps its origin);
    - ``last_detected``  = max (re-detected patterns advance);
    - ``detection_count`` = sum (+1 per scan that saw the pattern);
    - ``current_*`` = the value carried by the latest-detected arm
      (``max_by(col, last_detected)`` — the UPDATE's SET current_*);
    - ``max_count_seen`` / ``max_percentage_seen`` = plain max;
    - ``max_severity_seen`` = rank-max over info<warning<critical
      (ref :213-220);
    - ``resolved`` = latest arm's flag — a re-detected pattern carries
      FALSE from the scan arm (the UPDATE's ``resolved = FALSE``), an
      undetected one keeps its stored value.
    """
    fresh = issues_as_patterns(issues, scan_ts)
    merged = fresh if existing is None else existing.unionByName(fresh)
    sev_decoded = F.element_at(
        _sev_array(), F.max(_sev_rank(F.col("max_severity_seen")))
    )
    return merged.groupBy(*PATTERN_KEY).agg(
        F.min("first_detected").alias("first_detected"),
        F.max("last_detected").alias("last_detected"),
        F.sum("detection_count").cast("long").alias("detection_count"),
        F.max_by("current_severity", "last_detected").alias("current_severity"),
        sev_decoded.alias("max_severity_seen"),
        F.max_by("current_count", "last_detected").cast("long")
        .alias("current_count"),
        F.max("max_count_seen").cast("long").alias("max_count_seen"),
        F.max_by("current_percentage", "last_detected").cast("double")
        .alias("current_percentage"),
        F.max("max_percentage_seen").cast("double").alias("max_percentage_seen"),
        F.max_by("resolved", "last_detected").alias("resolved"),
    )


def quality_score_col(critical: Column, warning: Column) -> Column:
    """The reference's piecewise per-scan quality score
    (benchmark_storage.py:301-305):

    - 0 critical and 0 warning → 100
    - 0 critical               → 80 − 2·warnings
    - otherwise                → 50 − 10·criticals
    """
    return (
        F.when((critical == 0) & (warning == 0), F.lit(100.0))
        .when(critical == 0, F.lit(80.0) - warning * F.lit(2.0))
        .otherwise(F.lit(50.0) - critical * F.lit(10.0))
    )


def daily_trends(benchmarks: DataFrame) -> DataFrame:
    """Daily rollup of a scan-benchmarks relation (ref benchmark_storage.py:
    292-312): scans performed, avg critical/warning, avg scan time,
    deployment success rate, avg piecewise quality score.

    Expects columns ``scan_timestamp`` (timestamp), ``critical_issues``,
    ``warning_issues`` (long), ``scan_duration_ms`` (long),
    ``deployment_safe`` (boolean).  Averages are computed as exact integer
    sums divided once, so partial-aggregate merge order can never move the
    last ulp (the repo's float-determinism law)."""
    day = F.date_format(F.col("scan_timestamp"), "yyyy-MM-dd").alias(
        "date_recorded"
    )
    score = quality_score_col(
        F.col("critical_issues").cast("long"), F.col("warning_issues").cast("long")
    )
    n = F.count(F.lit(1))
    return (
        benchmarks.groupBy(day)
        .agg(
            n.cast("long").alias("scans_performed"),
            (F.sum("critical_issues").cast("double") / n)
            .alias("avg_critical_issues"),
            (F.sum("warning_issues").cast("double") / n)
            .alias("avg_warning_issues"),
            (F.sum("scan_duration_ms").cast("double") / n)
            .alias("avg_scan_time_ms"),
            (
                F.sum(F.col("deployment_safe").cast("long")).cast("double")
                * 100.0 / n
            ).alias("deployment_success_rate"),
            # per-scan scores are small exact doubles (100 / 80-2w / 50-10c);
            # their sum over longs-derived values is exact, one division
            (F.sum(score) / n).cast("double").alias("quality_score"),
        )
        .orderBy("date_recorded")
    )
