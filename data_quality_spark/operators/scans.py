"""Table scans: nulls, orphans, duplicates, completeness, health check.

Spark-first re-expression of the reference scanners:

- ``scan_nulls``    ← ``quality_scanner.py:46-128`` (C1) — but ONE fused agg
  per table instead of one query per (table, column).
- ``scan_orphans``  ← ``quality_scanner.py:131-209,448-467`` (C2/J1) +
  composite keys ← ``safe_scanners.py:71-79`` (J2) — one chained-left-join
  pass per child with a fused total+orphan-counts aggregate; join strategy
  left to Catalyst/AQE (broadcast picked at runtime when a parent is small).
- ``scan_duplicates``       ← ``quality_scanner.py:470-569`` (C3/A7)
  distinct-diff counts (counts *extra rows*).
- ``scan_duplicate_groups`` ← ``safe_scanners.py:144-190`` (A8)
  grouped HAVING count (counts *groups*) — deliberately kept distinct from
  A7; they are different operators (SURVEY.md §7.3).
- ``completeness`` ← ``advanced_analysis.py:300-368`` (A9-A11): the reference
  issues THREE queries per column; here all 3×N counters come out of a single
  scan.
- ``health_check`` ← ``quality_scanner.py:212-271`` (C4): lazy unionByName of
  the three scans — one Spark job when the caller finally acts.

Key-column inference (P1/P2) mirrors the reference's name patterns
(``quality_scanner.py:343-348``, ``null_scan.py:15``).
"""

from __future__ import annotations

import time
from functools import reduce
from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..plans.report import HealthReport, severity_rank_col
from ..plans.schemas import ISSUE_SCHEMA, Severity
from .rules import Rule, compile_rules, null_severity

__all__ = [
    "key_columns",
    "unique_candidate_columns",
    "scan_nulls",
    "scan_orphans",
    "scan_empty_records",
    "scan_duplicates",
    "scan_duplicates_approx",
    "scan_freshness",
    "profile_numeric",
    "scan_duplicate_groups",
    "completeness",
    "table_completeness",
    "database_completeness",
    "health_check",
    "severity_summary",
    "empty_issues",
]

# P1: key-ish name patterns, ref quality_scanner.py:343-348 / null_scan.py:15
KEY_PATTERNS = ("id", "key", "isrc", "email", "_code", "_number")
# P2: unique-candidate patterns, ref quality_scanner.py:511-551
UNIQUE_PATTERNS = ("isrc", "_code", "_number", "_id")


def empty_issues(spark) -> DataFrame:
    return spark.createDataFrame([], ISSUE_SCHEMA)


def key_columns(df: DataFrame) -> list[str]:
    return [
        c for c in df.columns if any(p in c.lower() for p in KEY_PATTERNS)
    ]


def unique_candidate_columns(df: DataFrame) -> list[str]:
    return [
        c for c in df.columns if any(p in c.lower() for p in UNIQUE_PATTERNS)
    ]


def scan_nulls(
    df: DataFrame,
    table: str,
    columns: Sequence[str] | None = None,
    keep_zero: bool = False,
) -> DataFrame:
    """Null counts on key-ish columns → issues (one fused agg pass).

    ``keep_zero=True`` emits a row per checked column even when clean
    (count=0, severity=info) — the auditable "what was checked" relation.
    """
    cols = list(columns) if columns is not None else key_columns(df)
    rules = [
        Rule(
            name="nulls",
            column=c,
            predicate=lambda d, c=c: d[c].isNull(),
            severity=null_severity(c),
            description=f"{c} has NULL values",
        )
        for c in cols
    ]
    return compile_rules(df, table, rules, keep_zero=keep_zero)


def _normalize_fk(entry) -> tuple[tuple[str, ...], str, tuple[str, ...], bool]:
    """fk_map entry → (fk_cols, parent_table, parent_cols, is_composite)."""
    fk, parent_name, pk = entry
    if isinstance(fk, str):
        return (fk,), parent_name, (pk,), False
    return tuple(fk), parent_name, tuple(pk), True


def scan_orphans(
    tables: Mapping[str, DataFrame],
    fk_map: Mapping[str, Sequence[tuple]],
) -> DataFrame:
    """FK orphan counts → critical issues, one join pass per child table.

    ``fk_map``: child table → list of FK declarations, each either

    - ``(fk_col, parent_table, parent_col)`` — single-column FK with the
      reference's child-NOT-NULL guard (quality_scanner.py:453-461): orphans
      are non-null fks with no parent; ``total`` counts all child rows;
    - ``((fk_col, ...), parent_table, (parent_col, ...))`` — composite FK
      mirroring the reference's multi-column outer-join scan
      (safe_scanners.py:71-79): plain LEFT OUTER JOIN on the AND of the key
      pairs, orphan ⇔ every referred parent column is NULL (no child guard —
      a NULL component fails the join and counts, exactly as the reference's
      ``and_(*[parent.c[r].is_(None)])`` does).

    (Spark has no FK metadata, so the map is declared — the reference
    discovers it from information_schema, quality_scanner.py:421-445.)

    Scale shape: ALL of a child's FKs resolve in one chained-left-join pass
    over deduped parent keys, and the total + every orphan count come out of
    a single fused aggregate — no per-FK rescan of the child, no eager
    driver-side ``count()`` jobs.  Join strategy is left to Catalyst/AQE: a
    real FK parent is usually the small dim and AQE converts the join to
    broadcast at runtime from observed sizes; forcing the hint here would
    OOM every executor the day a parent is 10^9 rows.
    """
    parts: list[DataFrame] = []
    for child_name, fks in fk_map.items():
        entries = [_normalize_fk(e) for e in fks]
        if not entries:
            continue
        base = tables[child_name]
        for j, (fk_cols, parent_name, pk_cols, _comp) in enumerate(entries):
            pk_alias = [f"__pk{j}_{i}__" for i in range(len(pk_cols))]
            parent = (
                tables[parent_name]
                .select(*[F.col(pc).alias(a) for pc, a in zip(pk_cols, pk_alias)])
                .dropDuplicates()
            )
            cond = reduce(
                lambda a, b: a & b,
                [F.col(fc) == F.col(a) for fc, a in zip(fk_cols, pk_alias)],
            )
            base = base.join(parent, cond, "left")
        aggs: list[Column] = [F.count(F.lit(1)).cast("long").alias("__total__")]
        for j, (fk_cols, _pn, pk_cols, comp) in enumerate(entries):
            missing = reduce(
                lambda a, b: a & b,
                [
                    F.col(f"__pk{j}_{i}__").isNull()
                    for i in range(len(pk_cols))
                ],
            )
            guard = F.lit(True) if comp else F.col(fk_cols[0]).isNotNull()
            aggs.append(
                F.sum(F.when(guard & missing, 1).otherwise(0))
                .cast("long")
                .alias(f"__o{j}__")
            )
        wide = base.agg(*aggs)
        structs = []
        for j, (fk_cols, parent_name, pk_cols, comp) in enumerate(entries):
            count = F.col(f"__o{j}__")
            total = F.col("__total__")
            if comp:
                desc = (
                    f"({','.join(fk_cols)}) references missing "
                    f"{parent_name}({','.join(pk_cols)})"
                )
            else:
                desc = f"{fk_cols[0]} references missing {parent_name}.{pk_cols[0]}"
            structs.append(
                F.struct(
                    F.lit(child_name).alias("table"),
                    F.lit(",".join(fk_cols)).cast("string").alias("column"),
                    F.lit("orphan").alias("issue_type"),
                    count.alias("count"),
                    total.alias("total"),
                    F.when(total > 0, count * 100.0 / total)
                    .otherwise(F.lit(0.0))
                    .cast("double")
                    .alias("percent"),
                    F.when(count > 0, F.lit(Severity.CRITICAL.value))
                    .otherwise(F.lit(Severity.INFO.value))
                    .alias("severity"),
                    F.lit(desc).alias("description"),
                )
            )
        parts.append(
            wide.select(F.explode(F.array(*structs)).alias("i"))
            .select("i.*")
            .filter(F.col("count") > 0)
        )
    if not parts:
        raise ValueError("empty fk_map")
    return reduce(lambda a, b: a.unionByName(b), parts)


def scan_empty_records(
    df: DataFrame,
    table: str,
    exclude: Sequence[str] = ("id", "created_at", "updated_at"),
    max_cols: int = 5,
) -> DataFrame:
    """P6: rows whose key fields are ALL NULL — structurally present but
    informationally empty records (ref real_data_checker.py:134-158:
    conjunction of the first ``max_cols`` non-id/non-audit columns IS NULL,
    severity warning).  One fused-aggregate pass like every other rule."""
    cols = [c for c in df.columns if c.lower() not in exclude][:max_cols]
    if not cols:
        return empty_issues(df.sparkSession)
    rule = Rule(
        name="empty_records",
        column=",".join(cols),
        predicate=lambda d: reduce(
            lambda a, b: a & b, [d[c].isNull() for c in cols]
        ),
        severity=Severity.WARNING.value,
        description="records with all key fields NULL",
    )
    return compile_rules(df, table, [rule])


def scan_duplicates(
    df: DataFrame,
    table: str,
    columns: Sequence[str] | None = None,
    keep_zero: bool = False,
) -> DataFrame:
    """Duplicate *extra-row* counts per unique-candidate column:
    COUNT(col) - COUNT(DISTINCT col) over non-null rows (A7,
    quality_scanner.py:554-569). One fused agg for all columns."""
    cols = list(columns) if columns is not None else unique_candidate_columns(df)
    rules = [
        Rule(
            name="duplicate",
            column=c,
            agg=lambda d, c=c: F.count(d[c]) - F.count_distinct(d[c]),
            severity=Severity.WARNING.value,
            description=f"{c} has duplicate values",
        )
        for c in cols
    ]
    return compile_rules(df, table, rules, keep_zero=keep_zero)


def scan_duplicates_approx(
    df: DataFrame,
    table: str,
    columns: Sequence[str] | None = None,
    rsd: float = 0.01,
    keep_zero: bool = False,
) -> DataFrame:
    """A7 at 10^12 scale: HyperLogLog++ distinct-diff (no exact
    count-distinct expansion; error bounded by ``rsd``).  The exact scan is
    the correctness tool; this is the monitoring tool — the reference's
    trend tables only need the magnitude (SURVEY A7 note)."""
    cols = list(columns) if columns is not None else unique_candidate_columns(df)
    rules = [
        Rule(
            name="duplicate_approx",
            column=c,
            agg=lambda d, c=c: F.greatest(
                F.count(d[c]) - F.approx_count_distinct(d[c], rsd), F.lit(0)
            ),
            severity=Severity.WARNING.value,
            description=f"{c} approx duplicate count (rsd={rsd})",
        )
        for c in cols
    ]
    return compile_rules(df, table, rules, keep_zero=keep_zero)


def profile_numeric(
    df: DataFrame, table: str, columns: Sequence[str]
) -> DataFrame:
    """One-pass numeric profile per column: count/nulls/min/max/mean/stddev
    + approx p50/p95/p99 — the data-profiling relation every quality
    dashboard needs; all aggregates fuse into a single scan."""
    aggs: list[Column] = []
    for i, c in enumerate(columns):
        aggs += [
            F.count(df[c]).cast("long").alias(f"__n{i}"),
            F.sum(F.when(df[c].isNull(), 1).otherwise(0)).cast("long").alias(f"__z{i}"),
            F.min(df[c]).cast("double").alias(f"__mn{i}"),
            F.max(df[c]).cast("double").alias(f"__mx{i}"),
            F.avg(df[c]).cast("double").alias(f"__av{i}"),
            F.stddev_samp(df[c]).cast("double").alias(f"__sd{i}"),
            F.percentile_approx(
                df[c].cast("double"), [0.5, 0.95, 0.99], 10_000
            ).alias(f"__pq{i}"),
        ]
    wide = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(table).alias("table"),
            F.lit(c).alias("column"),
            F.col(f"__n{i}").alias("non_null"),
            F.col(f"__z{i}").alias("nulls"),
            F.col(f"__mn{i}").alias("min"),
            F.col(f"__mx{i}").alias("max"),
            F.col(f"__av{i}").alias("mean"),
            F.col(f"__sd{i}").alias("stddev"),
            F.col(f"__pq{i}")[0].alias("p50"),
            F.col(f"__pq{i}")[1].alias("p95"),
            F.col(f"__pq{i}")[2].alias("p99"),
        )
        for i, c in enumerate(columns)
    ]
    return wide.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


def scan_freshness(
    df: DataFrame,
    table: str,
    ts_col: str,
    as_of: str,
    warn_hours: float = 24.0,
    crit_hours: float = 72.0,
) -> DataFrame:
    """Staleness check: hours between the newest event and ``as_of``
    (an explicit ISO timestamp — never wall-clock, so results are
    deterministic and reproducible; the caller passes "now").
    Reference analog: the DATE_SUB(CURDATE(), ...) trend windows
    (benchmark_storage.py:308-311) turned into a gate-able issue row.
    """
    # timestamp_diff works on TIMESTAMP_NTZ and is timezone-free — results
    # are identical under any session timezone
    # microsecond precision: whole-second variants truncate differently
    # across engines (boundary counting vs difference truncation)
    lag_h = F.timestamp_diff(
        "MICROSECOND", F.max(df[ts_col]), F.to_timestamp_ntz(F.lit(as_of))
    ).cast("double") / F.lit(3_600_000_000.0)
    wide = df.agg(
        F.count(df[ts_col]).cast("long").alias("__n"),
        lag_h.cast("double").alias("__lag_h"),
    )
    # NULL lag (empty table / all-NULL ts) is the WORST staleness case — no
    # data at all — and must gate critical, not fall through both thresholds
    # to info
    severity = (
        F.when(F.col("__lag_h").isNull(), F.lit(Severity.CRITICAL.value))
        .when(F.col("__lag_h") > crit_hours, F.lit(Severity.CRITICAL.value))
        .when(F.col("__lag_h") > warn_hours, F.lit(Severity.WARNING.value))
        .otherwise(F.lit(Severity.INFO.value))
    )
    return wide.select(
        F.lit(table).alias("table"),
        F.lit(ts_col).cast("string").alias("column"),
        F.lit("freshness").alias("issue_type"),
        F.lit(0).cast("long").alias("count"),
        F.col("__n").alias("total"),
        F.round(F.col("__lag_h"), 6).alias("percent"),  # lag hours, not %
        severity.alias("severity"),
        F.when(
            F.col("__lag_h").isNull(),
            F.lit(f"no timestamped rows in {table}.{ts_col}"),
        )
        .otherwise(
            F.concat(
                F.lit("newest "), F.lit(ts_col), F.lit(" lags as_of by "),
                F.round(F.col("__lag_h"), 1).cast("string"), F.lit("h"),
            )
        )
        .alias("description"),
    )


def scan_duplicate_groups(
    df: DataFrame, table: str, key_cols: Sequence[str]
) -> DataFrame:
    """Duplicate *group* count over a (composite) unique constraint (A8,
    safe_scanners.py:170-175): #groups with >1 row. Shuffles once on the
    key; partial agg makes the shuffle carry one row per key per mapper.

    The table total folds out of the same grouped relation (Σ group sizes)
    instead of a separate eager ``df.count()`` — one job, one scan."""
    dup_groups = (
        df.groupBy(*[F.col(c) for c in key_cols])
        .agg(F.count(F.lit(1)).alias("__n__"))
        .agg(
            F.sum(F.when(F.col("__n__") > 1, 1).otherwise(0))
            .cast("long")
            .alias("count"),
            F.sum(F.col("__n__")).cast("long").alias("__tot__"),
        )
    )
    total = F.col("__tot__")
    return dup_groups.select(
        F.lit(table).alias("table"),
        F.lit(",".join(key_cols)).cast("string").alias("column"),
        F.lit("duplicate").alias("issue_type"),
        F.col("count"),
        total.alias("total"),
        F.when(total > 0, F.col("count") * 100.0 / total)
        .otherwise(F.lit(0.0))
        .cast("double")
        .alias("percent"),
        F.when(F.col("count") > 0, F.lit(Severity.WARNING.value))
        .otherwise(F.lit(Severity.INFO.value))
        .alias("severity"),
        F.lit(f"unique constraint ({','.join(key_cols)}) violated").alias(
            "description"
        ),
    ).filter(F.col("count") > 0)


def completeness(df: DataFrame, table: str) -> DataFrame:
    """Per-column completeness triple in ONE scan (A9): filled / null /
    empty-string counts + fill% + category bucket
    (ref advanced_analysis.py:300-368; buckets 331-339).

    Returns one row per column:
    (table, column, total_rows, filled_count, null_count,
     empty_string_count, fill_percentage, category).
    """
    aggs: list[Column] = [F.count(F.lit(1)).alias("__total__")]
    string_cols = {f.name for f in df.schema.fields if f.dataType.simpleString() == "string"}
    for i, c in enumerate(df.columns):
        is_empty = (
            (df[c] == F.lit("")) if c in string_cols else F.lit(False)
        )
        aggs.append(
            F.sum(F.when(df[c].isNull(), 1).otherwise(0)).cast("long").alias(f"__n{i}__")
        )
        aggs.append(
            F.sum(F.when(df[c].isNotNull() & ~is_empty, 1).otherwise(0))
            .cast("long")
            .alias(f"__f{i}__")
        )
        aggs.append(
            F.sum(F.when(is_empty, 1).otherwise(0)).cast("long").alias(f"__e{i}__")
        )
    wide = df.agg(*aggs)
    structs = []
    for i, c in enumerate(df.columns):
        total = F.col("__total__")
        filled = F.coalesce(F.col(f"__f{i}__"), F.lit(0))
        fill_pct = F.when(total > 0, filled * 100.0 / total).otherwise(F.lit(0.0))
        category = (
            F.when(fill_pct >= 100.0, F.lit("perfect"))
            .when(fill_pct >= 90.0, F.lit("good"))
            .when(fill_pct >= 50.0, F.lit("poor"))
            .otherwise(F.lit("critical"))
        )
        structs.append(
            F.struct(
                F.lit(table).alias("table"),
                F.lit(c).alias("column"),
                total.cast("long").alias("total_rows"),
                filled.alias("filled_count"),
                F.coalesce(F.col(f"__n{i}__"), F.lit(0)).alias("null_count"),
                F.coalesce(F.col(f"__e{i}__"), F.lit(0)).alias("empty_string_count"),
                fill_pct.cast("double").alias("fill_percentage"),
                category.alias("category"),
            )
        )
    return wide.select(F.explode(F.array(*structs)).alias("c")).select("c.*")


def table_completeness(completeness_df: DataFrame) -> DataFrame:
    """Table score = unweighted mean of column fill% (A10,
    ref advanced_analysis.py:268-274), computed in Spark so many tables'
    completeness relations can union and roll up in one job."""
    return (
        completeness_df.groupBy("table")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_columns"),
            F.round(F.avg("fill_percentage"), 6).alias("completeness_score"),
        )
        .orderBy("table")
    )


def database_completeness(completeness_df: DataFrame) -> DataFrame:
    """Database score = column-count-weighted mean of table scores, which is
    exactly the plain mean over all column fill% (A11,
    ref advanced_analysis.py:121-131)."""
    return completeness_df.agg(
        F.count_distinct(F.col("table")).cast("long").alias("n_tables"),
        F.count(F.lit(1)).cast("long").alias("n_columns"),
        F.round(F.avg("fill_percentage"), 6).alias("completeness_score"),
    )


def health_check(
    tables: Mapping[str, DataFrame],
    fk_map: Mapping[str, Sequence[tuple[str, str, str]]] | None = None,
    collect: bool = True,
) -> HealthReport | DataFrame:
    """Compose null + orphan + duplicate scans (C4, quality_scanner.py:212-271).

    The three scans union *lazily*; with ``collect=False`` returns the sorted
    issues DataFrame (one Spark job for the caller to act on), else collects
    into a ``HealthReport`` with wall-clock timing like the reference.
    """
    t0 = time.perf_counter()
    parts: list[DataFrame] = []
    for name, df in tables.items():
        parts.append(scan_nulls(df, name))
        parts.append(scan_duplicates(df, name))
    if fk_map:
        parts.append(scan_orphans(tables, fk_map))
    issues = reduce(lambda a, b: a.unionByName(b), parts)
    issues = issues.orderBy(
        severity_rank_col("severity"), F.col("table"), F.col("column")
    )
    if not collect:
        return issues
    rows = [r.asDict() for r in issues.collect()]
    by_sev: dict[str, int] = {}
    for r in rows:
        by_sev[r["severity"]] = by_sev.get(r["severity"], 0) + 1
    real = {k: v for k, v in by_sev.items() if k != Severity.INFO.value}
    return HealthReport(
        all_good=not real,
        total_issues=len(rows),
        issues_by_severity=by_sev,
        scan_time_ms=(time.perf_counter() - t0) * 1000.0,
        issues=rows,
    )


def severity_summary(issues: DataFrame) -> DataFrame:
    """Issues per severity (A12, quality_scanner.py:258-262)."""
    return (
        issues.groupBy("severity")
        .agg(F.count(F.lit(1)).cast("long").alias("n_issues"))
        .orderBy(severity_rank_col("severity"))
    )
