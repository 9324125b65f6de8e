"""Rule registry + fused-aggregate compiler.

The reference stores checks as rows of ``data_quality_rules`` carrying raw
SQL (``/root/reference/sql/create_tables.sql:8-25``) and executes **one query
per rule per table** (``checkpoints.py:117-137``, ``quality_scanner.py:75-99``)
— an O(tables × columns × rules) scan pattern.  Here a rule is a pure function
``DataFrame -> Column`` (a boolean *violation* predicate or a ready aggregate),
and ``compile_rules`` fuses every rule for a table into **one**
``df.agg(...)`` pass that Catalyst executes as a single scan with map-side
partial aggregation — the structural 10-100× win at 100 TB, since each extra
rule adds one column expression to an existing scan instead of a new pass
over the data.

The output is the ``QualityIssue`` relation (``quality_scanner.py:21-33``)
produced *inside* Spark via an explode of per-rule structs — no driver
round-trip, so issue streams from many tables union lazily into one job.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..plans.schemas import ISSUE_SCHEMA, Severity

__all__ = [
    "Rule",
    "RuleSet",
    "TOTAL_SENTINEL",
    "compile_rules",
    "null_severity",
    "percent_severity",
    "total_sentinel_rule",
]

#: issue_type of the synthetic row emitted by :func:`total_sentinel_rule`.
TOTAL_SENTINEL = "__checkpoint_total__"


def total_sentinel_rule() -> "Rule":
    """A zero-count rule whose emitted row's ``total`` column carries the
    fused aggregate's ``__total__`` — checkpoint runners recover the table
    row count from the SAME single-scan collect instead of paying a second
    ``df.count()`` pass (2× IO at 100 TB).  ``emit_when_zero`` guarantees
    the row survives the count>0 filter even on a clean table."""
    return Rule(
        TOTAL_SENTINEL,
        None,
        predicate=lambda d: F.lit(False),
        severity=Severity.INFO.value,
        emit_when_zero=True,
        description="row-count sentinel (no extra scan)",
    )

# severity spec: fixed string, or builder (count, total, percent) -> Column
SeveritySpec = str | Callable[[Column, Column, Column], Column]


def percent_severity(
    warn_above: float = 0.0, crit_above: float = 100.0
) -> Callable[[Column, Column, Column], Column]:
    """Threshold-bucketed severity (ref advanced_analysis.py:331-339 shape)."""

    def build(count: Column, total: Column, percent: Column) -> Column:
        return (
            F.when(count == 0, F.lit(Severity.INFO.value))
            .when(percent > F.lit(crit_above), F.lit(Severity.CRITICAL.value))
            .when(percent > F.lit(warn_above), F.lit(Severity.WARNING.value))
            .otherwise(F.lit(Severity.INFO.value))
        )

    return build


def null_severity(column: str) -> Callable[[Column, Column, Column], Column]:
    """Null-scan severity law, ref quality_scanner.py:572-585:
    id/key/isrc columns → critical; >50% null → warning; else info."""
    is_key = any(p in column.lower() for p in ("id", "key", "isrc"))

    def build(count: Column, total: Column, percent: Column) -> Column:
        if is_key:
            return F.when(
                count > 0, F.lit(Severity.CRITICAL.value)
            ).otherwise(F.lit(Severity.INFO.value))
        return (
            F.when(count == 0, F.lit(Severity.INFO.value))
            .when(percent > 50.0, F.lit(Severity.WARNING.value))
            .otherwise(F.lit(Severity.INFO.value))
        )

    return build


@dataclass(frozen=True)
class Rule:
    """One validation rule.

    Exactly one of ``predicate`` / ``agg`` must be set:

    - ``predicate``: boolean Column where True marks a *violating* row
      (compiled to ``sum(when(pred, 1))`` — the reference's conditional-count
      shape, checkpoints.py:178-296);
    - ``agg``: a ready LongType aggregate Column (for non-predicate counts
      like the duplicate distinct-diff, quality_scanner.py:554-569).

    ``scope`` restricts both the violation count and the denominator (the
    reference's "WHERE decision='accept'" promotion scope, checkpoints.py:417).
    """

    name: str  # issue_type
    column: str | None
    predicate: Callable[[DataFrame], Column] | None = None
    agg: Callable[[DataFrame], Column] | None = None
    severity: SeveritySpec = Severity.WARNING.value
    description: str = ""
    scope: Callable[[DataFrame], Column] | None = None
    emit_when_zero: bool = False  # reference emits issues only when count>0

    def __post_init__(self) -> None:
        if (self.predicate is None) == (self.agg is None):
            raise ValueError(
                f"rule {self.name!r}: exactly one of predicate/agg required"
            )


@dataclass
class RuleSet:
    """A named collection of rules for one table (≈ the rows of
    data_quality_rules for that table, sql/create_tables.sql:8-25)."""

    table: str
    rules: list[Rule] = field(default_factory=list)

    def add(self, rule: Rule) -> "RuleSet":
        self.rules.append(rule)
        return self

    def compile(self, df: DataFrame) -> DataFrame:
        return compile_rules(df, self.table, self.rules)


def _severity_col(spec: SeveritySpec, count: Column, total: Column, percent: Column) -> Column:
    if isinstance(spec, str):
        return F.when(count > 0, F.lit(spec)).otherwise(F.lit(Severity.INFO.value))
    return spec(count, total, percent)


def compile_rules(
    df: DataFrame, table: str, rules: Sequence[Rule], keep_zero: bool = False
) -> DataFrame:
    """Fuse *all* rules into one aggregate pass and emit QualityIssue rows.

    One wide ``agg`` row → per-rule structs → ``explode`` → issue relation.
    Catalyst plans this as a single scan + partial/final HashAggregate; the
    explode runs over one row, so the post-agg stage is O(#rules), not O(rows).
    """
    if not rules:
        return df.sparkSession.createDataFrame([], ISSUE_SCHEMA)

    agg_exprs: list[Column] = [F.count(F.lit(1)).alias("__total__")]
    for i, rule in enumerate(rules):
        if rule.predicate is not None:
            pred = rule.predicate(df)
            if rule.scope is not None:
                pred = rule.scope(df) & pred
            cnt = F.sum(F.when(pred, F.lit(1)).otherwise(F.lit(0)))
        else:
            cnt = rule.agg(df)  # type: ignore[misc]
        agg_exprs.append(cnt.cast("long").alias(f"__c{i}__"))
        if rule.scope is not None:
            agg_exprs.append(
                F.sum(
                    F.when(rule.scope(df), F.lit(1)).otherwise(F.lit(0))
                ).cast("long").alias(f"__t{i}__")
            )

    wide = df.agg(*agg_exprs)

    structs: list[Column] = []
    for i, rule in enumerate(rules):
        count = F.coalesce(F.col(f"__c{i}__"), F.lit(0))
        total = (
            F.coalesce(F.col(f"__t{i}__"), F.lit(0))
            if rule.scope is not None
            else F.col("__total__")
        )
        percent = F.when(total > 0, count * 100.0 / total).otherwise(F.lit(0.0))
        structs.append(
            F.struct(
                F.lit(table).alias("table"),
                F.lit(rule.column).cast("string").alias("column"),
                F.lit(rule.name).alias("issue_type"),
                count.alias("count"),
                total.cast("long").alias("total"),
                percent.cast("double").alias("percent"),
                _severity_col(rule.severity, count, total, percent).alias("severity"),
                F.lit(rule.description or rule.name).alias("description"),
            )
        )

    issues = wide.select(F.explode(F.array(*structs)).alias("issue")).select("issue.*")
    emit_all = keep_zero
    if not emit_all:
        keep = F.col("count") > 0
        # rules that opt into zero-count emission still pass through
        zero_ok = [r.name for r in rules if r.emit_when_zero]
        if zero_ok:
            keep = keep | F.col("issue_type").isin(zero_ok)
        issues = issues.filter(keep)
    return issues
