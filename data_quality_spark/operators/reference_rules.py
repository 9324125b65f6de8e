"""The reference's concrete validation rules, re-expressed as Rule builders.

These are the exact rule semantics of the reference's medallion checkpoints
(``/root/reference/src/data_quality/checkpoints.py``), generalized to any
DataFrame via the fused rule compiler:

- F1 ISRC format       — length != 12 OR not ^[A-Z]{2}-[A-Z0-9]{3}-[0-9]{2}-[0-9]{5}$
  (``checkpoints.py:488-525``)
- F2 emoji deny-list   — music emoji in name columns (``checkpoints.py:407-486``)
- F3 garbage names     — lowercase LIKE deny-list (``checkpoints.py:527-581``)
- F4 semver format     — NOT ^v?[0-9]+\\.[0-9]+\\.[0-9]+ (``checkpoints.py:254-296``)
- A4 confidence range  — outside [0, 1] over non-null scope (``checkpoints.py:178-214``)
- A5 decision enum     — outside {accept, graylist, reject} (``checkpoints.py:216-252``)
- not-null             — raw_id / parsed_at (``checkpoints.py:117-127``)

``MedallionBronzeToSilver`` / ``MedallionSilverToGold`` compose them exactly
like the reference's two checkpoint classes: the bronze gate validates
structural parse sanity per platform table, the gold gate validates content
rules over the ``decision = 'accept'`` promotion scope
(``checkpoints.py:61-137`` and ``307-377``; success ⇔ zero criticals,
``checkpoints.py:99``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..plans.schemas import Severity
from .rules import Rule

__all__ = [
    "ISRC_REGEX",
    "EMOJI_REGEX",
    "GARBAGE_NAMES",
    "SEMVER_REGEX",
    "VALID_DECISIONS",
    "isrc_format_rule",
    "emoji_rule",
    "garbage_name_rule",
    "semver_rule",
    "confidence_range_rule",
    "decision_enum_rule",
    "not_null_rule",
    "MedallionBronzeToSilver",
    "MedallionSilverToGold",
]

ISRC_REGEX = r"^[A-Z]{2}-[A-Z0-9]{3}-[0-9]{2}-[0-9]{5}$"
# music-emoji deny-list, ref checkpoints.py:410
EMOJI_REGEX = "[\U0001f3bc\U0001f3ae\U0001f3b6\U0001f3b5\U0001f3a4\U0001f3a7\U0001f3b8\U0001f941\U0001f3b9\U0001f3ba\U0001f3bb]"
# garbage-name deny-list, ref checkpoints.py:530-545
GARBAGE_NAMES = [
    "unknown artist", "unknown", "n/a", "na", "null", "none", "test",
    "artist", "various", "various artists", "tbd", "temp",
]
SEMVER_REGEX = r"^v?[0-9]+\.[0-9]+\.[0-9]+"
VALID_DECISIONS = ["accept", "graylist", "reject"]


def isrc_format_rule(column: str = "isrc") -> Rule:
    """Invalid ISRC: wrong length or wrong format, over non-null scope."""
    return Rule(
        name="isrc_format",
        column=column,
        predicate=lambda d: ~d[column].rlike(ISRC_REGEX),
        scope=lambda d: d[column].isNotNull(),
        severity=Severity.CRITICAL.value,
        description="isrc violates CC-XXX-YY-NNNNN format",
    )


def emoji_rule(column: str) -> Rule:
    return Rule(
        name="emoji_in_name",
        column=column,
        predicate=lambda d: d[column].rlike(EMOJI_REGEX),
        scope=lambda d: d[column].isNotNull(),
        severity=Severity.WARNING.value,
        description=f"{column} contains music emoji",
    )


def garbage_name_rule(column: str) -> Rule:
    from pyspark.sql import functions as F

    def pred(d: DataFrame):
        lowered = F.lower(F.trim(d[column]))
        cond = lowered.isin(GARBAGE_NAMES)
        for g in ("unknown artist", "n/a"):
            cond = cond | lowered.contains(g)
        return cond

    return Rule(
        name="garbage_name",
        column=column,
        predicate=pred,
        scope=lambda d: d[column].isNotNull(),
        severity=Severity.WARNING.value,
        description=f"{column} matches garbage-name deny-list",
    )


def semver_rule(column: str = "parser_version") -> Rule:
    return Rule(
        name="version_format",
        column=column,
        predicate=lambda d: d[column].rlike(SEMVER_REGEX) == False,  # noqa: E712
        scope=lambda d: d[column].isNotNull(),
        severity=Severity.WARNING.value,
        description=f"{column} is not semver (v?MAJOR.MINOR.PATCH)",
    )


def confidence_range_rule(column: str = "confidence") -> Rule:
    return Rule(
        name="confidence_range",
        column=column,
        predicate=lambda d: (d[column] < 0.0) | (d[column] > 1.0),
        scope=lambda d: d[column].isNotNull(),
        severity=Severity.CRITICAL.value,
        description=f"{column} outside [0.0, 1.0]",
    )


def decision_enum_rule(column: str = "decision") -> Rule:
    return Rule(
        name="decision_enum",
        column=column,
        predicate=lambda d: ~d[column].isin(VALID_DECISIONS),
        scope=lambda d: d[column].isNotNull(),
        severity=Severity.CRITICAL.value,
        description=f"{column} not in {{accept, graylist, reject}}",
    )


def not_null_rule(column: str, severity: str = Severity.CRITICAL.value) -> Rule:
    return Rule(
        name=f"null_{column}",
        column=column,
        predicate=lambda d: d[column].isNull(),
        severity=severity,
        description=f"{column} must not be NULL",
    )


def _run_checkpoint(name: str, df: DataFrame, table: str, rules: list[Rule]):
    import time

    from ..plans.report import CheckpointResult
    from .rules import compile_rules

    t0 = time.perf_counter()
    issues = [r.asDict() for r in compile_rules(df, table, rules).collect()]
    total = df.count()
    failed = sum(i["count"] for i in issues)
    criticals = [i for i in issues if i["severity"] == Severity.CRITICAL.value]
    return CheckpointResult(
        checkpoint_name=name,
        success=not criticals,
        issues=issues,
        total_records=total,
        passed_records=max(total - failed, 0),
        failed_records=failed,
        execution_time_ms=(time.perf_counter() - t0) * 1000.0,
        summary=f"{len(issues)} issue type(s), {len(criticals)} critical",
    )


class MedallionBronzeToSilver:
    """Parse-sanity gate per platform table (ref checkpoints.py:61-137):
    not-null raw_id/parsed_at, confidence range, decision enum, semver."""

    name = "bronze_to_silver"

    def run(self, df: DataFrame, table: str):
        rules = [
            not_null_rule("raw_id"),
            not_null_rule("parsed_at"),
            confidence_range_rule(),
            decision_enum_rule(),
            semver_rule(),
        ]
        return _run_checkpoint(self.name, df, table, rules)


class MedallionSilverToGold:
    """Promotion gate over accepted rows (ref checkpoints.py:307-377):
    emoji/ISRC/garbage rules scoped to decision='accept'."""

    name = "silver_to_gold"

    def run(self, df: DataFrame, table: str, name_column: str = "artist_names"):
        accept = lambda d: d["decision"] == "accept"  # noqa: E731
        rules = []
        for base in (
            emoji_rule(name_column),
            garbage_name_rule(name_column),
            isrc_format_rule(),
        ):
            rules.append(
                Rule(
                    name=base.name,
                    column=base.column,
                    predicate=base.predicate,
                    scope=lambda d, b=base: accept(d) & b.scope(d),
                    severity=base.severity,
                    description=base.description,
                )
            )
        return _run_checkpoint(self.name, df, table, rules)
