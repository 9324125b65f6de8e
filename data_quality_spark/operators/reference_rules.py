"""The reference's concrete validation rules, re-expressed as Rule builders.

These are the exact rule semantics of the reference's medallion checkpoints
(``/root/reference/src/data_quality/checkpoints.py``), generalized to any
DataFrame via the fused rule compiler:

- F1 ISRC format       — NOT REGEXP ^[A-Z]{2}-[A-Z0-9]{3}-[0-9]{2}-[0-9]{5}$
  over ``isrc IS NOT NULL AND isrc != ''``, severity **warning**
  (``checkpoints.py:490-525``, ``_check_isrc_format``)
- F2 emoji deny-list   — music emoji in name columns; **critical** for
  artist names, warning for channel titles (``checkpoints.py:407-486``,
  ``_check_no_emojis_in_artists`` vs ``_check_no_emojis_in_channel``)
- F3 garbage names     — ``LOWER(col) LIKE '%p%'`` for EVERY deny-list
  pattern, i.e. contains-any, not exact match (``checkpoints.py:527-581``,
  ``_check_no_garbage_artists``)
- F4 semver format     — NOT ^v?[0-9]+\\.[0-9]+\\.[0-9]+, warning
  (``checkpoints.py:254-296``)
- F6 URL format        — anchored http(s) URL regex
  (``validation.py:33-35``, ``_URL_PATTERN``)
- A4 confidence range  — outside [0, 1] over non-null scope (``checkpoints.py:178-214``)
- A5 decision enum     — outside {accept, graylist, reject} (``checkpoints.py:216-252``)
- not-null             — raw_id / parsed_at / parser_version
  (``checkpoints.py:117-134``; parser_version via ``_check_parser_version``)

``MedallionBronzeToSilver`` / ``MedallionSilverToGold`` compose them exactly
like the reference's two checkpoint classes: the bronze gate validates
structural parse sanity per platform table (5 checks incl. the
parser_version not-null+format pair), the gold gate validates content rules
over the ``decision = 'accept'`` promotion scope (``checkpoints.py:61-137``
and ``307-377``; success ⇔ zero criticals, ``checkpoints.py:99``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..plans.schemas import Severity
from .rules import Rule

__all__ = [
    "ISRC_REGEX",
    "EMOJI_REGEX",
    "GARBAGE_NAME_PATTERNS",
    "SEMVER_REGEX",
    "URL_REGEX",
    "VALID_DECISIONS",
    "isrc_format_rule",
    "emoji_rule",
    "garbage_name_rule",
    "semver_rule",
    "url_format_rule",
    "confidence_range_rule",
    "decision_enum_rule",
    "not_null_rule",
    "MedallionBronzeToSilver",
    "MedallionSilverToGold",
]

ISRC_REGEX = r"^[A-Z]{2}-[A-Z0-9]{3}-[0-9]{2}-[0-9]{5}$"
# music-emoji deny-list, ref checkpoints.py:410
EMOJI_REGEX = "[\U0001f3bc\U0001f3ae\U0001f3b6\U0001f3b5\U0001f3a4\U0001f3a7\U0001f3b8\U0001f941\U0001f3b9\U0001f3ba\U0001f3bb]"
# garbage-name patterns, ref checkpoints.py:530-545 — each matched as
# LOWER(col) LIKE '%pattern%' (contains), exactly as _check_no_garbage_artists
# builds its OR chain.  Yes, that flags "Greatest Hits" via 'test'; that is
# the reference's semantics, reproduced faithfully.
GARBAGE_NAME_PATTERNS = [
    "unknown artist", "various artists", "n/a", "null", "undefined",
    "test", "sample",
]
SEMVER_REGEX = r"^v?[0-9]+\.[0-9]+\.[0-9]+"
# ref validation.py:33-35 (_URL_PATTERN), dialect-safe in java.util.regex,
# RE2 (DuckDB) and Python re: \w spelled out as [A-Za-z0-9_] because
# Python's \w is Unicode-aware by default while Java/RE2 default to ASCII
# (ADVICE r2 — with \w a non-ASCII-letter URL would pass a Python-side
# check but fail in Spark/DuckDB)
URL_REGEX = (
    r"^https?://(?:[-A-Za-z0-9_.])+(?:[:\d]+)?"
    r"(?:/(?:[A-Za-z0-9_/.])*(?:\?(?:[A-Za-z0-9_&=%.])*)?"
    r"(?:#(?:[A-Za-z0-9_]*))?)?$"
)
VALID_DECISIONS = ["accept", "graylist", "reject"]


def isrc_format_rule(column: str = "isrc") -> Rule:
    """Invalid ISRC format over non-null, non-empty scope — the reference
    scopes ``isrc IS NOT NULL AND isrc != ''`` and reports **warning**
    (checkpoints.py:490-525)."""
    return Rule(
        name="isrc_format",
        column=column,
        predicate=lambda d: ~d[column].rlike(ISRC_REGEX),
        scope=lambda d: d[column].isNotNull() & (d[column] != ""),
        severity=Severity.WARNING.value,
        description="isrc violates CC-XXX-YY-NNNNN format",
    )


def emoji_rule(column: str, severity: str = Severity.CRITICAL.value) -> Rule:
    """Music emoji in a name column.  The reference grades artist-name emoji
    **critical** (checkpoints.py:440) and channel-title emoji warning
    (checkpoints.py:486) — pass ``severity`` for the channel variant."""
    return Rule(
        name="emoji_in_name",
        column=column,
        predicate=lambda d: d[column].rlike(EMOJI_REGEX),
        scope=lambda d: d[column].isNotNull(),
        severity=severity,
        description=f"{column} contains music emoji",
    )


def garbage_name_rule(column: str) -> Rule:
    """Contains-any over the deny-list: ``LOWER(col) LIKE '%p%'`` for every
    pattern, matching the reference's OR chain (checkpoints.py:538-545)."""
    from pyspark.sql import functions as F

    def pred(d: DataFrame):
        lowered = F.lower(d[column])
        cond = None
        for g in GARBAGE_NAME_PATTERNS:
            term = lowered.contains(g)
            cond = term if cond is None else (cond | term)
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
    # `== False` (not `~`) deliberately: NULL rlike NULL-propagates and the
    # comparison keeps NULL → sum(when(NULL,1)) counts 0, mirroring the
    # reference's `WHERE parser_version IS NOT NULL` scope even if `scope`
    # were dropped.  The explicit scope keeps the denominator right too.
    return Rule(
        name="version_format",
        column=column,
        predicate=lambda d: d[column].rlike(SEMVER_REGEX) == False,  # noqa: E712
        scope=lambda d: d[column].isNotNull(),
        severity=Severity.WARNING.value,
        description=f"{column} is not semver (v?MAJOR.MINOR.PATCH)",
    )


def url_format_rule(column: str) -> Rule:
    """F6: value is not a well-formed http(s) URL (ref validation.py:33-35,
    306-327 — validate_url raises on non-match; here the non-matches become
    a counted issue over the non-null scope)."""
    return Rule(
        name="url_format",
        column=column,
        predicate=lambda d: ~d[column].rlike(URL_REGEX),
        scope=lambda d: d[column].isNotNull(),
        severity=Severity.WARNING.value,
        description=f"{column} is not a valid http(s) URL",
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
    # single-pass fused checkpoint (sentinel row carries total; no df.count())
    from .gate import run_fused_checkpoint

    return run_fused_checkpoint(name, df, table, rules)


class MedallionBronzeToSilver:
    """Parse-sanity gate per platform table (ref checkpoints.py:117-134):
    not-null raw_id/parsed_at, confidence range, decision enum, and the
    parser_version pair — not-null (critical, via _check_not_null inside
    _check_parser_version) + semver format (warning)."""

    name = "bronze_to_silver"

    def run(self, df: DataFrame, table: str):
        rules = [
            not_null_rule("raw_id"),
            not_null_rule("parsed_at"),
            confidence_range_rule(),
            decision_enum_rule(),
            not_null_rule("parser_version"),
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
