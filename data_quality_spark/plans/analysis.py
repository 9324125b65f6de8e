"""Deterministic rule-based analysis report (the reference's default "AI"
provider is not ML at all — it is a pure function over issue counts,
``/root/reference/src/data_quality/ai_integration.py:450-526``).

Driver-side only: runs over a collected issues list, produces the
``AIAnalysis``-shaped summary (``ai_integration.py:260-270``) with severity
assessment, recommended actions, fix templates, and a confidence score
derived from issue mix.  No Spark work here.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

__all__ = ["Analysis", "analyze_issues"]


@dataclass
class Analysis:
    summary: str
    severity_assessment: str
    business_impact: str
    recommended_actions: list[str] = field(default_factory=list)
    fix_templates: list[str] = field(default_factory=list)
    confidence_score: float = 1.0


_ACTIONS = {
    "nulls": "Backfill or constrain NULLs in {table}.{column} (NOT NULL + default)",
    "orphan": "Repair or remove orphaned rows in {table}.{column}; add FK enforcement upstream",
    "duplicate": "Deduplicate {table}.{column} (keep-first by primary key) and add a unique constraint",
    "range": "Clamp or quarantine out-of-range values in {table}.{column}",
    "enum": "Map or reject values outside the allowed set for {table}.{column}",
    "format": "Normalize or reject malformed values in {table}.{column}",
}

_FIXES = {
    "nulls": "UPDATE {table} SET {column} = <default> WHERE {column} IS NULL",
    "duplicate": "DELETE FROM {table} a USING {table} b WHERE a.{column} = b.{column} AND a.pk > b.pk",
    "orphan": "DELETE FROM {table} WHERE {column} NOT IN (SELECT pk FROM parent)",
}


def analyze_issues(issues: list[dict[str, Any]], top_n: int = 5) -> Analysis:
    """Pure function: issue rows → Analysis (mirrors the reference's local
    provider thresholds: ≥1 critical ⇒ 'high', ≥3 warnings ⇒ 'medium')."""
    crit = [i for i in issues if i.get("severity") == "critical"]
    warn = [i for i in issues if i.get("severity") == "warning"]
    if crit:
        severity = "high"
        impact = (
            f"{len(crit)} critical issue(s) block promotion: deploys gated "
            "until resolved (exit code 2)."
        )
    elif len(warn) >= 3:
        severity = "medium"
        impact = f"{len(warn)} warnings indicate degrading data quality."
    elif warn:
        severity = "low"
        impact = "Minor warnings only; safe to proceed with monitoring."
    else:
        severity = "none"
        impact = "No actionable issues."
    ranked = sorted(
        issues,
        key=lambda i: (
            {"critical": 0, "warning": 1, "info": 2}.get(i.get("severity"), 3),
            -int(i.get("count", 0)),
        ),
    )[:top_n]
    actions = []
    fixes = []
    for i in ranked:
        kind = i.get("issue_type", "")
        tmpl = _ACTIONS.get(kind)
        if tmpl:
            actions.append(
                tmpl.format(table=i.get("table", "?"), column=i.get("column") or "*")
            )
        fix = _FIXES.get(kind)
        if fix:
            fixes.append(
                fix.format(table=i.get("table", "?"), column=i.get("column") or "pk")
            )
    n = len(issues)
    confidence = 1.0 if n == 0 else max(0.5, 1.0 - 0.02 * min(n, 25))
    return Analysis(
        summary=(
            f"{n} issue(s): {len(crit)} critical, {len(warn)} warning, "
            f"{n - len(crit) - len(warn)} info."
        ),
        severity_assessment=severity,
        business_impact=impact,
        recommended_actions=actions,
        fix_templates=fixes,
        confidence_score=round(confidence, 2),
    )
