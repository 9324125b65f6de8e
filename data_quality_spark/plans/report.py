"""Driver-side report types + severity ordering + exit-code policy.

Mirrors the reference's ``HealthReport`` (``quality_scanner.py:35-44``),
pydantic ``Report`` render/exit semantics (``models.py:25-47``,
``cli_clean.py:109-117``) and the deployment-gate exit codes
(``deployment_gate.py:168-184``) — all pure driver logic over a collected
issues DataFrame; no Spark work happens here.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

from .schemas import Severity

__all__ = [
    "HealthReport",
    "Report",
    "CheckpointResult",
    "severity_rank_col",
    "exit_code_for",
]


def severity_rank_col(col: Column | str = "severity") -> Column:
    """Severity → sortable rank, ref quality_scanner.py:252-256 sort-key map."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.when(c == Severity.CRITICAL.value, F.lit(0))
        .when(c == Severity.WARNING.value, F.lit(1))
        .when(c == Severity.INFO.value, F.lit(2))
        .otherwise(F.lit(3))
    )


@dataclass
class HealthReport:
    """Aggregate of a health check run, ref quality_scanner.py:35-44."""

    all_good: bool
    total_issues: int
    issues_by_severity: dict[str, int]
    scan_time_ms: float
    issues: list[dict[str, Any]] = field(default_factory=list)

    @property
    def summary(self) -> dict[str, int]:
        return {
            "critical": self.issues_by_severity.get("critical", 0),
            "warning": self.issues_by_severity.get("warning", 0),
            "info": self.issues_by_severity.get("info", 0),
        }


@dataclass
class Report:
    """Stable serialization contract, ref models.py:25-47."""

    tool_version: str
    source: str
    issues: list[dict[str, Any]]

    def has_critical(self) -> bool:
        return any(i.get("severity") == "critical" for i in self.issues)

    def has_warnings(self) -> bool:
        return any(i.get("severity") == "warning" for i in self.issues)

    def render(self, fmt: str = "text") -> str:
        if fmt == "json":
            return json.dumps(
                {
                    "tool_version": self.tool_version,
                    "source": self.source,
                    "issues": self.issues,
                },
                default=str,
                indent=2,
            )
        if fmt != "text":
            raise ValueError(f"unsupported format: {fmt!r}")
        if not self.issues:
            return "No issues found."
        lines = [f"Found {len(self.issues)} issue(s):"]
        for i in self.issues:
            lines.append(
                f"  [{i.get('severity', '?').upper():8s}] "
                f"{i.get('table', '?')}.{i.get('column') or '*'} "
                f"{i.get('issue_type', '?')}: {i.get('description') or ''} "
                f"({i.get('count', 0)}/{i.get('total', 0)})"
            )
        return "\n".join(lines)


@dataclass
class CheckpointResult:
    """Gate result, ref checkpoints.py:23-34; success ⇔ zero criticals
    (checkpoints.py:99)."""

    checkpoint_name: str
    success: bool
    issues: list[dict[str, Any]]
    total_records: int
    passed_records: int
    failed_records: int
    execution_time_ms: float
    summary: str = ""


def exit_code_for(
    report: Report | HealthReport,
    fail_on: str = "critical",
    strict: bool = False,
) -> int:
    """Deployment-gate exit policy.

    Ref ``deployment_gate.py:168-184`` (0 = safe, 1 = warnings-in-strict,
    2 = critical) and ``cli_clean.py:109-117`` (``fail_on`` ∈
    {none, warning, critical}).
    """
    if isinstance(report, HealthReport):
        crit = report.summary["critical"]
        warn = report.summary["warning"]
    else:
        crit = sum(1 for i in report.issues if i.get("severity") == "critical")
        warn = sum(1 for i in report.issues if i.get("severity") == "warning")
    if fail_on == "none":
        return 0
    if crit > 0:
        return 2
    if warn > 0 and (strict or fail_on == "warning"):
        return 1
    return 0
