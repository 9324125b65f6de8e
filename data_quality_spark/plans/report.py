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

    def _severity_counts(self) -> tuple[int, int, int]:
        crit = sum(1 for i in self.issues if i.get("severity") == "critical")
        warn = sum(1 for i in self.issues if i.get("severity") == "warning")
        info = sum(1 for i in self.issues if i.get("severity") == "info")
        return crit, warn, info

    def render(self, fmt: str = "text") -> str:
        """Render formats: text / json plus the reference CI/CD runner's
        per-system outputs (ref scripts/ci_cd_data_quality.py:153-290,325):
        github (PR-comment markdown), gitlab (same, one heading level down),
        slack (attachment-JSON payload), jenkins (console log block)."""
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
        if fmt in ("github", "gitlab"):
            return self._render_github(gitlab=(fmt == "gitlab"))
        if fmt == "slack":
            return self._render_slack()
        if fmt == "jenkins":
            return self._render_jenkins()
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

    def _render_github(self, gitlab: bool = False) -> str:
        """GitHub PR comment (ref ci_cd_data_quality.py:153-196); GitLab is
        the same body one heading level down (ref :276)."""
        crit, warn, info = self._severity_counts()
        if not self.issues:
            title = "Data Quality: PASSED"
        elif crit == 0:
            title = "Data Quality: WARNINGS"
        else:
            title = "Data Quality: CRITICAL ISSUES"
        lines = [
            f"## {title}",
            "",
            "### Scan Results",
            f"- **Total Issues**: {len(self.issues):,}",
            f"- **Critical**: {crit}",
            f"- **Warning**: {warn}",
            f"- **Info**: {info}",
            "",
            "### Deployment Status",
            "**SAFE TO DEPLOY** - no critical issues found"
            if crit == 0
            else "**DEPLOYMENT BLOCKED** - critical issues must be resolved",
        ]
        if self.issues:
            lines += ["", "### Top Issues"]
            for i in self.issues[:5]:
                lines.append(
                    f"- **{i.get('table', '?')}.{i.get('column') or '*'}**"
                    f" [{i.get('severity', '?')}]: {i.get('description') or i.get('issue_type', '')}"
                )
        lines += ["", "---", "*Automated data quality check*"]
        out = "\n".join(lines)
        return out.replace("## ", "### ") if gitlab else out

    def _render_slack(self) -> str:
        """Slack attachment payload (ref ci_cd_data_quality.py:198-250)."""
        crit, warn, info = self._severity_counts()
        if not self.issues:
            color, title = "good", "Data Quality Check Passed"
        elif crit == 0:
            color, title = "warning", "Data Quality Issues Found"
        else:
            color, title = "danger", "Critical Data Quality Issues"
        return json.dumps(
            {
                "attachments": [
                    {
                        "color": color,
                        "title": title,
                        "fields": [
                            {
                                "title": "Issues Found",
                                "value": f"Critical: {crit} | Warning: {warn} | Info: {info}",
                                "short": True,
                            },
                            {
                                "title": "Deployment Status",
                                "value": "Safe" if crit == 0 else "Blocked",
                                "short": True,
                            },
                        ],
                        "footer": f"source: {self.source}",
                    }
                ]
            }
        )

    def _render_jenkins(self) -> str:
        """Jenkins console block (ref ci_cd_data_quality.py:252-274)."""
        crit, warn, info = self._severity_counts()
        bar = "=" * 60
        if not self.issues:
            status = "STATUS: PASSED"
        elif crit == 0:
            status = "STATUS: WARNINGS FOUND"
        else:
            status = "STATUS: CRITICAL ISSUES FOUND"
        return "\n".join(
            [
                bar,
                "DATA QUALITY CHECK RESULTS",
                bar,
                status,
                f"Total Issues: {len(self.issues)}",
                f"Critical: {crit}",
                f"Warning: {warn}",
                f"Info: {info}",
                bar,
            ]
        )


def get_json_schema() -> dict:
    """JSON Schema for the ``Report`` serialization contract (ref
    cli_clean.py:124-130 ``schema`` command / models.get_json_schema) —
    hand-maintained so it stays the stable external contract even if the
    dataclasses grow internal fields."""
    return {
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "title": "DataQualityReport",
        "type": "object",
        "required": ["tool_version", "source", "issues"],
        "properties": {
            "tool_version": {"type": "string"},
            "source": {"type": "string"},
            "issues": {
                "type": "array",
                "items": {
                    "type": "object",
                    "required": ["table", "issue_type", "count", "severity"],
                    "properties": {
                        "table": {"type": "string"},
                        "column": {"type": ["string", "null"]},
                        "issue_type": {"type": "string"},
                        "count": {"type": "integer", "minimum": 0},
                        "total": {"type": "integer", "minimum": 0},
                        "percent": {"type": "number"},
                        "severity": {
                            "type": "string",
                            "enum": ["critical", "warning", "info"],
                        },
                        "description": {"type": "string"},
                    },
                },
            },
        },
    }


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
