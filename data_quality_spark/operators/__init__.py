from .rules import Rule, RuleSet, compile_rules
from .scans import (
    completeness,
    health_check,
    scan_duplicate_groups,
    scan_duplicates,
    scan_nulls,
    scan_orphans,
    severity_summary,
)

__all__ = [
    "Rule",
    "RuleSet",
    "compile_rules",
    "scan_nulls",
    "scan_orphans",
    "scan_duplicates",
    "scan_duplicate_groups",
    "completeness",
    "health_check",
    "severity_summary",
]
