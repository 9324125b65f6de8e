from .rules import Rule, RuleSet, compile_rules
from .scans import (
    completeness,
    database_completeness,
    health_check,
    profile_numeric,
    scan_duplicate_groups,
    scan_duplicates,
    scan_duplicates_approx,
    scan_freshness,
    scan_nulls,
    scan_orphans,
    severity_summary,
    table_completeness,
)

__all__ = [
    "Rule",
    "RuleSet",
    "compile_rules",
    "scan_nulls",
    "scan_orphans",
    "scan_duplicates",
    "scan_duplicates_approx",
    "scan_duplicate_groups",
    "scan_freshness",
    "profile_numeric",
    "completeness",
    "table_completeness",
    "database_completeness",
    "health_check",
    "severity_summary",
]

# heavier operator families import lazily via their modules:
#   operators.dedup        — exact / MinHash-LSH / SimHash / Jaccard
#   operators.similarity   — cosine top-k / near-pairs / SRP-LSH
#   operators.docs         — text analysis (SQL-oracle-checkable subset)
#   operators.events       — gap-based sessionization (window ops)
#   operators.gate         — salted gate aggregate + medallion checkpoints
#   operators.reference_rules — the reference's concrete rule pack
