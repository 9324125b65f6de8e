from .schemas import (
    CLIPS_SCHEMA,
    ISSUE_SCHEMA,
    Severity,
    issue_struct_fields,
)
from .report import (
    CheckpointResult,
    HealthReport,
    Report,
    exit_code_for,
    severity_rank_col,
)

__all__ = [
    "CLIPS_SCHEMA",
    "ISSUE_SCHEMA",
    "Severity",
    "issue_struct_fields",
    "CheckpointResult",
    "HealthReport",
    "Report",
    "exit_code_for",
    "severity_rank_col",
]
