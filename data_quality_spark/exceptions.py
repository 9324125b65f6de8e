"""Typed error surface for the library and CLI.

Mirrors the reference's exception hierarchy and constructor contracts
(``/root/reference/src/data_quality/exceptions.py:1-218``) so a caller
migrating from the reference can keep its ``except ValidationError``
handlers — same class names, same per-class attributes, same formatted
message shape (message + details + suggestion).  The bodies are a
re-implementation, not a copy: one shared formatter, no per-class
boilerplate.

CLI error semantics (ref ``cli_clean.py:109-121``): policy failures use
exit codes 1/2 via ``plans.report.exit_code_for``; a *typed error* —
unreadable input, bad URL, missing driver — exits **3** so CI can
distinguish "the data is bad" from "the check never ran".
"""

from __future__ import annotations

from typing import Any

__all__ = [
    "DataQualityError",
    "ValidationError",
    "ConfigurationError",
    "ResourceError",
    "OperationError",
    "ScanError",
    "SchemaAnalysisError",
    "CLI_ERROR_EXIT",
]

# exit code for typed errors on CLI paths (0 ok, 1/2 = fail_on policy)
CLI_ERROR_EXIT = 3


class DataQualityError(Exception):
    """Base class: message + structured details + actionable suggestion."""

    def __init__(
        self,
        message: str,
        details: dict[str, Any] | None = None,
        suggestion: str | None = None,
        code: str = "unknown",
    ) -> None:
        super().__init__(message)
        self.message = message
        self.details = details or {}
        self.suggestion = suggestion
        self.code = code

    def __str__(self) -> str:
        out = self.message
        if self.details:
            kv = ", ".join(f"{k}={v}" for k, v in self.details.items())
            out += f" (Details: {kv})"
        if self.suggestion:
            out += f" Suggestion: {self.suggestion}"
        return out


class ValidationError(DataQualityError):
    """Bad input value (ref exceptions.py:76-100)."""

    def __init__(self, field: str, value: Any, expected: str,
                 suggestion: str | None = None) -> None:
        super().__init__(
            f"Invalid {field}: got {type(value).__name__} {value!r}, "
            f"expected {expected}",
            {"field": field, "value": value, "expected": expected},
            suggestion,
            "validation",
        )
        self.field = field
        self.value = value
        self.expected = expected


class ConfigurationError(DataQualityError):
    """Invalid or missing configuration (ref exceptions.py:103-122)."""

    def __init__(self, config_key: str, issue: str,
                 suggestion: str | None = None) -> None:
        super().__init__(
            f"Configuration error for '{config_key}': {issue}",
            {"config_key": config_key, "issue": issue},
            suggestion,
            "configuration",
        )
        self.config_key = config_key
        self.issue = issue


class ResourceError(DataQualityError):
    """Unavailable resource: file, database, jar (ref exceptions.py:124-151)."""

    def __init__(self, resource: str, issue: str,
                 current_usage: str | None = None,
                 suggestion: str | None = None) -> None:
        details = {"resource": resource, "issue": issue}
        if current_usage:
            details["current_usage"] = current_usage
        super().__init__(
            f"Resource error ({resource}): {issue}", details, suggestion,
            "resource",
        )
        self.resource = resource
        self.issue = issue
        self.current_usage = current_usage


class OperationError(DataQualityError):
    """Failed operation, with a retryability hint (ref exceptions.py:153-180)."""

    def __init__(self, operation: str, reason: str, retryable: bool = False,
                 suggestion: str | None = None) -> None:
        super().__init__(
            f"Operation '{operation}' failed: {reason}",
            {"operation": operation, "reason": reason,
             "retryable": retryable},
            suggestion,
            "operation",
        )
        self.operation = operation
        self.reason = reason
        self.retryable = retryable


class ScanError(OperationError):
    """A quality scan failed on a table (ref exceptions.py:182-199)."""

    def __init__(self, table_name: str, scan_type: str, error_message: str,
                 suggestion: str | None = None) -> None:
        super().__init__(
            f"{scan_type}_scan",
            f"Failed to scan table '{table_name}': {error_message}",
            suggestion=suggestion
            or "Check table permissions and database connectivity",
        )
        self.table_name = table_name
        self.scan_type = scan_type
        self.error_message = error_message


class SchemaAnalysisError(OperationError):
    """Schema analysis failed (ref exceptions.py:201-218)."""

    def __init__(self, schema_name: str, analysis_type: str,
                 error_message: str, suggestion: str | None = None) -> None:
        super().__init__(
            f"{analysis_type}_analysis",
            f"Failed to analyze schema '{schema_name}': {error_message}",
            suggestion=suggestion or "Ensure schema exists and is accessible",
        )
        self.schema_name = schema_name
        self.analysis_type = analysis_type
        self.error_message = error_message
