"""Reusable input validators with suggestion-bearing typed errors.

The reference exposes these as public API
(``/root/reference/src/data_quality/validation.py:38-363``): small
guards that raise :class:`~data_quality_spark.exceptions.ValidationError`
with an expected-shape description AND a concrete fix suggestion, so a
user's ``except ValidationError`` handling — and their direct
``validate_threshold(...)`` calls — migrate unchanged.  From-scratch
re-implementation sharing one failure helper; names, signatures, and
boundary semantics (inclusive min/max, zero gate before range, truthy
``max_length``) match the reference's contract.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, TypeGuard, Union

from .exceptions import ValidationError

__all__ = [
    "validate_not_none",
    "validate_string",
    "validate_number",
    "validate_int",
    "validate_float",
    "validate_threshold",
    "validate_sequence_not_empty",
    "is_valid_string",
    "validate_email",
    "validate_url",
    "validate_path",
    "validate_dict",
]

_EMAIL_RE = re.compile(r"^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}$")
_URL_RE = re.compile(
    r"^https?://(?:[-\w.])+(?:[:\d]+)?"
    r"(?:/(?:[\w/_.])*(?:\?(?:[\w&=%.])*)?(?:#(?:\w*))?)?$"
)


def _fail(field: str, value: Any, expected: str, suggestion: str) -> None:
    raise ValidationError(field, value, expected, suggestion)


def validate_not_none(value: Any, field_name: str) -> Any:
    """``value`` unchanged, unless it is None."""
    if value is None:
        _fail(field_name, value, "non-None value",
              f"Provide a valid {field_name} value")
    return value


def validate_string(
    value: Any,
    field_name: str,
    min_length: int = 1,
    max_length: Optional[int] = None,
    pattern: Optional[str] = None,
) -> str:
    """A string within optional length bounds matching ``pattern``.
    ``min_length`` defaults to 1 — the empty string is NOT a valid
    string input by default."""
    if not isinstance(value, str):
        _fail(field_name, value, "string",
              f"Convert {field_name} to string or provide string input")
    if len(value) < min_length:
        _fail(field_name, value,
              f"string with at least {min_length} characters",
              f"Provide a longer {field_name} "
              f"(current: {len(value)} chars)")
    if max_length and len(value) > max_length:
        _fail(field_name, value,
              f"string with at most {max_length} characters",
              f"Shorten {field_name} (current: {len(value)} chars, "
              f"max: {max_length})")
    if pattern and not re.match(pattern, value):
        _fail(field_name, value, f"string matching pattern '{pattern}'",
              f"Ensure {field_name} follows the required format")
    return value


def validate_number(
    value: Any,
    field_name: str,
    min_value: Optional[Union[int, float]] = None,
    max_value: Optional[Union[int, float]] = None,
    allow_zero: bool = True,
    number_type: type = float,
) -> Union[int, float]:
    """A number coerced to ``number_type``, with inclusive bounds.
    Check order is the contract: coercion → zero gate → min → max
    (so ``allow_zero=False, min_value=0`` rejects 0 with the
    "non-zero" message, not the range message)."""
    try:
        out = int(value) if number_type is int else float(value)
    except (TypeError, ValueError):
        _fail(field_name, value, number_type.__name__,
              f"Provide a valid numeric value for {field_name}")
    if not allow_zero and out == 0:
        _fail(field_name, value, "non-zero number",
              f"Provide a non-zero value for {field_name}")
    if min_value is not None and out < min_value:
        _fail(field_name, value, f"number >= {min_value}",
              f"Increase {field_name} to at least {min_value}")
    if max_value is not None and out > max_value:
        _fail(field_name, value, f"number <= {max_value}",
              f"Reduce {field_name} to at most {max_value}")
    return out


def validate_int(
    value: Any,
    field_name: str,
    min_value: Optional[int] = None,
    max_value: Optional[int] = None,
    allow_zero: bool = True,
) -> int:
    """:func:`validate_number` narrowed to int."""
    return validate_number(value, field_name, min_value, max_value,
                           allow_zero, int)


def validate_float(
    value: Any,
    field_name: str,
    min_value: Optional[float] = None,
    max_value: Optional[float] = None,
    allow_zero: bool = True,
) -> float:
    """:func:`validate_number` narrowed to float."""
    return validate_number(value, field_name, min_value, max_value,
                           allow_zero, float)


def validate_threshold(value: Any, field_name: str,
                       scale_0_to_1: bool = True) -> float:
    """A threshold on the 0–1 scale (default) or 0–100; both bounds
    inclusive."""
    return validate_float(value, field_name, min_value=0.0,
                          max_value=1.0 if scale_0_to_1 else 100.0)


def validate_sequence_not_empty(value: Any,
                                field_name: str) -> Sequence[Any]:
    """A sized iterable with at least one element (duck-typed — any
    ``__len__``+``__iter__`` carrier qualifies, strings included, per
    the reference's contract)."""
    if not (hasattr(value, "__len__") and hasattr(value, "__iter__")):
        _fail(field_name, value, "sequence (list, tuple, etc.)",
              f"Provide a sequence for {field_name}")
    if len(value) == 0:
        _fail(field_name, value, "non-empty sequence",
              f"Provide at least one item in {field_name}")
    return value


def is_valid_string(value: Any) -> TypeGuard[str]:
    """Non-raising type guard: a str with non-whitespace content."""
    return isinstance(value, str) and bool(value.strip())


def validate_email(value: Any, field_name: str) -> str:
    """A plausibly-formed email address (same pattern the rule engine's
    email rule applies column-wise)."""
    s = validate_string(value, field_name)
    if not _EMAIL_RE.match(s):
        _fail(field_name, value, "valid email address",
              f"Provide a valid email format for {field_name}")
    return s


def validate_url(value: Any, field_name: str) -> str:
    """An http(s) URL."""
    s = validate_string(value, field_name)
    if not _URL_RE.match(s):
        _fail(field_name, value, "valid URL",
              f"Provide a valid URL format for {field_name}")
    return s


def validate_path(value: Any, field_name: str,
                  must_exist: bool = False) -> Path:
    """A filesystem path, optionally required to exist."""
    try:
        p = Path(value)
    except (TypeError, ValueError):
        _fail(field_name, value, "valid file path",
              f"Provide a valid path string for {field_name}")
    if must_exist and not p.exists():
        _fail(field_name, value, "existing file path",
              f"Ensure the path exists: {p}")
    return p


def validate_dict(
    value: Any,
    field_name: str,
    required_keys: Optional[List[str]] = None,
    allowed_keys: Optional[List[str]] = None,
) -> Dict[str, Any]:
    """A dict, optionally constrained to required / allowed key sets."""
    if not isinstance(value, dict):
        _fail(field_name, value, "dictionary",
              f"Provide a dictionary for {field_name}")
    if required_keys:
        missing = set(required_keys) - set(value)
        if missing:
            _fail(field_name, value,
                  f"dictionary with keys: {required_keys}",
                  f"Add missing keys to {field_name}: {sorted(missing)}")
    if allowed_keys:
        extra = set(value) - set(allowed_keys)
        if extra:
            _fail(field_name, value,
                  f"dictionary with only allowed keys: {allowed_keys}",
                  f"Remove extra keys from {field_name}: {sorted(extra)}")
    return value
