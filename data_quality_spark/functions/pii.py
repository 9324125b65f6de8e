"""Checksum-validated PII and secret detection as pure Catalyst Column
builders — no UDFs, every decision exact-integer so the operators carry
strict DuckDB twins.

Detectors (all public-spec):
- Credit cards: ISO/IEC 7812 Luhn check over 13-19 digit candidates
  (with optional space/dash grouping).  The checksum kills the
  digit-run false positives a bare regex scrub (functions/text.py
  SCRUB_CHAIN) has to live with.
- IBAN: ISO 13616 mod-97 check (rearrange first four chars to the end,
  letters -> 10..35, remainder must be 1), folded per character with an
  ``aggregate`` HOF so the big integer never materializes — every
  intermediate stays < 97 * 100.
- Secret-ish tokens: long high-diversity alphanumeric tokens (API keys,
  auth tokens).  detect-secrets' published rule is a Shannon-entropy
  threshold; floats at a threshold boundary are not bit-stable across
  engines, so the decision here is an integer-exact surrogate for the
  same family: candidate length >= 24 over the base64ish alphabet,
  contains letters AND digits, >= ``min_distinct`` distinct characters,
  and no single character holding more than 1/4 of the token
  (cross-multiplied, never divided).

Dialect notes: candidate regexes avoid lookarounds (RE2 lacks them);
``\\b`` and explicit ASCII classes behave identically in java.util.regex
and RE2.  Character walks use substr-by-index, not split-on-empty (the
engines disagree on trailing empties).

Reference analog: the regex PII scrub family
(``/root/reference/src/data_quality/checkpoints.py`` scrub rules) —
extended with checksum validation, which the reference does not do.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "CARD_CANDIDATE_REGEX",
    "IBAN_CANDIDATE_REGEX",
    "SECRET_CANDIDATE_REGEX",
    "card_candidates",
    "iban_candidates",
    "secret_candidates",
    "luhn_valid",
    "iban_valid",
    "secretish",
]

# 13-19 digits with optional single space/dash between groups.
CARD_CANDIDATE_REGEX = r"\b(?:[0-9][ -]?){12,18}[0-9]\b"
# ISO 13616 shape: country code, two check digits, 11-30 alphanumerics.
IBAN_CANDIDATE_REGEX = r"\b[A-Z]{2}[0-9]{2}[A-Z0-9]{11,30}\b"
# base64ish long token (key material shape).
SECRET_CANDIDATE_REGEX = r"\b[A-Za-z0-9+/_=-]{24,}\b"

SECRET_MIN_DISTINCT = 15
# max single-char share: count * 4 <= length  (<= 25%)
SECRET_MAX_CHAR_NUM, SECRET_MAX_CHAR_DEN = 1, 4


def card_candidates(text: Column) -> Column:
    """Digit-normalized card candidates (grouping stripped)."""
    return F.transform(
        F.regexp_extract_all(text, F.lit(CARD_CANDIDATE_REGEX), F.lit(0)),
        lambda c: F.regexp_replace(c, r"[ -]", ""),
    )


def iban_candidates(text: Column) -> Column:
    return F.regexp_extract_all(text, F.lit(IBAN_CANDIDATE_REGEX), F.lit(0))


def secret_candidates(text: Column) -> Column:
    return F.regexp_extract_all(text, F.lit(SECRET_CANDIDATE_REGEX), F.lit(0))


def _chars(tok: Column) -> Column:
    """1-char substrings by index (dialect-stable char walk)."""
    return F.transform(
        F.sequence(F.lit(1), F.length(tok)),
        lambda i: F.substr(tok, i, F.lit(1)),
    )


def luhn_valid(digits: Column) -> Column:
    """ISO/IEC 7812 Luhn checksum over a digits-only string: from the
    right, double every second digit (subtract 9 when > 9), sum, valid
    when the sum is a multiple of 10.  Exact-integer fold."""
    n = F.length(digits)
    contrib = F.transform(
        F.sequence(F.lit(0), n - F.lit(1)),
        lambda j: F.when(
            j % 2 == 1,
            F.when(
                F.substr(digits, n - j, F.lit(1)).cast("int") * 2 > 9,
                F.substr(digits, n - j, F.lit(1)).cast("int") * 2 - 9,
            ).otherwise(F.substr(digits, n - j, F.lit(1)).cast("int") * 2),
        ).otherwise(F.substr(digits, n - j, F.lit(1)).cast("int")),
    )
    total = F.aggregate(contrib, F.lit(0), lambda a, x: a + x)
    return (n >= 13) & (n <= 19) & (total % 10 == 0)


def iban_valid(iban: Column) -> Column:
    """ISO 13616 mod-97: move the first four chars to the end, replace
    letters with 10..35, remainder mod 97 must equal 1.  The fold keeps
    ``acc < 97`` and multiplies by 10 (digit) or 100 (letter) per char,
    so everything stays in 32-bit range — no big-int, no UDF."""
    rearranged = F.concat(F.substr(iban, F.lit(5)), F.substr(iban, F.lit(1), F.lit(4)))
    chars = _chars(rearranged)
    acc = F.aggregate(
        chars,
        F.lit(0),
        lambda a, c: F.when(
            c.rlike("^[0-9]$"), (a * 10 + c.cast("int")) % 97
        ).otherwise((a * 100 + (F.ascii(c) - 55)) % 97),
    )
    return (acc == 1) & iban.rlike("^[A-Z]{2}[0-9]{2}[A-Z0-9]{11,30}$")


def secretish(
    tok: Column,
    min_distinct: int = SECRET_MIN_DISTINCT,
) -> Column:
    """Integer-exact high-diversity rule (entropy-threshold surrogate):
    letters AND digits present, >= ``min_distinct`` distinct chars, and
    no char exceeding 1/4 of the token (cross-multiplied)."""
    chars = _chars(tok)
    distinct = F.array_distinct(chars)
    max_cnt = F.array_max(
        F.transform(
            distinct, lambda c: F.size(F.filter(chars, lambda x: x == c))
        )
    )
    return (
        tok.rlike("[A-Za-z]")
        & tok.rlike("[0-9]")
        & (F.size(distinct) >= F.lit(min_distinct))
        & (max_cnt * SECRET_MAX_CHAR_DEN <= F.length(tok) * SECRET_MAX_CHAR_NUM)
    )
