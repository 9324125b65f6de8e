"""Fused text audit: every per-document text-quality rule in ONE scan.

The text twin of ``operators.audio_audit``: the à-la-carte operators
(gopher/repetition flags, stopword stats, encoding audit, quality
scorer) each scan the corpus — right for focused use, k× the IO when a
corpus health check wants all of them.  At 100 TB the scan IS the cost,
so the audit shape is: compute every rule signal as a column expression
over one pass and fold the counts into the reference's QualityIssue
relation with the SAME fused-aggregate machinery every other issue
stream uses (``operators.rules.compile_rules`` — one partial/final
HashAggregate, adding a rule adds an expression, not a pass).

Rule signals reuse the exact expressions of their standalone operators
(each of which is hash-verified by its own DuckDB twin), so this
module's differential surface is the composition + the fused fold.

Reference analog: ``health_check`` composing nulls+orphans+duplicates
into one issue stream (``/root/reference/src/data_quality/
quality_scanner.py:212-271``) — this is the same composition over the
text-quality rule family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .docs import (
    CONTROL_PATTERN,
    MOJIBAKE_PATTERN,
    REPLACEMENT_PATTERN,
    _ALL_STOPWORDS,
    token_count_col,
)
from .quality_model import quality_score_col
from .rules import Rule, compile_rules

__all__ = ["text_audit_rules", "text_audit_issues"]

# (issue_type, severity, description) in ladder order
_RULES_META = {
    "null_text": ("critical", "text is NULL"),
    "empty_text": ("warning", "text is empty or whitespace-only"),
    "too_few_words": ("warning", "fewer words than the corpus minimum"),
    "too_many_words": ("warning", "more words than the corpus maximum"),
    "dup_token_mass": ("warning", "duplicated-token fraction above 3/10"),
    "stopword_free": ("warning", "no stopwords in a non-trivial doc"),
    "digit_flood": ("warning", "digits are most of the characters"),
    "special_flood": ("warning", "special characters above 1/5 of chars"),
    "encoding_suspect": (
        "critical", "replacement char / control byte / mojibake present"),
    "low_quality_score": ("info", "linear quality score at or below 0"),
}


def _signals(text_col: str) -> dict[str, Column]:
    """The shared per-row signal expressions (same definitions as the
    standalone operators — exact integers except the quality score)."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    toks = F.split(F.trim(F.lower(text)), r"\s+")
    nt = token_count_col(F.col(text_col))
    stop_arr = F.array(*[F.lit(m) for m in _ALL_STOPWORDS])
    ns = F.when(nt == 0, F.lit(0)).otherwise(
        F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    )
    dup = F.when(nt == 0, F.lit(0)).otherwise(
        nt - F.size(F.array_distinct(toks))
    )
    nc = F.length(text)
    nd = nc - F.length(F.regexp_replace(text, r"[0-9]", ""))
    nsp = F.length(F.regexp_replace(text, r"[A-Za-z0-9À-ÿ \t\n\r]", ""))
    return {
        "nt": nt, "ns": ns, "dup": dup, "nc": nc, "nd": nd, "nsp": nsp,
        "n_repl": F.regexp_count(text, F.lit(REPLACEMENT_PATTERN)),
        "n_ctl": F.regexp_count(text, F.lit(CONTROL_PATTERN)),
        "n_moji": F.regexp_count(text, F.lit(MOJIBAKE_PATTERN)),
        "q": quality_score_col(text_col),
    }


def text_audit_rules(
    min_words: int = 15,
    max_words: int = 90,
    text_col: str = "text",
) -> list[Rule]:
    """The fused rule list; thresholds are integer-exact cross
    multiplications (no float ever decides a count except the quality
    score, whose expression is engine-deterministic — see
    quality_model)."""
    s = _signals(text_col)
    preds: dict[str, Column] = {
        "null_text": F.col(text_col).isNull(),
        "empty_text": F.col(text_col).isNotNull()
        & (F.length(F.trim(F.col(text_col))) == 0),
        "too_few_words": (s["nt"] > 0) & (s["nt"] < min_words),
        "too_many_words": s["nt"] > max_words,
        "dup_token_mass": F.lit(10) * s["dup"] > F.lit(3) * s["nt"],
        "stopword_free": (s["nt"] >= 5) & (s["ns"] == 0),
        "digit_flood": F.lit(2) * s["nd"] > s["nc"],
        "special_flood": F.lit(5) * s["nsp"] > s["nc"],
        "encoding_suspect": (s["n_repl"] > 0)
        | (s["n_ctl"] > 0)
        | (s["n_moji"] > 0),
        "low_quality_score": s["q"] <= F.lit(0.0),
    }
    assert set(preds) == set(_RULES_META)
    return [
        Rule(
            name=name,
            column=text_col,
            predicate=lambda d, c=preds[name]: c,
            severity=_RULES_META[name][0],
            description=_RULES_META[name][1],
        )
        for name in _RULES_META
    ]


def text_audit_issues(
    docs: DataFrame,
    table: str = "documents",
    min_words: int = 15,
    max_words: int = 90,
) -> DataFrame:
    """QualityIssue relation over the whole text-rule family — one scan,
    one fused partial/final aggregate (only rules with count > 0 emit,
    the reference's convention)."""
    return compile_rules(docs, table, text_audit_rules(min_words, max_words))
