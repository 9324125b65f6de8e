"""Checksum-validated PII / secret audit over a document corpus.

Builds on ``functions/pii.py`` (Luhn cards, ISO 13616 IBAN mod-97,
integer-exact secret-ish tokens): one scan, all detection map-side array
arithmetic inside whole-stage codegen, ZERO shuffles before the optional
rollup.  The audit deliberately reports counts, never the matched values —
a PII audit must not become a PII sink; pair with
``functions/text.SCRUB_CHAIN`` for redaction.

Scale notes: per-row cost is regex extraction plus O(len(candidate)^2)
integer array work on the (rare) candidate tokens; there is no shuffle,
no UDF, and no driver collection, so the operator is embarrassingly
parallel at any corpus size.

Reference analog: scrub/redaction rule family
(``/root/reference/src/data_quality/checkpoints.py`` PII rules), extended
with checksum validation the reference lacks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_quality_spark.functions.pii import (
    card_candidates,
    iban_candidates,
    iban_valid,
    luhn_valid,
    secret_candidates,
    secretish,
)

__all__ = ["pii_secrets_audit", "pii_secrets_summary"]


def _counts(text: Column) -> list[Column]:
    cards = card_candidates(text)
    ibans = iban_candidates(text)
    secrets = secret_candidates(text)
    return [
        F.size(cards).alias("n_card_cand"),
        F.size(F.filter(cards, luhn_valid)).alias("n_card_valid"),
        F.size(ibans).alias("n_iban_cand"),
        F.size(F.filter(ibans, iban_valid)).alias("n_iban_valid"),
        F.size(secrets).alias("n_secret_cand"),
        F.size(F.filter(secrets, lambda t: secretish(t))).alias("n_secret_flag"),
    ]


def pii_secrets_audit(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hits_only: bool = True,
) -> DataFrame:
    """Per-doc candidate/validated counts for cards, IBANs, and secret-ish
    tokens.  ``hits_only`` keeps only docs with at least one candidate
    (the audit's working set; at corpus scale the clean bulk never leaves
    the scan stage)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    out = docs.select(F.col(id_col), *_counts(t))
    if hits_only:
        out = out.where(
            (F.col("n_card_cand") + F.col("n_iban_cand") + F.col("n_secret_cand"))
            > 0
        )
    return out


def pii_secrets_summary(
    docs: DataFrame,
    by: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Corpus rollup: per-``by`` totals of candidates and validated hits
    plus the affected-doc count.  One scan + one small-key aggregate."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    per = docs.select(F.col(by), *_counts(t))
    any_hit = (
        F.col("n_card_valid") + F.col("n_iban_valid") + F.col("n_secret_flag") > 0
    )
    return (
        per.groupBy(by)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(any_hit, 1).otherwise(0)).cast("long").alias("n_docs_hit"),
            F.sum("n_card_valid").cast("long").alias("cards_valid"),
            F.sum("n_iban_valid").cast("long").alias("ibans_valid"),
            F.sum("n_secret_flag").cast("long").alias("secrets_flagged"),
        )
        .orderBy(by)
    )


def pii_rules(text_col: str = "text") -> list:
    """The PII rule family in the reference's Rule shape (for
    ``compile_rules`` / the fused audit CLI): checksum-validated card or
    IBAN present → critical, secret-ish token → warning, digit runs that
    fail the checksum → info (near-miss evidence, not PII)."""
    from data_quality_spark.operators.rules import Rule

    t = F.coalesce(F.col(text_col), F.lit(""))
    cards = card_candidates(t)
    ibans = iban_candidates(t)
    secrets = secret_candidates(t)
    n_card_valid = F.size(F.filter(cards, luhn_valid))
    preds = {
        "pii_credit_card": (
            n_card_valid > 0, "critical",
            "Luhn-valid payment card number present"),
        "pii_iban": (
            F.size(F.filter(ibans, iban_valid)) > 0, "critical",
            "mod-97-valid IBAN present"),
        "pii_secret_token": (
            F.size(F.filter(secrets, lambda x: secretish(x))) > 0, "warning",
            "high-diversity secret-shaped token present"),
        "pii_card_near_miss": (
            (F.size(cards) > 0) & (n_card_valid == 0), "info",
            "card-shaped digit run failing the Luhn checksum"),
    }
    return [
        Rule(
            name=name,
            column=text_col,
            predicate=lambda d, c=cond: c,
            severity=sev,
            description=desc,
        )
        for name, (cond, sev, desc) in preds.items()
    ]


def pii_issues(
    docs: DataFrame,
    table: str = "documents",
    text_col: str = "text",
) -> DataFrame:
    """QualityIssue relation for the PII family — ONE fused aggregate over
    one scan (compile_rules), composing with every other issue stream."""
    from data_quality_spark.operators.rules import compile_rules

    return compile_rules(docs, table, pii_rules(text_col))
