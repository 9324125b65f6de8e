"""Composite per-clip audio quality score: the gate-v2 defect ladder
folded into one 0-100 deduction score (the audio analog of
``operators/quality_model.py`` for text, and of the reference's piecewise
daily quality score, ``/root/reference/src/data_quality/
benchmark_storage.py:282-346``, applied per row instead of per day).

Law (exact-integer, bit-stable given the hash-verified v2 metrics):
- an undecodable clip scores 0 outright;
- otherwise score = max(0, 100 - sum of fired-rule weights), where every
  DROP_RULES_V2 rule deducts by severity (critical 25, warning 10);
- grade buckets: A >= 90, B >= 75, C >= 50, D >= 25, else F.

The flags are the SAME Column expressions the gate uses
(``pipeline.rule_flags_v2``), so score/gate can never disagree about
whether a defect fired; everything after featurization is whole-stage
codegen column arithmetic — no UDF, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["CRIT_WEIGHT", "WARN_WEIGHT", "rule_weights", "clip_quality_score",
           "quality_score_rollup"]

CRIT_WEIGHT = 25
WARN_WEIGHT = 10

GRADE_BOUNDS = [(90, "A"), (75, "B"), (50, "C"), (25, "D")]


def rule_weights() -> dict[str, int]:
    from data_quality_spark.pipeline import DROP_RULES_V2

    return {
        name: (CRIT_WEIGHT if sev == "critical" else WARN_WEIGHT)
        for name, sev in DROP_RULES_V2.items()
    }


def _grade(score: Column) -> Column:
    out = F.lit("F")
    for bound, g in reversed(GRADE_BOUNDS):
        out = F.when(score >= F.lit(bound), F.lit(g)).otherwise(out)
    return out


def clip_quality_score(featurized: DataFrame) -> DataFrame:
    """Adds ``q_score`` (int 0-100) and ``grade`` to a
    ``pipeline.featurize_v2`` + ``_text_heuristics`` featurized frame."""
    from data_quality_spark.pipeline import (
        _drop_defaults,
        rule_flags_v2,
        with_metric_defaults,
    )

    featurized = with_metric_defaults(featurized, v2=True)
    flags = rule_flags_v2(featurized)
    weights = rule_weights()
    deductions = None
    for name, col in flags.items():
        d = F.when(col, F.lit(weights[name])).otherwise(F.lit(0))
        deductions = d if deductions is None else deductions + d
    raw = F.lit(100) - deductions
    score = (
        F.when(flags["decode_failed"], F.lit(0))
        .otherwise(F.greatest(raw, F.lit(0)))
        .cast("int")
    )
    return _drop_defaults(
        featurized.withColumn("q_score", score).withColumn(
            "grade", _grade(F.col("q_score"))
        )
    )


def quality_score_rollup(scored: DataFrame, by: str = "codec") -> DataFrame:
    """Per-``by`` score distribution: clip count, exact integer score sum
    (mean left to the reader — no per-row float division), and per-grade
    counts.  One small-key aggregate."""
    grade_cols = [
        F.sum(F.when(F.col("grade") == g, 1).otherwise(0))
        .cast("long")
        .alias(f"n_{g.lower()}")
        for g in ["A", "B", "C", "D", "F"]
    ]
    return (
        scored.groupBy(by)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_clips"),
            F.sum("q_score").cast("long").alias("score_sum"),
            F.min("q_score").cast("int").alias("min_score"),
            *grade_cols,
        )
        .orderBy(by)
    )
