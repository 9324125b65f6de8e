"""Gate-score aggregate (A18) with explicit skew salting + medallion checkpoints.

The north rule's "light reduceByKey-style aggregate gate score per partition"
over skewed language/codec keys: ``en``/``pcm16`` dominates the corpus (60% /
70% by construction — real web-scale audio corpora skew the same way), so a
naive ``groupBy(lang, codec)`` would funnel the hot key through one reducer.

The salted two-phase aggregate here is the classic fix: append
``pmod(hash(clip_id), K)`` to the grouping key, partially aggregate (map-side
combine already shrinks each mapper's output to ≤ |keys|×K rows), then
re-aggregate without the salt.  The second shuffle moves only |keys|×K tiny
rows.  AQE's skew handling covers joins; for aggregates the salt is ours to
add (SURVEY.md §4.1).

``BronzeToSilverCheckpoint`` / ``SilverToGoldCheckpoint`` mirror the
reference's medallion gates (``/root/reference/src/data_quality/
checkpoints.py:61-137, 307-377``): a fixed rule list fused into one aggregate
pass, success ⇔ zero critical issues (checkpoints.py:99).
"""

from __future__ import annotations

import time
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.report import CheckpointResult
from ..plans.schemas import Severity
from .rules import TOTAL_SENTINEL, Rule, compile_rules, total_sentinel_rule

__all__ = [
    "salted_gate_aggregate",
    "run_fused_checkpoint",
    "BronzeToSilverCheckpoint",
    "SilverToGoldCheckpoint",
    "run_medallion_checkpoints",
]


def salted_gate_aggregate(
    decided: DataFrame,
    keys: Sequence[str] = ("lang_pred", "codec"),
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe gate rollup: per-key clip counts, keep counts,
    keep rate, mean rms/ppl, total audio seconds.

    Phase 1 groups on (keys..., salt) — hot keys split across ``salt_buckets``
    reducers; phase 2 merges the ≤ |keys|×buckets partials.  All means are
    carried as (sum, count) pairs so the two-phase split is exact.
    """
    is_keep = (F.col("decision") == "keep").cast("long")
    salted = decided.withColumn(
        "__salt", F.pmod(F.hash(F.col("clip_id")), F.lit(salt_buckets))
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(is_keep).alias("n_keep"),
        F.sum(F.coalesce(F.col("rms_db"), F.lit(0.0))).alias("rms_sum"),
        F.sum(F.when(F.col("rms_db").isNotNull(), 1).otherwise(0)).alias("rms_n"),
        F.sum(F.col("ppl")).alias("ppl_sum"),
        # exact integer partial: the final seconds value is then ONE double
        # division, independent of partial-agg merge order (a float partial
        # sum would make the last-ulp — and any rounded report built on it —
        # depend on shuffle arrival order)
        F.sum(F.col("dur_ms").cast("long")).alias("audio_ms"),
    )
    return (
        partial.groupBy(*keys)
        .agg(
            F.sum("n").cast("long").alias("n_clips"),
            F.sum("n_keep").cast("long").alias("n_keep"),
            (F.sum("n_keep") / F.sum("n")).cast("double").alias("keep_rate"),
            F.when(F.sum("rms_n") > 0, F.sum("rms_sum") / F.sum("rms_n"))
            .cast("double")
            .alias("avg_rms_db"),
            (F.sum("ppl_sum") / F.sum("n")).cast("double").alias("avg_ppl"),
            (F.sum("audio_ms").cast("double") / 1000.0).alias("audio_seconds"),
        )
        .orderBy(*keys)
    )


def run_fused_checkpoint(
    name: str, df: DataFrame, table: str, rules: Sequence[Rule]
) -> CheckpointResult:
    """ONE action, ONE scan: the rule list plus a row-count sentinel fuse
    into a single aggregate, and ``total_records`` is read off the
    sentinel's ``total`` column instead of a second ``df.count()`` pass
    (the r2 verdict's 2×-IO checkpoint finding).  Proven execute-once by
    ``tests/test_reference_rules.py::test_checkpoint_single_pass``."""
    t0 = time.perf_counter()
    rows = compile_rules(
        df, table, list(rules) + [total_sentinel_rule()]
    ).collect()
    issues = [r.asDict() for r in rows if r["issue_type"] != TOTAL_SENTINEL]
    total = next(r["total"] for r in rows if r["issue_type"] == TOTAL_SENTINEL)
    failed = sum(i["count"] for i in issues)
    criticals = [i for i in issues if i["severity"] == Severity.CRITICAL.value]
    return CheckpointResult(
        checkpoint_name=name,
        success=not criticals,  # success ⇔ zero criticals (ref :99)
        issues=issues,
        total_records=total,
        passed_records=max(total - failed, 0),
        failed_records=failed,
        execution_time_ms=(time.perf_counter() - t0) * 1000.0,
        summary=f"{len(issues)} issue type(s), {len(criticals)} critical",
    )


class _Checkpoint:
    name = "checkpoint"

    def rules(self, df: DataFrame) -> list[Rule]:  # pragma: no cover
        raise NotImplementedError

    def run(self, df: DataFrame, table: str = "clips") -> CheckpointResult:
        return run_fused_checkpoint(self.name, df, table, self.rules(df))


class BronzeToSilverCheckpoint(_Checkpoint):
    """Raw-clip sanity gate ≈ ref BronzeToSilver rule list (not-null ids,
    range rule, enum rule, version-format regex → here: the structural clip
    rules that need no decode)."""

    name = "bronze_to_silver"

    def rules(self, df: DataFrame) -> list[Rule]:
        from ..synth import ALLOWED_SR

        return [
            Rule(
                "null_clip_id", "clip_id",
                predicate=lambda d: d.clip_id.isNull(),
                severity=Severity.CRITICAL.value,
            ),
            Rule(
                "null_payload", "bytes",
                predicate=lambda d: d["bytes"].isNull(),
                severity=Severity.CRITICAL.value,
            ),
            Rule(
                "sample_rate_enum", "sr_hz",
                predicate=lambda d: ~d.sr_hz.isin(list(ALLOWED_SR)),
                severity=Severity.WARNING.value,
            ),
            Rule(
                "duration_range", "dur_ms",
                predicate=lambda d: (d.dur_ms <= 0) | (d.dur_ms > 60_000),
                scope=lambda d: d.dur_ms.isNotNull(),
                severity=Severity.CRITICAL.value,
            ),
            Rule(
                "codec_enum", "codec",
                predicate=lambda d: ~d.codec.isin(["pcm16", "mulaw", "wav"]),
                severity=Severity.WARNING.value,
            ),
        ]


class SilverToGoldCheckpoint(_Checkpoint):
    """Promotion gate over *decided* rows ≈ ref SilverToGold: accept-only
    scope + content rules (checkpoints.py:307-377)."""

    name = "silver_to_gold"

    def rules(self, df: DataFrame) -> list[Rule]:
        keep_scope = lambda d: d.decision == "keep"  # noqa: E731
        return [
            Rule(
                "kept_low_confidence", "lang_conf",
                predicate=lambda d: d.lang_conf < 0.5,
                scope=keep_scope,
                severity=Severity.CRITICAL.value,
            ),
            Rule(
                "kept_unscrubbed_pii", "scrubbed",
                predicate=lambda d: d.scrubbed.rlike(
                    r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
                ),
                scope=keep_scope,
                severity=Severity.CRITICAL.value,
            ),
            Rule(
                "kept_silence", "silence_frac",
                predicate=lambda d: d.silence_frac > 0.8,
                scope=keep_scope,
                severity=Severity.WARNING.value,
            ),
        ]


def run_medallion_checkpoints(
    bronze: DataFrame, decided: DataFrame
) -> dict[str, CheckpointResult]:
    """Run both layers (ref checkpoints.py:594-620)."""
    return {
        "bronze_to_silver": BronzeToSilverCheckpoint().run(bronze),
        "silver_to_gold": SilverToGoldCheckpoint().run(decided),
    }
