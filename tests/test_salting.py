"""Salted two-phase gate aggregate must be EXACTLY equivalent to the naive
single-phase groupBy — the salt changes the shuffle shape, never the result
(SURVEY §4.1: explicit salting for skewed lang/codec keys)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_quality_spark.operators.gate import salted_gate_aggregate
from data_quality_spark.pipeline import gate
from data_quality_spark.plans.schemas import CLIPS_SCHEMA
from data_quality_spark.synth import generate_clips


def test_salted_equals_unsalted(spark):
    pdf = generate_clips(400, seed=21)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    decided = gate(spark.createDataFrame(pdf[cols], CLIPS_SCHEMA)).cache()
    try:
        salted = {
            (r.lang_pred, r.codec): (r.n_clips, r.n_keep, round(r.audio_seconds, 6))
            for r in salted_gate_aggregate(decided, salt_buckets=16).collect()
        }
        naive = {
            (r["lang_pred"], r["codec"]): (
                r["n"], r["k"], round(r["a"], 6)
            )
            for r in decided.groupBy("lang_pred", "codec")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum((F.col("decision") == "keep").cast("long")).alias("k"),
                F.sum(F.col("dur_ms").cast("double") / 1000.0).alias("a"),
            )
            .collect()
        }
        assert salted == naive
        # the dominant key is split across salt buckets: with 16 buckets the
        # hot (en, pcm16) group's partial rows shrink by ~16x before phase 2
        assert sum(v[0] for v in salted.values()) == 400
    finally:
        decided.unpersist()
