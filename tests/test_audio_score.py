"""Composite clip quality score: gate/score consistency (same flag
expressions), deduction-law invariants, and the rollup reconciliation."""

from __future__ import annotations

import pytest

from data_quality_spark.operators.audio_score import (
    clip_quality_score,
    quality_score_rollup,
    rule_weights,
)
from data_quality_spark.pipeline import (
    DROP_RULES_V2,
    _text_heuristics,
    decide_v2,
    featurize_v2,
)


@pytest.fixture(scope="module")
def scored_and_decided(spark):
    from data_quality_spark.plans.schemas import CLIPS_SCHEMA
    from data_quality_spark.synth import generate_clips

    pdf = generate_clips(300, seed=42)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    df = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA).repartition(4, "clip_id")
    feat = _text_heuristics(featurize_v2(df))
    scored = clip_quality_score(feat).select("clip_id", "q_score", "grade")
    decided = decide_v2(feat).select("clip_id", "decision", "decision_reason")
    return (
        {r["clip_id"]: r for r in scored.collect()},
        {r["clip_id"]: r for r in decided.collect()},
    )


def test_weights_cover_ladder():
    w = rule_weights()
    assert set(w) == set(DROP_RULES_V2)
    assert all(v in (10, 25) for v in w.values())


def test_keep_iff_perfect_score(scored_and_decided):
    scored, decided = scored_and_decided
    assert set(scored) == set(decided)
    for cid, r in decided.items():
        s = scored[cid]["q_score"]
        if r["decision"] == "keep":
            assert s == 100, cid
        else:
            assert s <= 90, (cid, r["decision_reason"], s)


def test_decode_failed_scores_zero(scored_and_decided):
    scored, decided = scored_and_decided
    failed = [c for c, r in decided.items()
              if r["decision_reason"] == "decode_failed"]
    assert failed, "corpus should contain undecodable clips"
    for cid in failed:
        assert scored[cid]["q_score"] == 0
        assert scored[cid]["grade"] == "F"


def test_grades_partition_scores(scored_and_decided):
    scored, _ = scored_and_decided
    for r in scored.values():
        s, g = r["q_score"], r["grade"]
        assert 0 <= s <= 100
        expect = "A" if s >= 90 else "B" if s >= 75 else "C" if s >= 50 \
            else "D" if s >= 25 else "F"
        assert g == expect


def test_rollup_reconciles(spark, scored_and_decided):
    scored, _ = scored_and_decided
    from data_quality_spark.plans.schemas import CLIPS_SCHEMA
    from data_quality_spark.synth import generate_clips

    pdf = generate_clips(300, seed=42)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    df = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA)
    roll = quality_score_rollup(
        clip_quality_score(_text_heuristics(featurize_v2(df)))
    ).collect()
    assert sum(r["n_clips"] for r in roll) == 300
    assert sum(r["score_sum"] for r in roll) == sum(
        r["q_score"] for r in scored.values()
    )
    for r in roll:
        assert r["n_clips"] == (r["n_a"] + r["n_b"] + r["n_c"]
                                + r["n_d"] + r["n_f"])
