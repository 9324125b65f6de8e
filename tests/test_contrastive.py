"""Contrastive triplet mining (operators/contrastive.py).

Correctness model: positives must be same-speaker, negatives must be
the pitch-matched twin (the seeded confuser class), anchors without a
confuser in their pitch class emit nothing, margins are large and
positive (the corpus is designed off the float boundary), and the
relation is deterministic under repartitioning.
"""

from __future__ import annotations

import pytest

from data_quality_spark.operators.contrastive import voice_triplets
from data_quality_spark.plans.schemas import CLIPS_SCHEMA
from data_quality_spark.synth import make_audio_voice_corpus


def _clips(spark, pitch_twins):
    pdf = make_audio_voice_corpus(8, 5, seed=42, pitch_twins=pitch_twins)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    return spark.createDataFrame(pdf[cols], CLIPS_SCHEMA)


@pytest.fixture(scope="module")
def triplets(spark):
    return voice_triplets(_clips(spark, 3)).collect()


def _identity(cid):
    return cid[:4]  # vc00 / tw00


def test_triplet_semantics(triplets):
    assert len(triplets) > 0
    for r in triplets:
        # positive: same identity, different clip
        assert _identity(r["positive"]) == _identity(r["anchor"])
        assert r["positive"] != r["anchor"]
        # negative: the pitch twin — same pitch slot, other identity
        a, n = _identity(r["anchor"]), _identity(r["negative"])
        assert a != n
        assert a[2:] == n[2:]  # twin shares the speaker index
        assert {a[:2], n[:2]} == {"vc", "tw"}
        # margins are large, positive, and consistent
        assert r["pos_dist2_r"] < 1.0 < r["neg_dist2_r"]
        assert r["margin_r"] == pytest.approx(
            r["neg_dist2_r"] - r["pos_dist2_r"], abs=2e-6)
        assert r["margin_r"] > 10.0


def test_only_confused_pitch_classes_emit(triplets):
    # twins exist for speakers 0-2 only: anchors must come exclusively
    # from those six identities, and every one of their clips anchors
    anchors = {r["anchor"] for r in triplets}
    expected = {
        f"{p}{s:02d}c{c:02d}"
        for p in ("vc", "tw") for s in range(3) for c in range(5)
    }
    assert anchors == expected


def test_no_twins_no_triplets(spark):
    assert voice_triplets(_clips(spark, 0)).count() == 0


def test_partitioning_invariance(spark, triplets):
    again = voice_triplets(_clips(spark, 3).repartition(13)).collect()
    key = lambda rows: sorted(tuple(r) for r in rows)  # noqa: E731
    assert key(again) == key(triplets)
