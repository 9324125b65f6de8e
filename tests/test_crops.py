"""Crop-window scheduling (operators/crops.py).

Correctness model: offsets are a pure function of (clip, epoch, crop,
seed) — invariant under repartitioning, different across epochs —
always inside [0, dur - win]; short and NULL-duration clips emit
nothing; the law matches the from-spec XXH64 chain.
"""

from __future__ import annotations

import pytest

from data_quality_spark.functions.xxh64 import xxh64_fold
from data_quality_spark.operators.crops import crop_schedule


@pytest.fixture(scope="module")
def clips(spark):
    rows = [
        ("a", 2000), ("b", 1500), ("c", 499),  # c: too short for 500
        ("d", None),                            # d: unknown duration
        ("e", 500),                             # e: exactly one position
    ]
    return spark.createDataFrame(rows, "clip_id string, dur_ms int")


def test_matches_xxh64_chain_and_bounds(spark, clips):
    got = crop_schedule(clips, win_ms=500, crops_per_clip=3, epoch=2,
                        seed=9).collect()
    durs = {"a": 2000, "b": 1500, "e": 500}
    assert {r["clip_id"] for r in got} == set(durs)
    assert len(got) == 9
    for r in got:
        d = durs[r["clip_id"]]
        h = xxh64_fold([r["clip_id"], ("int", 2),
                        ("int", r["crop_idx"]), ("int", 9)])
        assert r["start_ms"] == h % (d - 500 + 1)
        assert 0 <= r["start_ms"] <= d - 500
    # exactly-window clip has only offset 0
    assert all(r["start_ms"] == 0 for r in got if r["clip_id"] == "e")


def test_epochs_differ_and_partitioning_invariant(spark, clips):
    a = sorted(tuple(r) for r in crop_schedule(
        clips, 500, 2, epoch=0, seed=1).collect())
    b = sorted(tuple(r) for r in crop_schedule(
        clips.repartition(5), 500, 2, epoch=0, seed=1).collect())
    assert a == b
    e1 = sorted(tuple(r) for r in crop_schedule(
        clips, 500, 2, epoch=1, seed=1).collect())
    assert [t[3] for t in a] != [t[3] for t in e1]  # offsets re-drawn


def test_rejects_bad_params(spark, clips):
    with pytest.raises(ValueError):
        crop_schedule(clips, 0)
    with pytest.raises(ValueError):
        crop_schedule(clips, 500, crops_per_clip=0)
