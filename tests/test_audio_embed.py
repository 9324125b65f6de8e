"""Noise-robust mel-embedding near-dup: kernel laws + recall on the
seeded additive-noise corpus (the axis fingerprints fail by design)."""

from __future__ import annotations

import numpy as np

from data_quality_spark.operators.audio_embed import (
    _profile_stats,
    embed_near_dup,
    traj_ncc,
)


def test_profile_stats_law():
    m = np.array([[1.0, 3.0], [3.0, 5.0]])
    profile, centered, norm, tvar = _profile_stats(m)
    assert profile.tolist() == [2.0, 4.0]
    assert centered.tolist() == [-1.0, 1.0]  # minus the profile mean (3)
    assert norm == np.sqrt(2.0)
    # deviations from the band profile: all entries are ±1
    assert tvar == 1.0


def test_traj_ncc_laws():
    a = np.arange(12.0).reshape(4, 3)
    assert traj_ncc(a, a) == 1.0
    # truncation to the shorter sequence, then exact correlation
    assert traj_ncc(a, a[:2]) == traj_ncc(a[:2], a[:2])
    assert traj_ncc(a, -a) == -1.0
    assert traj_ncc(np.zeros((0, 3)), a) == 0.0
    assert traj_ncc(np.ones((3, 3)), a) == 0.0  # zero variance -> 0


def test_embed_near_dup_noise_recall(spark):
    from pyspark.sql import functions as F

    from data_quality_spark.plans.schemas import CLIPS_SCHEMA
    from data_quality_spark.synth import make_audio_noise_corpus

    pdf = make_audio_noise_corpus(120, seed=7)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    clips = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA).repartition(
        4, "clip_id"
    )
    pairs = embed_near_dup(clips)
    got = {(r["id_a"], r["id_b"]): r for r in pairs.collect()}
    seeded = [
        (c.rsplit("_n", 1)[0], c)
        for c in pdf["clip_id"]
        if "_n" in c
    ]
    assert seeded
    caught = [p for p in seeded if p in got]
    # the axis fingerprints lose entirely: mel profiles recover >=85%
    assert len(caught) / len(seeded) >= 0.85
    # every reported pair carries thresholds + an evidence grade
    for r in got.values():
        assert r["profile_ncc"] >= 0.75
        assert r["traj_ncc"] >= 0.65
        assert r["evidence"] in ("trajectory", "stationary")
    # determinism: identical bytes across runs
    again = {(r["id_a"], r["id_b"]): r for r in
             embed_near_dup(clips).collect()}
    assert set(again) == set(got)
    assert all(
        (again[k]["profile_ncc"], again[k]["traj_ncc"])
        == (got[k]["profile_ncc"], got[k]["traj_ncc"])
        for k in got
    )
