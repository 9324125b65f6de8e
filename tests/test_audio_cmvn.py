"""Corpus CMVN stats (operators/audio_cmvn.py).

Correctness model: per-clip integer partials must equal a direct numpy
quantize+sum on the same matrices; the corpus stats must be BIT-identical
under repartitioning (the operator's reason to exist — float sums are
not); zero-frame clips are total no-ops; and the fixed-point stats must
sit within the documented quantization tolerance of the plain float64
stats.
"""

from __future__ import annotations

import numpy as np
import pytest

from data_quality_spark.operators.audio_cmvn import (
    CMVN_SCALE,
    cmvn_partials,
    cmvn_stats,
)
from data_quality_spark.operators.audio_mel import mel_features
from data_quality_spark.plans.schemas import CLIPS_SCHEMA
from data_quality_spark.synth import generate_clips


@pytest.fixture(scope="module")
def mel_df(spark):
    pdf = generate_clips(120, seed=7)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    clips = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA)
    return mel_features(clips).persist()


def test_partials_match_direct_numpy(mel_df):
    rows = mel_df.select("clip_id", "n_mels", "feat").collect()
    got = {r["clip_id"]: r for r in cmvn_partials(mel_df).collect()}
    checked = 0
    for r in rows:
        mat = np.frombuffer(r["feat"], dtype="<f8").reshape(-1, r["n_mels"])
        q = np.rint(mat * CMVN_SCALE).astype(np.int64)
        g = got[r["clip_id"]]
        assert g["n_frames"] == mat.shape[0]
        assert g["sum_q"] == [int(v) for v in q.sum(axis=0)]
        assert g["sum_q2"] == [int(v) for v in (q * q).sum(axis=0)]
        checked += 1
    assert checked == len(got)


def test_stats_bit_identical_under_repartitioning(spark, mel_df):
    a = cmvn_stats(mel_df, decimals=12).orderBy("band").collect()
    b = cmvn_stats(mel_df.repartition(17), decimals=12).orderBy(
        "band").collect()
    # 12 dp ~ full double precision for these magnitudes: any float-order
    # dependence would show here
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_zero_frame_clips_are_noops(spark, mel_df):
    # corrupt clips produce ok=false, zero frames; dropping them must not
    # change any moment (only n_clips)
    full = {r["band"]: r for r in cmvn_stats(mel_df).collect()}
    kept = {
        r["band"]: r
        for r in cmvn_stats(mel_df.filter("n_frames > 0")).collect()
    }
    n_zero = mel_df.filter("n_frames = 0").count()
    assert n_zero > 0
    for band, r in full.items():
        k = kept[band]
        assert r["n_clips"] - k["n_clips"] == n_zero
        assert (r["n_frames"], r["mean_r"], r["std_r"]) == (
            k["n_frames"], k["mean_r"], k["std_r"])


def test_quantization_tolerance_vs_float64(mel_df):
    rows = mel_df.select("n_mels", "feat").collect()
    mats = [
        np.frombuffer(r["feat"], dtype="<f8").reshape(-1, r["n_mels"])
        for r in rows
    ]
    all_cells = np.concatenate([m for m in mats if m.size], axis=0)
    want_mean = all_cells.mean(axis=0)
    want_std = all_cells.std(axis=0)
    got = {r["band"]: r for r in cmvn_stats(mel_df, decimals=9).collect()}
    for b in range(all_cells.shape[1]):
        assert abs(got[b]["mean_r"] - want_mean[b]) < 1e-4
        assert abs(got[b]["std_r"] - want_std[b]) < 1e-4


def test_apply_cmvn_normalizes_to_unit_stats(spark, mel_df):
    from data_quality_spark.operators.audio_cmvn import apply_cmvn

    stats = cmvn_stats(mel_df)
    normed = apply_cmvn(mel_df, stats)
    # the auditor certifies the producer: re-running the stats job over
    # the normalized table must read back ~N(0, 1) per band
    back = cmvn_stats(normed, decimals=9).collect()
    assert len(back) > 0
    for r in back:
        assert abs(r["mean_r"]) < 1e-4
        assert abs(r["std_r"] - 1.0) < 1e-4


def test_apply_cmvn_byte_deterministic_and_shape_preserving(spark, mel_df):
    from pyspark.sql import functions as F

    from data_quality_spark.operators.audio_cmvn import apply_cmvn

    stats = cmvn_stats(mel_df)
    a = apply_cmvn(mel_df, stats).select(
        "clip_id", F.xxhash64("feat").alias("h"),
        F.length("feat").alias("nb")).collect()
    b = apply_cmvn(mel_df.repartition(13), stats).select(
        "clip_id", F.xxhash64("feat").alias("h"),
        F.length("feat").alias("nb")).collect()
    da = {r["clip_id"]: (r["h"], r["nb"]) for r in a}
    db = {r["clip_id"]: (r["h"], r["nb"]) for r in b}
    assert da == db
    # byte length unchanged (same float64 grid)
    orig = {r["clip_id"]: r["nb"] for r in mel_df.select(
        "clip_id", F.length("feat").alias("nb")).collect()}
    for cid, (_, nb) in da.items():
        assert nb == orig[cid]


def test_moments_merge_exactly(spark, mel_df):
    """Incremental law: moments from disjoint increments merged ==
    single-pass moments, and the derived stats are bit-identical."""
    from data_quality_spark.operators.audio_cmvn import (
        cmvn_moments,
        merge_cmvn_moments,
        stats_from_moments,
    )

    a = cmvn_moments(mel_df.filter("pmod(xxhash64(clip_id), 2) = 0"))
    b = cmvn_moments(mel_df.filter("pmod(xxhash64(clip_id), 2) = 1"))
    merged = merge_cmvn_moments(a, b)
    full = cmvn_moments(mel_df)
    key = lambda rows: sorted(  # noqa: E731
        (r["band"], r["n_clips"], r["n_frames"], str(r["s"]), str(r["s2"]))
        for r in rows)
    assert key(merged.collect()) == key(full.collect())
    s1 = stats_from_moments(merged, decimals=12).orderBy("band").collect()
    s2 = stats_from_moments(full, decimals=12).orderBy("band").collect()
    assert [tuple(r) for r in s1] == [tuple(r) for r in s2]


def test_per_group_cmvn(spark, mel_df):
    """Per-speaker-style keyed stats: the group slices' stats equal the
    filtered-corpus stats, and grouped moments merge with the same
    exactness law."""
    from pyspark.sql import functions as F

    from data_quality_spark.operators.audio_cmvn import (
        cmvn_moments,
        stats_from_moments,
    )

    labeled = mel_df.withColumn(
        "spk", F.concat(F.lit("s"), (F.pmod(F.xxhash64("clip_id"), 3))
                        .cast("string")))
    grouped = stats_from_moments(
        cmvn_moments(labeled, by=("spk",)), decimals=9, by=("spk",)
    ).collect()
    assert {r["spk"] for r in grouped} == {"s0", "s1", "s2"}
    for spk in ("s0", "s1", "s2"):
        direct = {
            r["band"]: r for r in stats_from_moments(
                cmvn_moments(labeled.filter(F.col("spk") == spk)),
                decimals=9).collect()
        }
        for r in (g for g in grouped if g["spk"] == spk):
            d = direct[r["band"]]
            assert (r["n_clips"], r["n_frames"], r["mean_r"],
                    r["std_r"]) == (
                d["n_clips"], d["n_frames"], d["mean_r"], d["std_r"])
