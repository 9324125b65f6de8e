"""Speed-perturbed duplicate detection vs the seeded resampled corpus:
recall on evaluable injected pairs, zero confirmed false pairs, exact
speed estimates, and degenerate (single-peak) handling."""

from __future__ import annotations

import numpy as np
import pytest

from data_quality_spark.plans.schemas import CLIPS_SCHEMA


@pytest.fixture(scope="module")
def speed_result(spark):
    from data_quality_spark.operators.audio_speed import (
        clip_profiles,
        speed_dup_confirm,
        speed_dup_pairs,
    )
    from data_quality_spark.synth import make_audio_speed_corpus

    pdf = make_audio_speed_corpus(300, seed=42)
    df = spark.createDataFrame(
        pdf[[f.name for f in CLIPS_SCHEMA.fields]], CLIPS_SCHEMA)
    profs = clip_profiles(df).toPandas().set_index("clip_id")
    pairs = speed_dup_confirm(df, speed_dup_pairs(clip_profiles(df)))
    return pdf, profs, pairs.toPandas()


def test_recall_and_precision(speed_result):
    pdf, profs, got = speed_result
    injected = set(pdf[pdf["defect"].str.startswith("speed_")]["clip_id"])
    # evaluable = both sides carry >= 2 profile peaks (single pure tones
    # have no shift-invariant spacing key — degenerate, documented)
    evaluable = {
        sid for sid in injected
        if profs.loc[sid, "n_peaks"] >= 2
        and profs.loc[sid[: -len("_sp")], "n_peaks"] >= 2
    }
    found = {(r["id_a"], r["id_b"]) for _, r in got.iterrows()
             if r["confirmed"]}
    tp = {b for a, b in found if b == a + "_sp"}
    fp = {(a, b) for a, b in found if b != a + "_sp"}
    assert not fp, fp
    assert len(tp & evaluable) / len(evaluable) >= 0.85
    # confirm votes carry a wide margin over the threshold
    assert got[got["confirmed"]]["votes"].min() >= 100


def test_speed_estimate_matches_injected_factor(speed_result):
    pdf, _, got = speed_result
    defects = pdf.set_index("clip_id")["defect"]
    for _, r in got[got["confirmed"]].iterrows():
        tag = defects[r["id_b"]]
        ln, m = tag.split("_")[1:]
        # resample by L/M shortens duration by L/M: playback speed M/L
        assert abs(r["speed_est"] - int(m) / int(ln)) < 0.01, (tag, r)


def test_profiles_null_totality(spark):
    from data_quality_spark.operators.audio_speed import clip_profiles

    rows = [
        ("a", None, 16000, 1000, "pcm16", "x", "2026-01-01"),
        ("b", b"\x00\x01\x02\x03", 0, 1000, "pcm16", "x", "2026-01-01"),
    ]
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, sr_hz int, dur_ms int, "
              "codec string, transcript string, ingest_day string")
    got = {r["clip_id"]: r for r in clip_profiles(df).collect()}
    for cid in ("a", "b"):
        assert got[cid]["n_peaks"] == 0
        assert got[cid]["profile"] is None
