"""Blind-reverb detection vs the seeded RIR corpus: recall on the wet
clips, ZERO false flags on the dry matched-pair twins and the natural
corpus, and rt60 estimates tracking the seeded RT60."""

from __future__ import annotations

import numpy as np
import pytest

from data_quality_spark.plans.schemas import CLIPS_SCHEMA


@pytest.fixture(scope="module")
def reverb_rows(spark):
    from data_quality_spark.operators.audio_reverb import reverb_flags
    from data_quality_spark.synth import make_audio_reverb_corpus

    pdf = make_audio_reverb_corpus(300, seed=42)
    df = spark.createDataFrame(
        pdf[[f.name for f in CLIPS_SCHEMA.fields]], CLIPS_SCHEMA)
    got = reverb_flags(df).toPandas().set_index("clip_id")
    return pdf.set_index("clip_id"), got


def test_seeded_recall_and_no_false_flags(reverb_rows):
    pdf, got = reverb_rows
    defects = pdf["defect"].reindex(got.index)
    wet = got[defects.str.startswith("reverb_")]
    dry = got[defects == "dry_bursts"]
    other = got[~defects.str.startswith(("reverb_", "dry_"))]
    assert len(wet) == len(dry) > 0
    # dry twins and the natural corpus never flag
    assert not dry["is_reverberant"].any()
    assert not other["is_reverberant"].any()
    # population recall >= 90% (misses = clips whose gaps never let the
    # tail cross the activity threshold twice — no evidence, documented)
    recall = wet["is_reverberant"].mean()
    assert recall >= 0.90, recall


def test_rt60_tracks_seeded_value(reverb_rows):
    pdf, got = reverb_rows
    for ms in (500, 800, 1100):
        ids = pdf.index[pdf["defect"] == f"reverb_{ms}"]
        est = got.loc[ids, "rt60_est"].dropna()
        assert len(est) > 0
        med = float(est.median())
        # conditioned-run fitting biases steep on ragged tails; the
        # estimate stays within a factor ~1.6 of the seeded RT60
        assert ms / 1000.0 / 1.6 <= med <= ms / 1000.0 * 1.3, (ms, med)


def test_null_totality(spark):
    """Undecodable, sr=0, and too-short clips come back with zero counts
    and NULL rates — never a flag."""
    from data_quality_spark.operators.audio_reverb import reverb_flags
    from data_quality_spark.functions.audio import encode_pcm16

    short = encode_pcm16(np.zeros(100, dtype=np.float64))
    rows = [
        ("a", None, 16000, 1000, "pcm16", "x", "2026-01-01"),
        ("b", b"\x00\x01", 0, 1000, "pcm16", "x", "2026-01-01"),
        ("c", short, 16000, 6, "pcm16", "x", "2026-01-01"),
    ]
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, sr_hz int, dur_ms int, "
              "codec string, transcript string, ingest_day string")
    got = {r["clip_id"]: r for r in reverb_flags(df).collect()}
    for cid in ("a", "b", "c"):
        assert got[cid]["n_decays"] == 0
        assert got[cid]["rt60_est"] is None
        assert got[cid]["is_reverberant"] is False
