"""Speaker-turn detection: threshold-margin audit, exact boundary-count
recall with zero false flags across seeds, gain invariance of the shape
law, the silence-edge activity guard, and the operator/issue contracts."""

from __future__ import annotations

import numpy as np

from data_quality_spark.functions import audio as A
from data_quality_spark.functions.mel import log_mel
from data_quality_spark.functions.turns import (
    TURN_ACT_FLOOR,
    TURN_THETA,
    shape_vectors,
    turn_curve,
    turn_stats,
)
from data_quality_spark.synth import _turn_voice, make_audio_turns_corpus


def _dec(row):
    try:
        return A._decode_i16(row["bytes"], row["codec"], row["sr_hz"])
    except (ValueError, TypeError):
        return np.zeros(0, dtype=np.int16)


def _stats(row):
    return turn_stats(_dec(row).astype(np.float64) / 32768.0, row["sr_hz"] or 0)


def _curve_max(row):
    lm = log_mel(_dec(row).astype(np.float64) / 32768.0, row["sr_hz"] or 0)
    sh, bm = shape_vectors(lm)
    _, d, ev = turn_curve(sh, bm > TURN_ACT_FLOOR)
    return float(d[ev].max()) if ev.any() else None


def test_recall_and_specificity_two_seeds():
    for seed in (42, 7):
        pdf = make_audio_turns_corpus(300, seed=seed)
        for _, r in pdf.iterrows():
            st = _stats(r)
            d = str(r["defect"])
            if d.startswith("turns_"):
                assert st["n_turns"] == int(d.split("_")[1]), (seed, r["clip_id"])
            else:
                assert st["n_turns"] == 0, (seed, r["clip_id"], d)


def test_turn_threshold_margin():
    pdf = make_audio_turns_corpus(300, seed=42)
    pos_min, neg_max = None, None
    for _, r in pdf.iterrows():
        m = _curve_max(r)
        if m is None:
            continue
        if str(r["defect"]).startswith("turns_"):
            pos_min = m if pos_min is None else min(pos_min, m)
        else:
            neg_max = m if neg_max is None else max(neg_max, m)
    # the documented ~130x gap; theta must sit with >=2x margin each side
    assert pos_min is not None and neg_max is not None
    assert pos_min > 2 * TURN_THETA, pos_min
    assert neg_max < TURN_THETA / 2, neg_max


def test_gain_invariance():
    rng = np.random.default_rng(5)
    sr = 16_000
    x = np.concatenate(
        [_turn_voice(rng, sr, 1.5, 0), _turn_voice(rng, sr, 1.5, 2)]
    )
    a = turn_stats(x, sr)
    b = turn_stats(x * 0.25, sr)  # pure gain: shape is exactly invariant
    assert a["n_turns"] == b["n_turns"] == 1
    assert a["turns_csv"] == b["turns_csv"]


def test_silence_edge_guard():
    """A silence→speech edge is owned by the VAD rules, not the turn
    scan: the activity guard must reject it."""
    rng = np.random.default_rng(6)
    sr = 16_000
    x = np.concatenate(
        [np.zeros(int(sr * 1.5)), _turn_voice(rng, sr, 1.5, 1)]
    )
    st = turn_stats(x, sr)
    assert st["n_turns"] == 0
    # but the same speech spliced onto a DIFFERENT voice does flag
    y = np.concatenate(
        [_turn_voice(rng, sr, 1.5, 3), _turn_voice(rng, sr, 1.5, 1)]
    )
    assert turn_stats(y, sr)["n_turns"] == 1


def test_short_and_empty_clip():
    assert turn_stats(np.zeros(0), 16_000)["n_turns"] == 0
    st = turn_stats(np.zeros(800), 16_000)  # 50 ms: no candidate grid
    assert st["n_turns"] == 0 and st["n_eval"] == 0


def test_operator_and_issues(spark):
    from data_quality_spark.operators.audio_turns import turn_flags, turn_issues
    from data_quality_spark.plans.schemas import CLIPS_SCHEMA

    pdf = make_audio_turns_corpus(80, seed=42)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    df = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA).repartition(4, "clip_id")
    flags = turn_flags(df)
    rows = {r["clip_id"]: r for r in flags.collect()}
    n_multi = 0
    for _, r in pdf.iterrows():
        st = _stats(r)
        got = rows[r["clip_id"]]
        assert got["n_turns"] == st["n_turns"], r["clip_id"]
        assert got["turns_csv"] == st["turns_csv"]
        assert got["n_eval"] == st["n_eval"]
        assert got["is_multi_voice"] == (st["n_turns"] >= 1)
        n_multi += int(st["n_turns"] >= 1)
    assert n_multi > 0
    issues = {r["issue_type"]: r for r in turn_issues(flags).collect()}
    iss = issues["speaker_turns"]
    assert iss["count"] == n_multi and iss["total"] == len(pdf)
    assert iss["severity"] == "warning"
