"""Click/pop detection: constructed-spike recovery, the locality and
guard laws, zero false flags on clean corpora, evaluable-subset recall
on the seeded corpus, kernel-vs-pure-Python bit parity, and the
operator/issue contracts."""

from __future__ import annotations

import numpy as np
import pytest

from data_quality_spark.functions import clicks as C
from data_quality_spark.functions.audio import FRAME_MS, _decode_i16
from data_quality_spark.functions.clicks import click_stats
from data_quality_spark.synth import generate_clips, make_audio_click_corpus

SEEDED = {"click_1": 1, "click_3": 3, "crackle_7": 7}


def _dec(row):
    try:
        return _decode_i16(row["bytes"], row["codec"], row["sr_hz"])
    except (ValueError, TypeError):
        return np.zeros(0, dtype=np.int16)


def _tone(sr: int, secs: float, f: float = 440.0, amp: float = 0.4):
    t = np.arange(int(sr * secs)) / sr
    x = amp * np.sin(2 * np.pi * f * t)
    x = x + 0.005 * np.random.default_rng(0).normal(0, 1, len(t))
    return np.clip(np.rint(x * 32767), -32768, 32767).astype(np.int16)


# ------------------------------------------------------- constructed laws


@pytest.mark.parametrize("sr", [8000, 16000, 44100])
def test_single_spike_detected(sr):
    q = _tone(sr, 2.0)
    q[sr] = 28000
    st = click_stats(q, sr)
    assert st["n_clicks"] == 1, st
    assert st["max_d2"] >= 2 * 28000 - 2 * int(np.abs(q[sr - 1:sr + 2:2]).max())


def test_clean_tone_never_flags():
    for sr in (8000, 16000, 44100):
        st = click_stats(_tone(sr, 2.0), sr)
        assert st["n_clicks"] == 0, (sr, st)


def test_multi_spike_count_and_merge():
    sr = 16000
    q = _tone(sr, 3.0)
    for j, p in enumerate((sr, 2 * sr, int(2.5 * sr))):
        q[p] = 24000 if j % 2 == 0 else -24000
    st = click_stats(q, sr)
    assert st["n_clicks"] == 3, st
    # a 3-sample pop merges into ONE event (gap law)
    q2 = _tone(sr, 2.0)
    q2[sr:sr + 3] = (24000, -24000, 24000)
    st2 = click_stats(q2, sr)
    assert st2["n_clicks"] == 1, st2


def test_rail_guard_hands_clipping_edges_over():
    sr = 16000
    q = _tone(sr, 2.0, amp=0.4)
    q[sr] = 32767  # spike ON the rail = clipping artifact, not a click
    st = click_stats(q, sr)
    assert st["n_clicks"] == 0, st


def test_zero_guard_hands_dropout_edges_over():
    sr = 16000
    q = _tone(sr, 2.0, amp=0.4)
    q[sr:sr + 800] = 0  # hard dropout; its edges are the dropout rule's
    st = click_stats(q, sr)
    assert st["n_clicks"] == 0, st


def test_sustained_burst_not_a_click():
    sr = 16000
    q = _tone(sr, 2.0, amp=0.05)
    w = int(sr * 0.005)  # 5 ms of loud alternating content (> 1 ms law)
    q[sr:sr + w] = np.where(np.arange(w) % 2 == 0, 20000, -20000)
    st = click_stats(q, sr)
    assert st["n_clicks"] == 0, st


def test_degenerate_inputs_total():
    assert click_stats(np.zeros(0, np.int16), 16000)["n_clicks"] == 0
    assert click_stats(np.zeros(2, np.int16), 16000)["n_frames"] == 0
    assert click_stats(np.zeros(100, np.int16), 0)["n_clicks"] == 0
    assert click_stats(np.zeros(100, np.int16), None)["max_d2"] is None


# ------------------------------------------------------- corpus recall/FP


def _pos_passes(d2, i, frame, factor):
    """Kernel decision law replayed at one center index with a margin."""
    lo = max(i - C.CLICK_BG_WIN, 0)
    hi = min(i + C.CLICK_BG_WIN + 1, len(d2))
    bga = int(d2[lo:max(i - C.CLICK_SELF, lo)].max()) \
        if max(i - C.CLICK_SELF, lo) > lo else 0
    bgb = int(d2[min(i + C.CLICK_SELF + 1, hi):hi].max()) \
        if hi > min(i + C.CLICK_SELF + 1, hi) else 0
    bg = max(bga, bgb)
    f0 = (i // frame) * frame
    fs = d2[f0:f0 + frame]
    v = int(d2[i])
    return (v >= factor * C.CLICK_LOC_K * bg
            and v * len(fs) >= factor * C.CLICK_PRE_K * int(fs.sum())
            and v >= factor * C.CLICK_ABS_MIN)


@pytest.mark.parametrize("seed", [42, 7])
def test_no_false_flags_on_clean_corpora(seed):
    base = generate_clips(300, seed=seed)
    for _, r in base.iterrows():
        st = click_stats(_dec(r), r["sr_hz"])
        assert st["n_clicks"] == 0, (r["clip_id"], r["defect"], st)


def test_seeded_corpus_recall_and_count_law():
    corpus = make_audio_click_corpus(300, seed=42)
    base = generate_clips(300, seed=42)
    bmap = {r["clip_id"]: r for _, r in base.iterrows()}
    n_seeded = n_full = n_any = violations = 0
    for _, r in corpus.iterrows():
        if r["defect"] not in SEEDED:
            # non-injected rows of the click corpus stay clean
            assert click_stats(_dec(r), r["sr_hz"])["n_clicks"] == 0
            continue
        n_seeded += 1
        q = _dec(r)
        qc = _dec(bmap[r["clip_id"]])
        pos = np.nonzero(q.astype(np.int64) != qc.astype(np.int64))[0]
        assert len(pos) == SEEDED[r["defect"]]
        x = q.astype(np.int64)
        d2 = np.abs(x[:-2] - 2 * x[1:-1] + x[2:])
        frame = int(r["sr_hz"]) * FRAME_MS // 1000
        n_ev = sum(1 for p in pos if _pos_passes(d2, p - 1, frame, 1.1))
        st = click_stats(q, r["sr_hz"])
        if st["n_clicks"] > 0:
            n_any += 1
        if n_ev == len(pos):
            # fully evaluable: the count law is exact
            n_full += 1
            if st["n_clicks"] != len(pos):
                violations += 1
        elif not (n_ev <= st["n_clicks"] <= len(pos)):
            violations += 1
    assert violations == 0
    assert n_full >= 8, f"evaluable subset lost its teeth ({n_full})"
    assert n_any >= n_full  # detection at least covers the evaluable set


def test_kernel_matches_pure_python_twin():
    """The oracle replays the whole law independently in pure-Python ints;
    integer exactness makes bit-equality a hard assertion, not approx."""
    from data_quality_spark.oracles import _audio_clicks_expected

    exp = _audio_clicks_expected(120, seed=42)
    corpus = make_audio_click_corpus(120, seed=42).sort_values("clip_id")
    for k, (_, r) in enumerate(corpus.iterrows()):
        st = click_stats(_dec(r), r["sr_hz"])
        assert exp["n_samples"][k] == st["n_samples"]
        assert exp["n_frames"][k] == st["n_frames"]
        assert exp["n_cand"][k] == st["n_cand"]
        assert exp["n_clicks"][k] == st["n_clicks"], r["clip_id"]
        assert exp["max_d2"][k] == st["max_d2"]


# ------------------------------------------------------- operator contract


def test_click_operator_and_issues(spark):
    from data_quality_spark.operators.audio_clicks import (
        click_flags,
        click_issues,
    )
    from data_quality_spark.plans.schemas import CLIPS_SCHEMA

    pdf = make_audio_click_corpus(120, seed=42)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    df = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA).repartition(4)
    flags = click_flags(df).toPandas().set_index("clip_id")
    n_flagged = 0
    for _, r in pdf.iterrows():
        st = click_stats(_dec(r), r["sr_hz"])
        row = flags.loc[r["clip_id"]]
        assert int(row["n_clicks"]) == st["n_clicks"], r["clip_id"]
        n_flagged += int(row["is_clicky"])
    issues = {r["issue_type"]: r
              for r in click_issues(click_flags(df)).collect()}
    assert issues["clicks"]["count"] == n_flagged
    assert issues["clicks"]["total"] == len(pdf)
    assert issues["clicks"]["severity"] == (
        "warning" if n_flagged else "info"
    )
