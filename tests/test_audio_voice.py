"""Acoustic speaker clustering (voice profiles).

Kernel invariants (F0 estimation accuracy, gain invariance, unvoiced /
short rejection), and the Spark operator end-to-end: speaker purity and
completeness on the synthetic voice corpus, control exclusion, skew
guard.  The double-grid key guarantee itself is covered by
test_audio_channel (shared 1-D law).
"""

from __future__ import annotations

import numpy as np

from data_quality_spark.functions import audio as A
from data_quality_spark.functions.voice import (
    DIST2_MAX,
    MIN_VOICED_FRAMES,
    voice_profile,
)
from data_quality_spark.operators.audio_voice import (
    clip_voice_profile,
    voice_clusters,
)
from data_quality_spark.plans.schemas import CLIPS_SCHEMA
from data_quality_spark.synth import make_audio_voice_corpus

SR = 16000


def _decode(row) -> np.ndarray:
    return np.asarray(np.frombuffer(row["bytes"], dtype="<i2"))


# ------------------------------------------------------------- kernel


def test_f0_estimation_on_pulse_train():
    """A shaped impulse train at period P, gated into utterance-like
    segments with pauses (so the stationarity guard sees speech, not a
    held tone), estimates F0 = SR/P within the integer-lag
    quantization."""
    for period in (64, 100, 160, 200):
        exc = np.zeros(2 * SR)
        exc[::period] = 1.0
        # three 0.4 s segments with 0.25 s pauses
        gate = np.zeros(2 * SR)
        for k in range(3):
            i0 = int((0.1 + 0.65 * k) * SR)
            gate[i0: i0 + int(0.4 * SR)] = 1.0
        exc *= gate
        # low-pass shape so the waveform is speech-like, keep periodicity
        spec = np.fft.rfft(exc)
        f = np.linspace(0.0, 1.0, spec.size)
        x = np.fft.irfft(spec * np.exp(-3.0 * f), exc.size)
        x *= 0.2 / max(1e-12, float(np.sqrt(np.mean(x * x))))
        q = np.round(np.clip(x, -0.999, 0.999) * 32767).astype(np.int16)
        p, nv, f0 = voice_profile(q, SR)
        assert p is not None and nv >= MIN_VOICED_FRAMES
        assert abs(f0 - SR / period) < 1e-9, (period, f0)


def test_profile_gain_invariance():
    corpus = make_audio_voice_corpus(2, 1, seed=7)
    row = corpus[corpus.clip_id == "vc00c00"].iloc[0]
    x = _decode(row)
    p1, _, f1 = voice_profile(x, SR)
    p2, _, f2 = voice_profile(
        (x.astype(np.float64) * 0.4).astype(np.int16), SR
    )
    assert p1 is not None and p2 is not None
    assert abs(f1 - f2) < 1e-6
    assert float(((p1 - p2) ** 2).sum()) < DIST2_MAX / 4


def test_profile_rejects_unvoiced_and_short():
    corpus = make_audio_voice_corpus(2, 1, seed=7)
    for cid in corpus.clip_id:
        row = corpus[corpus.clip_id == cid].iloc[0]
        p, nv, f0 = voice_profile(_decode(row), row["sr_hz"])
        if cid.startswith("ctrl"):
            assert p is None and f0 == 0.0, (cid, nv)
        else:
            assert p is not None
    assert voice_profile(np.zeros(0, dtype=np.int16), SR)[0] is None
    assert voice_profile(np.zeros(2 * SR, dtype=np.int16), 0)[0] is None


def test_speaker_separation_margins():
    """Intra-speaker envelope distance well under DIST2_MAX; the nearest
    cross-speaker pair well over — the margin the cluster law rides."""
    corpus = make_audio_voice_corpus(4, 3, seed=42)
    profs = {}
    for _, r in corpus.iterrows():
        if r["clip_id"].startswith("ctrl"):
            continue
        p, _, _ = voice_profile(_decode(r), r["sr_hz"])
        profs[r["clip_id"]] = (p, r["defect"])
    ids = sorted(profs)
    intra, inter = [], []
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d2 = float(((profs[a][0] - profs[b][0]) ** 2).sum())
            (intra if profs[a][1] == profs[b][1] else inter).append(d2)
    assert max(intra) < DIST2_MAX / 2 < DIST2_MAX * 2 < min(inter), (
        max(intra), min(inter),
    )


# ----------------------------------------------------------- operator


def _clips_df(spark, pdf):
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    return spark.createDataFrame(pdf[cols], CLIPS_SCHEMA).repartition(
        8, "clip_id"
    )


def test_voice_clusters_speaker_purity(spark):
    pdf = make_audio_voice_corpus(6, 4, seed=42)
    out = voice_clusters(_clips_df(spark, pdf)).collect()
    label = dict(zip(pdf.clip_id, pdf.defect))
    by_comp: dict[str, set] = {}
    for r in out:
        by_comp.setdefault(r.speaker, set()).add(r.clip_id)
        assert r.cluster_size == 4
    assert len(by_comp) == 6
    for members in by_comp.values():
        assert len({label[m] for m in members}) == 1
        assert len(members) == 4
    assert not any(r.clip_id.startswith("ctrl") for r in out)


def test_voice_profile_flags_controls(spark):
    pdf = make_audio_voice_corpus(2, 2, seed=42)
    prof = clip_voice_profile(_clips_df(spark, pdf)).collect()
    ok = {r.clip_id: r.ok for r in prof}
    assert all(ok[c] for c in pdf.clip_id if c.startswith("vc"))
    assert not any(ok[c] for c in pdf.clip_id if c.startswith("ctrl"))


def test_voice_skew_guard(spark):
    pdf = make_audio_voice_corpus(2, 4, seed=42)
    out = voice_clusters(_clips_df(spark, pdf), max_bucket=1).collect()
    assert out == []


def test_stationary_tone_is_not_a_voice():
    """A continuous held tone is periodic everywhere — stationary
    periodicity, not speech (speech breaks at pauses/stops).  It must
    carry NO voice evidence, or tone mega-families flood the (F0, tilt)
    buckets into the skew guard and suppress real speakers."""
    t = np.arange(2 * SR) / SR
    x = 0.3 * np.sin(2 * np.pi * 180.0 * t)
    q = np.asarray(np.frombuffer(A.encode_pcm16(x), dtype="<i2"))
    p, nv, f0 = voice_profile(q, SR)
    assert p is None and nv > MIN_VOICED_FRAMES  # rejected for EXCESS


def test_voice_balance_caps_speakers(spark):
    """Per-speaker contribution cap over the acoustic clusters: every
    5-clip speaker keeps exactly 2, label-free controls (singletons)
    always survive."""
    from data_quality_spark.operators.audio_voice import voice_pairs
    from data_quality_spark.operators.cluster import balance_by_cluster

    pdf = make_audio_voice_corpus(4, 5, seed=42)
    clips = _clips_df(spark, pdf)
    pairs = voice_pairs(clip_voice_profile(clips))
    bal = balance_by_cluster(
        clips, "clip_id", pairs, cap=2, seed=9, portable=True
    ).collect()
    label = dict(zip(pdf.clip_id, pdf.defect))
    kept_by_speaker: dict[str, int] = {}
    for r in bal:
        lab = label[r.clip_id]
        if lab.startswith("speaker_"):
            kept_by_speaker[lab] = kept_by_speaker.get(lab, 0) + int(r.keep)
        else:
            assert r.keep  # singleton controls survive any cap >= 1
    assert kept_by_speaker == {f"speaker_{s:02d}": 2 for s in range(4)}
