"""Recording-channel (room-tone) clustering.

Kernel invariants (gain invariance, digital-silence and short-clip
rejection, guard-band stability), the double-grid key guarantee, and the
Spark operator end-to-end: session purity/completeness on the synthetic
channel corpus, control exclusion, and the skew guard.
"""

from __future__ import annotations

import numpy as np

from data_quality_spark.functions import audio as A
from data_quality_spark.functions.channel import (
    DIST2_MAX,
    MIN_NOISE_WINDOWS,
    TILT_STEP,
    channel_key_parts,
    noise_profile,
)
from data_quality_spark.operators.audio_channel import (
    channel_clusters,
    clip_channel_profile,
)
from data_quality_spark.plans.schemas import CLIPS_SCHEMA
from data_quality_spark.synth import make_audio_channel_corpus

SR = 16000


def _decode(row) -> np.ndarray:
    return np.frombuffer(row["bytes"], dtype="<i2").astype(np.int16)


def _session_clip(s: int, c: int, corpus=None):
    corpus = (
        make_audio_channel_corpus(4, 3, seed=42) if corpus is None
        else corpus
    )
    cid = f"ch{s:02d}c{c:02d}"
    row = corpus[corpus.clip_id == cid].iloc[0]
    return _decode(row)


# ------------------------------------------------------------- kernel


def test_profile_gain_invariance():
    corpus = make_audio_channel_corpus(2, 1, seed=7)
    x = _session_clip(0, 0, corpus)
    p1, n1 = noise_profile(x, SR)
    # same chain at half the preamp level: scale in the int16 domain
    p2, n2 = noise_profile((x.astype(np.float64) * 0.5).astype(np.int16), SR)
    assert p1 is not None and p2 is not None
    d2 = float(((p1 - p2) ** 2).sum())
    assert d2 < DIST2_MAX / 4, d2


def test_profile_rejects_digital_silence_and_short():
    # zero floor: bursts over exact digital silence — no channel evidence
    x = np.zeros(2 * SR, dtype=np.float64)
    t = np.arange(int(0.6 * SR)) / SR
    x[int(0.6 * SR): int(0.6 * SR) + t.size] = 0.3 * np.sin(
        2 * np.pi * 220.0 * t
    )
    q = np.frombuffer(A.encode_pcm16(x), dtype="<i2")
    p, _ = noise_profile(np.asarray(q), SR)
    assert p is None
    # too short: 0.1 s cannot hold MIN_NOISE_WINDOWS windows
    corpus = make_audio_channel_corpus(2, 1, seed=7)
    xs = _session_clip(0, 0, corpus)[: int(0.1 * SR)]
    p, nw = noise_profile(xs, SR)
    assert p is None and nw < MIN_NOISE_WINDOWS
    # degenerate inputs
    assert noise_profile(np.zeros(0, dtype=np.int16), SR)[0] is None
    assert noise_profile(xs, 0)[0] is None


def test_profile_stable_across_content():
    """Different clips of the same session (different bursts, different
    noise realizations) profile within DIST2_MAX; different sessions
    separate."""
    corpus = make_audio_channel_corpus(4, 3, seed=42)
    profs = {}
    for s in range(4):
        for c in range(3):
            p, _ = noise_profile(_session_clip(s, c, corpus), SR)
            assert p is not None
            profs[(s, c)] = p
    intra = max(
        float(((profs[(s, 0)] - profs[(s, c)]) ** 2).sum())
        for s in range(4) for c in (1, 2)
    )
    inter = min(
        float(((profs[(a, 0)] - profs[(b, 0)]) ** 2).sum())
        for a in range(4) for b in range(4) if a != b
    )
    assert intra < DIST2_MAX < inter, (intra, inter)


def test_double_grid_key_guarantee():
    """|Δtilt| ≤ TILT_STEP/2 − ε ⇒ shared cell on at least one grid —
    checked over a dense sweep of tilt pairs.  The sweep stops 1e-6
    inside the boundary: at EXACTLY S/2 with the base tilt on a grid
    line, float rounding in the left-fold dot can flip a floor (the
    mathematical inclusive bound holds, the float one is open), and the
    empirical intra-session tilt spread is ≪ S/2 anyway."""
    eps = 1e-6
    for t0 in np.linspace(-3.0, 3.0, 61):
        for dt in np.linspace(-TILT_STEP / 2 + eps, TILT_STEP / 2 - eps,
                              11):
            # construct profiles with exact target tilts by scaling
            w = np.arange(16.0) - 7.5
            w /= 16.0
            n2 = float((w * w).sum())
            pa = w * (t0 / n2)
            pb = w * ((t0 + dt) / n2)
            _, a0, a1, ta = channel_key_parts(pa)
            _, b0, b1, tb = channel_key_parts(pb)
            assert abs((tb - ta) - dt) < 1e-9
            assert a0 == b0 or a1 == b1, (t0, dt)


# ----------------------------------------------------------- operator


def _clips_df(spark, pdf):
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    return spark.createDataFrame(pdf[cols], CLIPS_SCHEMA).repartition(
        8, "clip_id"
    )


def test_channel_clusters_session_purity(spark):
    pdf = make_audio_channel_corpus(6, 4, seed=42)
    out = channel_clusters(_clips_df(spark, pdf)).collect()
    label = dict(zip(pdf.clip_id, pdf.defect))
    # every session clip clustered, every cluster pure and complete
    by_comp: dict[str, set] = {}
    for r in out:
        by_comp.setdefault(r.channel, set()).add(r.clip_id)
        assert r.cluster_size == 4
    assert len(by_comp) == 6
    for members in by_comp.values():
        assert len({label[m] for m in members}) == 1
        assert len(members) == 4
    # controls never cluster
    assert not any(r.clip_id.startswith("ctrl") for r in out)


def test_channel_profile_flags_controls(spark):
    pdf = make_audio_channel_corpus(2, 2, seed=42)
    prof = clip_channel_profile(_clips_df(spark, pdf)).collect()
    ok = {r.clip_id: r.ok for r in prof}
    assert all(ok[c] for c in pdf.clip_id if c.startswith("ch"))
    assert not any(ok[c] for c in pdf.clip_id if c.startswith("ctrl"))


def test_channel_skew_guard(spark):
    """max_bucket=1 skips every multi-member bucket — no pair can be
    proposed, so the hot-bucket O(n²) join is provably gated."""
    pdf = make_audio_channel_corpus(2, 6, seed=42)
    out = channel_clusters(_clips_df(spark, pdf), max_bucket=1).collect()
    assert out == []


def test_hot_buckets_report(spark):
    """The skew guard's skipped buckets are REPORTED, not silent."""
    from pyspark.sql import functions as F

    from data_quality_spark.operators.audio_channel import (
        bucket_candidate_pairs,
        hot_buckets,
    )

    rows = [(f"c{i:02d}", [0.0] * 4, 0, 7, 1) for i in range(10)]
    rows += [(f"d{i:02d}", [0.0] * 4, 0, 9, 1) for i in range(3)]
    keyed = spark.createDataFrame(
        rows, "clip_id string, prof array<double>, grid int, cell long, "
        "family int")
    hot = hot_buckets(keyed, max_bucket=5).collect()
    assert [(r["grid"], r["cell"], r["family"], r["n_members"])
            for r in hot] == [(0, 7, 1, 10)]
    # and the guarded candidate stage indeed skipped exactly that bucket
    cand = bucket_candidate_pairs(keyed, max_bucket=5)
    ids = set()
    for r in cand.collect():
        ids.add(r["id_a"][0]); ids.add(r["id_b"][0])
    assert ids == {"d"}
