"""Audio fingerprint dedup + spectral features.

Covers the spectral kernel invariants (tone centroid, noise flatness,
gain-invariance of fingerprints), the Spark operator end-to-end (recall of
injected codec/gain re-encodes, BER separation between duplicates and
distinct content), and the decode-failure path.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_quality_spark.functions import audio as A
from data_quality_spark.functions.spectral import (
    band_edges,
    fingerprint_i32,
    spectral_features,
)
from data_quality_spark.operators.audio_dedup import (
    clip_fingerprints,
    fingerprint_near_dup,
)
from data_quality_spark.operators.audio_features import clip_spectral
from data_quality_spark.plans.schemas import CLIPS_SCHEMA
from data_quality_spark.synth import make_audio_dup_corpus


def _tone(freq: float, sr: int = 16000, dur_s: float = 1.0, amp: float = 0.5):
    t = np.arange(int(sr * dur_s)) / sr
    return amp * np.sin(2 * np.pi * freq * t)


# ------------------------------------------------------------- kernel


def test_band_edges_monotonic_nonempty():
    e = band_edges()
    assert len(e) == 17 and e[0] == 1 and e[-1] == 129
    assert (np.diff(e) >= 1).all()


def test_tone_centroid_tracks_frequency():
    for freq in (440.0, 1000.0, 3000.0):
        x = (_tone(freq) * 32767).astype(np.int16)
        f = spectral_features(x, 16000)
        # rfft bin width at frame 256 / sr 16k is 62.5 Hz
        assert abs(f["centroid_hz"] - freq) < 130.0, (freq, f["centroid_hz"])
        assert f["flatness"] < 0.1  # pure tone is maximally peaky


def test_noise_flatness_high_tone_low():
    rng = np.random.default_rng(7)
    noise = (rng.normal(0, 0.2, 16000).clip(-1, 1) * 32767).astype(np.int16)
    fn = spectral_features(noise, 16000)
    ft = spectral_features((_tone(800.0) * 32767).astype(np.int16), 16000)
    assert fn["flatness"] > 0.5 > ft["flatness"]


def test_band_balance_splits_at_telephony_edges():
    low = spectral_features((_tone(150.0) * 32767).astype(np.int16), 16000)
    high = spectral_features((_tone(5000.0) * 32767).astype(np.int16), 16000)
    assert low["band_low"] > 0.9 and high["band_high"] > 0.9
    mid = spectral_features((_tone(1000.0) * 32767).astype(np.int16), 16000)
    assert mid["band_mid"] > 0.9


def test_spectral_empty_and_short_clips():
    assert spectral_features(np.zeros(0, dtype=np.int16), 16000)["centroid_hz"] is None
    assert spectral_features(np.zeros(100, dtype=np.int16), 16000)["centroid_hz"] is None
    # all-zero signal has no power -> NULL features, not a div-by-zero
    assert spectral_features(np.zeros(4096, dtype=np.int16), 16000)["flatness"] is None


def test_fingerprint_gain_invariant():
    rng = np.random.default_rng(11)
    x = rng.normal(0, 0.1, 16000) + _tone(700.0, amp=0.3)
    q1 = (np.clip(x, -1, 1) * 20000).astype(np.int16)
    q2 = (np.clip(x, -1, 1) * 5000).astype(np.int16)  # -12 dB gain
    f1, f2 = fingerprint_i32(q1), fingerprint_i32(q2)
    n = min(len(f1), len(f2))
    diff = sum(bin(int(a ^ b) & 0x7FFF).count("1") for a, b in zip(f1[:n], f2[:n]))
    assert diff / (15.0 * n) < 0.05  # quantization-only flips


def test_fingerprint_distinct_content_separates():
    rng = np.random.default_rng(13)
    a = fingerprint_i32((rng.normal(0, 0.2, 16000).clip(-1, 1) * 32767).astype(np.int16))
    b = fingerprint_i32((rng.normal(0, 0.2, 16000).clip(-1, 1) * 32767).astype(np.int16))
    n = min(len(a), len(b))
    diff = sum(bin(int(x ^ y) & 0x7FFF).count("1") for x, y in zip(a[:n], b[:n]))
    assert diff / (15.0 * n) > 0.35  # independent content ~0.5


# ------------------------------------------------------------- operator


@pytest.fixture(scope="module")
def dup_corpus(spark):
    pdf = make_audio_dup_corpus(400, seed=42)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    sdf = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA).repartition(8, "clip_id")
    return pdf, sdf


def test_reencode_recall_is_total(spark, dup_corpus):
    """Every injected re-encode whose fingerprint is long enough to bucket
    must be recovered — including the lossy µ-law ones."""
    pdf, sdf = dup_corpus
    fps = clip_fingerprints(sdf)
    pairs = fingerprint_near_dup(fps)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    fp_len = {r["clip_id"]: r["n_frames"] for r in fps.collect()}
    expected = {
        (cid, f"{cid}_re")
        for cid in pdf[pdf["defect"] == "reencode_dup"]["clip_id"].str[:-3]
        if fp_len.get(cid, 0) >= 3 and fp_len.get(f"{cid}_re", 0) >= 3
    }
    assert expected, "corpus must contain recoverable re-encodes"
    missed = expected - got
    assert not missed, f"missed {len(missed)} injected dups: {sorted(missed)[:5]}"


def test_dup_ber_below_distinct_ber(spark, dup_corpus):
    """BER separation: injected pairs sit far below the 0.30 cut; anything
    else the operator reports is the near-silent cluster (perceptually
    identical content), never two distinct voiced clips."""
    pdf, sdf = dup_corpus
    pairs = fingerprint_near_dup(clip_fingerprints(sdf)).collect()
    true = [r["ber"] for r in pairs if r["id_b"] == r["id_a"] + "_re"]
    assert true and max(true) < 0.20
    extra_ids = {
        i for r in pairs if r["id_b"] != r["id_a"] + "_re"
        for i in (r["id_a"], r["id_b"])
    }
    silentish = set(
        pdf[pdf["defect"].isin(["mostly_silence", "near_silent"])]["clip_id"]
    )
    silentish |= {f"{c}_re" for c in silentish}
    voiced_extras = extra_ids - silentish
    assert not voiced_extras, f"false positives on voiced clips: {voiced_extras}"


def test_fingerprints_drop_payload_and_handle_corrupt(spark, dup_corpus):
    _, sdf = dup_corpus
    fps = clip_fingerprints(sdf)
    assert "bytes" not in fps.columns
    # corrupt/unknown-codec clips yield empty fingerprints, not task failures
    n_empty = fps.filter(F.size("fp") == 0).count()
    assert n_empty > 0
    assert fps.count() == sdf.count()


def test_spectral_operator_matches_kernel(spark, dup_corpus):
    pdf, sdf = dup_corpus
    row = (
        clip_spectral(sdf).filter(F.col("clip_id") == "clip00000000").collect()[0]
    )
    r = pdf[pdf["clip_id"] == "clip00000000"].iloc[0]
    x = A._decode_i16(r["bytes"], r["codec"], r["sr_hz"])
    f = spectral_features(x, r["sr_hz"])
    assert row["ok"] == (f["centroid_hz"] is not None)
    if row["ok"]:
        assert row["centroid_hz"] == pytest.approx(f["centroid_hz"], abs=1e-9)
        assert row["flatness"] == pytest.approx(f["flatness"], abs=1e-12)


def test_execute_once_accumulator(spark, dup_corpus):
    """The fingerprint stage decodes each clip exactly once per action."""
    _, sdf = dup_corpus
    acc = spark.sparkContext.accumulator(0)
    n = sdf.count()
    fps = clip_fingerprints(sdf, counter=acc)
    fps.write.mode("overwrite").format("noop").save()
    assert acc.value == n


def test_shift_match_recovers_excerpts_with_exact_alignment(spark):
    """Hop-aligned excerpts (half also re-encoded) are recovered with the
    EXACT ground-truth shift, zero false positives on this corpus, and
    BER 0 for codec-identical cuts."""
    from data_quality_spark.operators.audio_dedup import (
        fingerprint_shift_match,
    )
    from data_quality_spark.synth import make_audio_excerpt_corpus

    pdf = make_audio_excerpt_corpus(400, seed=42)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    sdf = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA).repartition(8, "clip_id")
    pairs = fingerprint_shift_match(clip_fingerprints(sdf)).collect()
    truth = {
        r["clip_id"]: (int(r["defect"].split("_")[-1]), r["codec"])
        for _, r in pdf[pdf["clip_id"].str.endswith("_ex")].iterrows()
    }
    base_codec = {
        r["clip_id"]: r["codec"]
        for _, r in pdf[~pdf["clip_id"].str.endswith("_ex")].iterrows()
    }
    got = {r["id_b"]: r for r in pairs if r["id_b"] == r["id_a"] + "_ex"}
    assert not [r for r in pairs if r["id_b"] != r["id_a"] + "_ex"]
    assert len(got) >= 0.95 * len(truth)
    for ex_id, r in got.items():
        shift, ex_codec = truth[ex_id]
        assert r["shift"] == shift, ex_id
        if ex_codec == base_codec[ex_id[:-3]]:
            # pure cut: only the ±1-LSB encode round trip (decode /32768,
            # encode *32767) can touch bits — essentially zero BER
            assert r["ber"] < 0.02, (ex_id, r["ber"])
    # every miss must be a lossy re-encode, never a pure cut
    for ex_id in set(truth) - set(got):
        assert truth[ex_id][1] != base_codec[ex_id[:-3]], ex_id


def test_constellation_recovers_arbitrary_offsets(spark):
    """Excerpts cut at NON-hop-aligned sample offsets: the landmark matcher
    recovers every one with the offset within ±1 frame and zero false
    positives — on a corpus of stationary sinusoids, the adversarial case
    for constellation hashing."""
    from data_quality_spark.functions.spectral import CONST_HOP
    from data_quality_spark.operators.audio_dedup import (
        clip_landmarks,
        landmark_match,
    )
    from data_quality_spark.synth import make_audio_excerpt_corpus

    pdf = make_audio_excerpt_corpus(400, seed=42, align_hop=False)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    sdf = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA).repartition(8, "clip_id")
    pairs = landmark_match(clip_landmarks(sdf)).collect()
    truth = {
        r["clip_id"]: int(r["defect"].split("_")[-1])
        for _, r in pdf[pdf["clip_id"].str.endswith("_ex")].iterrows()
    }
    got = {r["id_b"]: r for r in pairs if r["id_b"] == r["id_a"] + "_ex"}
    assert not [r for r in pairs if r["id_b"] != r["id_a"] + "_ex"]
    assert set(got) == set(truth)
    for ex_id, r in got.items():
        expected = truth[ex_id] / CONST_HOP
        # adjacent-bin pairing lets a fractional offset's neighbour bin win
        # a tie, so the reported offset is exact to within ±1.5 frames
        assert abs(r["offset_frames"] - expected) <= 1.5, (
            ex_id, r["offset_frames"], expected,
        )


def test_shift_match_cannot_recover_arbitrary_offsets(spark):
    """Negative control: the Philips bit-stream matcher is hop-aligned by
    construction — non-aligned cuts decorrelate its frame grid, so it must
    recover almost none of them (this is exactly why landmark_match
    exists)."""
    from data_quality_spark.operators.audio_dedup import (
        fingerprint_shift_match,
    )
    from data_quality_spark.synth import make_audio_excerpt_corpus

    pdf = make_audio_excerpt_corpus(400, seed=42, align_hop=False)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    sdf = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA).repartition(8, "clip_id")
    pairs = fingerprint_shift_match(clip_fingerprints(sdf)).collect()
    n_ex = int(pdf["clip_id"].str.endswith("_ex").sum())
    found = sum(1 for r in pairs if r["id_b"] == r["id_a"] + "_ex")
    assert found < 0.2 * n_ex, (found, n_ex)


def test_near_dup_decodes_each_clip_once(spark, dup_corpus):
    """The full near-dup DAG references the fingerprint relation four times
    (bucket entries, size guard, both verify sides); the persist inside
    ``fingerprint_near_dup`` must keep the decode+FFT at exactly ONE pass
    (it re-executes 4x without it — a 100-TB-scale bug, r3 plan audit)."""
    _, sdf = dup_corpus
    acc = spark.sparkContext.accumulator(0)
    n = sdf.count()
    fps = clip_fingerprints(sdf, counter=acc)
    fingerprint_near_dup(fps).count()
    assert acc.value == n
    fps.unpersist()


def test_label_noise_audit_flags_relabeled_dups(spark):
    """Seeded off-by-one caption errors: every flagged pair involves a
    ``reencode_relabel`` clip, true re-encode pairs keep jaccard 1.0, and
    the relabeled dups' base pairs ARE flagged (the audit catches exactly
    the seeded noise, nothing else)."""
    from data_quality_spark.operators.label_noise import transcript_mismatch
    from data_quality_spark.synth import make_audio_dup_corpus

    pdf = make_audio_dup_corpus(400, seed=42, relabel_every=3)
    relabeled = set(pdf[pdf["defect"] == "reencode_relabel"]["clip_id"])
    assert relabeled
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    clips = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA).repartition(
        8, "clip_id"
    )
    pairs = fingerprint_near_dup(clip_fingerprints(clips))
    rows = transcript_mismatch(pairs, clips).collect()
    assert rows
    flagged = [r for r in rows if r["label_mismatch"]]
    assert flagged
    # flagged pairs are either a seeded relabel OR a silence-class
    # fingerprint collision (two near-silent clips match as audio but
    # carry unrelated captions — degenerate audio with ANY transcript is
    # itself label-suspect, so the audit flagging it is correct)
    silence = set(pdf[pdf["defect"] == "mostly_silence"]["clip_id"])

    def silent(c: str) -> bool:  # a _re dup inherits its base's audio
        return c in silence or (c.endswith("_re") and c[:-3] in silence)

    for r in flagged:
        seeded = r["id_a"] in relabeled or r["id_b"] in relabeled
        degenerate = silent(r["id_a"]) and silent(r["id_b"])
        assert seeded or degenerate, (r["id_a"], r["id_b"])
    # every relabeled clip that produced a verified pair is caught
    paired_relabeled = {
        c for r in rows for c in (r["id_a"], r["id_b"]) if c in relabeled
    }
    caught = {
        c for r in flagged for c in (r["id_a"], r["id_b"]) if c in relabeled
    }
    assert caught == paired_relabeled
    for r in rows:
        if not r["label_mismatch"]:
            assert r["jaccard"] == 1.0


def test_audio_dedup_resolve_survivor_law(spark):
    """Keep-one-per-cluster over the audio dup graph: exactly one keeper
    per component, and the keeper maximizes (decodable, codec fidelity
    pcm16>wav>mulaw, n_samples, smallest id) — on the re-encode-chain
    corpus the lossless generation must survive over its mulaw copy."""
    from pyspark.sql import functions as F

    from data_quality_spark.operators.audio_dedup import (
        clip_fingerprints,
        fingerprint_near_dup,
    )
    from data_quality_spark.operators.audio_speed import clip_profiles
    from data_quality_spark.operators.cluster import resolve_duplicates
    from data_quality_spark.plans.schemas import CLIPS_SCHEMA
    from data_quality_spark.synth import make_audio_dup_corpus

    pdf = make_audio_dup_corpus(200, seed=11)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    clips = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA)
    pairs = fingerprint_near_dup(clip_fingerprints(clips))
    meta = clip_profiles(clips).select("clip_id", "n_samples", "codec")
    rank = (
        F.when(F.col("codec") == "pcm16", 2)
        .when(F.col("codec") == "wav", 1)
        .otherwise(0)
        .cast("long")
    )
    prefer = F.when(
        F.col("n_samples") > 0,
        rank * F.lit(10_000_000_000) + F.col("n_samples"),
    ).otherwise(F.lit(-1).cast("long"))
    rows = resolve_duplicates(meta, "clip_id", pairs, prefer=prefer).collect()
    assert rows
    by_comp: dict = {}
    for r in rows:
        by_comp.setdefault(r.component, []).append(r)
    codec = dict(zip(pdf.clip_id, pdf.codec))
    order = {"pcm16": 2, "wav": 1, "mulaw": 0}
    for comp, members in by_comp.items():
        keepers = [m for m in members if m.keep]
        assert len(keepers) == 1, comp
        best = max(order[codec[m.clip_id]] for m in members)
        assert order[codec[keepers[0].clip_id]] == best, comp


def test_fingerprint_hot_buckets_report(spark):
    """The content-axis guard report: replicated content exceeds the
    guard and reports; the natural corpus side stays silent; the report
    and the candidate join share one key law (same entries helper), so
    a bucket is either paired or reported — never silently neither."""
    from data_quality_spark.operators.audio_dedup import (
        clip_fingerprints,
        fingerprint_hot_buckets,
    )
    from data_quality_spark.plans.schemas import CLIPS_SCHEMA
    from data_quality_spark.synth import generate_clips
    import pandas as pd

    base = generate_clips(20, seed=7)
    rep = pd.concat([base.iloc[[0]]] * 12, ignore_index=True)
    rep["clip_id"] = [f"hot{i:02d}" for i in range(12)]
    pdf = pd.concat([base, rep], ignore_index=True)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    clips = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA)
    fps = clip_fingerprints(clips)
    hot = fingerprint_hot_buckets(fps, max_bucket_size=8).collect()
    assert len(hot) > 0
    assert all(r["n_members"] > 8 for r in hot)
    # guard off -> nothing reported
    assert fingerprint_hot_buckets(
        fps, max_bucket_size=10_000).count() == 0


class TestAudioProbeIndex:
    """Incremental audio near-dup: stored-index probe laws."""

    def _split(self, spark, pdf):
        from data_quality_spark.plans.schemas import CLIPS_SCHEMA

        cols = [f.name for f in CLIPS_SCHEMA.fields]
        clips = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA)
        par = F.pmod(F.xxhash64("clip_id"), F.lit(2))
        return clips.where(par == 0), clips.where(par == 1)

    def test_decodes_only_the_increment(self, spark, tmp_path):
        """The index is stored fingerprints: a probe run must decode
        exactly the NEW clips, zero index audio."""
        from data_quality_spark.operators.audio_dedup import (
            audio_probe_index,
            build_audio_index,
        )
        from data_quality_spark.synth import make_audio_dup_corpus

        pdf = make_audio_dup_corpus(120, seed=7)
        idx_clips, new_clips = self._split(spark, pdf)
        n_new = new_clips.count()
        build_audio_index(idx_clips).write.mode("overwrite").parquet(
            str(tmp_path / "audio_index"))
        stored = spark.read.parquet(str(tmp_path / "audio_index"))
        acc = spark.sparkContext.accumulator(0)
        pairs = audio_probe_index(new_clips, stored, counter=acc)
        assert pairs.count() > 0
        assert acc.value == n_new

    def test_exact_digest_survives_hot_buckets_and_legacy_index(
            self, spark):
        """max_bucket_size=0 drops EVERY index bucket: with the stored
        digest identical fingerprints still pair at ber 0.0; a legacy
        index (no fp_digest column) returns nothing — old stored
        indexes keep working, minus the protection."""
        import pandas as pd

        from data_quality_spark.operators.audio_dedup import (
            audio_probe_index,
            build_audio_index,
        )
        from data_quality_spark.synth import generate_clips

        base = generate_clips(6, seed=3)
        rep = pd.concat([base.iloc[[0]]] * 8, ignore_index=True)
        rep["clip_id"] = [f"idx{i:02d}" for i in range(8)]
        new = base.iloc[[0]].copy()
        new["clip_id"] = ["probe0"]
        from data_quality_spark.plans.schemas import CLIPS_SCHEMA

        cols = [f.name for f in CLIPS_SCHEMA.fields]
        index = build_audio_index(
            spark.createDataFrame(rep[cols], CLIPS_SCHEMA))
        new_df = spark.createDataFrame(new[cols], CLIPS_SCHEMA)
        got = audio_probe_index(new_df, index, max_bucket_size=0).collect()
        assert len(got) == 8
        assert all(r["ber"] == 0.0 for r in got)
        legacy = index.drop("fp_digest")
        assert audio_probe_index(
            new_df, legacy, max_bucket_size=0).count() == 0
