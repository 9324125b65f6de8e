"""Log-mel feature extraction.

The operator's contract is PAYLOAD-grade: the float64 feature bytes are
hash-checked bit-for-bit by the driver oracle, so these tests pin the
kernel's spec geometry (filterbank shape, tone localization, frame
law, totality) and the property that makes the hash contract possible —
byte-identical output regardless of partitioning (fixed-order
reductions, no BLAS in the hot path).
"""

from __future__ import annotations

import numpy as np
import pytest

from data_quality_spark.functions.mel import (
    FMIN_HZ,
    N_MELS,
    hz_to_mel,
    log_mel,
    mel_filterbank,
    mel_to_hz,
)

SR = 16000


class TestFilterbank:
    def test_unit_peak_triangles(self):
        fb = mel_filterbank(SR, 512)
        assert fb.shape == (N_MELS, 257)
        assert np.all(fb >= 0.0)
        # every filter peaks at (nearly) 1.0 — the bin grid quantizes
        # the apex, so allow the apex-to-grid loss
        assert np.all(fb.max(axis=1) > 0.7)
        assert np.all(fb.max(axis=1) <= 1.0 + 1e-12)

    def test_centers_uniform_in_mel(self):
        edges = np.linspace(hz_to_mel(FMIN_HZ), hz_to_mel(SR / 2.0),
                            N_MELS + 2)
        steps = np.diff(edges)
        assert np.allclose(steps, steps[0])
        assert mel_to_hz(hz_to_mel(1234.5)) == pytest.approx(1234.5)

    def test_tone_localizes_to_its_band(self):
        fb = mel_filterbank(SR, 512)
        edges = mel_to_hz(np.linspace(hz_to_mel(FMIN_HZ),
                                      hz_to_mel(SR / 2.0), N_MELS + 2))
        for band in (5, 15, 30):
            f = edges[band + 1]  # band center
            t = np.arange(SR) / SR
            m = log_mel(0.5 * np.sin(2 * np.pi * f * t), SR)
            assert int(np.argmax(m.mean(axis=0))) == band


class TestKernel:
    def test_frame_count_law(self):
        frame, hop = int(SR * 0.025), int(SR * 0.010)
        for n in (frame, frame + 1, frame + hop, SR, 2 * SR + 37):
            m = log_mel(np.zeros(n), SR)
            assert m.shape == (1 + (n - frame) // hop, N_MELS)

    def test_totality(self):
        assert log_mel(np.zeros(10), SR).shape == (0, N_MELS)
        assert log_mel(np.zeros(SR), 0).shape == (0, N_MELS)
        m = log_mel(np.zeros(SR), SR)  # silence: finite floor, not -inf
        assert np.all(np.isfinite(m))

    def test_rate_independent_grid(self):
        # 100 frames/second at every rate
        for sr in (8000, 16000):
            m = log_mel(np.zeros(2 * sr), sr)
            assert m.shape[0] == 1 + (2 * sr - int(sr * 0.025)) // int(
                sr * 0.010)


class TestOperator:
    def test_bytes_stable_across_partitionings(self, spark):
        from data_quality_spark.operators.audio_mel import mel_features
        from data_quality_spark.plans.schemas import CLIPS_SCHEMA
        from data_quality_spark.synth import generate_clips

        pdf = generate_clips(60, seed=9)
        cols = [f.name for f in CLIPS_SCHEMA.fields]

        def hashes(parts):
            from pyspark.sql import functions as F

            df = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA).repartition(
                parts)
            return {
                r.clip_id: r.h
                for r in mel_features(df)
                .select("clip_id", F.xxhash64("feat").alias("h"))
                .collect()
            }

        assert hashes(1) == hashes(8)

    def test_undecodable_rows_total(self, spark):
        from data_quality_spark.operators.audio_mel import mel_features
        from data_quality_spark.plans.schemas import CLIPS_SCHEMA
        from data_quality_spark.synth import generate_clips

        pdf = generate_clips(120, seed=5)
        cols = [f.name for f in CLIPS_SCHEMA.fields]
        df = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA)
        rows = {r.clip_id: r for r in mel_features(df).collect()}
        assert len(rows) == 120
        bad = [c for c, d in zip(pdf.clip_id, pdf.defect)
               if d in ("codec_unknown", "corrupt_wav")]
        assert bad
        for c in bad:
            assert not rows[c].ok
            assert rows[c].n_frames == 0 and bytes(rows[c].feat) == b""


def test_specaugment_laws(spark):
    """SpecAugment over mel tables: masked cells take exactly the log
    floor, unmasked cells are bit-identical to the input, masks are
    clip-seeded (reproducible, distinct across clips), non-ok rows pass
    through untouched."""
    import numpy as np
    from pyspark.sql import functions as F

    from data_quality_spark.functions.mel import LOG_FLOOR
    from data_quality_spark.operators.audio_mel import mel_features
    from data_quality_spark.operators.audio_specaugment import specaugment
    from data_quality_spark.plans.schemas import CLIPS_SCHEMA
    from data_quality_spark.synth import generate_clips

    pdf = generate_clips(60, seed=42)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    clips = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA)
    feats = mel_features(clips).persist()
    base = {r.clip_id: r for r in feats.collect()}
    out1 = {r.clip_id: r for r in specaugment(feats).collect()}
    out2 = {r.clip_id: bytes(r.feat) for r in
            specaugment(feats.repartition(5)).collect()}
    log_floor = float(np.log(LOG_FLOOR))
    n_masked_total = 0
    for cid, r in out1.items():
        assert out2[cid] == bytes(r.feat)  # partitioning-independent
        b = base[cid]
        if not r.ok or r.n_frames == 0:
            assert bytes(r.feat) == bytes(b.feat)
            assert r.n_freq_masked == r.n_time_masked == 0
            continue
        m0 = np.frombuffer(bytes(b.feat), dtype="<f8").reshape(
            b.n_frames, b.n_mels)
        m1 = np.frombuffer(bytes(r.feat), dtype="<f8").reshape(
            r.n_frames, r.n_mels)
        changed = m1 != m0
        assert np.all(m1[changed] == log_floor)
        n_masked_total += int(changed.sum())
    assert n_masked_total > 0
    feats.unpersist()
