"""Music/speech content-class audit.

Seeded-defect style: constructed chord and syllabic-burst classes must
land on their own labels with zero cross-class flips; evaluability is
total (short / silent / undecodable → 'und', never a content class).
"""

from __future__ import annotations

import numpy as np
import pytest

from data_quality_spark.functions.musicspeech import (
    MS_MIN_ENV_FRAMES,
    MUSIC_STABLE_MIN,
    MUSIC_SYL_MAX,
    SPEECH_STABLE_MAX,
    SPEECH_SYL_MIN,
    music_speech_stats,
)
from data_quality_spark.synth import make_audio_musicspeech_corpus

SR = 16000


def _chord(dur=2.0):
    t = np.arange(int(SR * dur)) / SR
    s = sum(
        np.sin(2 * np.pi * 220.0 * r * t) / (i + 1)
        for i, r in enumerate((1.0, 1.5, 2.0, 3.0))
    )
    return np.rint(9000 * s / np.abs(s).max()).astype(np.int16)


def _bursts(dur=2.0, seed=3):
    rng = np.random.default_rng(seed)
    n = int(SR * dur)
    noise = rng.standard_normal(n)
    band = (np.convolve(noise, np.ones(8) / 8, "same")
            - np.convolve(noise, np.ones(32) / 32, "same"))
    env = np.zeros(n)
    pos = 0
    while pos < n:
        burst = int(SR * (0.08 + 0.12 * rng.random()))
        gap = int(SR * (0.04 + 0.10 * rng.random()))
        w = min(burst, n - pos)
        if w > 1:
            env[pos: pos + w] = np.hanning(burst)[:w]
        pos += burst + gap
    x = band * env
    return np.rint(12000 * x / np.abs(x).max()).astype(np.int16)


class TestKernel:
    def test_chord_signature(self):
        st = music_speech_stats(_chord(), SR)
        assert st["stable_frac"] >= 0.9
        assert st["syl_frac"] <= MUSIC_SYL_MAX

    def test_burst_signature(self):
        st = music_speech_stats(_bursts(), SR)
        assert st["syl_frac"] >= 0.7
        assert st["stable_frac"] <= SPEECH_STABLE_MAX

    def test_threshold_geometry_is_exclusive(self):
        # a clip cannot satisfy both label laws: music requires stable
        # ≥ 1/2, speech requires stable ≤ 1/4
        assert MUSIC_STABLE_MIN > SPEECH_STABLE_MAX
        assert SPEECH_SYL_MIN > MUSIC_SYL_MAX

    def test_evaluability_totality(self):
        short = _chord(dur=0.5)  # < MS_MIN_ENV_FRAMES envelope frames
        st = music_speech_stats(short[: MS_MIN_ENV_FRAMES * 320 - 1], SR)
        assert st["syl_frac"] is None and st["stable_frac"] is None
        silent = np.zeros(2 * SR, dtype=np.int16)
        st = music_speech_stats(silent, SR)
        assert st["syl_frac"] is None  # digital silence: no class
        st = music_speech_stats(np.zeros(0, dtype=np.int16), None)
        assert st["n_samples"] == 0 and st["syl_frac"] is None


class TestOperator:
    @pytest.fixture(scope="class")
    def labelled(self, spark):
        from data_quality_spark.operators.audio_musicspeech import (
            musicspeech_labels,
        )
        from data_quality_spark.plans.schemas import CLIPS_SCHEMA

        pdf = make_audio_musicspeech_corpus(150, seed=11)
        cols = [f.name for f in CLIPS_SCHEMA.fields]
        clips = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA)
        rows = {r.clip_id: r for r in musicspeech_labels(clips).collect()}
        tags = dict(zip(pdf.clip_id, pdf.defect))
        return rows, tags

    def test_seeded_classes_no_cross_flips(self, labelled):
        rows, tags = labelled
        music = [r for c, r in rows.items() if tags[c] == "music_chord"]
        speech = [r for c, r in rows.items() if tags[c] == "speech_burst"]
        assert len(music) >= 10 and len(speech) >= 10
        # every constructed burst clip is speech; every constructed
        # chord clip is music or (admissible, segment-boundary
        # modulation) other — NEVER the opposite class
        assert all(r.av_label == "speech" for r in speech)
        assert all(r.av_label in ("music", "other") for r in music)
        got_music = sum(1 for r in music if r.av_label == "music")
        assert got_music / len(music) >= 0.8

    def test_undecodable_rows_are_und(self, labelled):
        rows, tags = labelled
        dead = [r for r in rows.values() if r.n_samples == 0]
        assert dead, "corpus should carry undecodable pass-through rows"
        for r in dead:
            assert r.av_label == "und"
            assert r.syl_frac is None and r.stable_frac is None

    def test_issue_relation(self, spark, labelled):
        from data_quality_spark.operators.audio_musicspeech import (
            musicspeech_issues,
            musicspeech_labels,
        )
        from data_quality_spark.plans.schemas import CLIPS_SCHEMA

        pdf = make_audio_musicspeech_corpus(150, seed=11)
        cols = [f.name for f in CLIPS_SCHEMA.fields]
        clips = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA)
        issues = {
            r.issue_type: r
            for r in musicspeech_issues(
                musicspeech_labels(clips)
            ).collect()
        }
        rows, _ = labelled
        n_music = sum(1 for r in rows.values() if r.av_label == "music")
        assert issues["music_content"]["count"] == n_music
        assert issues["music_content"].severity == "warning"
        assert issues["music_content"].total == 150
