"""Pitch-shift / time-stretch duplicate detection.

Seeded-defect style over vocoder twins: every evaluable seeded pair
(both sides ≥ 2 profile peaks — the same degenerate exclusion the speed
detector documents) must be caught, classified correctly, and landmark-
confirmed; any confirmed non-seeded pair must carry the ``stationary``
marker (sustained-tone coincidences ARE spectral duplicates — the
operator reports the evidence grade instead of silently flagging).  The
full chain is independently replayed by the audio_pitch_dup differential
oracle; these tests pin the vocoder kernels, the rational-band snap,
and the decision geometry across two seeds.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from data_quality_spark.functions.spectral import (
    SPEED_B,
    corr_at_shift,
    logf_profile,
    profile_peaks,
)
from data_quality_spark.functions.stretch import (
    pitch_shift_rational,
    time_stretch,
)
from data_quality_spark.operators.audio_pitch import snap_rationals
from data_quality_spark.synth import make_audio_stretch_corpus

SR = 16000


def _program(dur=2.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(SR * dur)) / SR
    x = 0.01 * rng.standard_normal(t.size)
    for f in (440.0, 1210.0, 2480.0):
        x += rng.uniform(0.2, 0.4) * np.sin(2 * np.pi * f * t)
    return x / np.max(np.abs(x)) * 0.6


class TestVocoderKernels:
    def test_stretch_exact_length_and_pitch(self):
        x = _program()
        y = time_stretch(x, rate=10 / 11, out_len=round(len(x) * 11 / 10))
        assert len(y) == round(len(x) * 11 / 10)
        pa_, pb_ = logf_profile(x, SR), logf_profile(y, SR)
        assert profile_peaks(pa_) == profile_peaks(pb_)
        assert corr_at_shift(pa_, pb_, 0) > 0.99

    def test_pitch_shift_exact_duration_and_cells(self):
        x = _program(seed=1)
        z = pitch_shift_rational(x, 9, 8)
        assert len(z) == len(x)
        pa_, pz_ = logf_profile(x, SR), logf_profile(z, SR)
        want = SPEED_B * math.log2(9 / 8)
        for p1, p2 in zip(profile_peaks(pa_), profile_peaks(pz_)):
            assert abs((p2 - p1) - want) <= 1.5
        best = max(range(-16, 17), key=lambda s: corr_at_shift(pa_, pz_, s))
        assert abs(-best - want) <= 1.5

    def test_stretch_roundtrip_snr(self):
        x = _program(seed=2)
        y = time_stretch(x, 10 / 11, out_len=round(len(x) * 1.1))
        w = time_stretch(y, 11 / 10, out_len=len(x))
        core = slice(2048, -2048)
        err = w[core] - x[core]
        snr = 10 * np.log10(np.mean(x[core] ** 2) / np.mean(err ** 2))
        assert snr >= 25.0

    def test_snap_rationals_contain_truth(self):
        # the integer cell shift of each seeded factor must map back to
        # a band containing the exact rational
        from fractions import Fraction

        for L, M in [(9, 8), (7, 8), (8, 9), (11, 10), (5, 4)]:
            sh = round(-SPEED_B * math.log2(L / M))
            assert Fraction(L, M) in snap_rationals(sh), (L, M, sh)
        assert snap_rationals(0) == [1]


class TestOperator:
    @pytest.fixture(scope="class", params=[42, 7])
    def run(self, request, spark):
        from data_quality_spark.functions.audio import _decode_i16
        from data_quality_spark.operators.audio_pitch import (
            clip_profiles,
            pitch_dup_confirm,
            pitch_dup_pairs,
        )
        from data_quality_spark.plans.schemas import CLIPS_SCHEMA

        seed = request.param
        pdf = make_audio_stretch_corpus(240, seed=seed)
        cols = [f.name for f in CLIPS_SCHEMA.fields]
        clips = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA)
        rows = {
            (r.id_a, r.id_b): r
            for r in pitch_dup_confirm(
                clips, pitch_dup_pairs(clip_profiles(clips))
            ).collect()
        }
        truth = {
            (c[:-3], c): d
            for c, d in zip(pdf.clip_id, pdf.defect)
            if c.endswith("_tw")
        }
        n_peaks = {}
        for cid, b, cdc, sr in zip(
            pdf.clip_id, pdf.bytes, pdf.codec, pdf.sr_hz
        ):
            try:
                q = _decode_i16(b, cdc, sr)
                p = logf_profile(q.astype(np.float64) / 32768.0, int(sr))
                n_peaks[cid] = len(profile_peaks(p)) if p is not None else 0
            except (ValueError, TypeError):
                n_peaks[cid] = 0
        evaluable = {
            p for p in truth if n_peaks[p[0]] >= 2 and n_peaks[p[1]] >= 2
        }
        return rows, truth, evaluable

    def test_every_evaluable_twin_confirmed(self, run):
        rows, truth, evaluable = run
        assert len(evaluable) >= 25
        missed = [
            p for p in evaluable
            if p not in rows or not rows[p].confirmed
        ]
        assert missed == []

    def test_classification_matches_seeded_kind(self, run):
        rows, truth, evaluable = run
        for p in evaluable:
            want = (
                "time_stretch"
                if truth[p].startswith("stretch")
                else "pitch_shift"
            )
            assert rows[p].edit_class == want, (p, truth[p])

    def test_scale_estimate_tracks_seeded_factor(self, run):
        rows, truth, evaluable = run
        for p in evaluable:
            kind, L, M = truth[p].split("_")
            if kind != "pitch":
                continue
            assert rows[p].scale_est_r == pytest.approx(
                int(L) / int(M), rel=0.04
            ), (p, truth[p], rows[p].scale_est_r)

    def test_confirmed_nonseeded_only_stationary(self, run):
        rows, truth, evaluable = run
        leaks = [
            (p, r.votes, r.distinct)
            for p, r in rows.items()
            if r.confirmed and p not in truth and not r.stationary
        ]
        assert leaks == []

    def test_votes_separate(self, run):
        rows, truth, evaluable = run
        tw = [rows[p].votes for p in evaluable]
        other = [
            r.votes for p, r in rows.items()
            if p not in truth and not r.confirmed
        ]
        assert min(tw) >= 50
        if other:
            assert max(other) < 50
