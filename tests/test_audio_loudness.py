"""K-weighted gated loudness (LUFS) kernel contract + operator parity.

The differential oracle (irfft + fsum + explicit gate loop vs Parseval +
numpy) proves the implementations agree; these tests pin what the
*contract* is — the BS.1770 absolute anchor (full-scale 997 Hz sine →
−3.01 LUFS), the two-stage gate behavior, the K-filter's spectral shape,
and the NULL semantics for unmeasurable clips.
"""

from __future__ import annotations

import numpy as np
import pytest

from data_quality_spark.functions.loudness import (
    ABS_GATE_LUFS,
    block_loudness,
    clip_loudness,
    gated_loudness,
    k_weight_power,
)

SR = 48000


def sine(freq: float, secs: float, amp: float = 1.0, sr: int = SR) -> np.ndarray:
    t = np.arange(int(secs * sr), dtype=np.float64) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


class TestKernel:
    def test_bs1770_sine_anchor(self):
        # The spec's published anchor: a 0 dBFS 997 Hz sine measures
        # −3.01 LUFS (K-filter ≈ unity at 997 Hz, sine ms = 1/2).
        s = clip_loudness(sine(997.0, 3.0), SR)
        assert s["lufs_i"] is not None
        assert abs(s["lufs_i"] - (-3.01)) < 0.1

    def test_anchor_holds_at_16k(self):
        s = clip_loudness(sine(997.0, 3.0, sr=16000), 16000)
        assert abs(s["lufs_i"] - (-3.01)) < 0.1

    def test_silence_is_gated_out_of_the_integration(self):
        # Appending digital silence must not drag the level down: the
        # absolute gate removes those blocks entirely.
        tone_only = clip_loudness(sine(997.0, 2.0, amp=0.25), SR)
        padded = clip_loudness(
            np.concatenate([sine(997.0, 2.0, amp=0.25),
                            np.zeros(3 * SR, dtype=np.float32)]), SR)
        assert abs(padded["lufs_i"] - tone_only["lufs_i"]) < 0.5
        assert padded["n_blocks"] > tone_only["n_blocks"]
        # boundary blocks straddling tone→silence may survive the relative
        # gate (≥ −10 LU of partial energy); everything else is gated
        assert padded["n_gated"] <= tone_only["n_blocks"] + 3

    def test_relative_gate_drops_quiet_tail(self):
        # A −40 dB tail is above the absolute gate but > 10 LU below the
        # loud part: the relative gate must exclude it.
        loud = sine(997.0, 2.0, amp=0.5)
        quiet = sine(997.0, 2.0, amp=0.005)  # 40 dB down
        both = clip_loudness(np.concatenate([loud, quiet]), SR)
        loud_only = clip_loudness(loud, SR)
        assert abs(both["lufs_i"] - loud_only["lufs_i"]) < 0.5
        assert both["n_gated"] < both["n_blocks"]

    def test_k_filter_kills_rumble_and_boosts_treble(self):
        # Same amplitude, three frequencies: 20 Hz rumble is strongly
        # attenuated by the RLB high-pass (50 Hz is only ~4 dB down —
        # the spec's HP is gentle); 8 kHz sits on the +4 dB shelf.
        hum = clip_loudness(sine(20.0, 2.0, amp=0.5), SR)["lufs_i"]
        mid = clip_loudness(sine(997.0, 2.0, amp=0.5), SR)["lufs_i"]
        high = clip_loudness(sine(8000.0, 2.0, amp=0.5), SR)["lufs_i"]
        assert hum < mid - 10.0
        assert mid + 2.0 < high < mid + 5.0

    def test_weight_grid_matches_filter_anchor_points(self):
        n = int(SR * 0.4)
        w = k_weight_power(SR, n)
        hz = np.arange(n // 2 + 1) * SR / n
        # ≈ +0.691 dB at 997 Hz (exactly what the −0.691 offset cancels,
        # making the sine anchor −3.01), ≈ +4 dB far above the shelf,
        # << 1 at 20 Hz
        at = lambda f: w[int(np.argmin(np.abs(hz - f)))]
        assert abs(10 * np.log10(at(997.0)) - 0.691) < 0.05
        assert abs(10 * np.log10(at(14000.0)) - 4.0) < 0.4
        assert 10 * np.log10(at(20.0)) < -12.0

    def test_unmeasurable_clips_report_null(self):
        assert clip_loudness(np.zeros(0, dtype=np.float32), SR) == {
            "n_blocks": 0, "n_gated": 0, "lufs_i": None, "lufs_max_m": None}
        # shorter than one 400 ms block
        short = clip_loudness(sine(997.0, 0.3), SR)
        assert short["n_blocks"] == 0 and short["lufs_i"] is None
        # digital silence: blocks exist but every one is absolutely gated
        silent = clip_loudness(np.zeros(SR, dtype=np.float32), SR)
        assert silent["n_blocks"] > 0
        assert silent["n_gated"] == 0
        assert silent["lufs_i"] is None and silent["lufs_max_m"] is None

    def test_gate_math_on_constructed_blocks(self):
        # hand-built block loudness vector: two at −20, one at −35
        # (relative-gated), one at −80 (absolutely gated)
        lj = np.array([-20.0, -20.0, -35.0, -80.0])
        lufs, k = gated_loudness(lj)
        assert k == 2
        assert abs(lufs - (-20.0)) < 1e-9
        assert gated_loudness(np.zeros(0)) == (None, 0)
        assert gated_loudness(np.full(3, -90.0)) == (None, 0)

    def test_block_layout(self):
        # 1 s at 48 kHz: blocks at 0,100..600 ms → 7 blocks
        lj = block_loudness(sine(997.0, 1.0), SR)
        assert lj.size == 7
        assert (lj > ABS_GATE_LUFS).all()


@pytest.mark.usefixtures("spark")
class TestOperator:
    def test_clip_lufs_matches_kernel(self, spark):
        from data_quality_spark.functions.audio import _decode_i16
        from data_quality_spark.operators.audio_loudness import clip_lufs
        from data_quality_spark.plans.schemas import CLIPS_SCHEMA
        from data_quality_spark.synth import generate_clips

        pdf = generate_clips(150, seed=23)
        df = spark.createDataFrame(
            pdf[[f.name for f in CLIPS_SCHEMA.fields]], CLIPS_SCHEMA)
        got = clip_lufs(df).toPandas().set_index("clip_id")
        n_measured = 0
        for _, r in pdf.iterrows():
            try:
                q = _decode_i16(r["bytes"], r["codec"], r["sr_hz"])
                ok = True
            except (ValueError, TypeError):
                q = np.zeros(0, dtype=np.int16)
                ok = False
            want = clip_loudness(
                q.astype(np.float32) / np.float32(32767.0), r["sr_hz"] or 0)
            row = got.loc[r["clip_id"]]
            assert bool(row["ok"]) == ok
            assert int(row["n_blocks"]) == want["n_blocks"]
            assert int(row["n_gated"]) == want["n_gated"]
            for k in ("lufs_i", "lufs_max_m"):
                if want[k] is None:
                    assert np.isnan(row[k])
                else:
                    assert row[k] == want[k]  # bit-identical float64 path
                    n_measured += 1
        assert n_measured > 100  # the corpus is mostly measurable

    def test_quiet_defects_sit_below_clean_speech(self, spark):
        """The statistic the gate wants: quiet/mostly-silent clips land
        well below clean speech-like clips on the gated scale."""
        from data_quality_spark.operators.audio_loudness import clip_lufs
        from data_quality_spark.plans.schemas import CLIPS_SCHEMA
        from data_quality_spark.synth import generate_clips

        pdf = generate_clips(400, seed=7)
        df = spark.createDataFrame(
            pdf[[f.name for f in CLIPS_SCHEMA.fields]], CLIPS_SCHEMA)
        out = clip_lufs(df).toPandas().set_index("clip_id")
        defects = pdf.set_index("clip_id")["defect"].reindex(out.index)
        clean = out[defects == "none"]["lufs_i"].dropna()
        quiet = out[defects == "near_silent"]["lufs_i"].dropna()
        assert len(clean) and len(quiet)
        assert quiet.median() < clean.median() - 10.0
