"""Speech-SNR kernel contract + operator parity.

The differential oracle (state machine + fsum vs RLE + numpy means) proves
the implementations agree; these tests pin what the *contract* is — which
frames count as signal, what degenerate partitions return, and that the
estimate recovers a constructed SNR.
"""

from __future__ import annotations

import numpy as np
import pytest

from data_quality_spark.functions.snr import SNR_CAP_DB, SNR_FLOOR_DB, speech_snr

SR = 16000
FRAME = SR * 20 // 1000  # 320 samples


def tone(n_frames: int, amp: float = 0.3) -> np.ndarray:
    t = np.arange(n_frames * FRAME, dtype=np.float64) / SR
    return (amp * np.sin(2 * np.pi * 440 * t)).astype(np.float32)


def floor_noise(n_frames: int, amp: float = 0.003) -> np.ndarray:
    # deterministic ±amp square wave: exact mean square amp², RMS -50 dBFS
    x = np.full(n_frames * FRAME, amp, dtype=np.float32)
    x[1::2] *= -1.0
    return x


class TestKernel:
    def test_recovers_constructed_snr(self):
        n_sp, n_nz = 20, 10
        x = np.concatenate([tone(n_sp) + floor_noise(n_sp),
                            floor_noise(n_nz)])
        s = speech_snr(x, SR)
        assert s["n_frames"] == n_sp + n_nz
        assert s["speech_frames"] == n_sp
        # speech ms ≈ 0.3²/2 + 0.003², noise ms = 0.003² exactly
        want = 10 * np.log10((0.3**2 / 2 + 0.003**2) / 0.003**2)
        assert abs(s["snr_db"] - want) < 1.0
        assert abs(s["noise_db"] - 20 * np.log10(0.003)) < 0.5

    def test_all_speech_has_no_noise_reference(self):
        s = speech_snr(tone(25), SR)
        assert s["speech_frames"] == s["n_frames"] == 25
        assert s["snr_db"] is None and s["noise_db"] is None
        assert s["speech_db"] is not None

    def test_all_silence_has_no_signal(self):
        s = speech_snr(floor_noise(25), SR)
        assert s["speech_frames"] == 0
        assert s["snr_db"] is None and s["speech_db"] is None
        assert abs(s["noise_db"] - 20 * np.log10(0.003)) < 0.5

    def test_digital_zero_floor_caps(self):
        x = np.concatenate([tone(20), np.zeros(10 * FRAME, dtype=np.float32)])
        s = speech_snr(x, SR)
        assert s["snr_db"] == SNR_CAP_DB
        assert s["noise_db"] == SNR_FLOOR_DB

    def test_degenerate_inputs(self):
        empty = {"n_frames": 0, "speech_frames": 0,
                 "snr_db": None, "speech_db": None, "noise_db": None}
        assert speech_snr(np.zeros(0, dtype=np.float32), SR) == empty
        assert speech_snr(np.zeros(FRAME - 1, dtype=np.float32), SR) == empty
        assert speech_snr(tone(5), 0) == empty

    def test_hangover_frames_count_as_speech(self):
        # a bridged interior gap is *inside* the utterance: its (quiet)
        # frames belong to the signal side, lowering the speech mean —
        # the contract is "VAD partition", not "threshold partition"
        from data_quality_spark.functions.vad import HANG_FRAMES

        x = np.concatenate([tone(5), floor_noise(HANG_FRAMES),
                            tone(5), floor_noise(10)])
        s = speech_snr(x, SR)
        assert s["speech_frames"] == 10 + HANG_FRAMES


@pytest.mark.usefixtures("spark")
class TestOperator:
    def test_clip_snr_matches_kernel(self, spark):
        from data_quality_spark.functions.audio import _decode_i16
        from data_quality_spark.operators.audio_snr import clip_snr
        from data_quality_spark.plans.schemas import CLIPS_SCHEMA
        from data_quality_spark.synth import generate_clips

        pdf = generate_clips(150, seed=23)
        df = spark.createDataFrame(
            pdf[[f.name for f in CLIPS_SCHEMA.fields]], CLIPS_SCHEMA)
        got = clip_snr(df).toPandas().set_index("clip_id")
        for _, r in pdf.iterrows():
            try:
                q = _decode_i16(r["bytes"], r["codec"], r["sr_hz"])
                ok = True
            except (ValueError, TypeError):
                q = np.zeros(0, dtype=np.int16)
                ok = False
            want = speech_snr(
                q.astype(np.float32) / np.float32(32767.0), r["sr_hz"] or 0)
            row = got.loc[r["clip_id"]]
            assert bool(row["ok"]) == ok
            assert int(row["n_frames"]) == want["n_frames"]
            assert int(row["speech_frames"]) == want["speech_frames"]
            for k in ("snr_db", "speech_db", "noise_db"):
                if want[k] is None:
                    assert np.isnan(row[k])
                else:
                    assert row[k] == want[k]  # bit-identical float64 path

    def test_mostly_silence_defect_is_measurable(self, spark):
        """The defect class the metric exists for: clips whose background
        is digital silence get a (capped) SNR; clean wall-to-wall clips
        honestly report 'no in-clip noise reference' instead of a number."""
        from data_quality_spark.operators.audio_snr import clip_snr
        from data_quality_spark.plans.schemas import CLIPS_SCHEMA
        from data_quality_spark.synth import generate_clips

        pdf = generate_clips(400, seed=7)
        df = spark.createDataFrame(
            pdf[[f.name for f in CLIPS_SCHEMA.fields]], CLIPS_SCHEMA)
        out = clip_snr(df).toPandas().set_index("clip_id")
        defects = pdf.set_index("clip_id")["defect"].reindex(out.index)
        mostly = out[defects == "mostly_silence"]
        assert len(mostly)
        measured = mostly["snr_db"].dropna()
        # boundary frames straddling the zeroed block carry partial signal
        # into the noise mean, so the lower tail sits well under the cap
        assert len(measured) and (measured > 10.0).all()
        clean = out[defects == "none"]
        assert len(clean) and clean["snr_db"].isna().all()
