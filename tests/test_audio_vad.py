"""VAD smoothing semantics + segmentation operator behavior.

The differential oracle (state machine vs RLE) proves the two
implementations agree; these tests pin what the *contract* is — which gaps
bridge, which bursts drop, and that segmentation conserves the speech mass
the per-clip stats report.
"""

from __future__ import annotations

import numpy as np
import pytest

from data_quality_spark.functions.vad import (
    HANG_FRAMES,
    MIN_SPEECH_FRAMES,
    smooth_active,
    vad_segments,
    vad_stats,
)

SR = 16000
FRAME = SR * 20 // 1000  # 320 samples


def tone(n_frames: int, amp: float = 0.3) -> np.ndarray:
    t = np.arange(n_frames * FRAME, dtype=np.float64) / SR
    return (amp * np.sin(2 * np.pi * 440 * t)).astype(np.float32)


def silence(n_frames: int) -> np.ndarray:
    return np.zeros(n_frames * FRAME, dtype=np.float32)


def clip(*parts: np.ndarray) -> np.ndarray:
    return np.concatenate(parts)


class TestSmoothing:
    def test_interior_gap_at_hang_bridges(self):
        a = np.array([True] * 3 + [False] * HANG_FRAMES + [True] * 3)
        assert smooth_active(a).all()

    def test_interior_gap_over_hang_splits(self):
        a = np.array([True] * 3 + [False] * (HANG_FRAMES + 1) + [True] * 3)
        out = smooth_active(a)
        assert not out[3: 3 + HANG_FRAMES + 1].any()
        assert out[:3].all() and out[-3:].all()

    def test_leading_trailing_silence_never_bridged(self):
        a = np.array([False] * HANG_FRAMES + [True] * 4 + [False] * HANG_FRAMES)
        out = smooth_active(a)
        assert not out[:HANG_FRAMES].any() and not out[-HANG_FRAMES:].any()

    def test_short_burst_dropped(self):
        a = np.zeros(10, dtype=bool)
        a[5: 5 + MIN_SPEECH_FRAMES - 1] = True
        assert not smooth_active(a).any()

    def test_two_clicks_merge_then_survive(self):
        # hangover runs before debounce: two sub-threshold clicks separated
        # by a bridgeable gap become one legitimate burst
        a = np.zeros(12, dtype=bool)
        a[4] = True
        a[4 + 1 + HANG_FRAMES] = True
        out = smooth_active(a)
        assert out[4: 5 + HANG_FRAMES + 1].all()


class TestStats:
    def test_gap_bridged_in_signal_domain(self):
        # 40 ms interior silence (= HANG_FRAMES frames) → one segment
        x = clip(tone(10), silence(HANG_FRAMES), tone(10))
        s = vad_stats(x, SR)
        assert s["n_segments"] == 1
        assert s["speech_ratio"] == 1.0

    def test_long_gap_splits(self):
        x = clip(tone(10), silence(10), tone(10))
        s = vad_stats(x, SR)
        assert s["n_segments"] == 2
        assert s["longest_silence_ms"] == 200
        assert s["longest_speech_ms"] == 200

    def test_leading_trailing(self):
        x = clip(silence(5), tone(20), silence(3))
        s = vad_stats(x, SR)
        assert s["leading_silence_ms"] == 100
        assert s["trailing_silence_ms"] == 60

    def test_all_silent(self):
        s = vad_stats(silence(25), SR)
        assert s["n_segments"] == 0 and s["speech_ratio"] == 0.0
        assert s["longest_silence_ms"] == 500

    def test_segments_conserve_speech_mass(self):
        x = clip(silence(3), tone(8), silence(7), tone(12), silence(2))
        s = vad_stats(x, SR)
        segs = vad_segments(x, SR)
        assert len(segs) == s["n_segments"] == 2
        assert sum(g["dur_ms"] for g in segs) == round(
            s["speech_ratio"] * s["n_frames"] * 20)
        for g in segs:
            assert g["end_ms"] - g["start_ms"] == g["dur_ms"]
            assert -40.0 < g["rms_db"] < 0.0

    def test_zero_and_short_input(self):
        assert vad_stats(np.zeros(0, dtype=np.float32), SR)["n_frames"] == 0
        assert vad_segments(np.zeros(FRAME - 1, dtype=np.float32), SR) == []
        assert vad_stats(tone(5), 0)["n_frames"] == 0


@pytest.mark.usefixtures("spark")
class TestOperators:
    def test_clip_vad_discriminates_defects(self, spark):
        from data_quality_spark.operators.audio_vad import clip_vad
        from data_quality_spark.plans.schemas import CLIPS_SCHEMA
        from data_quality_spark.synth import generate_clips

        pdf = generate_clips(400, seed=7)
        df = spark.createDataFrame(
            pdf[[f.name for f in CLIPS_SCHEMA.fields]], CLIPS_SCHEMA)
        out = clip_vad(df).toPandas().set_index("clip_id")
        defects = pdf.set_index("clip_id")["defect"]
        clean = out[defects.reindex(out.index) == "none"]
        near_silent = out[defects.reindex(out.index) == "near_silent"]
        assert len(clean) and len(near_silent)
        # synthetic clean clips are continuous tone+noise: fully active
        assert (clean["speech_ratio"] > 0.95).all()
        assert (near_silent["speech_ratio"] == 0.0).all()
        # mostly_silence zeroes ≥85% of the signal: VAD must see it
        mostly = out[defects.reindex(out.index) == "mostly_silence"]
        assert len(mostly) and (mostly["speech_ratio"] < 0.5).all()

    def test_vad_stream_equals_batch(self, spark, tmp_path):
        """clip_vad is a pure map, so it composes with Structured Streaming
        unchanged: an availableNow drain over the same files must produce
        bit-identical rows to the batch pass (same kernel, same floats)."""
        from data_quality_spark.operators.audio_vad import clip_vad
        from data_quality_spark.plans.schemas import CLIPS_SCHEMA
        from data_quality_spark.synth import generate_clips

        pdf = generate_clips(80, seed=19)
        cols = [f.name for f in CLIPS_SCHEMA.fields]
        src = str(tmp_path / "bronze")
        out = str(tmp_path / "vad_out")
        cp = str(tmp_path / "cp")
        spark.createDataFrame(pdf[cols], CLIPS_SCHEMA).write.parquet(src)

        batch = clip_vad(spark.read.parquet(src)).orderBy("clip_id").collect()
        stream = spark.readStream.schema(CLIPS_SCHEMA).parquet(src)
        q = (
            clip_vad(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.read.parquet(out).orderBy("clip_id").collect()
        assert got == batch

    def test_clip_segments_matches_kernel(self, spark):
        from data_quality_spark.operators.audio_vad import clip_segments
        from data_quality_spark.functions.audio import _decode_i16
        from data_quality_spark.plans.schemas import CLIPS_SCHEMA
        from data_quality_spark.synth import generate_clips

        pdf = generate_clips(120, seed=11)
        df = spark.createDataFrame(
            pdf[[f.name for f in CLIPS_SCHEMA.fields]], CLIPS_SCHEMA)
        got = (clip_segments(df).toPandas()
               .sort_values(["clip_id", "seg_idx"]).reset_index(drop=True))
        want_rows = []
        for _, r in pdf.sort_values("clip_id").iterrows():
            try:
                q = _decode_i16(r["bytes"], r["codec"], r["sr_hz"])
            except (ValueError, TypeError):
                continue
            x = q.astype(np.float32) / np.float32(32767.0)
            for seg in vad_segments(x, r["sr_hz"] or 0):
                want_rows.append((r["clip_id"], seg["seg_idx"],
                                  seg["start_ms"], seg["end_ms"],
                                  seg["dur_ms"], seg["rms_db"]))
        assert len(got) == len(want_rows)
        for row, want in zip(got.itertuples(index=False), want_rows):
            assert (row.clip_id, row.seg_idx, row.start_ms, row.end_ms,
                    row.dur_ms) == want[:5]
            assert row.rms_db == want[5]  # bit-identical float64 path
