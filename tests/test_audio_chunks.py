"""Materialized chunker (extract_segments) contract."""

from __future__ import annotations

import numpy as np
import pytest

from data_quality_spark.plans.schemas import CLIPS_SCHEMA


@pytest.mark.usefixtures("spark")
class TestExtractSegments:
    def _run(self, spark, n=150, seed=23, **kw):
        from data_quality_spark.operators.audio_vad import extract_segments
        from data_quality_spark.synth import generate_clips

        pdf = generate_clips(n, seed=seed)
        df = spark.createDataFrame(
            pdf[[f.name for f in CLIPS_SCHEMA.fields]], CLIPS_SCHEMA)
        return pdf, extract_segments(df, **kw).toPandas()

    def test_payloads_are_exact_waveform_slices(self, spark):
        from data_quality_spark.functions.audio import _decode_i16
        from data_quality_spark.functions.vad import vad_segments

        pdf, segs = self._run(spark)
        assert len(segs)
        by_clip = pdf.set_index("clip_id")
        checked = 0
        for _, s in segs.iterrows():
            r = by_clip.loc[s["clip_id"]]
            q = _decode_i16(r["bytes"], r["codec"], r["sr_hz"])
            want = [g for g in vad_segments(
                q.astype(np.float32) / np.float32(32767.0), r["sr_hz"] or 0)
                if g["seg_idx"] == s["seg_idx"]][0]
            sl = np.ascontiguousarray(
                q[want["start_sample"]:want["end_sample"]], dtype="<i2")
            assert s["bytes"] == sl.tobytes()
            assert len(s["bytes"]) == 2 * (want["end_sample"]
                                           - want["start_sample"])
            checked += 1
            if checked >= 40:
                break

    def test_min_dur_filter_keeps_original_seg_idx(self, spark):
        _, all_segs = self._run(spark, min_dur_ms=0)
        _, long_segs = self._run(spark, min_dur_ms=500)
        assert len(long_segs) < len(all_segs)
        assert (long_segs["dur_ms"] >= 500).all()
        # surviving (clip, seg_idx) pairs must be a subset with identical rows
        key = ["clip_id", "seg_idx"]
        merged = long_segs.merge(all_segs, on=key, suffixes=("_l", "_a"))
        assert len(merged) == len(long_segs)
        assert (merged["dur_ms_l"] == merged["dur_ms_a"]).all()

    def test_output_is_codec_normalized(self, spark):
        _, segs = self._run(spark)
        # every payload is raw pcm16 LE with the advertised duration
        for _, s in segs.head(25).iterrows():
            q = np.frombuffer(s["bytes"], dtype="<i2")
            assert int(round(q.size * 1000 / s["sr_hz"])) == s["dur_ms"]
            assert len(s["bytes"]) % 2 == 0
