"""Speaking-rate (chars per speech second) operator contract.

The differential oracle (state machine + re.sub + explicit if/elif vs
RLE + Arrow RE2 + JVM when-ladder) proves the implementations agree;
these tests pin the contract: rate is over VAD *speech* time, not clip
duration, and the flag ladder's precedence.
"""

from __future__ import annotations

import numpy as np
import pytest

from data_quality_spark.functions import audio as A
from data_quality_spark.plans.schemas import CLIPS_SCHEMA

SR = 16000


def tone_bytes(secs: float, amp: float = 0.3) -> bytes:
    t = np.arange(int(secs * SR), dtype=np.float64) / SR
    return A.encode_pcm16((amp * np.sin(2 * np.pi * 440 * t)).astype(np.float32))


def silence_bytes(secs: float) -> bytes:
    return A.encode_pcm16(np.zeros(int(secs * SR), dtype=np.float32))


def clip(cid, payload, transcript, codec="pcm16", sr=SR):
    n = len(payload) // 2 if codec == "pcm16" else len(payload)
    return {"clip_id": cid, "bytes": payload, "sr_hz": sr,
            "dur_ms": int(n * 1000 / sr), "codec": codec,
            "transcript": transcript, "ingest_day": "2026-01-01"}


@pytest.mark.usefixtures("spark")
class TestSpeakingRate:
    def _run(self, spark, rows, **kw):
        import pandas as pd

        from data_quality_spark.operators.audio_vad import speaking_rate

        df = spark.createDataFrame(
            pd.DataFrame(rows)[[f.name for f in CLIPS_SCHEMA.fields]],
            CLIPS_SCHEMA)
        return speaking_rate(df, **kw).toPandas().set_index("clip_id")

    def test_rate_uses_speech_time_not_duration(self, spark):
        # identical transcript + identical 2 s of speech; clip B carries
        # 6 s of extra silence.  A duration-based ratio halves for B; the
        # speech-time rate must be (nearly) unchanged.
        text = "x" * 30  # 30 chars / 2 s speech = 15 cps
        rows = [
            clip("a", tone_bytes(2.0), text),
            clip("b", tone_bytes(2.0) + silence_bytes(6.0), text),
        ]
        out = self._run(spark, rows)
        assert out.loc["a", "flag"] == "ok"
        assert out.loc["b", "flag"] == "ok"
        assert abs(out.loc["a", "cps"] - 15.0) < 1.0
        assert abs(out.loc["b", "cps"] - out.loc["a", "cps"]) < 1.0

    def test_flag_ladder(self, spark):
        rows = [
            clip("undec", b"\x00\x01\x02", "hello", codec="wav"),
            clip("silent_text", silence_bytes(2.0), "ghost transcript"),
            clip("speech_notext", tone_bytes(2.0), ""),
            clip("speech_nulltext", tone_bytes(2.0), None),
            clip("empty", silence_bytes(1.0), "   "),
            clip("short", tone_bytes(0.1) + silence_bytes(1.0), "hi"),
            clip("fast", tone_bytes(1.0), "y" * 100),   # 100 cps
            clip("slow", tone_bytes(10.0), "z" * 10),   # 1 cps
            clip("good", tone_bytes(2.0), "w" * 24),    # 12 cps
        ]
        out = self._run(spark, rows)
        assert out.loc["undec", "flag"] == "undecodable"
        assert out.loc["silent_text", "flag"] == "silent_with_text"
        assert out.loc["speech_notext", "flag"] == "speech_without_text"
        assert out.loc["speech_nulltext", "flag"] == "speech_without_text"
        assert out.loc["empty", "flag"] == "empty"
        assert out.loc["short", "flag"] == "insufficient_speech"
        assert out.loc["fast", "flag"] == "too_fast"
        assert out.loc["slow", "flag"] == "too_slow"
        assert out.loc["good", "flag"] == "ok"
        # whitespace never counts as a character
        assert out.loc["empty", "chars"] == 0

    def test_thresholds_are_parameters(self, spark):
        rows = [clip("g", tone_bytes(2.0), "w" * 24)]  # 12 cps
        assert self._run(spark, rows, max_cps=10.0).loc["g", "flag"] == "too_fast"
        assert self._run(spark, rows, min_cps=14.0).loc["g", "flag"] == "too_slow"

    def test_corpus_defect_discrimination(self, spark):
        """On the seeded corpus: empty-transcript defects land in
        speech_without_text; clean clips are overwhelmingly rate-sane."""
        import pandas as pd

        from data_quality_spark.operators.audio_vad import speaking_rate
        from data_quality_spark.synth import generate_clips

        pdf = generate_clips(400, seed=7)
        df = spark.createDataFrame(
            pdf[[f.name for f in CLIPS_SCHEMA.fields]], CLIPS_SCHEMA)
        out = speaking_rate(df).toPandas().set_index("clip_id")
        defects = pdf.set_index("clip_id")["defect"].reindex(out.index)
        empties = out[defects == "empty_transcript"]
        assert len(empties)
        assert (empties["flag"] == "speech_without_text").all()
        clean = out[defects == "none"]
        assert (clean["flag"].isin(["ok", "too_fast", "too_slow"])).all()
        assert (clean["flag"] == "ok").mean() > 0.8
