"""Pre-decode payload triage: hand-crafted byte evidence per class.

Every evidence class in the ladder gets a purpose-built payload; the
Spark Column ladder must name it exactly.  A plan assertion proves the
operator stays entirely JVM-side (no Python eval node anywhere) — the
whole point of the triage stage is running BEFORE the Arrow hop.
"""

from __future__ import annotations

import struct

import pytest

from data_quality_spark.operators.payload_audit import (
    PAYLOAD_CLASS_SEVERITY,
    payload_confusion,
    sniff_payloads,
)


def wav_bytes(sr: int, n_samples: int, *, fmt_code=1, channels=1, bits=16,
              fmt_size=16, hdr_sr=None, pad=0) -> bytes:
    data = b"\x01\x02" * n_samples
    hdr_sr = sr if hdr_sr is None else hdr_sr
    block = channels * bits // 8
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", fmt_size)
        + struct.pack("<HHIIHH", fmt_code, channels, hdr_sr,
                      hdr_sr * block, block, bits)
        + (b"\x00" * (fmt_size - 16))
        + b"data" + struct.pack("<I", len(data))
        + data + b"\x00" * pad
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


CASES = [
    # (name, bytes, codec, sr, dur_ms, expected class)
    ("empty", b"", "pcm16", 16000, 1000, "empty_payload"),
    ("null", None, "pcm16", 16000, 1000, "empty_payload"),
    ("mp3", b"\xff\xfb" * 100, "mp3", 16000, 1000, "codec_unknown"),
    ("nocodec", b"ab" * 100, None, 16000, 1000, "codec_unknown"),
    ("sr0", b"ab" * 100, "pcm16", 0, 1000, "sr_invalid"),
    ("srbig", b"ab" * 100, "pcm16", 400000, 1000, "sr_invalid"),
    ("wav_junk", b"junkjunkjunkjunk" * 4, "wav", 16000, 1000,
     "bad_container"),
    ("wav_trunc", wav_bytes(16000, 16000)[:30], "wav", 16000, 1000,
     "bad_container"),
    ("wav_fmt18", wav_bytes(16000, 16000, fmt_size=18), "wav", 16000,
     1000, "noncanonical_wav"),
    ("wav_stereo", wav_bytes(16000, 16000, channels=2), "wav", 16000,
     1000, "unsupported_wav"),
    ("wav_float", wav_bytes(16000, 16000, fmt_code=3), "wav", 16000,
     1000, "unsupported_wav"),
    ("wav_8bit", wav_bytes(16000, 16000, bits=8), "wav", 16000, 1000,
     "unsupported_wav"),
    ("wav_srlie", wav_bytes(16000, 16000, hdr_sr=8000), "wav", 16000,
     1000, "header_sr_mismatch"),
    ("wav_short", wav_bytes(16000, 8000), "wav", 16000, 1000,
     "length_mismatch"),
    ("wav_ok", wav_bytes(16000, 16000), "wav", 16000, 1000, "ok"),
    ("wav_pad", wav_bytes(16000, 16000, pad=1), "wav", 16000, 1000,
     "ok"),
    ("riff_as_pcm", wav_bytes(16000, 16000), "pcm16", 16000, 1000,
     "container_in_raw"),
    ("riff_as_mulaw", wav_bytes(8000, 8000), "mulaw", 8000, 1000,
     "container_in_raw"),
    ("pcm_odd", b"\x00" * 32001, "pcm16", 16000, 1000, "odd_length"),
    ("pcm_short", b"\x00" * 16000, "pcm16", 16000, 1000,
     "length_mismatch"),
    ("pcm_ok", b"\x00" * 32000, "pcm16", 16000, 1000, "ok"),
    # 1ms slack: 16 samples = 32 bytes off-grid is still ok
    ("pcm_slack", b"\x00" * 32032, "pcm16", 16000, 1000, "ok"),
    ("pcm_past_slack", b"\x00" * 32034, "pcm16", 16000, 1000,
     "length_mismatch"),
    ("mulaw_ok", b"\x7f" * 8000, "mulaw", 8000, 1000, "ok"),
    ("mulaw_long", b"\x7f" * 12000, "mulaw", 8000, 1000,
     "length_mismatch"),
]


@pytest.fixture(scope="module")
def classified(spark):
    rows = [(name, data, codec, sr, dur)
            for name, data, codec, sr, dur, _ in CASES]
    df = spark.createDataFrame(
        rows,
        "clip_id string, bytes binary, codec string, sr_hz int, "
        "dur_ms int",
    )
    out = sniff_payloads(df).select("clip_id", "payload_class",
                                    "payload_severity")
    return {r["clip_id"]: (r["payload_class"], r["payload_severity"])
            for r in out.collect()}


@pytest.mark.parametrize(
    "name,expected",
    [(c[0], c[5]) for c in CASES],
    ids=[c[0] for c in CASES],
)
def test_evidence_class(classified, name, expected):
    cls, sev = classified[name]
    assert cls == expected
    assert sev == PAYLOAD_CLASS_SEVERITY[expected]


def test_plan_is_pure_catalyst(spark):
    df = spark.createDataFrame(
        [("a", b"xx", "pcm16", 16000, 1)],
        "clip_id string, bytes binary, codec string, sr_hz int, "
        "dur_ms int",
    )
    plan = payload_confusion(df)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "Python" not in plan and "Arrow" not in plan


def test_confusion_counts_match_row_level(spark):
    from data_quality_spark.synth import generate_clips

    pdf = generate_clips(300, seed=7)
    df = spark.createDataFrame(pdf)
    cells = {(r["codec"], r["payload_class"]): r["n"]
             for r in payload_confusion(df).collect()}
    rows = sniff_payloads(df).groupBy("codec", "payload_class").count() \
        .collect()
    assert cells == {(r["codec"], r["payload_class"]): r["count"]
                     for r in rows}
    assert sum(cells.values()) == 300
