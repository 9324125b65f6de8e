"""Unit tests for the numpy audio codecs and text kernels."""

from __future__ import annotations

import numpy as np
import pytest

from data_quality_spark.functions import audio as A
from data_quality_spark.functions import text as X


@pytest.fixture(scope="module")
def signal():
    rng = np.random.default_rng(123)
    t = np.arange(16000) / 16000.0
    x = 0.5 * np.sin(2 * np.pi * 440 * t) + rng.normal(0, 0.01, 16000)
    return np.clip(x, -1, 1)


def snr_db(x, y):
    err = x - y
    return 10 * np.log10(np.sum(x**2) / max(np.sum(err**2), 1e-30))


def test_pcm16_roundtrip_snr(signal):
    assert snr_db(signal, A.decode_pcm16(A.encode_pcm16(signal))) > 60


def test_mulaw_roundtrip_snr(signal):
    # µ-law is lossy; the BASELINE invariant is SNR ≥ 30 dB
    assert snr_db(signal, A.decode_mulaw(A.encode_mulaw(signal))) >= 30


def test_wav_roundtrip(signal):
    y, sr = A.decode_wav(A.encode_wav(signal, 16000))
    assert sr == 16000 and snr_db(signal, y) > 60


def test_decode_clip_errors():
    with pytest.raises(ValueError):
        A.decode_clip(b"\x00\x01", "opus", 16000)
    with pytest.raises(ValueError):
        A.decode_wav(b"RIFFxxxxNOPE" + b"\x00" * 64)
    with pytest.raises(ValueError):
        # header sr disagrees with declared metadata
        A.decode_clip(A.encode_wav(np.zeros(100), 8000), "wav", 16000)


def test_clip_stats_silence_and_clipping():
    assert A.clip_stats(np.zeros(8000), 16000)["silence_frac"] == 1.0
    st = A.clip_stats(np.ones(1600), 16000)
    assert st["clip_frac"] == 1.0 and st["peak_db"] == pytest.approx(0.0, abs=1e-6)
    assert A.clip_stats(np.zeros(0), 16000)["rms_db"] == -120.0


def test_langid_separates_languages():
    samples = {
        "en": "the people think this is a good time of the year",
        "es": "el tiempo de la vida es muy bien para el mundo",
        "de": "die menschen denken das ist eine gute zeit für die welt",
        "fr": "le temps de la vie est très bien pour le monde",
    }
    for lang, s in samples.items():
        pred, conf = X.LANGID.score_one(s)
        assert pred == lang and conf > 0.9
    _, junk_conf = X.LANGID.score_one("xq zzz qqq 0x0x zxzx")
    assert junk_conf < 0.5
    assert X.LANGID.score_one("") == ("und", 0.0)


def test_perplexity_orders_text_quality():
    en = "the people think this is a good time"
    junk = "xq zzz qqq 0x0x"
    assert X.PPLM.ppl_one(en, "en") < X.PPLM.ppl_one(junk, "en")
    assert X.PPLM.ppl_one(en, "en") < 2000 < X.PPLM.ppl_one(junk, "en")


def test_scrub_patterns():
    t = "mail a@b.com or +1 555-123-4567 ssn 123-45-6789 you scumbag MORON"
    s = X.scrub_text(t)
    assert "<EMAIL>" in s and "<PHONE>" in s and "<SSN>" in s
    assert s.count("<TOX>") == 2  # case-insensitive word boundary
    assert X.scrub_text(None) is None
    assert X.scrub_text("clean text") == "clean text"


def test_text_heuristics():
    assert X.token_count("  a  b c ") == 3
    assert X.token_count("") == 0 and X.token_count(None) == 0
    assert X.rep_ratio("a a a a") == 0.75
    assert X.charclass_frac("ab!!") == 0.5
    assert X.charclass_frac("über straße") == 0.0  # latin-1 letters are normal
