"""Property-based tests (hypothesis) for the pure kernels — no Spark session,
so these run in milliseconds and fuzz the corners the seeded corpus misses."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from data_quality_spark.functions import audio as A
from data_quality_spark.functions import text as X

signals = st.lists(
    st.floats(min_value=-1.0, max_value=1.0, allow_nan=False, width=32),
    min_size=0,
    max_size=2000,
).map(lambda xs: np.asarray(xs, dtype=np.float64))


@settings(max_examples=50, deadline=None)
@given(signals)
def test_pcm16_roundtrip_bounded_error(x):
    y = A.decode_pcm16(A.encode_pcm16(x))
    assert len(y) == len(x)
    if len(x):
        # int16 quantization: worst-case error ~ 1/32767 (+ rounding)
        assert float(np.max(np.abs(y - x))) <= 1.0 / 32767.0 + 1e-6


@settings(max_examples=50, deadline=None)
@given(signals)
def test_mulaw_roundtrip_snr(x):
    y = A.decode_mulaw(A.encode_mulaw(x))
    assert len(y) == len(x)
    power = float(np.sum(np.square(x)))
    if power > 1e-3:  # SNR is only meaningful for non-silent signals
        err = float(np.sum(np.square(y - x)))
        assert 10 * np.log10(power / max(err, 1e-30)) >= 25.0


@settings(max_examples=50, deadline=None)
@given(signals, st.sampled_from([8000, 16000, 44100]))
def test_wav_roundtrip_preserves_sr(x, sr):
    y, got_sr = A.decode_wav(A.encode_wav(x, sr))
    assert got_sr == sr and len(y) == len(x)


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=512))
def test_decoders_never_crash_on_garbage(payload):
    # decode either succeeds or raises ValueError — never another exception
    for codec in ("pcm16", "mulaw", "wav"):
        try:
            out = A.decode_clip(payload, codec, 16000)
            assert isinstance(out, np.ndarray)
        except ValueError:
            pass


@settings(max_examples=100, deadline=None)
@given(signals, st.sampled_from([0, 1, 8000, 16000]))
def test_clip_stats_invariants(x, sr):
    st_ = A.clip_stats(x, sr)
    assert 0.0 <= st_["silence_frac"] <= 1.0
    assert 0.0 <= st_["clip_frac"] <= 1.0
    assert st_["rms_db"] <= st_["peak_db"] + 1e-9
    assert st_["n_samples"] == float(len(x)) or (sr <= 0)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=300))
def test_scrub_idempotent_and_safe(t):
    once = X.scrub_text(t)
    assert X.scrub_text(once) == once  # scrubbing is idempotent
    # scrubbed text never contains an email-shaped token
    import re

    assert not re.search(X.PII_PATTERNS[0][1], once)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=200))
def test_token_metrics_bounds(t):
    n = X.token_count(t)
    assert n >= 0
    assert 0.0 <= X.rep_ratio(t) <= 1.0
    assert 0.0 <= X.charclass_frac(t) <= 1.0
    lang, conf = X.LANGID.score_one(t)
    assert 0.0 <= conf <= 1.0
    assert X.PPLM.ppl_one(t, lang) >= 0.0


def test_xxh64_twin_matches_spark(spark):
    """The pure-Python XXH64 (driver-side differential oracles) must
    bit-match Spark's xxhash64 on arbitrary strings, multi-column folds,
    and long arrays — one Spark job over a generated corpus of edge-ish
    inputs (unicode, empties, long strings, block boundaries)."""
    from pyspark.sql import functions as F

    from data_quality_spark.functions.xxh64 import xxh64_fold, xxh64_string

    strings = [
        "", "a", " ", "hello world", "ünïcode ☂ test", "你好世界",
        "x" * 31, "y" * 32, "z" * 33, "w" * 100, "\x00\x01", "末 " * 40,
        "tab\tand\nnewline", "🎵🎶", "a" * 7 + "b", "mixed 123 !@# ünits",
    ]
    df = spark.createDataFrame([(s, i) for i, s in enumerate(strings)],
                               "s string, i long")
    got = df.select(
        F.xxhash64("s").alias("h1"),
        F.xxhash64("s", F.lit(5)).alias("h2"),
        F.xxhash64("s", F.col("i")).alias("h3"),
    ).collect()
    for (s, i), r in zip([(s, i) for i, s in enumerate(strings)], got):
        assert r.h1 == xxh64_string(s, 42), s
        assert r.h2 == xxh64_fold([s, ("int", 5)]), s
        assert r.h3 == xxh64_fold([s, i]), s
    adf = spark.createDataFrame(
        [([1, -5, 2**40, 0, -(2**62)],), ([],)], "a array<long>"
    )
    ah = [r[0] for r in adf.select(F.xxhash64("a")).collect()]
    assert ah[0] == xxh64_fold([1, -5, 2**40, 0, -(2**62)])
    assert ah[1] == 42  # empty array: seed passes through


@given(
    st.lists(
        st.text(
            alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
            max_size=60,
        ),
        min_size=1, max_size=20,
    )
)
@settings(max_examples=60, deadline=None)
def test_langid_batch_composition_tolerance(texts):
    """Scoring a text alone vs inside any batch agrees to ~1e-12 in
    confidence and exactly in predicted language except measure-zero ties
    (reduceat SIMD alignment, see functions.text._segment_sums)."""
    from data_quality_spark.functions.text import LANGID, PPLM

    langs_b, confs_b = LANGID.score_batch(texts)
    ppls_b = PPLM.ppl_batch(texts, langs_b)
    for t, lb, cb, pb in zip(texts, langs_b, confs_b, ppls_b):
        l1, c1 = LANGID.score_one(t)
        assert l1 == lb
        assert abs(c1 - cb) < 1e-9
        p1 = PPLM.ppl_one(t, l1)
        assert abs(p1 - pb) <= 1e-9 * max(abs(pb), 1.0)


@given(
    st.lists(st.sampled_from("abcdefgh"), min_size=0, max_size=40),
    st.integers(min_value=0, max_value=30),
)
@settings(max_examples=80, deadline=None)
def test_winnowing_coverage_property(tokens, extra):
    """Winnowing guarantee (Schleimer et al. §2): two documents sharing a
    run of ≥ window + k - 1 tokens share at least one fingerprint."""
    from data_quality_spark.oracles import _winnow_fps_one

    k, w = 3, 4
    doc_a = " ".join(tokens)
    # doc_b embeds doc_a's token run between unrelated prefixes/suffixes
    doc_b = " ".join(["zz%d" % i for i in range(extra)] + tokens + ["qq", "rr"])
    fa = _winnow_fps_one(doc_a, k, w)
    fb = _winnow_fps_one(doc_b, k, w)
    if len(tokens) >= w + k - 1:
        assert fa & fb, (doc_a, doc_b)
    # determinism
    assert fa == _winnow_fps_one(doc_a, k, w)
