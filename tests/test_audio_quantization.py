"""Effective-bit-depth / upconversion audit.

The lattice kernel is checked on hand-built arrays (exact trailing-zero
and codebook laws, two's-complement negatives, degenerate clips); the
Spark operator is checked for seeded-defect recall, zero natural false
flags, the honest-µ-law-container exclusion, and the not-evaluable NULL
ladder — all against the quantized corpus the differential oracle replays.
"""

from __future__ import annotations

import numpy as np
import pytest

from data_quality_spark.functions.audio import (
    _decode_i16,
    encode_mulaw,
    encode_pcm16,
)
from data_quality_spark.functions.quantization import (
    MIN_NONZERO_DEFAULT,
    UPCONVERT_TZ_BITS,
    mulaw_codebook,
    quantization_stats_i16,
)


class TestKernel:
    def test_trailing_zeros_exact(self):
        x = (np.arange(-100, 100, dtype=np.int64) * 256).astype(np.int16)
        st = quantization_stats_i16(x)
        assert st["tz_bits"] == 8  # odd multiples of 256 present
        x2 = (np.arange(-50, 50, dtype=np.int64) * 1024).astype(np.int16)
        assert quantization_stats_i16(x2)["tz_bits"] == 10

    def test_negative_lattice_two_complement(self):
        # -256 ends in eight zero bits exactly like +256
        x = np.array([-256, -512, 256], dtype=np.int16)
        assert quantization_stats_i16(x)["tz_bits"] == 8

    def test_full_res_material_has_no_common_zeros(self):
        rng = np.random.default_rng(7)
        x = rng.integers(-3000, 3000, 4096).astype(np.int16)
        x[0] = 1  # force an odd sample
        assert quantization_stats_i16(x)["tz_bits"] == 0

    def test_degenerates(self):
        assert quantization_stats_i16(np.zeros(0, dtype=np.int16)) == {
            "n_samples": 0, "n_nonzero": 0, "n_distinct": 0,
            "tz_bits": 16, "mulaw_hits": 0,
        }
        st = quantization_stats_i16(np.zeros(100, dtype=np.int16))
        assert st["tz_bits"] == 16 and st["n_nonzero"] == 0
        assert st["n_distinct"] == 1

    def test_mulaw_roundtrip_is_full_codebook_member(self):
        rng = np.random.default_rng(11)
        sig = rng.uniform(-0.8, 0.8, 8000)
        q = _decode_i16(encode_mulaw(sig), "mulaw", 16000)
        st = quantization_stats_i16(np.asarray(q, dtype=np.int16))
        assert st["mulaw_hits"] == st["n_nonzero"]
        assert st["n_distinct"] <= 256

    def test_random_material_not_codebook(self):
        rng = np.random.default_rng(13)
        x = rng.integers(-3000, 3000, 4096).astype(np.int16)
        st = quantization_stats_i16(x)
        assert st["mulaw_hits"] < st["n_nonzero"]

    def test_codebook_matches_kernel_lut(self):
        from data_quality_spark.functions.audio import _mulaw_table

        assert set(mulaw_codebook().tolist()) == set(
            np.unique(_mulaw_table()).tolist()
        )


class TestOperator:
    @pytest.fixture(scope="class")
    def flags(self, spark):
        from data_quality_spark.operators.audio_quantization import (
            clip_quantization,
            quantization_flags,
        )
        from data_quality_spark.plans.schemas import CLIPS_SCHEMA
        from data_quality_spark.synth import make_audio_quantized_corpus

        pdf = make_audio_quantized_corpus(300, seed=42)
        cols = [f.name for f in CLIPS_SCHEMA.fields]
        df = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA).repartition(
            8, "clip_id"
        )
        rows = {
            r["clip_id"]: r.asDict()
            for r in quantization_flags(clip_quantization(df)).collect()
        }
        return pdf, rows

    def test_seeded_defects_caught_and_no_false_flags(self, flags):
        pdf, rows = flags
        caught = missed_small = 0
        for _, src in pdf.iterrows():
            r = rows[src["clip_id"]]
            if not r["ok"]:
                continue
            if src["defect"] in ("bit_upconvert", "mulaw_upconvert"):
                want = ("bit_upconverted"
                        if src["defect"] == "bit_upconvert"
                        else "mulaw_upconverted")
                if r["n_nonzero"] >= MIN_NONZERO_DEFAULT:
                    assert r[want] is True, src["clip_id"]
                    assert r["upconverted"] is True
                    caught += 1
                else:
                    assert r["upconverted"] is None
                    missed_small += 1
            elif src["codec"] in ("pcm16", "wav"):
                # natural full-res clips: never flagged (NULL allowed when
                # too few nonzero samples — near-silent / mostly-silent)
                assert r["upconverted"] in (False, None), src["clip_id"]
        assert caught >= 40  # ~60+17 seeded at n=300; most are decodable
        # the not-evaluable ladder should be the exception, not the rule
        assert missed_small < caught / 4

    def test_honest_mulaw_container_not_flagged(self, flags):
        pdf, rows = flags
        checked = 0
        for _, src in pdf.iterrows():
            if src["codec"] != "mulaw" or src["defect"] != "none":
                continue
            r = rows[src["clip_id"]]
            if r["ok"] and r["upconverted"] is not None:
                assert r["upconverted"] is False
                assert r["mulaw_hits"] == r["n_nonzero"]  # coarse, honestly
                checked += 1
        assert checked > 0

    def test_verdict_null_iff_not_evaluable(self, flags):
        _, rows = flags
        for r in rows.values():
            if not r["ok"]:
                assert r["upconverted"] is None
            else:
                evaluable = r["n_nonzero"] >= MIN_NONZERO_DEFAULT
                assert (r["upconverted"] is not None) == evaluable


def test_oracle_twin_matches_operator(spark):
    """Row-for-row parity with the differential twin (the same compare the
    driver's hash gate runs at sf0.01)."""
    from data_quality_spark.oracles import _audio_quantization_expected
    from data_quality_spark.operators.audio_quantization import (
        clip_quantization,
        quantization_flags,
    )
    from data_quality_spark.plans.schemas import CLIPS_SCHEMA
    from data_quality_spark.synth import make_audio_quantized_corpus

    exp = _audio_quantization_expected(120, seed=7)
    pdf = make_audio_quantized_corpus(120, seed=7)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    df = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA).repartition(
        8, "clip_id"
    )
    got = (
        quantization_flags(clip_quantization(df))
        .orderBy("clip_id")
        .collect()
    )
    assert len(got) == len(exp["clip_id"])
    for i, r in enumerate(got):
        for k in exp:
            assert r[k] == exp[k][i], (exp["clip_id"][i], k)
