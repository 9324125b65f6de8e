"""Loudness-range (EBU R128 / Tech 3342) over-compression audit.

Seeded-defect style: constructed brick-limited (flat) and dynamic
programs must separate by > 6× on both sides of the 3 LU flag law;
evaluability is total (short / silent / undecodable → NULL LRA, never a
flag).  The LRA law itself — absolute gate, fsum power mean, −20 LU
relative gate, integer-index percentiles — is independently replayed by
the audio_lra differential oracle; these tests pin the kernel geometry
and the operator/issue wiring.
"""

from __future__ import annotations

import numpy as np
import pytest

from data_quality_spark.functions.loudness import (
    LRA_MIN_BLOCKS,
    ST_BLOCK_S,
    ST_HOP_S,
    block_loudness,
    clip_lra,
    loudness_range,
)
from data_quality_spark.operators.audio_lra import OVERCOMP_LRA_MAX
from data_quality_spark.synth import make_audio_lra_corpus

SR = 16000


def _flat(dur=12.0, seed=1, rms=0.2):
    rng = np.random.default_rng(seed)
    return (rms * rng.standard_normal(int(SR * dur))).astype(np.float64)


def _dynamic(dur=12.0, seed=2, loud=0.2, soft_db=-14.0):
    """Alternating ~4 s loud/soft noise sections — longer than the 3 s
    short-term window so whole blocks are purely one level."""
    rng = np.random.default_rng(seed)
    n = int(SR * dur)
    x = loud * rng.standard_normal(n)
    soft = 10.0 ** (soft_db / 20.0)
    pos = 0
    level_soft = False
    while pos < n:
        w = int(SR * 4.0)
        if level_soft:
            x[pos: pos + w] *= soft
        level_soft = not level_soft
        pos += w
    return x


class TestKernel:
    def test_flat_program_collapses(self):
        st = clip_lra(_flat(), SR)
        assert st["n_lra_gated"] >= LRA_MIN_BLOCKS
        assert st["lra"] is not None and st["lra"] < 0.5

    def test_dynamic_program_spreads(self):
        st = clip_lra(_dynamic(), SR)
        assert st["n_lra_gated"] >= LRA_MIN_BLOCKS
        # 14 dB section contrast → LRA near 14 LU, > 4× the 3 LU law
        assert st["lra"] is not None and st["lra"] > 4 * OVERCOMP_LRA_MAX

    def test_relative_gate_uses_minus_20(self):
        """Sections at −30 dB relative must be DISCARDED by the −20 LU
        relative gate (the Tech 3342 subtlety): the reported spread then
        collapses to the loud sections' own variation, not 30 LU."""
        st = clip_lra(_dynamic(soft_db=-30.0), SR)
        assert st["lra"] is not None and st["lra"] < 25.0
        lj = block_loudness(
            _dynamic(soft_db=-30.0), SR,
            block_s=ST_BLOCK_S, hop_s=ST_HOP_S,
        )
        raw_spread = np.max(lj) - np.min(lj)
        assert raw_spread > st["lra"] + 5.0  # the gate really bit

    def test_percentile_integer_index_law(self):
        # hand-check on a known ascending distribution: k=10 gated
        # blocks at 0..9 LUFS-ish values → idx10 = 0, idx95 = 8
        vals = np.array([-40.0 + v for v in range(10)])
        lra, k = loudness_range(vals)
        assert k == 10
        assert lra == pytest.approx(vals[8] - vals[0])

    def test_evaluability_totality(self):
        assert clip_lra(np.zeros(0), SR)["lra"] is None
        assert clip_lra(_flat(dur=2.0), SR)["lra"] is None  # < one block
        assert clip_lra(np.zeros(5 * SR), SR)["lra"] is None  # silence
        st = clip_lra(_flat(dur=2.0), 0)
        assert st["n_st_blocks"] == 0 and st["lra"] is None


class TestOperator:
    @pytest.fixture(scope="class")
    def flagged(self, spark):
        from data_quality_spark.operators.audio_lra import lra_flags
        from data_quality_spark.plans.schemas import CLIPS_SCHEMA

        pdf = make_audio_lra_corpus(100, seed=7)
        cols = [f.name for f in CLIPS_SCHEMA.fields]
        clips = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA)
        rows = {r.clip_id: r for r in lra_flags(clips).collect()}
        tags = dict(zip(pdf.clip_id, pdf.defect))
        return rows, tags

    def test_seeded_classes_separate(self, flagged):
        rows, tags = flagged
        flat = [r for c, r in rows.items() if tags[c] == "lra_flat"]
        dyn = [r for c, r in rows.items() if tags[c] == "lra_dynamic"]
        assert len(flat) >= 10 and len(dyn) >= 10
        assert all(r.is_overcompressed for r in flat)
        assert all(r.lra < OVERCOMP_LRA_MAX / 2 for r in flat)
        assert not any(r.is_overcompressed for r in dyn)
        assert all(r.lra > 2 * OVERCOMP_LRA_MAX for r in dyn)

    def test_null_lra_never_flags(self, flagged):
        rows, tags = flagged
        nulls = [r for r in rows.values() if r.lra is None]
        assert nulls, "corpus should carry short / undecodable rows"
        assert not any(r.is_overcompressed for r in nulls)

    def test_issue_relation(self, spark, flagged):
        from data_quality_spark.operators.audio_lra import (
            lra_flags,
            lra_issues,
        )
        from data_quality_spark.plans.schemas import CLIPS_SCHEMA

        pdf = make_audio_lra_corpus(100, seed=7)
        cols = [f.name for f in CLIPS_SCHEMA.fields]
        clips = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA)
        issues = {
            r.issue_type: r for r in lra_issues(lra_flags(clips)).collect()
        }
        rows, _ = flagged
        n_flagged = sum(1 for r in rows.values() if r.is_overcompressed)
        r = issues["overcompressed"]
        assert r["count"] == n_flagged > 0
        assert r.severity == "warning" and r.total == 100
        assert r.percent == pytest.approx(100.0 * n_flagged / 100)
