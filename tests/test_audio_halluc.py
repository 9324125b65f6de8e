"""ASR-hallucination / cross-modal mismatch audit.

Seeded-defect style: the four injected hallucination classes must be
caught at 100% with ZERO false flags on the clean base (the corpus is
defect-free apart from the seeded grid, so the catch set must EQUAL the
seeded set exactly).  The decision laws themselves are independently
replayed by the audio_halluc differential oracle (brute-force tail-loop
enumeration, per-char normalization); these tests pin the text kernels
and the operator/issue wiring.
"""

from __future__ import annotations

import pytest

from data_quality_spark.functions.halluc import (
    LOOP_MIN_REPEATS,
    LOOP_MIN_TOKENS,
    STOCK_PHRASES,
    normalize_caption,
    tail_loop,
)
from data_quality_spark.synth import make_audio_halluc_corpus


class TestKernels:
    def test_tail_loop_simple_word(self):
        # "... stop stop stop stop" → period 1, 4 repeats
        assert tail_loop("a b stop stop stop stop".split()) == (1, 4)

    def test_tail_loop_phrase(self):
        toks = ("intro " + "thank you " * 5).split()
        p, k = tail_loop(toks)
        assert (p, k) == (2, 5)

    def test_tail_loop_prefers_mass_then_small_period(self):
        # "x y x y x y" — period 2 × 3 = mass 6 beats nothing longer;
        # no period-1 repeat exists at the tail
        assert tail_loop("x y x y x y".split()) == (2, 3)
        # pure run: period 1 mass 6 ties period 2 mass 6 → smallest period
        assert tail_loop(["w"] * 6) == (1, 6)

    def test_tail_loop_interior_repeat_not_counted(self):
        # the loop must anchor at the END
        assert tail_loop("go go go go then done".split()) == (0, 0)

    def test_tail_loop_empty_and_single(self):
        assert tail_loop([]) == (0, 0)
        assert tail_loop(["one"]) == (0, 0)

    def test_normalize_caption(self):
        assert normalize_caption("  Thanks, for WATCHING!!  ") == (
            "thanks for watching"
        )
        assert normalize_caption(None) == ""
        assert normalize_caption("Café -- ok") == "caf ok"
        assert "thanks for watching" in STOCK_PHRASES


class TestOperator:
    @pytest.fixture(scope="class")
    def flagged(self, spark):
        from data_quality_spark.operators.audio_halluc import halluc_flags
        from data_quality_spark.plans.schemas import CLIPS_SCHEMA

        pdf = make_audio_halluc_corpus(240, seed=11)
        cols = [f.name for f in CLIPS_SCHEMA.fields]
        clips = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA)
        rows = {r.clip_id: r for r in halluc_flags(clips).collect()}
        tags = dict(zip(pdf.clip_id, pdf.defect))
        return rows, tags

    @pytest.mark.parametrize(
        "cls,flag",
        [
            ("halluc_silence", "text_over_silence"),
            ("halluc_notext", "speech_no_text"),
            ("halluc_loop", "end_loop"),
            ("halluc_stock", "stock_caption"),
        ],
    )
    def test_seeded_class_caught_exactly(self, flagged, cls, flag):
        rows, tags = flagged
        seeded = {c for c, d in tags.items() if d == cls}
        caught = {c for c, r in rows.items() if getattr(r, flag)}
        assert len(seeded) >= 15
        assert caught == seeded

    def test_clean_rows_never_flag(self, flagged):
        rows, tags = flagged
        clean = [r for c, r in rows.items() if tags[c] == "none"]
        assert len(clean) >= 150
        assert not any(r.is_halluc for r in clean)

    def test_loop_stats_satisfy_law(self, flagged):
        rows, tags = flagged
        for c, r in rows.items():
            if tags[c] == "halluc_loop":
                assert r.tail_repeats >= LOOP_MIN_REPEATS
                assert r.tail_period * r.tail_repeats >= LOOP_MIN_TOKENS

    def test_issue_relation(self, spark, flagged):
        from data_quality_spark.operators.audio_halluc import (
            halluc_flags,
            halluc_issues,
        )
        from data_quality_spark.plans.schemas import CLIPS_SCHEMA

        pdf = make_audio_halluc_corpus(240, seed=11)
        cols = [f.name for f in CLIPS_SCHEMA.fields]
        clips = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA)
        issues = {
            r.issue_type: r
            for r in halluc_issues(halluc_flags(clips)).collect()
        }
        rows, tags = flagged
        for cls, flag, sev in [
            ("halluc_silence", "text_over_silence", "critical"),
            ("halluc_notext", "speech_no_text", "critical"),
            ("halluc_loop", "end_loop", "warning"),
            ("halluc_stock", "stock_caption", "warning"),
        ]:
            n = sum(1 for c, d in tags.items() if d == cls)
            r = issues[flag]
            assert r["count"] == n > 0
            assert r.severity == sev and r.total == 240
            assert r.percent == pytest.approx(100.0 * n / 240)


def test_cli_audit_halluc(spark, tmp_path, capsys, monkeypatch):
    """audit --kind halluc: seeded silence-caption clips surface as
    text_over_silence (critical) → exit 2 under --fail-on critical."""
    import json

    import data_quality_spark.cli as cli
    from data_quality_spark.plans.schemas import CLIPS_SCHEMA

    monkeypatch.setattr("pyspark.sql.SparkSession.stop", lambda self: None)
    tables = tmp_path / "tables"
    tables.mkdir()
    pdf = make_audio_halluc_corpus(96, seed=3)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    spark.createDataFrame(pdf[cols], CLIPS_SCHEMA).coalesce(2).write.parquet(
        str(tables / "haclips.parquet")
    )
    code = cli.main(
        ["audit", "--tables", str(tables), "--table", "haclips",
         "--kind", "halluc", "--format", "json", "--fail-on", "none"]
    )
    rows = {r["issue_type"]: r for r in json.loads(capsys.readouterr().out)}
    assert code == 0
    n_sil = int((pdf["defect"] == "halluc_silence").sum())
    r = rows["text_over_silence"]
    assert r["count"] == n_sil > 0
    assert r["severity"] == "critical" and r["total"] == 96
    assert cli.main(
        ["audit", "--tables", str(tables), "--table", "haclips",
         "--kind", "halluc"]
    ) == 2
    capsys.readouterr()
