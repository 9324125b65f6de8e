"""Unicode normalization repair laws.

The stats relation is hash-checked end-to-end by the driver oracle
(independent regex replay + md5); these tests pin the law itself on
constructed strings and the transform view's contracts (NULL totality,
idempotence, dedup convergence — the reason the repair exists).
"""

from __future__ import annotations

import unicodedata

from data_quality_spark.operators.text_normalize import (
    apply_norm,
    normalize_stats,
    normalize_text,
)


class TestLaw:
    def test_newline_folding(self):
        s, n_cr, n_ctl, nfc = apply_norm("a\r\nb\rc\nd")
        assert s == "a\nb\nc\nd" and n_cr == 2 and n_ctl == 0 and not nfc

    def test_control_strip_keeps_tab_newline(self):
        s, _, n_ctl, _ = apply_norm("a\x07b\tc\nd\x7fe\x9cf")
        assert s == "ab\tc\ndef" and n_ctl == 3

    def test_nfc_composition(self):
        decomposed = "café"
        s, _, _, nfc = apply_norm(decomposed)
        assert s == "café" and nfc
        assert unicodedata.is_normalized("NFC", s)

    def test_replacement_char_kept(self):
        s, _, n_ctl, _ = apply_norm("bad � data.")
        assert "�" in s and n_ctl == 0

    def test_idempotent(self):
        once, *_ = apply_norm("x\r\ny café \x07z")
        twice, n_cr, n_ctl, nfc = apply_norm(once)
        assert twice == once and n_cr == 0 and n_ctl == 0 and not nfc


class TestOperator:
    def test_transform_null_totality_and_dedup_convergence(self, spark):
        rows = [
            (1, "café menu."),      # decomposed spelling
            (2, "café menu."),       # composed spelling — same text
            (3, None),
            (4, "ctl\x07 here\r\n"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r.doc_id: r.text for r in normalize_text(df).collect()}
        assert out[3] is None
        # the two spellings converge — byte-level dedup now sees one form
        assert out[1] == out[2] == "café menu."
        assert out[4] == "ctl here\n"
        st = {r.doc_id: r for r in normalize_stats(df).collect()}
        assert st[1].nfc_changed and not st[2].changed
        assert st[3].n_in == 0 and not st[3].changed
        assert st[1].norm_md5 == st[2].norm_md5


def test_cli_audit_normalize(spark, tmp_path, capsys, monkeypatch):
    """audit --kind normalize: repair-need classes surface with exact
    counts."""
    import json

    import data_quality_spark.cli as cli

    monkeypatch.setattr("pyspark.sql.SparkSession.stop", lambda self: None)
    tables = tmp_path / "tables"
    tables.mkdir()
    rows = [
        (1, "clean text here."),
        (2, "crlf\r\nline"),
        (3, "ctl\x07here"),
        (4, "café decomposed"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1).write.parquet(str(tables / "docs.parquet"))
    code = cli.main(
        ["audit", "--tables", str(tables), "--table", "docs",
         "--kind", "normalize", "--format", "json", "--fail-on", "none"]
    )
    out = {r["issue_type"]: r for r in json.loads(capsys.readouterr().out)}
    assert code == 0
    assert out["crlf_newlines"]["count"] == 1
    assert out["control_chars"]["count"] == 1
    assert out["nfc_decomposed"]["count"] == 1
    assert out["needs_normalization"]["count"] == 3
    assert out["needs_normalization"]["total"] == 4
