"""C4/Gopher line-level filtering laws.

The query is verified end-to-end by a STRICT DuckDB SQL twin (incl. the
cleaned-text md5); these tests pin the keep/drop laws on constructed
pages and the transform view's coherence with the stats view.
"""

from __future__ import annotations

import hashlib

from data_quality_spark.operators.line_filter import clean_lines, line_stats


def _stats(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r.doc_id: r for r in line_stats(df).collect()}


def test_line_keep_law(spark):
    s = _stats(spark, [
        (1, "Good sentence here.\nshort\nAnother fine line!\n"
            "please enable JavaScript to continue."),
        (2, "No terminal punctuation on this line\nBut this one has it."),
        (3, 'He said "done."\nIs this kept?\nYes it is!'),
    ])
    assert (s[1].n_lines, s[1].n_kept) == (4, 2)  # short + javascript die
    assert (s[2].n_lines, s[2].n_kept) == (2, 1)
    assert s[3].n_kept == 3  # quote, question, exclamation all terminal


def test_page_drop_law(spark):
    s = _stats(spark, [
        (1, "Totally fine sentence."),
        (2, "Contains Lorem Ipsum dolor sit."),
        (3, "var x = { a: 1 }; plus a real sentence."),
        (4, "no line survives here"),
        (5, None),
    ])
    assert not s[1].c4_drop
    assert s[2].has_lorem and s[2].c4_drop
    assert s[3].has_brace and s[3].c4_drop
    assert s[4].n_kept == 0 and s[4].c4_drop
    assert s[5].n_lines == 0 and s[5].c4_drop


def test_gopher_line_shape_flags(spark):
    bullets = "\n".join(f"• item {i}" for i in range(10))
    s = _stats(spark, [
        (1, bullets),                              # 10/10 bullets
        (2, bullets + "\nA real closing sentence."),  # 10/11 → still >90%
        (3, "One...\nTwo...\nThree fine sentences here.\nFour more words "
            "here.\nFive good words here too."),   # 2/5 ellipsis > 30%
        (4, "Only one...\nplus many normal lines.\nMore of them here.\n"
            "And another good one.\nAnd one more to dilute."),  # 1/5 ≤ 30%
    ])
    assert s[1].fail_bullet
    assert s[2].fail_bullet  # 110 > 99
    assert s[3].fail_ellipsis and not s[3].fail_bullet
    assert not s[4].fail_ellipsis


def test_clean_lines_transform_coherence(spark):
    rows = [
        (1, "Keep this sentence.\nnot this\nAnd keep this one too!"),
        (2, "lorem ipsum makes the whole page vanish."),
        (3, "nothing survives"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cleaned = {r.doc_id: r.text for r in clean_lines(df).collect()}
    assert set(cleaned) == {1}
    assert cleaned[1] == "Keep this sentence.\nAnd keep this one too!"
    # the stats view's md5 is the md5 of the transform view's text
    st = {r.doc_id: r for r in line_stats(df).collect()}
    assert st[1].cleaned_md5 == hashlib.md5(
        cleaned[1].encode()).hexdigest()


def test_cli_audit_lines(spark, tmp_path, capsys, monkeypatch):
    """audit --kind lines: C4 page-drops and Gopher line-shape failures
    surface as warnings with exact counts."""
    import json

    import data_quality_spark.cli as cli

    monkeypatch.setattr("pyspark.sql.SparkSession.stop", lambda self: None)
    tables = tmp_path / "tables"
    tables.mkdir()
    bullets = "\n".join(f"• item {i}" for i in range(10))
    rows = [
        (1, "A perfectly fine sentence."),
        (2, "Contains lorem ipsum dolor."),
        (3, bullets),
        (4, "One...\nTwo...\nFine sentence number three here."),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1).write.parquet(str(tables / "docs.parquet"))
    code = cli.main(
        ["audit", "--tables", str(tables), "--table", "docs",
         "--kind", "lines", "--format", "json", "--fail-on", "none"]
    )
    out = {r["issue_type"]: r for r in json.loads(capsys.readouterr().out)}
    assert code == 0
    assert out["c4_page_drop"]["count"] == 2  # lorem + all-bullet page
    assert out["bullet_lines"]["count"] == 1
    assert out["ellipsis_lines"]["count"] == 1
    assert out["c4_page_drop"]["severity"] == "warning"
