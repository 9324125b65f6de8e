"""Dataset datasheet: overview law (counts, durations, dup fraction,
PII hits), grouping-sets distributions in one pass, optional-column
degradation, markdown rendering, and the CLI command."""

from __future__ import annotations

import json

import pytest

from data_quality_spark.plans.datasheet import datasheet, render_markdown


def test_overview_and_distributions(spark):
    from data_quality_spark.plans.schemas import CLIPS_SCHEMA
    from data_quality_spark.synth import generate_clips

    pdf = generate_clips(120, seed=42)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    df = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA)
    card = datasheet(df)
    ov = card["overview"]
    assert ov["n_rows"] == 120
    assert ov["total_dur_ms"] == int(pdf["dur_ms"].sum())
    assert ov["first_day"] == pdf["ingest_day"].min()
    assert ov["last_day"] == pdf["ingest_day"].max()
    assert ov["n_empty_transcript"] == int(
        (pdf["transcript"].str.strip() == "").sum()
    )
    assert 0.0 <= ov["approx_duplicate_frac"] <= 1.0
    assert ov["pii_hits"] >= int((pdf["defect"] == "pii").sum())
    # distributions cover the corpus exactly
    assert sum(card["by_codec"].values()) == 120
    assert sum(card["by_ingest_day"].values()) == 120
    assert sum(card["by_lang_pred"].values()) == 120
    assert set(card["by_codec"]) == set(pdf["codec"].unique())
    md = render_markdown(card)
    assert "## Overview" in md and "## codec distribution" in md


def test_optional_columns_degrade(spark):
    df = spark.createDataFrame(
        [(1, "hello there"), (2, "the quick fox")], ["doc_id", "transcript"]
    )
    card = datasheet(df)
    assert card["overview"]["n_rows"] == 2
    assert "total_dur_ms" not in card["overview"]
    assert "by_codec" not in card
    assert sum(card["by_lang_pred"].values()) == 2


def test_cli_datasheet(spark, tmp_path, capsys, monkeypatch):
    import data_quality_spark.cli as cli
    from data_quality_spark.plans.schemas import CLIPS_SCHEMA
    from data_quality_spark.synth import generate_clips

    monkeypatch.setattr("pyspark.sql.SparkSession.stop", lambda self: None)
    pdf = generate_clips(40, seed=42)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    src = tmp_path / "clips"
    spark.createDataFrame(pdf[cols], CLIPS_SCHEMA).coalesce(2).write.parquet(
        str(src)
    )
    code = cli.main(["datasheet", "--input", str(src)])
    card = json.loads(capsys.readouterr().out)
    assert code == 0 and card["overview"]["n_rows"] == 40
    code = cli.main(["datasheet", "--input", str(src), "--format", "markdown"])
    assert code == 0
    assert "# Dataset datasheet" in capsys.readouterr().out
