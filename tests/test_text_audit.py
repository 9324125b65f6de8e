"""Fused text audit: seeded-defect detection per rule, agreement with the
standalone operators, count>0 emission, and the single-scan plan law."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_quality_spark.operators.text_audit import (
    _RULES_META,
    text_audit_issues,
)


@pytest.fixture(scope="module")
def seeded(spark):
    prose = "the quick brown fox jumps over the lazy dog and runs away now"
    rows = [
        (1, None, "en"),                                  # null_text
        (2, "   ", "en"),                                 # empty_text
        (3, "short one", "en"),                           # too_few_words
        (4, " ".join(["w%d is fine the" % i for i in range(40)]), "en"),
        (5, "dup dup dup dup dup dup dup dup dup the", "en"),  # dup mass
        (6, "zebra quokka vortex plasma nexus", "en"),    # stopword_free
        (7, "1234 5678 9012 the", "en"),                  # digit_flood
        (8, "@@@@ #### $$$$ %%%% the ok", "en"),          # special_flood
        (9, prose + " caf�e", "en"),                      # encoding_suspect
        (10, prose + " " + prose, "en"),                  # clean long prose
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_each_rule_fires(spark, seeded):
    issues = {
        r["issue_type"]: r
        for r in text_audit_issues(seeded, min_words=10, max_words=60).collect()
    }
    for rule in ("null_text", "empty_text", "too_few_words", "too_many_words",
                 "dup_token_mass", "stopword_free", "digit_flood",
                 "special_flood", "encoding_suspect"):
        assert rule in issues, rule
        assert issues[rule]["count"] >= 1, rule
        assert issues[rule]["severity"] == _RULES_META[rule][0]
        assert issues[rule]["total"] == 10
    # percent law
    r = issues["null_text"]
    assert r["percent"] == pytest.approx(r["count"] * 100.0 / r["total"])


def test_zero_count_rules_not_emitted(spark):
    clean = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog and runs away "
             "from the big red barn with some more words here", "en")],
        "doc_id long, text string, lang string",
    )
    emitted = {r["issue_type"]
               for r in text_audit_issues(clean, min_words=5).collect()}
    assert "null_text" not in emitted
    assert "encoding_suspect" not in emitted


def test_agrees_with_standalone_operators(spark, sf_dir):
    """The fused audit's counts equal the standalone operators' on the
    real corpus (shared expressions — the fold must not change them)."""
    from data_quality_spark.operators.docs import (
        encoding_audit,
        stopword_stats,
    )
    from data_quality_spark.operators.quality_model import quality_score

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    issues = {
        r["issue_type"]: r["count"]
        for r in text_audit_issues(docs, min_words=15, max_words=90).collect()
    }
    enc = encoding_audit(docs).agg(F.sum("n_suspect")).collect()[0][0]
    assert issues.get("encoding_suspect", 0) == enc
    sw = stopword_stats(docs).agg(F.sum("n_stopword_free")).collect()[0][0]
    assert issues.get("stopword_free", 0) == sw
    lowq = quality_score(docs).filter(~F.col("q_keep")).count()
    assert issues.get("low_quality_score", 0) == lowq


def test_single_scan_single_aggregate_plan(spark, seeded):
    plan = (
        text_audit_issues(seeded)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # one aggregate pair over one source, no join, no extra scan
    assert plan.count("Scan ") <= 1 or "LocalTableScan" in plan
    for bad in ("SortMergeJoin", "BroadcastHashJoin"):
        assert bad not in plan
