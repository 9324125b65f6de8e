"""Linear quality scorer laws: feature math on hand-built docs, empty-doc
totality, weight-sign behavior, and integer-exact rollup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_quality_spark.operators.quality_model import (
    LEN_CAP,
    WEIGHTS,
    quality_score,
    quality_score_stats,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # natural prose: stopwords present, few digits/specials → keep
        (1, "the quick brown fox jumps over the lazy dog and runs", "en"),
        # digit flood → strongly negative
        (2, "4532 9981 2210 8876 0045 1123 9087 6654 3321 0098", "en"),
        # symbol soup → special fraction dominates
        (3, "@@@ ### $$$ %%% ^^^ &&& *** ((( ))) ___", "en"),
        # empty / null: score is the bias alone, never an error
        (4, "", "en"),
        (5, None, "en"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string, lang string")


def test_scores_and_keep(spark, docs):
    rows = {r["doc_id"]: r for r in quality_score(docs).collect()}
    assert rows[1]["q_keep"] is True
    assert rows[2]["q_keep"] is False
    assert rows[3]["q_keep"] is False
    # empty and null docs score exactly the bias: every fraction guard
    # yields 0.0 and f_len is 0
    b = WEIGHTS[0]
    assert rows[4]["q_score"] == pytest.approx(b)
    assert rows[5]["q_score"] == pytest.approx(b)


def test_feature_math_exact(spark):
    """One doc with hand-countable features reproduces the exact chain."""
    text = "the cat sat on 12 mats!"
    df = spark.createDataFrame(
        [(1, text, "en")], "doc_id int, text string, lang string"
    )
    got = quality_score(df).first()["q_score"]
    from data_quality_spark.operators.quality_model import _ALL_STOPWORDS

    toks = text.lower().split()
    nt = len(toks)
    ns = sum(1 for t in toks if t in _ALL_STOPWORDS)
    nc = len(text)
    nd = sum(ch.isdigit() for ch in text)
    nsp = sum(
        1 for ch in text
        if not (ch.isascii() and (ch.isalnum() or ch in " \t\n\r"))
        and not ("À" <= ch <= "ÿ")
    )
    assert nt == 6 and nc == len(text)
    b, w_stop, w_len, w_digit, w_special = WEIGHTS
    want = (
        (((b + (w_stop * (ns / nt))) + (w_len * (min(nt, LEN_CAP) / float(LEN_CAP))))
         + (w_digit * (nd / nc)))
        + (w_special * (nsp / nc))
    )
    assert got == want  # bit-identical: same IEEE chain


def test_stats_rollup(spark, docs):
    stats = {r["lang"]: r for r in quality_score_stats(docs).collect()}
    assert stats["en"]["n_docs"] == 5
    keeps = sum(
        1 for r in quality_score(docs).collect() if r["q_keep"]
    )
    assert stats["en"]["n_keep"] == keeps


def test_no_shuffle_scoring_plan(spark, docs):
    plan = (
        quality_score(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # one scan, map-side only
