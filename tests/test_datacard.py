"""Corpus data card (operators/datacard.py).

Correctness model: the grouping-sets card must equal three separately
computed aggregates (corpus / per-lang / per-source), the additive
metrics must reconcile across dimensions, and the physical plan must
show ONE source scan with one Expand — the single-pass claim.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_quality_spark.operators.datacard import data_card


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    for i in range(240):
        lang = ["en", "de", "es"][i % 3]
        source = ["web", "books"][i % 2]
        if i % 40 == 7:
            text = None  # empty class
        elif i % 17 == 3:
            text = "dup dup dup"  # exact-dup class
        else:
            text = f"word{i} " + "the quick brown fox and that this " * (
                2 + i % 5)
        rows.append((i, text, lang, source))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    return spark.createDataFrame(pdf)


def test_matches_separate_aggregates(spark, docs):
    card = {(r["dim"], r["grp"]): r for r in data_card(docs).collect()}
    n = docs.count()
    corpus = card[("corpus", "all")]
    assert corpus["n_docs"] == n
    # per-lang rows equal direct groupBy counts
    for r in docs.groupBy("lang").count().collect():
        assert card[("lang", r["lang"])]["n_docs"] == r["count"]
    for r in docs.groupBy("source").count().collect():
        assert card[("source", r["source"])]["n_docs"] == r["count"]
    # exact uniques: corpus row equals a direct distinct count of
    # NON-NULL texts (NULL text carries no fingerprint — the law)
    direct = docs.where(F.col("text").isNotNull()).select(
        F.md5("text").alias("m")
    ).distinct().count()
    assert corpus["n_unique"] == direct


def test_additive_metrics_reconcile(docs):
    rows = data_card(docs).collect()
    by_dim = {}
    for r in rows:
        by_dim.setdefault(r["dim"], []).append(r)
    corpus = by_dim["corpus"][0]
    for dim in ("lang", "source"):
        for m in ("n_docs", "n_chars", "n_tokens", "n_empty",
                  "n_gopher_pass"):
            assert sum(r[m] for r in by_dim[dim]) == corpus[m], (dim, m)
        # distinct counts are NOT additive: dup classes span groups
        assert sum(r["n_unique"] for r in by_dim[dim]) >= corpus["n_unique"]
    assert corpus["n_empty"] > 0  # seeded classes present
    assert corpus["n_unique"] < corpus["n_docs"]


def test_single_scan_plan(docs):
    plan = data_card(docs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Expand") == 1
    # one source scan feeds everything (the docs fixture is an in-memory
    # relation; the scan node appears exactly once)
    scans = (plan.count("Scan ExistingRDD") + plan.count("FileScan")
             + plan.count("LocalTableScan"))
    assert scans == 1


def test_data_card_drift_status_law(spark):
    from data_quality_spark.operators.datacard import data_card_drift

    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "doc_id long, text string, lang string, source string")
    words = "several plain common words right here and there "
    old = mk(
        [(i, f"{words} o{i}", "en", "web") for i in range(10)]
        + [(100 + i, f"{words} g{i}", "de", "web") for i in range(4)]
    )
    new = mk(
        [(i, f"{words} o{i}", "en", "web") for i in range(10)]  # stable
        + [(200 + i, f"{words} n{i}", "fr", "books") for i in range(3)]
    )
    got = {(r["dim"], r["grp"]): r for r in data_card_drift(
        old, new).collect()}
    assert got[("lang", "en")]["status"] == "stable"
    assert got[("lang", "de")]["status"] == "removed"
    assert got[("lang", "fr")]["status"] == "added"
    assert got[("corpus", "all")]["status"] == "changed"
    assert got[("corpus", "all")]["d_docs"] == -1  # 14 -> 13
    assert got[("lang", "de")]["d_docs"] == -4
    assert got[("lang", "fr")]["n_docs_old"] == 0
    assert got[("source", "books")]["status"] == "added"
    # zero-delta sanity on the stable row
    en = got[("lang", "en")]
    assert all(en[f"d_{m}"] == 0 for m in
               ("docs", "tokens", "empty", "gopher_pass", "unique"))
