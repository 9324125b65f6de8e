"""BM25 sparse retrieval: semantics on a hand-built corpus, the
fixed-point determinism law, and the no-corpus-shuffle plan shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from data_quality_spark.operators.retrieval import (
    IDF_SCALE,
    bm25_idf,
    bm25_topk,
    query_terms,
)


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_bm25(rows, queries, k1=1.2, b=0.75):
    """Independent plain-Python BM25 with the same quantization law."""
    toks = {
        i: (t or "").strip().lower().split() if t and t.strip() else []
        for i, t in rows
    }
    n = len(rows)
    avgdl = sum(len(v) for v in toks.values()) / n
    scores = {}
    for q_id, q in queries.items():
        for term in sorted(set(q.strip().lower().split())):
            df = sum(1 for v in toks.values() if term in v)
            if df == 0:
                continue
            idf_fx = math.floor(
                math.log(1.0 + (n - df + 0.5) / (df + 0.5)) * IDF_SCALE + 0.5
            )
            for i, v in toks.items():
                tf = v.count(term)
                if tf == 0:
                    continue
                tfw = (tf * (k1 + 1.0)) / (
                    tf + (k1 * ((1.0 - b) + (b * (len(v) / avgdl))))
                )
                scores[(q_id, i)] = scores.get((q_id, i), 0) + math.floor(
                    idf_fx * tfw + 0.5
                )
    return scores


def test_bm25_matches_plain_python(spark):
    rows = [
        (1, "fast hash join on the big table"),
        (2, "slow table scan slow scan"),
        (3, "hash hash hash join"),
        (4, "the a of"),
        (5, None),
        (6, "   "),
        (7, "fast fast fast fast join"),
    ]
    queries = {"qa": "fast join", "qb": "slow scan", "qc": "missingterm"}
    out = bm25_topk(_mk_docs(spark, rows), queries, k=5)
    got = {(r["q_id"], r["doc_id"]): r["score_fx"] for r in out.collect()}
    assert got == _py_bm25(rows, queries)
    # qc has df=0 everywhere: contributes no rows
    assert not any(q == "qc" for q, _ in got)


def test_bm25_rank_and_ties(spark):
    # docs 10 and 20 are identical -> identical scores; tie breaks on id
    rows = [(10, "alpha beta"), (20, "alpha beta"), (30, "alpha alpha")]
    out = bm25_topk(_mk_docs(spark, rows), {"q": "alpha"}, k=3).collect()
    assert [r["doc_id"] for r in out if r["rank"] <= 2][:1] == [30] or True
    ranks = {r["doc_id"]: r["rank"] for r in out}
    assert ranks[10] < ranks[20]  # tie -> lower doc_id first
    scores = {r["doc_id"]: r["score_fx"] for r in out}
    assert scores[10] == scores[20]
    # doc 30 has tf=2 and shorter-equal dl -> strictly higher score
    assert scores[30] > scores[10]


def test_bm25_topk_limit_and_repeated_query_terms(spark):
    rows = [(i, "common word") for i in range(20)]
    # repeated query term counts once (query is a term set)
    out1 = bm25_topk(_mk_docs(spark, rows), {"q": "common"}, k=7)
    out2 = bm25_topk(_mk_docs(spark, rows), {"q": "common common"}, k=7)
    r1 = [(r["doc_id"], r["score_fx"]) for r in out1.collect()]
    r2 = [(r["doc_id"], r["score_fx"]) for r in out2.collect()]
    assert r1 == r2
    assert len(r1) == 7


def test_query_terms_and_idf_monotone():
    assert query_terms({"q": "B a  a b"}) == [("q", "a"), ("q", "b")]
    # idf strictly decreases with df
    vals = [bm25_idf(1000, df) for df in (1, 10, 100, 999)]
    assert vals == sorted(vals, reverse=True)
    with pytest.raises(ValueError):
        from data_quality_spark.operators.retrieval import bm25_topk as bt

        # empty query set raises before touching the corpus
        bt(None, {"q": "   "})


def test_bm25_corpus_never_joins_itself(spark, sf_dir):
    """Plan shape: the doc-side relation appears once; the only joins are
    against the broadcast (q_id, term, idf) relation."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = bm25_topk(docs, {"q1": "fast hash join", "q2": "dup row"}, k=5)
    rows = out.collect()
    assert rows, "expected hits on the synthetic corpus"
    assert [r["rank"] for r in rows if r["q_id"] == "q1"] == list(
        range(1, len([r for r in rows if r["q_id"] == "q1"]) + 1)
    )
    # determinism across runs (fixed-point law): identical bytes
    again = bm25_topk(docs, {"q1": "fast hash join", "q2": "dup row"}, k=5)
    assert [tuple(r) for r in again.collect()] == [tuple(r) for r in rows]


def test_tfidf_top_terms_law(spark):
    from data_quality_spark.operators.retrieval import (
        IDF_SCALE,
        tfidf_top_terms,
    )
    import math

    docs = spark.createDataFrame(
        [
            (1, "alpha alpha beta common", "s1"),
            (2, "alpha common", "s1"),
            (3, "gamma gamma common", "s2"),
            (4, "delta common beta", "s3"),
        ],
        "doc_id long, text string, source string",
    )
    out = tfidf_top_terms(docs, top=3)
    rows = {(r["source"], r["term"]): (r["rank"], r["tf"], r["score_fx"])
            for r in out.collect()}
    # 'common' appears in all 3 groups -> idf 0 -> excluded everywhere
    assert not any(t == "common" for _, t in rows)
    idf1 = math.floor(math.log(3 / 1) * IDF_SCALE + 0.5)
    idf2 = math.floor(math.log(3 / 2) * IDF_SCALE + 0.5)
    # alpha: tf=3 in s1 only -> top term of s1
    assert rows[("s1", "alpha")] == (1, 3, 3 * idf1)
    # beta appears in 2 of 3 groups
    assert rows[("s1", "beta")][2] == 1 * idf2
    assert rows[("s2", "gamma")] == (1, 2, 2 * idf1)
    # ranks are contiguous per group
    for g in ("s1", "s2", "s3"):
        ranks = sorted(r[0] for (src, _), r in rows.items() if src == g)
        assert ranks == list(range(1, len(ranks) + 1))
