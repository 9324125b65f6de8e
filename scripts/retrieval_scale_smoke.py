"""Retrieval-at-scale smoke: BM25 top-k + tf-idf signatures over ~1M docs.

Expands the sf0.1 documents table (5k docs) N× with fresh doc_ids and
UNCHANGED text — the BM25 stress case: the probe queries' common terms hit
most of the corpus, so the matched sliver (the only data that moves) is
maximal.  Replication also gives a free correctness invariant at scale:
every replica of a document must land on the IDENTICAL integer score, so
with k = 2·replicas the top-k must be exactly the best 2 original documents
× replicas ties each.

Usage: python scripts/retrieval_scale_smoke.py [replicas]
Prints one JSON line {n_docs, matched_rows, bm25_seconds, bm25_docs_per_sec,
tie_check, distinct_scores_top, tfidf_seconds, tfidf_rows}.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

QUERIES = {
    "q1": "fast hash join",
    "q2": "slow table scan",
    "q3": "dup row",
}


def main() -> None:
    from pyspark.sql import functions as F

    from data_quality_spark.operators.retrieval import (
        bm25_topk,
        query_terms,
        tfidf_top_terms,
    )
    from data_quality_spark.session import get_spark

    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    spark = get_spark("retrieval-scale-smoke")
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    docs = (
        base.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))).alias("__r"),
            "text",
            "source",
        )
        .select(
            (F.col("doc_id") * replicas + F.col("__r")).alias("doc_id"),
            "text",
            "source",
        )
        .repartition(128)
        .persist()
    )
    n = docs.count()

    # matched-sliver accounting: how many (doc, query-term) postings move
    terms = sorted({t for _, t in query_terms(QUERIES)})
    toks = F.split(F.trim(F.lower(F.coalesce(F.col("text"), F.lit("")))), r"\s+")
    matched_rows = docs.select(
        F.explode(
            F.array_intersect(toks, F.array(*[F.lit(t) for t in terms]))
        ).alias("term")
    ).count()

    k = 2 * replicas
    t0 = time.perf_counter()
    out = bm25_topk(docs, QUERIES, k=k)
    rows = out.collect()
    bm25_s = time.perf_counter() - t0

    # tie invariant: per query the top 2·replicas rows must be exactly two
    # score values, each appearing `replicas` times (replica blocks)
    tie_ok = True
    distinct_scores = {}
    for q in QUERIES:
        scores = [r["score_fx"] for r in rows if r["q_id"] == q]
        uniq = sorted(set(scores), reverse=True)
        distinct_scores[q] = len(uniq)
        counts = [scores.count(u) for u in uniq]
        if len(scores) == k:
            tie_ok = tie_ok and len(uniq) == 2 and counts == [replicas, replicas]

    t0 = time.perf_counter()
    tfidf_rows = tfidf_top_terms(docs, group_col="source", top=5).count()
    tfidf_s = time.perf_counter() - t0

    docs.unpersist()
    print(json.dumps({
        "n_docs": n,
        "matched_rows": matched_rows,
        "bm25_seconds": round(bm25_s, 2),
        "bm25_docs_per_sec": round(n / bm25_s),
        "tie_check": tie_ok,
        "distinct_scores_top": distinct_scores,
        "tfidf_seconds": round(tfidf_s, 2),
        "tfidf_rows": tfidf_rows,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
