"""Dedup-at-scale smoke: MinHash-LSH + winnowing over a 1M-document corpus.

Expands the sf0.1 documents table (5k docs) 200× with per-replica token
suffixes (`tok_i`) so replicas share NO tokens — the corpus is ~1M mostly
distinct documents with only the source table's natural near-dups repeated
per replica slice.  This measures the two scale-critical dedup paths end to
end (signature computation dominates both) at 3 orders of magnitude above
the correctness scale.

Usage: python scripts/dedup_scale_smoke.py [replicas]
Prints one JSON line {n_docs, minhash_seconds, minhash_docs_per_sec,
winnow_seconds, winnow_docs_per_sec, lsh_pairs}.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    from pyspark.sql import functions as F

    from data_quality_spark.operators.dedup import (
        minhash_lsh_pairs,
        winnow_fingerprints,
    )
    from data_quality_spark.session import get_spark

    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    spark = get_spark("dedup-scale-smoke")
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    docs = (
        base.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))).alias("__r"),
            "text",
        )
        .select(
            (F.col("doc_id") * replicas + F.col("__r")).alias("doc_id"),
            # suffix every token with the replica index: replicas share no
            # tokens, so the corpus is ~n_docs distinct documents
            F.concat_ws(
                " ",
                F.transform(
                    F.split(F.coalesce(F.col("text"), F.lit("")), " "),
                    lambda t: F.concat(t, F.lit("_"), F.col("__r")),
                ),
            ).alias("text"),
        )
        .repartition(128)
        .persist()
    )
    n = docs.count()

    t0 = time.perf_counter()
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", verify_threshold=0.5).count()
    mh = time.perf_counter() - t0

    t1 = time.perf_counter()
    winnow_fingerprints(docs, "doc_id", "text").count()
    wn = time.perf_counter() - t1
    docs.unpersist()
    spark.stop()

    print(
        json.dumps(
            {
                "n_docs": n,
                "minhash_seconds": round(mh, 2),
                "minhash_docs_per_sec": round(n / mh, 1),
                "winnow_seconds": round(wn, 2),
                "winnow_docs_per_sec": round(n / wn, 1),
                "lsh_pairs": pairs,
            }
        )
    )


if __name__ == "__main__":
    main()
