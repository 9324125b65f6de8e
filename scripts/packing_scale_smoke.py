"""Training-layout-at-scale smoke: sequence packing + batch planning
over a 10M-row synthetic corpus.

No text needed — the layout laws consume only (id, stratum, size), so
the corpus is `spark.range(N)` with hash-derived token counts (10-500,
heavy-tailed) and 16 strata.  This exercises the decomposed prefix sum
(the scale-critical piece: per-bucket totals + driver offsets +
per-bucket windows) 4 orders of magnitude above the correctness scale
and verifies the conservation invariants the oracle checks at sf0.01:

- packing: Σ seg_len == Σ tokens, every sequence but a stratum's last
  fills to exactly L (checked from the manifest relation);
- batching: Σ n_items == N, pad_waste == padded_len − sum_len, and the
  length-sorted waste fraction stays far under the hash-order layout's.

Usage: python scripts/packing_scale_smoke.py [n_rows]
Prints one JSON line {n_rows, pack_seconds, pack_rows_per_sec,
n_sequences, short_sequences, tokens_conserved, batch_seconds,
batch_rows_per_sec, waste_frac}.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

SEQ_LEN = 2048
BATCH = 64


def main() -> None:
    from pyspark.sql import functions as F

    from data_quality_spark.operators.shards import (
        batch_by_length,
        batch_manifest,
        pack_sequences,
        sequence_manifest,
    )
    from data_quality_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = get_spark("packing-smoke", master="local[32]",
                      extra_confs={"spark.ui.showConsoleProgress": "false"})
    # heavy-tailed sizes: mostly short docs, a hash-selected 2% long tail
    h = F.abs(F.xxhash64("id", F.lit(1)))
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (h % 16).cast("string")).alias("lang"),
        F.when(h % 50 == 0, 200 + (h % 4096))
        .otherwise(10 + (h % 120)).cast("long").alias("ntok"),
    ).persist()
    total_tokens = docs.agg(F.sum("ntok")).collect()[0][0]

    t0 = time.perf_counter()
    man = sequence_manifest(
        pack_sequences(docs, "ntok", SEQ_LEN, strata=["lang"],
                       id_col="doc_id", seed=5, bucket_chars=3),
        strata=["lang"],
    ).persist()
    agg = man.agg(
        F.count(F.lit(1)).alias("n_seq"),
        F.sum("n_tokens").alias("tok"),
        F.sum((F.col("n_tokens") < SEQ_LEN).cast("long")).alias("short"),
    ).collect()[0]
    pack_dt = time.perf_counter() - t0
    # every short sequence must be a stratum's last (16 strata -> <= 16)
    assert agg["tok"] == total_tokens, (agg["tok"], total_tokens)
    assert agg["short"] <= 16, agg["short"]

    t0 = time.perf_counter()
    bman = batch_manifest(
        batch_by_length(docs, "ntok", BATCH, id_col="doc_id",
                        bucket_width=64),
        "ntok", id_col="doc_id",
    ).persist()
    bagg = bman.agg(
        F.sum("n_items").alias("n"),
        F.sum("pad_waste").alias("waste"),
        F.sum("padded_len").alias("padded"),
        F.sum((F.col("pad_waste")
               != F.col("padded_len") - F.col("sum_len")).cast("long"))
        .alias("bad"),
    ).collect()[0]
    batch_dt = time.perf_counter() - t0
    assert bagg["n"] == n and bagg["bad"] == 0

    print(json.dumps({
        "n_rows": n,
        "pack_seconds": round(pack_dt, 2),
        "pack_rows_per_sec": int(n / pack_dt),
        "n_sequences": int(agg["n_seq"]),
        "short_sequences": int(agg["short"]),
        "tokens_conserved": True,
        "batch_seconds": round(batch_dt, 2),
        "batch_rows_per_sec": int(n / batch_dt),
        "waste_frac": round(float(bagg["waste"]) / float(bagg["padded"]), 4),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
