"""Bloom-filter benchmark decontamination — the big-eval-set scale path.

``quality_filters.decontaminate`` broadcasts the benchmark's distinct
n-grams and semi-joins; correct and cheap while the eval suite is small.
When the held-out set itself is large (a whole eval CORPUS: 10^8-10^9
grams), the broadcast relation is tens of GB — but a Bloom filter over
the same keys is ``bits_per_key``/8 bytes each (12 bits ≈ 1.5 B/gram,
FPR ≈ (1−e^(−k·keys/m))^k ≈ 0.1% at k=6), small enough to ship to every
executor.  The classic two-stage then holds the exactness guarantee:

1. **Bloom prefilter (map-only, zero shuffle)**: every corpus gram tests
   against the broadcast bitset; misses are discarded AT THE SCAN — a
   Bloom filter has no false negatives, so nothing contaminated is lost.
2. **Exact verify (join over the sliver)**: only Bloom survivors — the
   contaminated grams plus the measured false positives — reach the
   exact gram join, whose input is now orders of magnitude smaller than
   the corpus, making ANY join strategy cheap.

The report keeps the false positives as DATA (`bloom_* - confirmed_*`):
the FPR is measured per run, never assumed from the formula.

Hash law (dialect-pinned): position_i = pmod(xxhash64(gram, long(i)), m)
— Spark's XxHash64 column fold (string bytes at seed 42, then the 8-byte
little-endian long ``i`` seeded by the previous hash); the differential
twin replays it with ``functions.xxh64``.  ``m`` is rounded up to a
multiple of 64 bits.

Build shape: positions explode from the (tiny relative to corpus) gram
side, each partition folds its positions into a local ``m/8``-byte
bitset (one ``mapInPandas`` row per partition), and the driver ORs the
partition bitsets — the same partial-aggregate shape as a treeReduce;
driver cost is #partitions × m/8 (coalesce the gram side for huge m).

Membership has two implementations, tested equal:

- ``bloom_hit_col``: pure Catalyst over a binary literal (``substr`` +
  ``bit_get``) — zero Python; right while the bitset fits in a plan
  literal (a few MB).
- ``bloom_hit_udf``: vectorized pandas UDF over a SparkContext broadcast
  — the GB-bitset path; positions are computed JVM-side (xxhash64), so
  Python only does numpy bitset gathers, never string hashing.

Reference parity: extends the reference's contamination checks (SURVEY
§2 dedup/decontamination family) with the probabilistic-prefilter
formulation; no reference analog (it never ran at a scale needing one).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .quality_filters import word_ngrams

__all__ = [
    "bloom_positions_col", "bloom_build", "bloom_hit_col",
    "bloom_hit_udf", "bloom_decontamination_report",
]


def bloom_positions_col(gram: Column, m_bits: int, k: int) -> Column:
    """array<long> of the k bit positions for one gram (JVM-side)."""
    return F.array(
        *[
            F.pmod(
                F.xxhash64(gram, F.lit(i).cast("long")), F.lit(m_bits)
            )
            for i in range(k)
        ]
    )


def bloom_build(grams: DataFrame, m_bits: int, k: int,
                gram_col: str = "gram") -> bytes:
    """Fold the key side into an ``m_bits``-bit set (little-endian bit
    order within each byte).  One partition = one local bitset row; the
    driver ORs them."""
    assert m_bits % 64 == 0, "m_bits must be a multiple of 64"
    nbytes = m_bits // 8
    pos = grams.select(
        F.explode(
            bloom_positions_col(F.col(gram_col), m_bits, k)
        ).alias("p")
    )

    def fold(batches):
        import numpy as np
        import pandas as pd

        acc = np.zeros(nbytes, dtype=np.uint8)
        for pdf in batches:
            p = pdf["p"].to_numpy(dtype=np.int64)
            np.bitwise_or.at(acc, p >> 3, (1 << (p & 7)).astype(np.uint8))
        yield pd.DataFrame({"bits": [acc.tobytes()]})

    import numpy as np

    acc = np.zeros(nbytes, dtype=np.uint8)
    for row in pos.mapInPandas(fold, "bits binary").collect():
        acc |= np.frombuffer(row["bits"], dtype=np.uint8)
    return acc.tobytes()


def bloom_hit_col(pos_array: Column, bitset: bytes) -> Column:
    """Pure-Catalyst membership test against a binary literal: every
    position's bit set.  For bitsets small enough to live in the plan."""
    lit = F.lit(bytearray(bitset))

    def bit(p: Column) -> Column:
        byte = F.conv(
            F.hex(lit.substr((F.shiftright(p, 3) + 1).cast("int"),
                             F.lit(1))),
            16, 10,
        ).cast("int")
        return F.bit_get(byte, p.bitwiseAND(F.lit(7)).cast("int")) == 1

    return F.forall(pos_array, bit)


def bloom_hit_udf(spark, bitset: bytes):
    """Vectorized membership test over a SparkContext broadcast — the
    GB-bitset path.  numpy gathers only; no Python hashing."""
    bcast = spark.sparkContext.broadcast(bitset)

    @F.pandas_udf("boolean")
    def hit(pos: pd.Series) -> pd.Series:
        import numpy as np

        bits = np.frombuffer(bcast.value, dtype=np.uint8)
        if len(pos) == 0:
            return pd.Series([], dtype=bool)
        p = np.vstack(pos.to_numpy()).astype(np.int64)  # (rows, k)
        set_ = (bits[p >> 3] >> (p & 7).astype(np.uint8)) & 1
        return pd.Series(set_.all(axis=1))

    return hit


def _round64(bits: int) -> int:
    return max(64, ((bits + 63) // 64) * 64)


def bloom_decontamination_report(
    docs: DataFrame,
    benchmark_source: str,
    n: int = 4,
    bits_per_key: int = 12,
    k: int = 6,
    use_udf_path: bool = True,
) -> DataFrame:
    """Per-source contamination tally via Bloom prefilter + exact verify,
    with the false positives reported as data.

    Output (exact ints): source, n_docs, bloom_docs, confirmed_docs,
    bloom_grams, confirmed_grams — ``confirmed_*`` equals the exact
    path's answer (no false negatives, verify is exact); ``bloom_* −
    confirmed_*`` is the measured FP cost of the prefilter."""
    spark = docs.sparkSession
    bench = docs.where(F.col("source") == benchmark_source)
    rest = docs.where(F.col("source") != benchmark_source)

    bench_grams = word_ngrams(bench, "doc_id", "text", n).select(
        "gram"
    ).distinct()
    n_keys = bench_grams.count()
    m_bits = _round64(bits_per_key * max(n_keys, 1))
    bitset = bloom_build(bench_grams, m_bits, k)

    doc_grams = word_ngrams(
        rest, "doc_id", "text", n, carry=["source"]
    ).distinct()
    pos = doc_grams.withColumn(
        "__pos", bloom_positions_col(F.col("gram"), m_bits, k)
    )
    if use_udf_path:
        hit = bloom_hit_udf(spark, bitset)(F.col("__pos"))
    else:
        hit = bloom_hit_col(F.col("__pos"), bitset)
    survivors = pos.where(hit).drop("__pos")

    # exact verify over the Bloom sliver only
    marked = survivors.join(
        F.broadcast(bench_grams.withColumn("__exact", F.lit(1))),
        "gram", "left",
    )
    per_source = marked.groupBy("source").agg(
        F.count_distinct("doc_id").cast("long").alias("bloom_docs"),
        F.count_distinct(
            F.when(F.col("__exact").isNotNull(), F.col("doc_id"))
        ).cast("long").alias("confirmed_docs"),
        F.count(F.lit(1)).cast("long").alias("bloom_grams"),
        F.sum(F.coalesce(F.col("__exact"), F.lit(0))).cast("long")
        .alias("confirmed_grams"),
    )
    base = rest.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    zero = F.lit(0).cast("long")
    return (
        base.join(per_source, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("bloom_docs", zero).alias("bloom_docs"),
            F.coalesce("confirmed_docs", zero).alias("confirmed_docs"),
            F.coalesce("bloom_grams", zero).alias("bloom_grams"),
            F.coalesce("confirmed_grams", zero).alias("confirmed_grams"),
        )
        .orderBy("source")
    )
