"""Compression-ratio quality signal (deflate ratio per document).

The classic web-scale text filter the token/stopword/entropy families
can't replace: DEFLATE's ratio collapses the two failure modes that
look superficially different — machine-generated repetition (SEO spam,
template boilerplate, keyword stuffing) compresses FAR better than
prose, while encrypted/base64/binary-pasted garbage compresses WORSE —
into one number with decades of calibration behind it (used by
RefinedWeb and Dolma as a first-pass quality gate; public pattern).

Law — exact integers end to end:

- ``n_bytes``  = len(utf-8(text))
- ``z_bytes``  = len(zlib.compress(utf-8(text), level=6))  (>= 8 even
  for the empty string, so the ratio is always defined)
- ``ratio_q``  = (n_bytes << 20) // z_bytes   — the deflate ratio in
  2^-20 fixed point, an exact integer (the BM25 quantization pattern)
- ``is_repetitive`` := ratio_q >= 3.5 << 20   (prose sits ~1.9-2.5 on
  this corpus; >= 3.5 needs pathological self-similarity)
- ``is_random``     := n_bytes >= 200 and ratio_q <= 1.15 << 20
  (uniform-ish bytes barely compress; short docs are excluded — the
  deflate header dominates them)

Determinism: for a fixed zlib build + level the compressed LENGTH is a
pure function of the input bytes, and the differential twin calls the
SAME zlib from the same interpreter, so Spark and oracle agree exactly.
(Compressed length is not guaranteed stable across zlib VERSIONS; the
expected-file meta key ties artifacts to the environment that wrote
them, so a zlib upgrade surfaces as a visible regeneration, not a
silent flake.)

Execution shape: ONE ``mapInArrow`` pass over (id, text) — zlib is
C-speed, no shuffle, scales with input splits.  At 100 TB this is the
cheapest of the content filters (deflate level 6 runs ~100 MB/s/core;
one pass, no intermediate state).

Reference analog: none (row-level content quality is beyond the
reference); the shape is the per-row rule scan (checks.py) applied to
kernel-computed metrics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "compression_stats",
    "compression_flags",
    "compression_issues",
    "Z_LEVEL",
    "REPETITIVE_Q",
    "RANDOM_Q",
    "RANDOM_MIN_BYTES",
]

Z_LEVEL = 6
REPETITIVE_Q = (7 << 20) // 2          # ratio >= 3.5 in 2^-20 units
RANDOM_Q = (23 << 20) // 20            # ratio <= 1.15
RANDOM_MIN_BYTES = 200


def compression_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_bytes, z_bytes, ratio_q) via one Arrow pass; NULL text
    behaves as the empty string (n_bytes = 0)."""
    proj = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    out_schema = T.StructType(
        [
            T.StructField("doc_id", proj.schema["doc_id"].dataType, True),
            T.StructField("n_bytes", T.LongType(), False),
            T.StructField("z_bytes", T.LongType(), False),
            T.StructField("ratio_q", T.LongType(), False),
        ]
    )

    def run(batches):
        import zlib

        import pyarrow as pa

        for batch in batches:
            ids = batch.column(0)
            texts = batch.column(1).to_pylist()
            n_bytes, z_bytes, ratio_q = [], [], []
            for t in texts:
                b = (t or "").encode("utf-8")
                z = len(zlib.compress(b, Z_LEVEL))
                n_bytes.append(len(b))
                z_bytes.append(z)
                ratio_q.append((len(b) << 20) // z)
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array(n_bytes, type=pa.int64()),
                    pa.array(z_bytes, type=pa.int64()),
                    pa.array(ratio_q, type=pa.int64()),
                ],
                names=["doc_id", "n_bytes", "z_bytes", "ratio_q"],
            )

    return proj.mapInArrow(run, out_schema)


def compression_flags(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``compression_stats`` + the two decision columns (integer laws in
    Catalyst over the exact statistics)."""
    return compression_stats(docs, id_col, text_col).withColumns(
        {
            "is_repetitive": F.col("ratio_q") >= F.lit(REPETITIVE_Q),
            "is_random": (F.col("n_bytes") >= F.lit(RANDOM_MIN_BYTES))
            & (F.col("ratio_q") <= F.lit(RANDOM_Q)),
        }
    )


def compression_issues(flags: DataFrame, table: str = "documents") -> DataFrame:
    """Issue relation over the flags (reference issue schema, ONE fused
    aggregate — the audit_issues law)."""
    wide = flags.agg(
        F.count(F.lit(1)).alias("__total__"),
        F.count(F.when(F.col("is_repetitive"), 1)).alias("n:compress_repetitive"),
        F.count(F.when(F.col("is_random"), 1)).alias("n:compress_random"),
    )
    rules = [
        ("compress_repetitive", "warning", "text",
         "deflate ratio >= 3.5: template/repetition spam"),
        ("compress_random", "warning", "text",
         "deflate ratio <= 1.15 at >= 200 bytes: high-entropy garbage"),
    ]
    structs = []
    for name, sev, column, desc in rules:
        cnt = F.col(f"n:{name}")
        total = F.col("__total__")
        structs.append(F.struct(
            F.lit(table).alias("table"),
            F.lit(column).alias("column"),
            F.lit(name).alias("issue_type"),
            cnt.alias("count"),
            total.alias("total"),
            F.when(total > 0, cnt * 100.0 / total).otherwise(F.lit(0.0))
            .cast("double").alias("percent"),
            F.when(cnt > 0, F.lit(sev)).otherwise(F.lit("info"))
            .alias("severity"),
            F.lit(desc).alias("description"),
        ))
    return wide.select(F.explode(F.array(*structs)).alias("i")).select("i.*")
