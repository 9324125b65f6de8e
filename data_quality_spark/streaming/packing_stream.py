"""Streaming sequence packing: the training layout built as data arrives.

A continuously-ingesting corpus wants the concat-and-chunk token grid
(``shards.pack_sequences``) maintained incrementally — a nightly full
repack rereads the whole corpus AND rewrites every sequence id, while
the append law never touches yesterday's layout: each micro-batch packs
its documents starting at the PER-STRATUM token offset where the
previous batch ended, so a batch boundary falling mid-sequence resumes
the same ``seq_id`` and the union of all batch directories is one
contiguous, gap-free token grid.

Ordering law (documented difference from the batch operator): the
global order is ARRIVAL-major — batches in ingestion order, hash order
within a batch.  That is exactly what an append-only layout means; the
batch operator's corpus-wide hash order requires knowing the corpus.

Idempotent-replay law (the gate/identity stream convention): each
micro-batch writes its own ``batch_id=N`` directory for BOTH the
segment rows and the offsets snapshot; a replayed batch re-reads batch
N-1's offsets and overwrites only its own outputs, so a crash between
the data write and the checkpoint commit cannot double-pack or skew
the running offsets.

Scale: per batch, the work is the batch operator's (tiny offsets
broadcast + per-bucket windows over the INCREMENT); stored state is
one row per stratum.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.docs import token_count_col
from ..operators.shards import _SEP, pack_sequences

__all__ = ["stream_pack_sequences", "read_stream_segments"]


def _offsets_path(root: str, batch_id: int) -> str:
    return os.path.join(root, "offsets", f"batch_id={batch_id}")


def _read_offsets(spark: SparkSession, root: str,
                  upto_batch: int) -> dict[str, int]:
    """Offsets after the newest batch <= upto_batch (empty at start).
    Walking back handles replay: batch N always reads N-1's snapshot,
    never its own partial state.

    Existence is probed via ``spark.read`` (AnalysisException = not
    written yet), NOT driver-local ``os.path.exists`` — the segments
    and offsets go through Spark writers that accept any Hadoop FS URI,
    and a local-only probe against e.g. an ``hdfs://`` output_root
    would never see the snapshot, silently restarting every batch at
    offset 0 and corrupting the gap-free token grid."""
    from pyspark.errors import AnalysisException

    for b in range(upto_batch, -1, -1):
        p = _offsets_path(root, b)
        try:
            rows = spark.read.parquet(p).collect()
        except AnalysisException:
            continue
        return {r["stratum"]: int(r["total_tokens"]) for r in rows}
    return {}


def stream_pack_sequences(
    spark: SparkSession,
    input_path: str,
    output_root: str,
    seq_len: int,
    strata: tuple[str, ...] = ("lang",),
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 0,
    max_files_per_trigger: int | None = None,
    await_seconds: float = 300.0,
) -> dict:
    """Pack all documents under ``input_path`` into ``seq_len`` training
    sequences as a micro-batch stream; returns {batches, docs_in,
    tokens_in} after the availableNow drain.

    Outputs under ``output_root``: ``segments/batch_id=N`` (the
    per-batch slice of the token grid) and ``offsets/batch_id=N`` (the
    per-stratum running totals the NEXT batch continues from)."""
    counters = {"batches": 0, "docs_in": 0, "tokens_in": 0}

    def process(batch_df: DataFrame, batch_id: int) -> None:
        prev = _read_offsets(spark, output_root, int(batch_id) - 1)
        with_tok = batch_df.withColumn(
            "__ntok", token_count_col(F.col(text_col)))
        seg = pack_sequences(
            with_tok, "__ntok", seq_len, strata=list(strata),
            id_col=id_col, seed=seed, portable=True,
            start_offsets=prev,
        )
        seg.select(*strata, "seq_id", "pos_in_seq", id_col,
                   "doc_offset", "seg_len", "n_doc_tokens").write.mode(
            "overwrite"
        ).parquet(os.path.join(output_root, "segments",
                               f"batch_id={batch_id}"))
        key = F.concat_ws(
            _SEP, *[F.coalesce(F.col(s).cast("string"), F.lit(""))
                    for s in strata])
        totals = {
            r["stratum"]: int(r["tok"])
            for r in with_tok.groupBy(key.alias("stratum")).agg(
                F.sum(F.greatest(F.col("__ntok").cast("long"),
                                 F.lit(0))).alias("tok")
            ).collect()
        }
        merged = dict(prev)
        for k, v in totals.items():
            merged[k] = merged.get(k, 0) + v
        spark.createDataFrame(
            sorted(merged.items()), "stratum string, total_tokens long"
        ).coalesce(1).write.mode("overwrite").parquet(
            _offsets_path(output_root, int(batch_id)))
        counters["batches"] += 1
        counters["docs_in"] += batch_df.count()
        counters["tokens_in"] += sum(totals.values())

    reader = spark.readStream.schema(
        spark.read.parquet(input_path).schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    stream = reader.parquet(input_path)
    query = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation",
                os.path.join(output_root, "_pack_stream_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    deadline = time.time() + await_seconds
    while query.isActive and time.time() < deadline:
        query.awaitTermination(2.0)
    if query.isActive:  # pragma: no cover - safety for hung streams
        query.stop()
    return counters


def read_stream_segments(spark: SparkSession, output_root: str) -> DataFrame:
    """The union token grid across all batch directories (partition
    discovery supplies ``batch_id``)."""
    return spark.read.parquet(os.path.join(output_root, "segments"))
