"""Structured-Streaming wrapper around the clips gate.

The reference is batch-only (SURVEY.md §2.9); the north-rule engine stays
batch for parity, but a continuously-ingesting corpus wants the same gate as
a stream.  This wrapper is the thin adapter: ``readStream`` over the
ingest directory → the identical ``pipeline.gate`` transformation →
``foreachBatch`` sink that reuses the batch writers (partitioned silver
output + per-batch metrics), with Spark's own checkpointLocation providing
exactly-once file-source progress tracking (complementing the
partition-level LineageLedger used by the batch runner).

``foreachBatch`` (not a direct streaming sink) because the gate ends in a
salted aggregate + dynamic-partition overwrite — batch-only operations; this
is the standard escape hatch and keeps one code path for both modes.

Trigger ``availableNow`` drains the backlog then stops — the offline analog
of a long-running micro-batch stream, and what the tests use.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline import gate
from ..plans.schemas import CLIPS_SCHEMA
from ..sources.io import append_metrics, write_partitioned

__all__ = ["stream_gate"]


def stream_gate(
    spark: SparkSession,
    input_path: str,
    output_root: str,
    max_files_per_trigger: int | None = None,
    await_seconds: float = 300.0,
) -> dict:
    """Gate all clip files under ``input_path`` as a micro-batch stream.

    Returns {batches, rows_in, rows_kept} after the availableNow drain.
    """
    counters = {"batches": 0, "rows_in": 0, "rows_kept": 0}

    def process(batch_df: DataFrame, batch_id: int) -> None:
        decided = gate(batch_df)
        day_counts = (
            decided.groupBy("ingest_day")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum((F.col("decision") == "keep").cast("long")).alias("kept"),
            )
            .collect()
        )
        write_partitioned(
            decided.filter(F.col("decision") == "keep").drop("bytes"),
            os.path.join(output_root, "silver_stream"),
            ["ingest_day"],
        )
        rows = [
            (
                f"stream-{batch_id}",
                f"ingest_day={r['ingest_day']}",
                "rows_in",
                float(r["n"]),
                "",
            )
            for r in day_counts
        ]
        if rows:
            append_metrics(spark, output_root, rows)
        counters["batches"] += 1
        counters["rows_in"] += sum(r["n"] for r in day_counts)
        counters["rows_kept"] += sum(r["kept"] for r in day_counts)

    reader = (
        spark.readStream.schema(CLIPS_SCHEMA)
        .option("recursiveFileLookup", "true")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(input_path)

    query = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", os.path.join(output_root, "_stream_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    deadline = time.time() + await_seconds
    while query.isActive and time.time() < deadline:
        query.awaitTermination(2.0)
    if query.isActive:  # pragma: no cover - safety for hung streams
        query.stop()
    return counters
