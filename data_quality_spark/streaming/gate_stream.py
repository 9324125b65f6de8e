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
salted aggregate + partitioned batch writes — batch-only operations; this
is the standard escape hatch and keeps one code path for both modes.  Each
micro-batch writes into its own ``batch_id=N`` subdirectory, which makes
replays idempotent (a retried batch overwrites itself) and multi-batch runs
loss-free (dynamic partition overwrite on a SHARED directory would let a
later batch replace an earlier batch's rows for the same ingest_day).

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
        # Featurize executes ONCE per micro-batch: the gated frame (payload
        # already dropped, so rows are small) is persisted, the day-count
        # aggregate and the kept-rows write both read the cache, and the
        # cache is released before the next batch.  Without the persist the
        # collect + write would each re-run the decode stage.
        decided = gate(batch_df).persist()
        try:
            day_counts = (
                decided.groupBy("ingest_day")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum((F.col("decision") == "keep").cast("long")).alias("kept"),
                )
                .collect()
            )
            # Each micro-batch owns its own batch_id=N subdirectory: a batch
            # REPLAY (failure recovery) overwrites only its own directory —
            # idempotent exactly-once output — while a LATER batch that
            # happens to carry the same ingest_day can never clobber an
            # earlier batch's rows (a shared dynamic-partition-overwrite
            # sink silently loses them).  Readers see batch_id as one more
            # hive partition column under silver_stream/.
            write_partitioned(
                decided.filter(F.col("decision") == "keep"),
                os.path.join(output_root, "silver_stream", f"batch_id={batch_id}"),
                ["ingest_day"],
            )
        finally:
            decided.unpersist()
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
