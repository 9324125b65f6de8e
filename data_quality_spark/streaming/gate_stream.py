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

from ..pipeline import gate, gate_v2
from ..plans.schemas import CLIPS_SCHEMA
from ..sources.io import append_metrics, write_partitioned

__all__ = ["stream_gate"]


def stream_gate(
    spark: SparkSession,
    input_path: str,
    output_root: str,
    max_files_per_trigger: int | None = None,
    await_seconds: float = 300.0,
    decode_counter=None,
    profile: str = "v1",
) -> dict:
    """Gate all clip files under ``input_path`` as a micro-batch stream.

    Returns {batches, rows_in, rows_kept} after the availableNow drain.
    ``decode_counter`` (optional accumulator) proves one featurize pass per
    micro-batch, mirroring the batch runner's execute-once law.
    ``profile="v2"`` streams the audio-metric gate — the per-row section is
    stateless either way, so the streaming legality argument is unchanged.
    """
    from pyspark.sql import Observation

    counters = {"batches": 0, "rows_in": 0, "rows_kept": 0}

    def process(batch_df: DataFrame, batch_id: int) -> None:
        # ONE action per micro-batch, same law as the batch runner
        # (runner.py:109-138): in/kept totals and the day set ride along as
        # observe() metrics on the kept-rows write — no persist crutch, no
        # second collect re-running the decode stage.  (The batch runner
        # gets per-DAY counts because it chooses the day list up front; a
        # micro-batch's day set is data, so the stream records per-BATCH
        # totals plus the observed day set in the metric detail.)
        gate_fn = gate_v2 if profile == "v2" else gate
        decided = gate_fn(batch_df, counter=decode_counter)
        obs = Observation(f"stream_{batch_id}")
        observed = decided.observe(
            obs,
            F.count(F.lit(1)).alias("rows_in"),
            F.sum((F.col("decision") == "keep").cast("long")).alias("rows_kept"),
            # O(#distinct days) — bounded by the ingest-day universe, not rows
            F.collect_set("ingest_day").alias("days"),
        )
        # Each micro-batch owns its own batch_id=N subdirectory: a batch
        # REPLAY (failure recovery) overwrites only its own directory —
        # idempotent exactly-once output — while a LATER batch that
        # happens to carry the same ingest_day can never clobber an
        # earlier batch's rows (a shared dynamic-partition-overwrite
        # sink silently loses them).  Readers see batch_id as one more
        # hive partition column under silver_stream/.
        write_partitioned(
            observed.filter(F.col("decision") == "keep"),
            os.path.join(output_root, "silver_stream", f"batch_id={batch_id}"),
            ["ingest_day"],
        )
        vals = obs.get  # available once the write action finishes
        rows_in = int(vals["rows_in"] or 0)
        rows_kept = int(vals["rows_kept"] or 0)
        days = ",".join(sorted(vals["days"] or []))
        append_metrics(
            spark,
            output_root,
            [
                (f"stream-{batch_id}", "batch", "rows_in", float(rows_in),
                 f"days={days}"),
                (f"stream-{batch_id}", "batch", "rows_kept", float(rows_kept),
                 f"days={days}"),
            ],
        )
        counters["batches"] += 1
        counters["rows_in"] += rows_in
        counters["rows_kept"] += rows_kept

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
