"""Structured-Streaming wrapper around the incremental audio probe.

The daily-ingest shape: clips arrive continuously, and each micro-batch
is probed against the STORED fingerprint index
(``audio_dedup.build_audio_index`` output) — the increment is the only
audio decoded, exactly the batch probe's law, per batch.  Near-dup
pairs land under ``probe_stream/batch_id=N`` (the gate stream's
idempotent-replay law: a retried batch overwrites only itself), so the
union of all batch directories equals the one-shot batch probe over
the union of the increments — NEW×INDEX pairs only, on both paths, so
the equality is exact, not approximate (differential-tested).

Per batch the index bucket keys are re-derived from the stored fp
arrays (fingerprints, never audio).  At a scale where that per-batch
rescan hurts, store the ``(off, bh)`` entry relation beside the index
and join it directly — the seam is the ``index_df`` argument.

Within-increment duplicates (new×new) are intentionally out of scope
on BOTH paths — they are the nightly batch closure's job; this stream
answers "is this new clip already in the corpus", which is what gates
ingest.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.audio_dedup import audio_probe_index
from ..plans.schemas import CLIPS_SCHEMA

__all__ = ["stream_probe_index"]


def stream_probe_index(
    spark: SparkSession,
    input_path: str,
    index_df: DataFrame,
    output_root: str,
    max_files_per_trigger: int | None = None,
    await_seconds: float = 300.0,
    decode_counter=None,
    **probe_kwargs,
) -> dict:
    """Probe all clip files under ``input_path`` against ``index_df``
    as a micro-batch stream; pairs write to
    ``output_root/probe_stream/batch_id=N``.  Returns {batches,
    clips_in, pairs_out} after the availableNow drain;
    ``decode_counter`` proves each increment decodes exactly once."""
    from pyspark.sql import Observation

    counters = {"batches": 0, "clips_in": 0, "pairs_out": 0}

    def process(batch_df: DataFrame, batch_id: int) -> None:
        obs_in = Observation(f"probe_in_{batch_id}")
        observed_in = batch_df.observe(
            obs_in, F.count(F.lit(1)).alias("clips_in"))
        pairs = audio_probe_index(
            observed_in, index_df, counter=decode_counter, **probe_kwargs
        )
        obs_out = Observation(f"probe_out_{batch_id}")
        observed = pairs.observe(
            obs_out, F.count(F.lit(1)).alias("pairs_out"))
        observed.write.mode("overwrite").parquet(
            os.path.join(output_root, "probe_stream",
                         f"batch_id={batch_id}")
        )
        counters["batches"] += 1
        counters["clips_in"] += int(obs_in.get["clips_in"] or 0)
        counters["pairs_out"] += int(obs_out.get["pairs_out"] or 0)

    reader = spark.readStream.schema(CLIPS_SCHEMA).option(
        "recursiveFileLookup", "true")
    if max_files_per_trigger:
        reader = reader.option(
            "maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(input_path)
    query = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation",
                os.path.join(output_root, "_probe_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    deadline = time.time() + await_seconds
    while query.isActive and time.time() < deadline:
        query.awaitTermination(2.0)
    if query.isActive:  # pragma: no cover - safety for hung streams
        query.stop()
    return counters
