"""Structured-Streaming wrapper around identity-feature extraction.

A continuously-ingesting audio corpus wants the expensive identity
decode (fingerprints + channel + voice profiles, the split's input) to
run AS clips arrive, not in a nightly batch: ``readStream`` over the
ingest directory → the identical ``audio_identity.identity_features``
transformation → ``foreachBatch`` sink reusing the batch writers, with
each micro-batch writing its own ``batch_id=N`` subdirectory (the
gate stream's idempotent-replay law: a retried batch overwrites only
itself, a later batch can never clobber an earlier day's rows).

The downstream split then runs ``split_from_features`` over the union
of all batch directories at ZERO decode cost — streaming feature
extraction + batch relational split, the same division of labor as the
checkpointed runner, with Spark's checkpointLocation tracking file
progress instead of the LineageLedger's day grain.

``foreachBatch`` because the feature relation ends in partitioned batch
writes; the per-row section is a stateless map, so streaming legality
is trivial.  Trigger ``availableNow`` drains the backlog then stops.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.audio_identity import identity_features
from ..plans.schemas import CLIPS_SCHEMA
from ..sources.io import METRICS_SCHEMA, write_partitioned

__all__ = ["stream_identity_features"]


def stream_identity_features(
    spark: SparkSession,
    input_path: str,
    output_root: str,
    max_files_per_trigger: int | None = None,
    await_seconds: float = 300.0,
    decode_counter=None,
) -> dict:
    """Extract identity features for all clip files under ``input_path``
    as a micro-batch stream.  Returns {batches, clips_in, ch_ok, vo_ok}
    after the availableNow drain; ``decode_counter`` proves one decode
    pass per micro-batch (the execute-once law)."""
    from pyspark.sql import Observation

    counters = {"batches": 0, "clips_in": 0, "ch_ok": 0, "vo_ok": 0}

    def process(batch_df: DataFrame, batch_id: int) -> None:
        feats = identity_features(
            batch_df, counter=decode_counter, carry_cols=("ingest_day",)
        )
        obs = Observation(f"ident_stream_{batch_id}")
        observed = feats.observe(
            obs,
            F.count(F.lit(1)).alias("clips_in"),
            F.sum(F.col("ch_ok").cast("long")).alias("ch_ok"),
            F.sum(F.col("vo_ok").cast("long")).alias("vo_ok"),
            F.collect_set("ingest_day").alias("days"),
        )
        write_partitioned(
            observed,
            os.path.join(output_root, "identity_stream",
                         f"batch_id={batch_id}"),
            ["ingest_day"],
        )
        vals = obs.get
        n = int(vals["clips_in"] or 0)
        ch = int(vals["ch_ok"] or 0)
        vo = int(vals["vo_ok"] or 0)
        days = ",".join(sorted(d for d in (vals["days"] or []) if d))
        # metrics follow the SAME idempotent-replay law as the feature
        # rows: each batch OVERWRITES its own batch_id=N metrics dir, so
        # a batch replayed after a crash-before-checkpoint-commit cannot
        # double-count (plain append_metrics would duplicate the rows)
        mrows = [
            (f"stream-{batch_id}", "batch", "clips_in", float(n),
             f"days={days}"),
            (f"stream-{batch_id}", "batch", "channel_evidence",
             float(ch), f"days={days}"),
            (f"stream-{batch_id}", "batch", "voice_evidence",
             float(vo), f"days={days}"),
        ]
        spark.createDataFrame(mrows, METRICS_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(
            os.path.join(output_root, "metrics", f"batch_id={batch_id}")
        )
        counters["batches"] += 1
        counters["clips_in"] += n
        counters["ch_ok"] += ch
        counters["vo_ok"] += vo

    # NO recursiveFileLookup: it disables partition discovery, and the
    # bronze layout keeps ingest_day ONLY in the directory names — with
    # the option on, every row read ingest_day=NULL (found by review;
    # the carried column was silently hive-default-partitioned)
    reader = spark.readStream.schema(CLIPS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option(
            "maxFilesPerTrigger", str(max_files_per_trigger)
        )
    stream = reader.parquet(input_path)

    query = (
        stream.writeStream.foreachBatch(process)
        .option(
            "checkpointLocation",
            os.path.join(output_root, "_ident_stream_ckpt"),
        )
        .trigger(availableNow=True)
        .start()
    )
    deadline = time.time() + await_seconds
    while query.isActive and time.time() < deadline:
        query.awaitTermination(2.0)
    if query.isActive:  # pragma: no cover - safety for hung streams
        query.stop()
    return counters
