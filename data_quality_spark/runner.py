"""End-to-end gate job: partition-incremental, resumable, metric-emitting.

``run_gate_pipeline`` is what ``spark-submit --py-files dq.zip`` launches on a
cluster (see bench.py for the sandbox harness).  Execution contract per the
north rule:

- work is scheduled per input partition (``ingest_day``) — parquet partition
  pruning limits each job to the pending days, so a killed run resumes
  without recomputing finished partitions (lineage ledger, ``sources/io.py``);
- kept rows land partitioned by (ingest_day, lang_pred) — downstream training
  jobs prune by language;
- per-partition metrics (clips in/kept, throughput) append to the metrics
  table, mirroring the reference's benchmark persistence
  (``/root/reference/src/data_quality/benchmark_storage.py:75-170``).
"""

from __future__ import annotations

import os
import time
import uuid

import pandas as pd

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from .pipeline import gate_files
from .plans.schemas import CLIPS_SCHEMA
from .sources.io import LineageLedger, append_metrics, write_partitioned

__all__ = [
    "write_clips", "run_gate_pipeline", "run_segment_pipeline",
    "run_feature_pipeline", "list_ingest_days",
]

# Silver rows reference bronze by clip_id instead of duplicating the audio
# payload: at 10^12-clip scale re-storing `bytes` would double the corpus
# footprint and force the payload through every downstream shuffle/write.
OUTPUT_COLS = [
    "clip_id", "sr_hz", "dur_ms", "codec", "scrubbed",
    "rms_db", "peak_db", "silence_frac", "clip_frac", "lang_pred",
    "lang_conf", "ppl", "token_count", "len_ratio", "decision",
    "decision_reason", "ingest_day",
]

# the v2 profile carries its extended audio metrics into silver — they are
# cheap scalars a training pipeline filters/stratifies on downstream
OUTPUT_COLS_V2 = OUTPUT_COLS + [
    "speech_ratio", "speech_ms", "snr_db", "lufs_i",
    "n_dropouts", "max_const_run", "dc_sum", "bw_rms", "hf_db",
]


def write_clips(spark: SparkSession, pdf: pd.DataFrame, path: str) -> None:
    """Write a synthetic pandas clips frame as ingest_day-partitioned parquet
    (the Iceberg-shaped bronze table)."""
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    df = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA)
    df.write.mode("overwrite").partitionBy("ingest_day").parquet(path)


def list_ingest_days(spark: SparkSession, input_path: str) -> list[str]:
    """Partition values from the directory layout — an Iceberg catalog would
    serve these from metadata; for parquet the listing is equally metadata-only."""
    days = [
        d.split("=", 1)[1]
        for d in os.listdir(input_path)
        if d.startswith("ingest_day=")
    ]
    return sorted(days)


def run_gate_pipeline(
    spark: SparkSession,
    input_path: str,
    output_root: str,
    resume: bool = True,
    days_per_batch: int = 0,
    fail_after_batches: int | None = None,
    decode_counter=None,
    three_way: bool = False,
    profile: str = "v1",
) -> dict:
    """Gate all pending ingest_day partitions.

    ``days_per_batch=0`` processes all pending days in one Spark job (fastest
    wall-clock); >0 chunks them so the lineage ledger advances incrementally
    (finer-grained resume).  ``fail_after_batches`` simulates a mid-run kill
    for the resume test.  ``decode_counter`` (optional Spark accumulator)
    counts decoded clips — the execute-once test passes it to prove the
    featurize stage runs exactly one pass per batch.

    ``three_way=True`` surfaces the reference's decision enum
    (checkpoints.py:216-252) as output partitions: accept AND graylist rows
    land under ``output_root/gated/decision=…/ingest_day=…/lang_pred=…`` in
    the SAME single write action (decision is just one more partition
    column, so the one-pass law holds), with per-day graylist counts in the
    metrics.  Default binary mode writes accepted rows to ``silver/``
    exactly as before.
    """
    run_id = uuid.uuid4().hex[:12]
    ledger = LineageLedger(output_root, "gate")
    all_days = list_ingest_days(spark, input_path)
    days = ledger.pending(all_days) if resume else all_days
    batches = (
        [days]
        if days_per_batch <= 0
        else [days[i : i + days_per_batch] for i in range(0, len(days), days_per_batch)]
    )
    totals = {"rows_in": 0, "rows_kept": 0, "days": 0, "skipped": len(all_days) - len(days)}
    t_start = time.perf_counter()
    for bi, batch in enumerate(b for b in batches if b):
        if fail_after_batches is not None and bi >= fail_after_batches:
            return {**totals, "run_id": run_id, "completed": False}
        for d in batch:
            ledger.mark(d, "running", run_id=run_id)
        t0 = time.perf_counter()
        # storage-direct gate: payload bytes go storage → python worker and
        # never cross the JVM; the partition_filter prunes whole day
        # directories before any IO (manifest-level partition pruning)
        day_set = set(batch)  # NOT `days`: the partition_filter lambda
        # must never close over the function-level pending list's name
        from .pipeline import decide3, decide3_v2

        three_decider = decide3_v2 if profile == "v2" else decide3
        decided = gate_files(
            spark,
            input_path,
            partition_filter=lambda pv: pv.get("ingest_day") in day_set,
            counter=decode_counter,
            decider=three_decider if three_way else None,
            profile=profile,
        ).select(*(OUTPUT_COLS_V2 if profile == "v2" else OUTPUT_COLS))
        # ONE action per batch: the kept-rows write.  Per-day in/kept counts
        # ride along as observe() metrics on the pre-filter frame (the batch's
        # day list is known, so per-day totals are plain conditional sums) —
        # a separate collect() here would re-execute the featurize stage,
        # doubling the most expensive work of the whole system.
        day_list = sorted(day_set)
        keep_value = "accept" if three_way else "keep"
        obs = Observation(f"gate_{run_id}_b{bi}")
        metrics = []
        for di, d in enumerate(day_list):
            is_day = F.col("ingest_day") == d
            metrics.append(F.sum(is_day.cast("long")).alias(f"n_{di}"))
            metrics.append(
                F.sum(
                    (is_day & (F.col("decision") == keep_value)).cast("long")
                ).alias(f"k_{di}")
            )
            if three_way:
                metrics.append(
                    F.sum(
                        (is_day & (F.col("decision") == "graylist")).cast("long")
                    ).alias(f"g_{di}")
                )
        observed = decided.observe(obs, *metrics)
        # repartition on the partition keys first: without it every task
        # writes a file into every (day, lang) directory — task_count × dirs
        # small files; with it, one file per output partition.  Cheap here:
        # the payload column is already gone.
        if three_way:
            kept = observed.filter(
                F.col("decision").isin("accept", "graylist")
            ).repartition("decision", "ingest_day", "lang_pred")
            write_partitioned(
                kept,
                os.path.join(output_root, "gated"),
                ["decision", "ingest_day", "lang_pred"],
            )
        else:
            kept = observed.filter(F.col("decision") == "keep").repartition(
                "ingest_day", "lang_pred"
            )
            write_partitioned(
                kept,
                os.path.join(output_root, "silver"),
                ["ingest_day", "lang_pred"],
            )
        vals = obs.get  # available once the write action finishes
        dt = time.perf_counter() - t0
        metric_rows = []
        for di, d in enumerate(day_list):
            n = int(vals[f"n_{di}"] or 0)
            kept_n = int(vals[f"k_{di}"] or 0)
            ledger.mark(d, "done", rows_in=n, rows_kept=kept_n, run_id=run_id)
            totals["rows_in"] += n
            totals["rows_kept"] += kept_n
            totals["days"] += 1
            metric_rows.append(
                (run_id, f"ingest_day={d}", "rows_in", float(n), "")
            )
            metric_rows.append(
                (run_id, f"ingest_day={d}", "rows_kept", float(kept_n), "")
            )
            if three_way:
                gl = int(vals[f"g_{di}"] or 0)
                totals["rows_graylist"] = totals.get("rows_graylist", 0) + gl
                metric_rows.append(
                    (run_id, f"ingest_day={d}", "rows_graylist", float(gl), "")
                )
        batch_rows = sum(
            int(vals[f"n_{di}"] or 0) for di in range(len(day_list))
        )
        metric_rows.append(
            (run_id, "batch", "clips_per_sec", batch_rows / dt if dt > 0 else 0.0,
             f"batch={bi} days={len(batch)}")
        )
        append_metrics(spark, output_root, metric_rows)
    totals["run_id"] = run_id
    totals["completed"] = True
    totals["wall_s"] = time.perf_counter() - t_start
    totals["clips_per_sec"] = (
        totals["rows_in"] / totals["wall_s"] if totals["wall_s"] > 0 else 0.0
    )
    return totals


def run_segment_pipeline(
    spark: SparkSession,
    input_path: str,
    output_root: str,
    min_dur_ms: int = 200,
    resume: bool = True,
    days_per_batch: int = 0,
    fail_after_batches: int | None = None,
    decode_counter=None,
) -> dict:
    """Training-manifest writer: VAD-chunk every pending ``ingest_day`` into
    per-segment pcm16 clips (``operators.audio_vad.extract_segments``) and
    write them partitioned by ``ingest_day`` under ``output_root/segments``,
    with the same lineage/resume law as the gate runner — a killed run
    resumes on the pending days only, finished days are never re-chunked.

    Execution shape per batch: partition-pruned parquet scan (the
    ``ingest_day IN (…)`` predicate reaches the scan as a PartitionFilter)
    → ONE variable-fan-out ``mapInArrow`` (decode once, slice segments,
    ``ingest_day`` carried so no join back to the source) → ONE write
    action.  No repartition before the write: each scan task reads rows of
    exactly one day directory, so tasks already write into a single output
    partition — repartitioning here would shuffle the segment payloads for
    nothing.  Per-day clip/segment/audio-second counts ride along as
    ``observe()`` metrics on the input and output frames of the same
    action (the runner's one-action law: a separate count would re-decode
    the corpus).

    The input payload crosses JVM→Python once (the product payload must
    cross back anyway, so storage-direct reading would save at most half
    the transport, not the decode); at 100 TB the bound is decode + write,
    both embarrassingly parallel per day partition.
    """
    from .operators.audio_vad import extract_segments

    run_id = uuid.uuid4().hex[:12]
    ledger = LineageLedger(output_root, "segments")
    all_days = list_ingest_days(spark, input_path)
    days = ledger.pending(all_days) if resume else all_days
    batches = (
        [days]
        if days_per_batch <= 0
        else [days[i : i + days_per_batch]
              for i in range(0, len(days), days_per_batch)]
    )
    totals = {
        "clips_in": 0, "segments_out": 0, "days": 0,
        "skipped": len(all_days) - len(days),
    }
    t_start = time.perf_counter()
    for bi, batch in enumerate(b for b in batches if b):
        if fail_after_batches is not None and bi >= fail_after_batches:
            return {**totals, "run_id": run_id, "completed": False}
        for d in batch:
            ledger.mark(d, "running", run_id=run_id)
        t0 = time.perf_counter()
        day_list = sorted(batch)
        scan = spark.read.parquet(input_path).where(
            F.col("ingest_day").isin(day_list)
        )
        obs_in = Observation(f"seg_in_{run_id}_b{bi}")
        in_metrics = [
            F.sum((F.col("ingest_day") == d).cast("long")).alias(f"n_{di}")
            for di, d in enumerate(day_list)
        ]
        observed_in = scan.observe(obs_in, *in_metrics)
        segs = extract_segments(
            observed_in,
            min_dur_ms=min_dur_ms,
            carry_cols=("ingest_day",),
            counter=decode_counter,
        )
        obs_out = Observation(f"seg_out_{run_id}_b{bi}")
        out_metrics = []
        for di, d in enumerate(day_list):
            is_day = F.col("ingest_day") == d
            out_metrics.append(F.sum(is_day.cast("long")).alias(f"s_{di}"))
            out_metrics.append(
                F.sum(F.when(is_day, F.col("dur_ms")).otherwise(0).cast("long"))
                .alias(f"ms_{di}")
            )
        observed = segs.observe(obs_out, *out_metrics)
        write_partitioned(
            observed, os.path.join(output_root, "segments"), ["ingest_day"]
        )
        vals_in = obs_in.get
        vals_out = obs_out.get
        dt = time.perf_counter() - t0
        metric_rows = []
        batch_segs = 0
        for di, d in enumerate(day_list):
            n = int(vals_in[f"n_{di}"] or 0)
            s = int(vals_out[f"s_{di}"] or 0)
            ms = int(vals_out[f"ms_{di}"] or 0)
            batch_segs += s
            ledger.mark(d, "done", rows_in=n, rows_kept=s, run_id=run_id)
            totals["clips_in"] += n
            totals["segments_out"] += s
            totals["days"] += 1
            metric_rows.append(
                (run_id, f"ingest_day={d}", "clips_in", float(n), "")
            )
            metric_rows.append(
                (run_id, f"ingest_day={d}", "segments_out", float(s), "")
            )
            metric_rows.append(
                (run_id, f"ingest_day={d}", "audio_seconds_out",
                 ms / 1000.0, "")
            )
        metric_rows.append(
            (run_id, "batch", "segments_per_sec",
             batch_segs / dt if dt > 0 else 0.0,
             f"batch={bi} days={len(batch)}")
        )
        append_metrics(spark, output_root, metric_rows)
    totals["run_id"] = run_id
    totals["completed"] = True
    totals["wall_s"] = time.perf_counter() - t_start
    return totals


def run_feature_pipeline(
    spark: SparkSession,
    input_path: str,
    output_root: str,
    resume: bool = True,
    days_per_batch: int = 0,
    fail_after_batches: int | None = None,
    decode_counter=None,
) -> dict:
    """Training-INPUT writer: decode every pending ``ingest_day`` once and
    write its log-mel feature table (``operators.audio_mel.mel_features``)
    partitioned by ``ingest_day`` under ``output_root/features``, with the
    same lineage/resume law as the gate and segment runners — a killed run
    resumes on the pending days only, finished days are never re-decoded.

    Same execution shape as ``run_segment_pipeline``: partition-pruned
    scan → ONE ``mapInArrow`` (decode + mel, ``ingest_day`` carried so no
    join back) → ONE write action with per-day clip/frame counts riding
    as ``observe()`` metrics (the one-action law).  Feature bytes are the
    payload — at 100 TB the bound is decode + write, both parallel per
    day partition; no shuffle anywhere.
    """
    from .operators.audio_mel import mel_features

    run_id = uuid.uuid4().hex[:12]
    ledger = LineageLedger(output_root, "features")
    all_days = list_ingest_days(spark, input_path)
    days = ledger.pending(all_days) if resume else all_days
    batches = (
        [days]
        if days_per_batch <= 0
        else [days[i : i + days_per_batch]
              for i in range(0, len(days), days_per_batch)]
    )
    totals = {
        "clips_in": 0, "frames_out": 0, "days": 0,
        "skipped": len(all_days) - len(days),
    }
    t_start = time.perf_counter()
    for bi, batch in enumerate(b for b in batches if b):
        if fail_after_batches is not None and bi >= fail_after_batches:
            return {**totals, "run_id": run_id, "completed": False}
        for d in batch:
            ledger.mark(d, "running", run_id=run_id)
        t0 = time.perf_counter()
        day_list = sorted(batch)
        scan = spark.read.parquet(input_path).where(
            F.col("ingest_day").isin(day_list)
        )
        feats = mel_features(
            scan, carry_cols=("ingest_day",), counter=decode_counter
        )
        obs = Observation(f"mel_{run_id}_b{bi}")
        metrics = []
        for di, d in enumerate(day_list):
            is_day = F.col("ingest_day") == d
            metrics.append(F.sum(is_day.cast("long")).alias(f"n_{di}"))
            metrics.append(
                F.sum(F.when(is_day, F.col("n_frames")).otherwise(0)
                      .cast("long")).alias(f"f_{di}")
            )
        observed = feats.observe(obs, *metrics)
        write_partitioned(
            observed, os.path.join(output_root, "features"), ["ingest_day"]
        )
        vals = obs.get
        dt = time.perf_counter() - t0
        metric_rows = []
        batch_frames = 0
        for di, d in enumerate(day_list):
            n = int(vals[f"n_{di}"] or 0)
            fr = int(vals[f"f_{di}"] or 0)
            batch_frames += fr
            ledger.mark(d, "done", rows_in=n, rows_kept=n, run_id=run_id)
            totals["clips_in"] += n
            totals["frames_out"] += fr
            totals["days"] += 1
            metric_rows.append(
                (run_id, f"ingest_day={d}", "clips_in", float(n), "")
            )
            metric_rows.append(
                (run_id, f"ingest_day={d}", "frames_out", float(fr), "")
            )
        metric_rows.append(
            (run_id, "batch", "frames_per_sec",
             batch_frames / dt if dt > 0 else 0.0,
             f"batch={bi} days={len(batch)}")
        )
        append_metrics(spark, output_root, metric_rows)
    totals["run_id"] = run_id
    totals["completed"] = True
    totals["wall_s"] = time.perf_counter() - t_start
    return totals


def run_identity_pipeline(
    spark: SparkSession,
    input_path: str,
    output_root: str,
    resume: bool = True,
    days_per_batch: int = 0,
    fail_after_batches: int | None = None,
    decode_counter=None,
) -> dict:
    """Checkpointed identity-feature extraction: decode every pending
    ``ingest_day`` ONCE and write its slim identity-feature table
    (``operators.audio_identity.identity_features`` — fingerprints +
    channel/voice profiles + key cells, ~1 KB/clip) partitioned by
    ``ingest_day`` under ``output_root/identity``, with the same
    lineage/resume law as the gate/segment/mel runners: a killed run
    resumes on pending days only, finished days are never re-decoded.

    This checkpoints the EXPENSIVE half of ``identity_split`` — at
    10^12 clips the decode dominates; the relational half
    (``split_from_features``) re-runs from these tables at pure
    shuffle-of-key-cells cost, so re-splitting with a new val_frac or
    seed (or after appending new ingest days) costs zero decode.

    Execution shape: partition-pruned scan → ONE ``mapInArrow``
    (``ingest_day`` carried, no join back) → ONE write action with
    per-day clip / channel-evidence / voice-evidence counts riding as
    ``observe()`` metrics (the one-action law).
    """
    from .operators.audio_identity import identity_features

    run_id = uuid.uuid4().hex[:12]
    ledger = LineageLedger(output_root, "identity")
    all_days = list_ingest_days(spark, input_path)
    days = ledger.pending(all_days) if resume else all_days
    batches = (
        [days]
        if days_per_batch <= 0
        else [days[i: i + days_per_batch]
              for i in range(0, len(days), days_per_batch)]
    )
    totals = {
        "clips_in": 0, "ch_ok": 0, "vo_ok": 0, "days": 0,
        "skipped": len(all_days) - len(days),
    }
    t_start = time.perf_counter()
    for bi, batch in enumerate(b for b in batches if b):
        if fail_after_batches is not None and bi >= fail_after_batches:
            return {**totals, "run_id": run_id, "completed": False}
        for d in batch:
            ledger.mark(d, "running", run_id=run_id)
        t0 = time.perf_counter()
        day_list = sorted(batch)
        scan = spark.read.parquet(input_path).where(
            F.col("ingest_day").isin(day_list)
        )
        feats = identity_features(
            scan, counter=decode_counter, carry_cols=("ingest_day",)
        )
        obs = Observation(f"ident_{run_id}_b{bi}")
        metrics = []
        for di, d in enumerate(day_list):
            is_day = F.col("ingest_day") == d
            metrics.append(F.sum(is_day.cast("long")).alias(f"n_{di}"))
            metrics.append(
                F.sum((is_day & F.col("ch_ok")).cast("long"))
                .alias(f"c_{di}")
            )
            metrics.append(
                F.sum((is_day & F.col("vo_ok")).cast("long"))
                .alias(f"v_{di}")
            )
        observed = feats.observe(obs, *metrics)
        write_partitioned(
            observed, os.path.join(output_root, "identity"), ["ingest_day"]
        )
        vals = obs.get
        dt = time.perf_counter() - t0
        metric_rows = []
        batch_clips = 0
        for di, d in enumerate(day_list):
            n = int(vals[f"n_{di}"] or 0)
            ch = int(vals[f"c_{di}"] or 0)
            vo = int(vals[f"v_{di}"] or 0)
            batch_clips += n
            ledger.mark(d, "done", rows_in=n, rows_kept=n, run_id=run_id)
            totals["clips_in"] += n
            totals["ch_ok"] += ch
            totals["vo_ok"] += vo
            totals["days"] += 1
            metric_rows.append(
                (run_id, f"ingest_day={d}", "clips_in", float(n), "")
            )
            metric_rows.append(
                (run_id, f"ingest_day={d}", "channel_evidence", float(ch),
                 "")
            )
            metric_rows.append(
                (run_id, f"ingest_day={d}", "voice_evidence", float(vo), "")
            )
        metric_rows.append(
            (run_id, "batch", "clips_per_sec",
             batch_clips / dt if dt > 0 else 0.0,
             f"batch={bi} days={len(batch)}")
        )
        append_metrics(spark, output_root, metric_rows)
    totals["run_id"] = run_id
    totals["completed"] = True
    totals["wall_s"] = time.perf_counter() - t_start
    return totals
