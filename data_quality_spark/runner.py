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


def _run_day_batches(
    spark: SparkSession,
    output_root: str,
    job: str,
    all_days: list[str],
    run_batch,
    counters: list[tuple[str, str, str | None, float]],
    kept_tag: str,
    rate_name: str,
    rate_tag: str,
    resume: bool,
    days_per_batch: int,
    fail_after_batches: int | None,
) -> dict:
    """The scaffolding shared by all four partition-incremental runners
    (gate / segments / features / identity): lineage-ledger resume,
    day batching, the running/done marks, per-day observe-metric
    unpacking, metrics-table append, and wall-clock totals.

    ``run_batch(day_list, bi, run_id)`` performs the batch's ONE write
    action and returns the observed counter values keyed
    ``f"{tag}_{di}"`` (merge multiple Observations into one dict when a
    pipeline observes both input and output frames).  ``counters`` is
    the declarative per-day counter spec: ``(tag, metric_name,
    totals_key, scale)`` — tag matches the observe aliases, metric_name
    is the metrics-table row, totals_key accumulates into the returned
    dict (None = metric-only), scale converts units (ms → s).  The
    ledger's rows_in/rows_kept are the first counter and ``kept_tag``;
    the batch rate metric is ``rate_tag``'s batch total / wall.
    """
    run_id = uuid.uuid4().hex[:12]
    ledger = LineageLedger(output_root, job)
    days = ledger.pending(all_days) if resume else all_days
    batches = (
        [days]
        if days_per_batch <= 0
        else [days[i: i + days_per_batch]
              for i in range(0, len(days), days_per_batch)]
    )
    totals: dict = {"days": 0, "skipped": len(all_days) - len(days)}
    for _tag, _metric, tkey, _scale in counters:
        if tkey:
            totals.setdefault(tkey, 0)
    t_start = time.perf_counter()
    for bi, batch in enumerate(b for b in batches if b):
        if fail_after_batches is not None and bi >= fail_after_batches:
            return {**totals, "run_id": run_id, "completed": False}
        for d in batch:
            ledger.mark(d, "running", run_id=run_id)
        t0 = time.perf_counter()
        day_list = sorted(batch)
        vals = run_batch(day_list, bi, run_id)
        dt = time.perf_counter() - t0
        metric_rows = []
        rate_units = 0
        first_tag = counters[0][0]
        for di, d in enumerate(day_list):
            got = {tag: int(vals[f"{tag}_{di}"] or 0)
                   for tag, _m, _t, _s in counters}
            ledger.mark(d, "done", rows_in=got[first_tag],
                        rows_kept=got[kept_tag], run_id=run_id)
            totals["days"] += 1
            rate_units += got[rate_tag]
            for tag, metric_name, totals_key, scale in counters:
                if totals_key:
                    totals[totals_key] += got[tag]
                metric_rows.append(
                    (run_id, f"ingest_day={d}", metric_name,
                     got[tag] * scale, "")
                )
        metric_rows.append(
            (run_id, "batch", rate_name,
             rate_units / dt if dt > 0 else 0.0,
             f"batch={bi} days={len(batch)}")
        )
        append_metrics(spark, output_root, metric_rows)
    totals["run_id"] = run_id
    totals["completed"] = True
    totals["wall_s"] = time.perf_counter() - t_start
    return totals


def _day_observe_metrics(day_list, counters):
    """Per-day conditional aggregates for ``observe()``: one column per
    (counter, day), aliased ``f"{tag}_{di}"`` — ``counters`` maps tag →
    builder(is_day) -> Column."""
    ms = []
    for di, d in enumerate(day_list):
        is_day = F.col("ingest_day") == d
        for tag, build in counters.items():
            ms.append(build(is_day).alias(f"{tag}_{di}"))
    return ms


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
    keep_value = "accept" if three_way else "keep"

    def run_batch(day_list, bi, run_id):
        # storage-direct gate: payload bytes go storage → python worker
        # and never cross the JVM; the partition_filter prunes whole day
        # directories before any IO (manifest-level partition pruning)
        day_set = set(day_list)  # the partition_filter lambda must never
        # close over a mutable outer list's name
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
        # ONE action per batch: the kept-rows write.  Per-day in/kept
        # counts ride along as observe() metrics on the pre-filter frame —
        # a separate collect() would re-execute the featurize stage,
        # doubling the most expensive work of the whole system.
        obs = Observation(f"gate_{run_id}_b{bi}")
        obs_counters = {
            "n": lambda is_day: F.sum(is_day.cast("long")),
            "k": lambda is_day: F.sum(
                (is_day & (F.col("decision") == keep_value)).cast("long")),
        }
        if three_way:
            obs_counters["g"] = lambda is_day: F.sum(
                (is_day & (F.col("decision") == "graylist")).cast("long"))
        observed = decided.observe(
            obs, *_day_observe_metrics(day_list, obs_counters))
        # repartition on the partition keys first: without it every task
        # writes a file into every (day, lang) directory — task_count ×
        # dirs small files; with it, one file per output partition.
        # Cheap here: the payload column is already gone.
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
        return obs.get  # available once the write action finishes

    counters = [("n", "rows_in", "rows_in", 1.0),
                ("k", "rows_kept", "rows_kept", 1.0)]
    if three_way:
        counters.append(("g", "rows_graylist", "rows_graylist", 1.0))
    totals = _run_day_batches(
        spark, output_root, "gate", list_ingest_days(spark, input_path),
        run_batch, counters, kept_tag="k", rate_name="clips_per_sec",
        rate_tag="n", resume=resume, days_per_batch=days_per_batch,
        fail_after_batches=fail_after_batches,
    )
    if totals["completed"]:
        totals["clips_per_sec"] = (
            totals["rows_in"] / totals["wall_s"]
            if totals["wall_s"] > 0 else 0.0
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

    def run_batch(day_list, bi, run_id):
        scan = spark.read.parquet(input_path).where(
            F.col("ingest_day").isin(day_list)
        )
        obs_in = Observation(f"seg_in_{run_id}_b{bi}")
        observed_in = scan.observe(obs_in, *_day_observe_metrics(
            day_list, {"n": lambda is_day: F.sum(is_day.cast("long"))}))
        segs = extract_segments(
            observed_in,
            min_dur_ms=min_dur_ms,
            carry_cols=("ingest_day",),
            counter=decode_counter,
        )
        obs_out = Observation(f"seg_out_{run_id}_b{bi}")
        observed = segs.observe(obs_out, *_day_observe_metrics(day_list, {
            "s": lambda is_day: F.sum(is_day.cast("long")),
            "ms": lambda is_day: F.sum(
                F.when(is_day, F.col("dur_ms")).otherwise(0).cast("long")),
        }))
        write_partitioned(
            observed, os.path.join(output_root, "segments"), ["ingest_day"]
        )
        return {**obs_in.get, **obs_out.get}

    return _run_day_batches(
        spark, output_root, "segments",
        list_ingest_days(spark, input_path), run_batch,
        [("n", "clips_in", "clips_in", 1.0),
         ("s", "segments_out", "segments_out", 1.0),
         ("ms", "audio_seconds_out", None, 1e-3)],
        kept_tag="s", rate_name="segments_per_sec", rate_tag="s",
        resume=resume, days_per_batch=days_per_batch,
        fail_after_batches=fail_after_batches,
    )


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

    def run_batch(day_list, bi, run_id):
        scan = spark.read.parquet(input_path).where(
            F.col("ingest_day").isin(day_list)
        )
        feats = mel_features(
            scan, carry_cols=("ingest_day",), counter=decode_counter
        )
        obs = Observation(f"mel_{run_id}_b{bi}")
        observed = feats.observe(obs, *_day_observe_metrics(day_list, {
            "n": lambda is_day: F.sum(is_day.cast("long")),
            "f": lambda is_day: F.sum(
                F.when(is_day, F.col("n_frames")).otherwise(0)
                .cast("long")),
        }))
        write_partitioned(
            observed, os.path.join(output_root, "features"), ["ingest_day"]
        )
        return obs.get

    return _run_day_batches(
        spark, output_root, "features",
        list_ingest_days(spark, input_path), run_batch,
        [("n", "clips_in", "clips_in", 1.0),
         ("f", "frames_out", "frames_out", 1.0)],
        kept_tag="n", rate_name="frames_per_sec", rate_tag="f",
        resume=resume, days_per_batch=days_per_batch,
        fail_after_batches=fail_after_batches,
    )


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

    def run_batch(day_list, bi, run_id):
        scan = spark.read.parquet(input_path).where(
            F.col("ingest_day").isin(day_list)
        )
        feats = identity_features(
            scan, counter=decode_counter, carry_cols=("ingest_day",)
        )
        obs = Observation(f"ident_{run_id}_b{bi}")
        observed = feats.observe(obs, *_day_observe_metrics(day_list, {
            "n": lambda is_day: F.sum(is_day.cast("long")),
            "c": lambda is_day: F.sum(
                (is_day & F.col("ch_ok")).cast("long")),
            "v": lambda is_day: F.sum(
                (is_day & F.col("vo_ok")).cast("long")),
        }))
        write_partitioned(
            observed, os.path.join(output_root, "identity"), ["ingest_day"]
        )
        return obs.get

    return _run_day_batches(
        spark, output_root, "identity",
        list_ingest_days(spark, input_path), run_batch,
        [("n", "clips_in", "clips_in", 1.0),
         ("c", "channel_evidence", "ch_ok", 1.0),
         ("v", "voice_evidence", "vo_ok", 1.0)],
        kept_tag="n", rate_name="clips_per_sec", rate_tag="n",
        resume=resume, days_per_batch=days_per_batch,
        fail_after_batches=fail_after_batches,
    )
