"""Transform-stage scale smoke: SR-normalize + VAD + segmentation over the
full 100k-clip bench corpus.

Runs the three round-3 transform/analysis operators end-to-end at 1000×
oracle scale and cross-checks machine-verifiable invariants instead of
trusting throughput alone:

  normalize_sr   — every resampled row lands at target_hz/pcm16 and its
                   dur_ms equals the payload-implied duration;
  clip_vad       — speech_ratio ∈ [0,1]; decode-ok rate matches the
                   corpus's known decodable fraction (±2%);
  clip_segments  — per-clip segment dur sums equal the VAD pass's
                   speech-frame mass exactly (two independent jobs must
                   agree clip-by-clip — checked via a join, not a sample).

Usage: python scripts/audio_transform_scale_smoke.py [n_clips] [target_hz]
Prints one JSON line with per-stage seconds + clips/sec and the invariant
results.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    from pyspark.sql import functions as F

    import bench
    from data_quality_spark.operators.audio_resample import normalize_sr
    from data_quality_spark.operators.audio_vad import clip_segments, clip_vad
    from data_quality_spark.session import get_spark

    n_clips = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    target_hz = int(sys.argv[2]) if len(sys.argv) > 2 else 16000
    clips_path = bench.ensure_clips(n_clips)
    spark = get_spark(
        "audio-transform-scale-smoke",
        extra_confs={"spark.sql.parquet.columnarReaderBatchSize": "512"},
    )
    clips = spark.read.parquet(clips_path)

    out: dict = {"n_clips": n_clips, "target_hz": target_hz}

    # --- normalize_sr: count + payload-consistency in one aggregate pass
    t0 = time.time()
    norm = normalize_sr(clips, target_hz)
    agg = norm.select(
        F.col("resampled").cast("long").alias("r"),
        F.when(
            F.col("resampled")
            & (
                (F.col("sr_hz") != target_hz)
                | (F.col("codec") != "pcm16")
                # kernel rounds with Python banker's rounding; any correct
                # rounding is within 0.5 ms of the exact value
                | (
                    F.abs(
                        F.col("dur_ms")
                        - F.length("bytes") / 2 * 1000 / target_hz
                    )
                    > 0.5001
                )
            ),
            1,
        ).otherwise(0).alias("bad"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("r").alias("n_resampled"),
        F.sum("bad").alias("n_inconsistent"),
    ).collect()[0]
    dt = time.time() - t0
    out["normalize_seconds"] = round(dt, 2)
    out["normalize_clips_per_sec"] = round(n_clips / dt, 1)
    out["n_resampled"] = agg["n_resampled"]
    out["n_inconsistent"] = agg["n_inconsistent"]

    # --- clip_vad
    t0 = time.time()
    vad = clip_vad(clips)
    vagg = vad.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("ok").cast("long")).alias("n_ok"),
        F.sum(
            F.when((F.col("speech_ratio") < 0) | (F.col("speech_ratio") > 1), 1)
            .otherwise(0)
        ).alias("bad_ratio"),
        F.sum((F.col("speech_ratio") * F.col("n_frames")).cast("long")).alias(
            "speech_frames"
        ),
    ).collect()[0]
    dt = time.time() - t0
    out["vad_seconds"] = round(dt, 2)
    out["vad_clips_per_sec"] = round(n_clips / dt, 1)
    out["vad_ok_frac"] = round(vagg["n_ok"] / vagg["n"], 4)
    out["vad_bad_ratio_rows"] = vagg["bad_ratio"]

    # --- clip_segments + exact cross-job mass agreement
    t0 = time.time()
    segs = clip_segments(clips)
    per_clip_seg = segs.groupBy("clip_id").agg(
        F.sum("dur_ms").alias("seg_ms"), F.count(F.lit(1)).alias("n_segs")
    )
    n_seg_rows = segs.count()
    dt = time.time() - t0
    out["segments_seconds"] = round(dt, 2)
    out["segments_clips_per_sec"] = round(n_clips / dt, 1)
    out["n_segment_rows"] = n_seg_rows

    # VAD says speech_frames * 20ms per clip; segments must sum to the same
    vad_ms = vad.select(
        "clip_id",
        (F.round(F.col("speech_ratio") * F.col("n_frames")) * 20)
        .cast("long")
        .alias("vad_ms"),
    )
    mism = (
        vad_ms.join(per_clip_seg, "clip_id", "left")
        .select(
            F.when(
                F.coalesce(F.col("seg_ms"), F.lit(0)) != F.col("vad_ms"), 1
            ).otherwise(0).alias("m")
        )
        .agg(F.sum("m").alias("mismatches"))
        .collect()[0]["mismatches"]
    )
    out["vad_vs_segments_mismatches"] = mism
    out["loadavg_1m"] = round(os.getloadavg()[0], 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
