"""Audio-dedup-at-scale smoke: spectral fingerprints + BER-verified LSH
join over the full 100k-clip bench corpus with injected re-encodes.

Takes the cached bench corpus (100k synthetic clips, ~3.4 GB of audio),
re-encodes a deterministic 1-in-``dup_every`` sample under the next codec at
0.8 gain ON the cluster (one mapInArrow pass — no driver-side audio), unions
it in, then runs the production path:

  clip_fingerprints (mapInArrow, payload dropped)
    -> fingerprint_near_dup (stable-byte buckets -> bit_count BER verify)

and reports fingerprint throughput plus recall over the injected sample —
the built-in correctness cross-check at 250× the oracle scale.

Usage: python scripts/audio_dedup_scale_smoke.py [n_clips] [dup_every]
Prints one JSON line {n_clips, n_dups_injected, fingerprint_seconds,
clips_per_sec, pairs_found, injected_recovered, recall, loadavg_1m}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    import pyarrow as pa
    from pyspark.sql import functions as F

    import bench
    from data_quality_spark.operators.audio_dedup import (
        clip_fingerprints,
        fingerprint_near_dup,
    )
    from data_quality_spark.session import get_spark

    n_clips = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    dup_every = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    clips_path = bench.ensure_clips(n_clips)
    # this path scans the binary payload through the JVM vectorized reader
    # (unlike the storage-direct gate): cap the columnar batch row count so
    # 32 concurrent tasks of ~100 KB clips stay well under the heap
    spark = get_spark(
        "audio-dedup-scale-smoke",
        extra_confs={"spark.sql.parquet.columnarReaderBatchSize": "512"},
    )
    clips = spark.read.parquet(clips_path)

    # re-encode every dup_every-th decodable clip on the cluster
    sample = clips.filter(
        F.pmod(F.xxhash64("clip_id"), F.lit(dup_every)) == 0
    )
    out_schema = clips.schema

    def reencode(batches):
        import numpy as np

        from data_quality_spark.functions import audio as A
        from data_quality_spark.synth import _REENCODE_CYCLE

        for batch in batches:
            cols = {name: batch.column(i).to_pylist()
                    for i, name in enumerate(batch.schema.names)}
            keep = {name: [] for name in batch.schema.names}
            for i in range(batch.num_rows):
                codec = cols["codec"][i]
                if codec not in _REENCODE_CYCLE or cols["bytes"][i] is None:
                    continue
                try:
                    q = A._decode_i16(cols["bytes"][i], codec, cols["sr_hz"][i])
                except (ValueError, TypeError):
                    continue
                if len(q) == 0:
                    continue
                xf = q.astype(np.float64) / 32768.0 * 0.8
                nc = _REENCODE_CYCLE[codec]
                if nc == "pcm16":
                    payload = A.encode_pcm16(xf)
                elif nc == "mulaw":
                    payload = A.encode_mulaw(xf)
                else:
                    payload = A.encode_wav(xf, int(cols["sr_hz"][i]))
                for name in batch.schema.names:
                    if name == "clip_id":
                        keep[name].append(cols[name][i] + "_re")
                    elif name == "bytes":
                        keep[name].append(payload)
                    elif name == "codec":
                        keep[name].append(nc)
                    else:
                        keep[name].append(cols[name][i])
            yield pa.RecordBatch.from_pydict(
                {n: keep[n] for n in batch.schema.names},
                schema=pa.schema(
                    [batch.schema.field(n) for n in batch.schema.names]
                ),
            )

    dups = sample.mapInArrow(reencode, out_schema)
    corpus = clips.unionByName(dups)
    n_dups = dups.count()

    t0 = time.time()
    fps = clip_fingerprints(corpus)
    fps.write.mode("overwrite").format("noop").save()
    fp_seconds = round(time.time() - t0, 2)

    t1 = time.time()
    all_fps = clip_fingerprints(corpus).persist()
    pairs = fingerprint_near_dup(all_fps).persist()
    n_pairs = pairs.count()
    recovered = pairs.filter(
        F.col("id_b") == F.concat(F.col("id_a"), F.lit("_re"))
    ).count()
    join_seconds = round(time.time() - t1, 2)

    # classify the misses: a "degenerate" base is one whose fingerprint is
    # mostly zero words (near-silence — thousands of clips share these
    # patterns, so their buckets exceed max_bucket_size and are deliberately
    # dropped by the skew guard; bit-identical silence belongs to EXACT
    # dedup).  A miss outside this class would be a real recall bug.
    zero_frac = (
        F.size(F.filter("fp", lambda v: v == 0)).cast("double")
        / F.greatest(F.size("fp"), F.lit(1)).cast("double")
    )
    marks = all_fps.select(
        F.col("clip_id").alias("id_a"),
        (zero_frac > 0.5).alias("degenerate"),
    )
    # base-clip RMS via the gate's own featurize pass: misses below the
    # gate's RMS floor are clips the pipeline drops as near-silent anyway
    from data_quality_spark.pipeline import featurize
    from data_quality_spark.synth import GateThresholds

    rms = featurize(
        clips.join(
            dups.select(
                F.expr(
                    "substring(clip_id, 1, length(clip_id) - 3)"
                ).alias("clip_id")
            ),
            "clip_id",
            "semi",
        )
    ).select(F.col("clip_id").alias("id_a"), "rms_db")
    injected = (
        dups.select(
            F.expr("substring(clip_id, 1, length(clip_id) - 3)").alias("id_a")
        )
        .join(
            pairs.filter(
                F.col("id_b") == F.concat(F.col("id_a"), F.lit("_re"))
            ).select("id_a").withColumn("__hit", F.lit(True)),
            "id_a",
            "left",
        )
        .join(marks, "id_a", "left")
        .join(rms, "id_a", "left")
    )
    missed = injected.filter(F.col("__hit").isNull()).persist()
    n_missed_degenerate = missed.filter(F.col("degenerate")).count()
    n_missed_subgate = missed.filter(
        ~F.coalesce("degenerate", F.lit(False))
        & (F.coalesce("rms_db", F.lit(-999.0)) < GateThresholds.RMS_MIN_DB)
    ).count()
    n_missed_other = (
        missed.count() - n_missed_degenerate - n_missed_subgate
    )

    total = n_clips + n_dups
    print(json.dumps({
        "n_clips": total,
        "n_dups_injected": n_dups,
        "fingerprint_seconds": fp_seconds,
        "clips_per_sec": round(total / fp_seconds, 1),
        "near_dup_total_seconds": join_seconds,
        "pairs_found": n_pairs,
        "injected_recovered": recovered,
        "recall": round(recovered / n_dups, 4) if n_dups else None,
        "missed_degenerate_silence": n_missed_degenerate,
        "missed_below_gate_rms_floor": n_missed_subgate,
        "missed_other": n_missed_other,
        "loadavg_1m": round(os.getloadavg()[0], 2),
    }))


if __name__ == "__main__":
    main()
