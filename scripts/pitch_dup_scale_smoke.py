"""Pitch/stretch-dup-at-scale smoke: the vocoder-axis matcher over the
full 100k-clip bench corpus with injected phase-vocoder twins.

Takes the cached bench corpus, vocoder-perturbs a deterministic
1-in-``tw_every`` sample ON the cluster (one mapInArrow pass — the
phase vocoder is pure numpy, no driver-side audio), alternating time
stretch (11/10, 9/10) and pitch shift (9/8, 8/9), unions it in, then
runs the production chain:

  clip_profiles (mapInArrow, payload dropped, persisted once)
    -> pitch_dup_pairs (spacing buckets -> anchored verification)
    -> pitch_dup_confirm (rational-band resample + scaled landmark vote,
       payloads joined ONLY for the candidate pair set)

and reports profile throughput, candidate/confirmed counts, and recall
over the injected evaluable sample — the built-in correctness
cross-check at ~330× the oracle scale.

Usage: python scripts/pitch_dup_scale_smoke.py [n_clips] [tw_every] [max_bucket]
Prints one JSON line.  ``max_bucket`` is the hot-bucket guard — the
synthetic corpus draws 1-3 tones from ~250 cells, so only ~500 distinct
peak geometries exist and at 100k clips EVERY geometry is hot; the guard
is the recall/cost dial this smoke measures (real audio corpora have
orders more spectral entropy, so the default 64 holds there).
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
    from data_quality_spark.operators.audio_pitch import (
        clip_profiles,
        pitch_dup_confirm,
        pitch_dup_pairs,
    )
    from data_quality_spark.session import get_spark

    n_clips = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    tw_every = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    max_bucket = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    clips_path = bench.ensure_clips(n_clips)
    spark = get_spark(
        "pitch-dup-scale-smoke",
        extra_confs={"spark.sql.parquet.columnarReaderBatchSize": "512"},
    )
    clips = spark.read.parquet(clips_path)
    sample = clips.filter(
        F.pmod(F.xxhash64("clip_id"), F.lit(tw_every)) == 0
    )
    out_schema = clips.schema

    def vocode(batches):
        import numpy as np

        from data_quality_spark.functions import audio as A
        from data_quality_spark.functions.stretch import (
            pitch_shift_rational,
            time_stretch,
        )

        factors = [("st", 11, 10), ("pi", 9, 8), ("st", 9, 10),
                   ("pi", 8, 9)]
        for batch in batches:
            cols = {name: batch.column(i).to_pylist()
                    for i, name in enumerate(batch.schema.names)}
            keep = {name: [] for name in batch.schema.names}
            for i in range(batch.num_rows):
                if cols["bytes"][i] is None:
                    continue
                try:
                    q = A._decode_i16(
                        cols["bytes"][i], cols["codec"][i], cols["sr_hz"][i])
                except (ValueError, TypeError):
                    continue
                if len(q) < 8192 or not cols["sr_hz"][i]:
                    continue
                x = q.astype(np.float64) / 32768.0
                import zlib  # deterministic across workers (hash() is salted)

                kind, L, M = factors[
                    zlib.crc32(cols["clip_id"][i].encode()) % len(factors)]
                if kind == "st":
                    y = time_stretch(
                        x, rate=M / L, out_len=round(len(x) * L / M))
                else:
                    y = pitch_shift_rational(x, L, M)
                y = np.clip(y, -1.0, 0.999969)
                for name in batch.schema.names:
                    if name == "clip_id":
                        keep[name].append(cols[name][i] + "_tw")
                    elif name == "bytes":
                        keep[name].append(A.encode_pcm16(y))
                    elif name == "codec":
                        keep[name].append("pcm16")
                    elif name == "dur_ms":
                        keep[name].append(
                            int(round(len(y) / cols["sr_hz"][i] * 1000)))
                    else:
                        keep[name].append(cols[name][i])
            yield pa.RecordBatch.from_pydict(
                {n: keep[n] for n in batch.schema.names},
                schema=pa.schema(
                    [batch.schema.field(n) for n in batch.schema.names]
                ),
            )

    tws = sample.mapInArrow(vocode, out_schema)
    corpus = clips.unionByName(tws)
    n_tw = tws.count()

    t0 = time.time()
    profiles = clip_profiles(corpus)
    pairs = pitch_dup_pairs(profiles, max_bucket_size=max_bucket)
    confirmed = pitch_dup_confirm(corpus, pairs).cache()
    n_pairs = confirmed.count()
    chain_seconds = round(time.time() - t0, 2)

    n_conf = confirmed.filter(F.col("confirmed")).count()
    seeded_hits = (
        confirmed.filter(
            F.col("confirmed")
            & (F.col("id_b") == F.concat(F.col("id_a"), F.lit("_tw")))
        ).count()
    )
    # evaluable injected twins: both sides >= 2 profile peaks
    ev = (
        profiles.filter(F.col("n_peaks") >= 2)
        .select(F.col("clip_id"))
        .alias("p")
    )
    seeded_eval = (
        tws.select(F.col("clip_id").alias("tid"),
                   F.regexp_replace("clip_id", "_tw$", "").alias("bid"))
        .join(ev.selectExpr("clip_id as tid"), "tid")
        .join(ev.selectExpr("clip_id as bid"), "bid")
        .count()
    )
    print(json.dumps({
        "n_clips": n_clips,
        "max_bucket": max_bucket,
        "n_twins_injected": n_tw,
        "n_twins_evaluable": seeded_eval,
        "chain_seconds": chain_seconds,
        "clips_per_sec": round((n_clips + n_tw) / chain_seconds, 1),
        "candidate_pairs": n_pairs,
        "confirmed_pairs": n_conf,
        "seeded_recovered": seeded_hits,
        "recall_evaluable": round(seeded_hits / seeded_eval, 4)
        if seeded_eval else None,
        "loadavg_1m": round(os.getloadavg()[0], 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
