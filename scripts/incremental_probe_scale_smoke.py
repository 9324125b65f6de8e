"""Incremental-probe-at-scale smoke: a 10k-clip increment probed against
stored fingerprint indexes of 100k and 1M clips.

The claim under test (r4 VERDICT #5): with the stored entry relation
(+ stored bucket stats), probe wall-time tracks the INCREMENT, not the
index — the index is scanned (slim keys, no audio) but never shuffled,
so a 10× index costs far less than 10× probe time.  Invariants:

- 200 injected exact copies (index rows whose fp equals an increment
  clip's fingerprint) are ALL recovered at ber 0.0 at BOTH index sizes
  (the digest path — exact identity never depends on bucket heat);
- the pair set found at 100k is a subset of the 1M run's pairs
  restricted to the shared index ids (same increment, superset index);
- the legacy no-entries path (index keys re-derived from stored fp
  arrays) still returns the identical pair set at 100k.

The index is synthesized directly as fingerprint arrays (deterministic
per-id xxhash-free integer mix — building a 1M-clip AUDIO corpus just
to discard the audio would test the decoder, not the probe); the
increment is REAL audio from the bench corpus, so the probe pays its
true decode cost in every run.

Usage: python scripts/incremental_probe_scale_smoke.py [small] [big] [inc]
Prints one JSON line; paste the numbers into BENCH.md like the r4
cluster/split/prune smokes.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, "/root/repo")

N_INJECT = 200


def synth_index(spark, n: int, inject_fps, out_dir: str) -> None:
    """Write a deterministic n-row fingerprint index + entries + stats.
    fp[j] for clip i is a 32-bit integer mix of (i, j); n_frames varies
    96..159 by id.  ``inject_fps`` rows (clip_id, fp list) are appended
    as extra index rows with ids 'inj<i>'."""
    import numpy as np
    import pyarrow as pa
    from pyspark.sql import functions as F

    from data_quality_spark.operators.audio_dedup import (
        audio_index_bucket_stats,
        audio_index_entries,
    )

    base = spark.range(n).select(F.col("id").cast("long").alias("__i"))

    def gen(batches):
        for b in batches:
            ids = b.column("__i").to_numpy()
            out_ids, out_nf, out_fp = [], [], []
            for i in ids:
                nf = 96 + (int(i) * 2654435761 % 64)
                j = np.arange(nf, dtype=np.uint64)
                # splitmix-style integer mix, vectorized over frames
                x = (np.uint64(i) * np.uint64(0x9E3779B97F4A7C15)
                     + j * np.uint64(0xBF58476D1CE4E5B9))
                x ^= x >> np.uint64(31)
                x *= np.uint64(0x94D049BB133111EB)
                x ^= x >> np.uint64(27)
                fp = (x & np.uint64(0xFFFFFFFF)).astype(np.int64)
                out_ids.append(f"ix{int(i):09d}")
                out_nf.append(nf)
                out_fp.append(fp.astype(np.int32))
            yield pa.RecordBatch.from_arrays(
                [pa.array(out_ids),
                 pa.array(out_nf, type=pa.int32()),
                 pa.array(out_fp, type=pa.list_(pa.int32()))],
                names=["clip_id", "n_frames", "fp"],
            )

    idx = base.repartition(64).mapInArrow(
        gen, "clip_id string, n_frames int, fp array<int>")
    inj = spark.createDataFrame(
        [(f"inj{k:04d}", len(fp), [int(v) for v in fp])
         for k, (_, fp) in enumerate(inject_fps)],
        "clip_id string, n_frames int, fp array<int>",
    )
    idx = idx.unionByName(inj).withColumn(
        "fp_digest",
        F.when(F.size("fp") > 0, F.xxhash64(F.col("fp"))),
    )
    idx.write.mode("overwrite").parquet(os.path.join(out_dir, "index"))
    stored = spark.read.parquet(os.path.join(out_dir, "index"))
    entries = audio_index_entries(stored)
    entries.write.mode("overwrite").parquet(
        os.path.join(out_dir, "entries"))
    audio_index_bucket_stats(
        spark.read.parquet(os.path.join(out_dir, "entries"))
    ).write.mode("overwrite").parquet(os.path.join(out_dir, "stats"))


def shuffle_totals(spark) -> tuple[int, int]:
    """(read_bytes, write_bytes) over completed stages via the UI REST
    API (the cluster_split_prune smoke's machine-readable evidence)."""
    base = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{base}/api/v1/applications") as r:
        app_id = json.load(r)[0]["id"]
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app_id}/stages?status=complete"
    ) as r:
        stages = json.load(r)
    return (
        sum(s.get("shuffleReadBytes", 0) for s in stages),
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
    )


def probe(spark, inc_df, root: str, with_entries: bool = True):
    from data_quality_spark.operators.audio_dedup import audio_probe_index

    idx = spark.read.parquet(os.path.join(root, "index"))
    kw = {}
    if with_entries:
        kw["index_entries_df"] = spark.read.parquet(
            os.path.join(root, "entries"))
        kw["index_stats_df"] = spark.read.parquet(
            os.path.join(root, "stats"))
    rd0, wr0 = shuffle_totals(spark)
    t0 = time.perf_counter()
    pairs = audio_probe_index(inc_df, idx, **kw)
    rows = pairs.collect()
    dt = time.perf_counter() - t0
    rd1, wr1 = shuffle_totals(spark)
    return rows, dt, round((wr1 - wr0) / 1e6, 1)


def main() -> None:
    from pyspark.sql import functions as F

    import bench
    from data_quality_spark.operators.audio_dedup import clip_fingerprints
    from data_quality_spark.session import get_spark

    small = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    big = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    n_inc = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000
    inc_path = bench.ensure_clips(n_inc)
    spark = get_spark(
        "incremental-probe-scale-smoke",
        extra_confs={
            "spark.sql.parquet.columnarReaderBatchSize": "512",
            "spark.ui.enabled": "true",  # shuffle_totals reads the REST API
        },
    )
    inc = spark.read.parquet(inc_path)

    # fingerprint the increment ONCE driver-side to pick the injected
    # exact copies (the probe recomputes its own fps — this pre-pass is
    # test scaffolding, not part of the measured path)
    fps = clip_fingerprints(inc).filter(F.size("fp") >= 3).limit(
        N_INJECT).collect()
    inject = [(r["clip_id"], r["fp"]) for r in fps]
    expect_exact = {r["clip_id"] for r in fps}

    work = tempfile.mkdtemp(prefix="dq_probe_smoke_")
    res: dict = {"n_increment": n_inc, "n_injected": len(inject),
                 "loadavg_1m": round(os.getloadavg()[0], 1)}
    pair_sets = {}
    for name, n in (("small", small), ("big", big)):
        root = os.path.join(work, name)
        t0 = time.perf_counter()
        synth_index(spark, n, inject, root)
        build_s = time.perf_counter() - t0
        rows, dt, shuf_mb = probe(spark, inc, root)
        exact_hits = {
            r["new_id"] for r in rows
            if r["index_id"].startswith("inj") and r["ber"] == 0.0
        }
        pair_sets[name] = {(r["new_id"], r["index_id"]) for r in rows}
        res[f"index_{name}"] = {
            "n_index": n,
            "build_seconds": round(build_s, 1),
            "probe_seconds": round(dt, 1),
            "pairs": len(rows),
            "probe_shuffle_write_mb": shuf_mb,
            "exact_injected_recovered":
                len(exact_hits & expect_exact),
        }
    # legacy path: no stored entries/stats — index keys re-derived and
    # every verify relation shuffled; measured at BOTH sizes so the
    # stored path's advantage is visible as a function of index size
    for name in ("small", "big"):
        rows_legacy, dt_legacy, shuf_legacy = probe(
            spark, inc, os.path.join(work, name), with_entries=False)
        res[f"legacy_no_entries_{name}"] = {
            "probe_seconds": round(dt_legacy, 1),
            "probe_shuffle_write_mb": shuf_legacy,
            "pairs": len(rows_legacy),
            "identical_to_entries_path":
                {(r["new_id"], r["index_id"]) for r in rows_legacy}
                == pair_sets[name],
        }
    shared = {p for p in pair_sets["big"]
              if not p[1].startswith("ix") or int(p[1][2:]) < small}
    res["small_pairs_subset_of_big_restricted"] = (
        pair_sets["small"] <= pair_sets["big"])
    res["big_restricted_equals_small"] = shared == pair_sets["small"]
    res["probe_time_ratio_big_over_small"] = round(
        res["index_big"]["probe_seconds"]
        / max(res["index_small"]["probe_seconds"], 1e-9), 2)
    res["index_size_ratio"] = round(big / small, 1)
    print(json.dumps(res))
    spark.stop()
    import shutil

    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
