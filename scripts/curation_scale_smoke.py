"""Curation-stage scale smoke: loop scan + silence trim at 1000× oracle
scale (the full 100k-clip bench corpus, plus ~1k injected frame-aligned
loops), cross-checked by machine-verifiable invariants instead of
throughput alone:

  loop_scan     — recall over the injected tiled-payload loops ≥ 0.9
                  (misses must be degenerate-stream guards), false-flag
                  rate on the natural corpus < 0.1% (reported exactly);
  trim_silence  — two INDEPENDENT jobs must agree clip-by-clip via a
                  join (the established smoke law): trim's lead_ms
                  equals clip_vad's leading_silence_ms exactly on every
                  trimmed row; tail_ms exceeds trailing_silence_ms only
                  by the sub-frame remainder (< one frame + rounding);
                  n_out ≤ n_in everywhere.

Usage: python scripts/curation_scale_smoke.py [n_clips]
Prints ONE JSON line with per-stage seconds + clips/sec + invariants.
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
    from data_quality_spark.operators.audio_loop import loop_scan
    from data_quality_spark.operators.audio_vad import clip_vad, trim_silence
    from data_quality_spark.plans.schemas import CLIPS_SCHEMA
    from data_quality_spark.session import get_spark
    from data_quality_spark.synth import make_audio_loop_corpus

    n_clips = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    clips_path = bench.ensure_clips(n_clips)
    spark = get_spark(
        "curation-scale-smoke",
        extra_confs={"spark.sql.parquet.columnarReaderBatchSize": "512"},
    )
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    corpus = spark.read.parquet(clips_path).select(*cols)

    out: dict = {"n_clips": n_clips, "loadavg_1m": round(os.getloadavg()[0], 2)}

    # ---- loop scan over corpus + injected frame-aligned loops
    inj_pdf = make_audio_loop_corpus(3000, seed=777, loop_every=3)
    inj_pdf = inj_pdf[inj_pdf["defect"] == "looped"]
    out["n_injected_loops"] = int(len(inj_pdf))
    injected = spark.createDataFrame(inj_pdf[cols], CLIPS_SCHEMA)
    t0 = time.perf_counter()
    scan = loop_scan(corpus.unionByName(injected))
    agg = scan.agg(
        F.count(F.lit(1)).alias("total"),
        F.count(F.when(F.col("clip_id").endswith("_loop"), 1))
        .alias("n_inj"),
        F.count(F.when(F.col("clip_id").endswith("_loop")
                       & F.col("looped"), 1)).alias("n_inj_caught"),
        F.count(F.when(F.col("clip_id").endswith("_loop")
                       & ~F.col("looped")
                       & ((F.col("n_distinct") < 8)
                          | (F.col("n_dominant") * 2
                             > F.col("n_frames"))), 1))
        .alias("n_inj_degenerate_miss"),
        F.count(F.when(~F.col("clip_id").endswith("_loop")
                       & F.col("looped"), 1)).alias("n_corpus_flagged"),
    ).collect()[0]
    dt = time.perf_counter() - t0
    total = agg["total"]
    out["loop_scan"] = {
        "sec": round(dt, 2),
        "clips_per_sec": round(total / dt, 1),
        "recall": round(agg["n_inj_caught"] / agg["n_inj"], 4),
        "misses_all_degenerate": bool(
            agg["n_inj"] - agg["n_inj_caught"]
            == agg["n_inj_degenerate_miss"]
        ),
        "corpus_false_flags": int(agg["n_corpus_flagged"]),
        "corpus_false_rate": round(
            agg["n_corpus_flagged"] / (total - agg["n_inj"]), 6),
    }
    assert agg["n_inj"] == out["n_injected_loops"]
    assert out["loop_scan"]["recall"] >= 0.9, out["loop_scan"]
    assert out["loop_scan"]["corpus_false_rate"] < 0.001, out["loop_scan"]

    # ---- sample-domain (arbitrary-offset) loop scan at scale
    from data_quality_spark.operators.audio_loop import (
        DOMINANT_DEN,
        DOMINANT_NUM,
        SAMPLE_MIN_DISTINCT,
        loop_scan_samples,
    )

    injx_pdf = make_audio_loop_corpus(3000, seed=778, loop_every=3,
                                      arbitrary_every=2)
    injx_pdf = injx_pdf[injx_pdf["defect"] == "looped_arbitrary"]
    out["n_injected_arbitrary"] = int(len(injx_pdf))
    injectedx = spark.createDataFrame(injx_pdf[cols], CLIPS_SCHEMA)
    t0 = time.perf_counter()
    scanx = loop_scan_samples(corpus.unionByName(injectedx))
    # admissible misses: sample-domain degenerate guard, or structurally
    # not-evaluable (best_lag NULL — sr_hz <= 0 rows can't form a lag
    # window; the invalid-rate audit owns those clips)
    degx = (
        (F.col("n_distinct") < SAMPLE_MIN_DISTINCT)
        | (F.col("n_dominant") * DOMINANT_DEN
           > DOMINANT_NUM * F.col("n_samples"))
        | F.col("best_lag").isNull()
    )
    aggx = scanx.agg(
        F.count(F.lit(1)).alias("total"),
        F.count(F.when(F.col("clip_id").endswith("_loopx"), 1))
        .alias("n_inj"),
        F.count(F.when(F.col("clip_id").endswith("_loopx")
                       & F.col("looped"), 1)).alias("n_inj_caught"),
        F.count(F.when(F.col("clip_id").endswith("_loopx")
                       & ~F.col("looped") & degx, 1))
        .alias("n_inj_degenerate_miss"),
        F.count(F.when(~F.col("clip_id").endswith("_loopx")
                       & F.col("looped"), 1)).alias("n_corpus_flagged"),
    ).collect()[0]
    dt = time.perf_counter() - t0
    totalx = aggx["total"]
    out["loop_scan_samples"] = {
        "sec": round(dt, 2),
        "clips_per_sec": round(totalx / dt, 1),
        "recall": round(aggx["n_inj_caught"] / aggx["n_inj"], 4),
        "misses_all_degenerate": bool(
            aggx["n_inj"] - aggx["n_inj_caught"]
            == aggx["n_inj_degenerate_miss"]
        ),
        "corpus_false_flags": int(aggx["n_corpus_flagged"]),
        "corpus_false_rate": round(
            aggx["n_corpus_flagged"] / (totalx - aggx["n_inj"]), 6),
    }
    assert out["loop_scan_samples"]["recall"] >= 0.85, out["loop_scan_samples"]
    assert out["loop_scan_samples"]["corpus_false_rate"] < 0.001, (
        out["loop_scan_samples"])

    # ---- trim vs VAD: independent jobs must agree clip-by-clip
    t0 = time.perf_counter()
    trim = trim_silence(corpus)
    vad = clip_vad(corpus).select(
        "clip_id", "leading_silence_ms", "trailing_silence_ms")
    from data_quality_spark.functions.audio import FRAME_MS

    j = trim.join(vad, "clip_id")
    # tail remainder = samples past the last full VAD frame < FRAME_MS
    inv = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("trimmed"), 1)).alias("n_trimmed"),
        F.count(F.when(F.col("n_out") > F.col("n_in"), 1)).alias("n_bad_len"),
        F.count(F.when(
            F.col("trimmed")
            & (F.col("lead_ms") != F.col("leading_silence_ms")), 1))
        .alias("n_lead_mismatch"),
        F.count(F.when(
            F.col("trimmed")
            & ((F.col("tail_ms") < F.col("trailing_silence_ms"))
               | (F.col("tail_ms") - F.col("trailing_silence_ms")
                  > F.lit(FRAME_MS + 1))), 1))
        .alias("n_tail_out_of_band"),
    ).collect()[0]
    dt = time.perf_counter() - t0
    out["trim_silence"] = {
        "sec": round(dt, 2),
        "clips_per_sec": round(inv["n"] / dt, 1),
        "n_trimmed": int(inv["n_trimmed"]),
        "lead_ms_mismatches": int(inv["n_lead_mismatch"]),
        "tail_ms_out_of_band": int(inv["n_tail_out_of_band"]),
        "bad_lengths": int(inv["n_bad_len"]),
    }
    assert inv["n"] == n_clips
    assert inv["n_bad_len"] == 0
    assert inv["n_lead_mismatch"] == 0
    assert inv["n_tail_out_of_band"] == 0
    assert inv["n_trimmed"] > n_clips // 2

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
