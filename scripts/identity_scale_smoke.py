"""Identity-axes-at-scale smoke: one fused decode pass (fingerprints +
channel + voice kernels) over the full 100k-clip bench corpus with an
injected speaker population, then the three pair laws and the union
closure.

Takes the cached bench corpus, unions in ``make_audio_voice_corpus``
speakers (default 30 speakers × 4 clips — different utterances, one
voice each), and runs the production path:

  identity_features (ONE mapInArrow, payload dropped, ~1 KB/clip)
    -> identity_pairs (content / channel / voice bucket+verify laws)
    -> union components

and reports fused-featurization throughput plus speaker-recovery
correctness over the injected population at 250× the oracle scale:
every injected speaker's clips must land in ONE voice component
(completeness) and no component may mix two speakers (purity) — checked
on the voice-axis pair graph restricted to injected ids.

Usage: python scripts/identity_scale_smoke.py [n_clips] [n_speakers]
Prints one JSON line.
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
    from data_quality_spark.operators.audio_identity import (
        identity_features,
        identity_pairs,
    )
    from data_quality_spark.plans.schemas import CLIPS_SCHEMA
    from data_quality_spark.session import get_spark
    from data_quality_spark.synth import make_audio_voice_corpus

    n_clips = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_speakers = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    clips_per = 4
    clips_path = bench.ensure_clips(n_clips)
    spark = get_spark(
        "identity-scale-smoke",
        extra_confs={"spark.sql.parquet.columnarReaderBatchSize": "512"},
    )
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    base = spark.read.parquet(clips_path).select(cols)
    inj_pdf = make_audio_voice_corpus(n_speakers, clips_per, seed=5)
    inj_pdf = inj_pdf[inj_pdf.clip_id.str.startswith("vc")]
    injected = spark.createDataFrame(inj_pdf[cols], CLIPS_SCHEMA)
    clips = base.unionByName(injected)

    feat = identity_features(clips).persist()
    t0 = time.perf_counter()
    n_total = feat.count()
    feat_s = time.perf_counter() - t0
    ev = feat.agg(
        F.sum(F.col("ch_ok").cast("long")).alias("ch"),
        F.sum(F.col("vo_ok").cast("long")).alias("vo"),
    ).collect()[0]

    t1 = time.perf_counter()
    pairs = identity_pairs(feat).persist()
    axis_counts = {
        r["axis"]: r["n"]
        for r in pairs.groupBy("axis").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    pair_s = time.perf_counter() - t1

    # injected-speaker recovery on the voice axis
    voice_pairs = [
        (r.id_a, r.id_b)
        for r in pairs.where(
            (F.col("axis") == "voice")
            & F.col("id_a").startswith("vc")
            & F.col("id_b").startswith("vc")
        ).collect()
    ]
    parent = {c: c for c in inj_pdf.clip_id}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in voice_pairs:
        parent[find(a)] = find(b)
    comps: dict[str, set] = {}
    for c in inj_pdf.clip_id:
        comps.setdefault(find(c), set()).add(c[:4])  # vcNN prefix
    pure = all(len(s) == 1 for s in comps.values())
    complete = len(comps) == n_speakers

    print(json.dumps({
        "n_clips": int(n_total),
        "n_injected": int(len(inj_pdf)),
        "feature_seconds": round(feat_s, 2),
        "clips_per_sec": round(n_total / feat_s, 1),
        "channel_evidence_frac": round(ev["ch"] / n_total, 4),
        "voice_evidence_frac": round(ev["vo"] / n_total, 4),
        "pair_seconds": round(pair_s, 2),
        "pairs_by_axis": axis_counts,
        "injected_speakers": n_speakers,
        "speaker_purity_ok": bool(pure),
        "speaker_completeness_ok": bool(complete),
        "loadavg_1m": round(os.getloadavg()[0], 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
