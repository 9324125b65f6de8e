"""Provenance-watermark scale smoke: embed + detect over the 100k-clip
bench corpus.

Exercises the detector at 1000× oracle scale and cross-checks
machine-verifiable invariants instead of trusting throughput alone:

  embed stage  — every ``mark_every``-th ELIGIBLE clip (decodable,
                 >= WM_MIN_SAMPLES) gets the pipeline key embedded via
                 one mapInArrow pass and is re-encoded pcm16; the
                 ``marked`` column records what actually happened.
  detect stage — recall on marked clips must be 100% (the 10.5-sigma
                 floor holds corpus-wide, not just on the 300-clip
                 oracle corpus); false positives on the other ~100k
                 unmarked clips must be ZERO (the 6-sigma bound says
                 ~1e-9/clip — one flag here would falsify the law).

Usage: python scripts/watermark_scale_smoke.py [n_clips] [mark_every]
Prints one JSON line with per-stage seconds + clips/sec + invariants.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    import bench
    from data_quality_spark.operators.audio_watermark import watermark_flags
    from data_quality_spark.session import get_spark

    n_clips = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    mark_every = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    clips_path = bench.ensure_clips(n_clips)
    spark = get_spark(
        "watermark-scale-smoke",
        extra_confs={"spark.sql.parquet.columnarReaderBatchSize": "512"},
    )
    clips = spark.read.parquet(clips_path)
    marked_path = f"/tmp/dq_bench_cache/wm_marked_{n_clips}_{mark_every}"

    out: dict = {"n_clips": n_clips, "mark_every": mark_every}

    # --- embed stage: one Arrow pass, deterministic selection by row hash
    schema = T.StructType(
        clips.schema.fields
        + [T.StructField("marked", T.BooleanType(), False)]
    )
    col_idx = {f.name: i for i, f in enumerate(clips.schema.fields)}

    def embed(batches):
        import numpy as np
        import pyarrow as pa

        from data_quality_spark.functions.audio import _decode_i16, encode_pcm16
        from data_quality_spark.functions.watermark import (
            WM_KEY_DEFAULT,
            WM_MIN_SAMPLES,
            embed_watermark,
        )

        for batch in batches:
            cols = {n: batch.column(i).to_pylist() for n, i in col_idx.items()}
            marked = []
            for i in range(batch.num_rows):
                ok = False
                cid = cols["clip_id"][i]
                if int(cid[4:]) % mark_every == 0:
                    try:
                        q = _decode_i16(
                            cols["bytes"][i], cols["codec"][i], cols["sr_hz"][i]
                        )
                        if len(q) >= WM_MIN_SAMPLES:
                            m = embed_watermark(q, WM_KEY_DEFAULT)
                            cols["bytes"][i] = encode_pcm16(
                                m.astype(np.float64) / 32767.0
                            )
                            cols["codec"][i] = "pcm16"
                            ok = True
                    except (ValueError, TypeError):
                        pass
                marked.append(ok)
            arrays = [
                pa.array(cols[f.name]) for f in clips.schema.fields
            ] + [pa.array(marked, type=pa.bool_())]
            yield pa.RecordBatch.from_arrays(
                arrays, names=[f.name for f in clips.schema.fields] + ["marked"]
            )

    t0 = time.time()
    clips.mapInArrow(embed, schema).write.mode("overwrite").parquet(marked_path)
    out["embed_sec"] = round(time.time() - t0, 2)

    # --- detect stage: the operator under test, then one tiny join to the
    # (clip_id, marked) projection for the confusion counts
    corpus = spark.read.parquet(marked_path)
    t0 = time.time()
    flags = watermark_flags(corpus)
    conf = (
        flags.join(corpus.select("clip_id", "marked"), "clip_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("marked"), 1)).alias("n_marked"),
            F.count(F.when(F.col("marked") & F.col("is_watermarked"), 1))
            .alias("tp"),
            F.count(F.when(~F.col("marked") & F.col("is_watermarked"), 1))
            .alias("fp"),
        )
        .collect()[0]
    )
    dt = time.time() - t0
    out["detect_sec"] = round(dt, 2)
    out["detect_clips_per_sec"] = round(conf["n"] / dt, 1)
    out["n_marked"] = conf["n_marked"]
    out["recall"] = (
        round(conf["tp"] / conf["n_marked"], 6) if conf["n_marked"] else None
    )
    out["false_positives"] = conf["fp"]
    out["ok"] = bool(
        conf["n"] == n_clips
        and conf["n_marked"] > 0
        and conf["tp"] == conf["n_marked"]
        and conf["fp"] == 0
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
