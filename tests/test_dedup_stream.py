"""Streaming dedup vs batch, and stateless quality filters on streams.

The differential surface is cross-micro-batch state: duplicate keys are
split across parquet slices so a per-batch dedup would keep them — only
carried state makes the stream agree with the batch operator.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
import pytest


def _write_slice(path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = pd.DataFrame(rows, columns=["k", "ts", "payload"])
    table = pa.Table.from_pandas(pdf, preserve_index=False).cast(
        pa.schema(
            [("k", pa.int64()), ("ts", pa.timestamp("us")), ("payload", pa.string())]
        )
    )
    pq.write_table(table, path)


def test_stream_dedup_matches_batch_across_microbatches(spark, tmp_path):
    from data_quality_spark.streaming.dedup_stream import dedup_stream

    t0 = datetime(2026, 1, 1, 12, 0, 0)
    s = timedelta(seconds=30)
    src = tmp_path / "src"
    src.mkdir()
    # keys 1..4 in slice 0; keys 3, 4 duplicated in slice 1 (within the
    # watermark), key 5 new; slice 2 duplicates 1 and 5 again
    _write_slice(src / "s0.parquet", [(k, t0 + k * s, f"first-{k}") for k in (1, 2, 3, 4)])
    _write_slice(src / "s1.parquet", [(3, t0 + 5 * s, "dup-3"), (4, t0 + 6 * s, "dup-4"), (5, t0 + 7 * s, "first-5")])
    _write_slice(src / "s2.parquet", [(1, t0 + 8 * s, "dup-1"), (5, t0 + 9 * s, "dup-5")])

    stream = (
        spark.readStream.schema("k long, ts timestamp, payload string")
        .option("maxFilesPerTrigger", 1)  # force one micro-batch per slice
        .parquet(str(src))
    )
    q = (
        dedup_stream(stream, ["k"], watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    # drain fully before reading: a fixed await that returns early on a
    # loaded host leaves the memory table partial (observed once in a
    # full-suite run at 120 s) — loop to the deadline and REQUIRE the
    # drain, so slowness is a visible timeout, never a wrong-rows flake
    import time as _time

    deadline = _time.time() + 300
    while q.isActive and _time.time() < deadline:
        q.awaitTermination(5)
    assert not q.isActive, "availableNow drain did not finish in 300s"
    got = {
        r["k"]: r["payload"] for r in spark.sql("SELECT * FROM dedup_out").collect()
    }
    # exactly one survivor per key, and never a 'dup-*' payload
    assert sorted(got) == [1, 2, 3, 4, 5]
    assert all(p.startswith("first-") for p in got.values())

    batch = dedup_stream(spark.read.parquet(str(src)), ["k"])
    assert batch.count() == 5


def test_gopher_flags_are_streaming_legal(spark, tmp_path):
    """The quality filters are pure projections: the same expression runs
    on a readStream unchanged and emits identical flags per doc."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_quality_spark.operators.quality_filters import gopher_flags

    rows = [
        (0, "the quick brown fox jumps over a lazy dog again and again today", "en", "s"),
        (1, "tiny", "en", "s"),
    ]
    src = tmp_path / "docs"
    src.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": [r[0] for r in rows],
                "text": [r[1] for r in rows],
                "lang": [r[2] for r in rows],
                "source": [r[3] for r in rows],
            }
        ),
        src / "d0.parquet",
    )
    stream = spark.readStream.schema(
        "doc_id long, text string, lang string, source string"
    ).parquet(str(src))
    q = (
        gopher_flags(stream, min_words=5, max_words=50)
        .writeStream.format("memory")
        .queryName("gopher_out")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: r["gopher_pass"]
        for r in spark.sql("SELECT * FROM gopher_out").collect()
    }
    want = {
        r["doc_id"]: r["gopher_pass"]
        for r in gopher_flags(
            spark.read.parquet(str(src)), min_words=5, max_words=50
        ).collect()
    }
    assert got == want == {0: True, 1: False}


def test_stream_probe_matches_batch_probe(spark, tmp_path):
    """The streaming incremental audio probe equals the one-shot batch
    probe over the union of increments (NEW×INDEX pairs on both
    paths), and each increment decodes exactly once."""
    from pyspark.sql import functions as F

    from data_quality_spark.operators.audio_dedup import (
        audio_probe_index,
        build_audio_index,
    )
    from data_quality_spark.plans.schemas import CLIPS_SCHEMA
    from data_quality_spark.streaming.probe_stream import stream_probe_index
    from data_quality_spark.synth import make_audio_dup_corpus

    pdf = make_audio_dup_corpus(120, seed=7)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    clips = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA)
    par = F.pmod(F.xxhash64("clip_id"), F.lit(2))
    idx_clips, new_clips = clips.where(par == 0), clips.where(par == 1)
    index_path = str(tmp_path / "index")
    build_audio_index(idx_clips).write.parquet(index_path)
    stored = spark.read.parquet(index_path)

    src = str(tmp_path / "incoming")
    new_clips.coalesce(3).write.parquet(src)  # 3 files → multiple batches
    acc = spark.sparkContext.accumulator(0)
    out_root = str(tmp_path / "out")
    res = stream_probe_index(
        spark, src, stored, out_root,
        max_files_per_trigger=1, decode_counter=acc,
    )
    assert res["batches"] >= 2
    assert acc.value == new_clips.count()  # one decode per increment row

    streamed = sorted(
        (r["new_id"], r["index_id"], round(r["ber"], 9))
        for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(f"{out_root}/probe_stream").collect()
    )
    batch = sorted(
        (r["new_id"], r["index_id"], round(r["ber"], 9))
        for r in audio_probe_index(new_clips, stored).collect()
    )
    assert streamed == batch and len(batch) > 0
