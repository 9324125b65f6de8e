"""Streaming identity-feature extraction vs the batch operator.

The stream must produce bit-identical features (the byte-determinism
contract makes this checkable), one decode per micro-batch
(accumulator), idempotent per-batch directories, and the downstream
split over the streamed tables must equal the direct batch split.
"""

from __future__ import annotations

import os

from data_quality_spark.operators.audio_identity import (
    identity_split,
    split_from_features,
)
from data_quality_spark.plans.schemas import CLIPS_SCHEMA
from data_quality_spark.runner import write_clips
from data_quality_spark.streaming.identity_stream import (
    stream_identity_features,
)
from data_quality_spark.synth import make_audio_identity_corpus


def test_stream_features_match_batch_and_feed_split(spark, tmp_path):
    pdf = make_audio_identity_corpus(42)
    src = str(tmp_path / "bronze")
    write_clips(spark, pdf, src)
    out = str(tmp_path / "out")
    acc = spark.sparkContext.accumulator(0)
    res = stream_identity_features(
        spark, src, out, max_files_per_trigger=1, decode_counter=acc
    )
    assert res["clips_in"] == len(pdf) == acc.value
    assert res["batches"] >= 2  # maxFilesPerTrigger forces several
    assert res["ch_ok"] == res["vo_ok"] == len(pdf) - 2  # mu00/mu01

    # plain partition discovery: batch_id and ingest_day come from the
    # directory names (recursiveFileLookup would DROP them — the bug
    # this test regression-guards on the write side too)
    feats = spark.read.parquet(os.path.join(out, "identity_stream"))
    assert feats.count() == len(pdf)
    # the carried partition column must survive the stream read
    # (regression: recursiveFileLookup nulled every ingest_day)
    assert feats.filter("ingest_day IS NULL").count() == 0
    assert set(
        r["ingest_day"] for r in feats.select("ingest_day").distinct()
        .collect()
    ) == set(pdf["ingest_day"].unique())
    # metrics: one idempotent batch_id dir per batch, three rows each
    mets = spark.read.parquet(os.path.join(out, "metrics"))
    assert mets.count() == 3 * res["batches"]
    assert mets.filter("metric = 'clips_in'").agg(
        {"value": "sum"}).collect()[0][0] == len(pdf)
    # split over streamed features == direct batch split
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    direct = identity_split(
        spark.createDataFrame(pdf[cols], CLIPS_SCHEMA).repartition(
            8, "clip_id"
        )
    ).collect()
    assert split_from_features(feats).collect() == direct

    # availableNow rerun from the checkpoint: nothing new to process
    res2 = stream_identity_features(spark, src, out, decode_counter=acc)
    assert res2["clips_in"] == 0 and acc.value == len(pdf)
