"""Checkpointed identity-feature extraction (run_identity_pipeline).

The decode-heavy half of the union-of-axes split under the shared
lineage law: kill/resume without recompute (accumulator-proven), per-day
evidence metrics on the one write action, and the product law —
``split_from_features`` over the WRITTEN tables equals the direct
``identity_split``, so re-splitting costs zero decode.
"""

from __future__ import annotations

import os

import pytest

from data_quality_spark.operators.audio_identity import (
    identity_split,
    split_from_features,
)
from data_quality_spark.plans.schemas import CLIPS_SCHEMA
from data_quality_spark.runner import run_identity_pipeline, write_clips
from data_quality_spark.sources.io import read_metrics
from data_quality_spark.synth import make_audio_identity_corpus


@pytest.fixture(scope="module")
def ident_path(spark, tmp_path_factory):
    pdf = make_audio_identity_corpus(42)
    path = str(tmp_path_factory.mktemp("ident") / "bronze")
    write_clips(spark, pdf, path)
    return path


def test_kill_resume_and_split_product(spark, ident_path, tmp_path_factory):
    pdf = make_audio_identity_corpus(42)
    n = len(pdf)
    out = str(tmp_path_factory.mktemp("out") / "ident")
    counter = spark.sparkContext.accumulator(0)
    # two ingest days in the corpus: kill after the first
    r1 = run_identity_pipeline(
        spark, ident_path, out, days_per_batch=1,
        fail_after_batches=1, decode_counter=counter,
    )
    assert not r1["completed"] and r1["days"] == 1
    assert counter.value == r1["clips_in"] < n
    r2 = run_identity_pipeline(
        spark, ident_path, out, decode_counter=counter
    )
    assert r2["completed"] and r2["skipped"] == 1
    assert counter.value == n  # pending day only — zero recompute
    assert r1["clips_in"] + r2["clips_in"] == n

    feats = spark.read.parquet(os.path.join(out, "identity"))
    assert feats.count() == n
    # evidence tallies: all voiced-session clips have both kinds;
    # mu00/mu01 have neither
    assert r1["ch_ok"] + r2["ch_ok"] == n - 2
    assert r1["vo_ok"] + r2["vo_ok"] == n - 2
    m = read_metrics(spark, out).toPandas()
    assert int(m[m["metric"] == "clips_in"]["value"].sum()) == n
    assert (m["metric"] == "clips_per_sec").any()

    # product law: split over the checkpointed features == direct split
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    direct = identity_split(
        spark.createDataFrame(pdf[cols], CLIPS_SCHEMA).repartition(
            8, "clip_id"
        )
    ).collect()
    from_ckpt = split_from_features(feats).collect()
    assert from_ckpt == direct

    # noop resume
    r3 = run_identity_pipeline(spark, ident_path, out)
    assert r3["days"] == 0 and r3["skipped"] == 2
