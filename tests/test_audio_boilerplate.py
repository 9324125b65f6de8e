"""Cross-clip audio boilerplate (operators/audio_boilerplate.py)."""

from __future__ import annotations

import collections

from pyspark.sql import functions as F

from data_quality_spark.operators.audio_boilerplate import audio_boilerplate
from data_quality_spark.oracles import _audio_boilerplate_expected
from data_quality_spark.plans.schemas import CLIPS_SCHEMA
from data_quality_spark.synth import make_audio_jingle_corpus


def test_jingle_detection_laws(spark):
    """Detection quality + exact twin parity on the seeded corpus:

    - every jingle clip whose sr GROUP is large enough to reach the
      lexicon (min_clips distinct clips) is flagged — full recall on
      real corpus boilerplate;
    - jingle clips in tiny sr groups (2 clips at 44.1 kHz) are NOT
      flagged: two clips sharing an intro is a duplicate-pair question,
      not corpus boilerplate — the min_clips threshold is the
      definition, not a miss;
    - false flags are bounded (≤ 2) and barely over the line: synthetic
      sinusoid-mixture clips genuinely share peak structure, a property
      real speech corpora don't have;
    - Spark rows equal the twin exactly (all-int laws).
    """
    pdf = make_audio_jingle_corpus(300, seed=42, jingle_every=4)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    clips = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA).repartition(
        8, "clip_id"
    )
    got = {r["clip_id"]: r for r in audio_boilerplate(clips).collect()}
    exp = _audio_boilerplate_expected()
    assert len(got) == len(exp["clip_id"]) == 300
    for i, cid in enumerate(exp["clip_id"]):
        r = got[cid]
        for col in ("n_landmarks", "n_boiler", "boilerplate_heavy"):
            assert r[col] == exp[col][i], (cid, col)

    truth = dict(zip(pdf["clip_id"], pdf["defect"]))
    srs = dict(zip(pdf["clip_id"], pdf["sr_hz"]))
    group = collections.Counter(
        srs[c] for c, d in truth.items() if d == "jingle"
    )
    big_group_jingles = {
        c for c, d in truth.items()
        if d == "jingle" and group[srs[c]] >= 20
    }
    flagged = {c for c, r in got.items() if r["boilerplate_heavy"]}
    assert big_group_jingles <= flagged
    assert len(big_group_jingles) >= 60
    false_flags = flagged - {c for c, d in truth.items() if d == "jingle"}
    assert len(false_flags) <= 2, false_flags
    missed = {c for c, d in truth.items() if d == "jingle"} - flagged
    assert all(group[srs[c]] < 20 for c in missed), missed


def test_corpus_without_shared_intro_flags_nothing_new(spark):
    """With no seeded jingle the lexicon threshold suppresses all but
    the known tonal-collision tail (the same ≤2 bound)."""
    pdf = make_audio_jingle_corpus(200, seed=42, jingle_every=10**9)
    assert (pdf["defect"] != "jingle").all()
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    clips = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA).repartition(
        8, "clip_id"
    )
    flagged = audio_boilerplate(clips).filter(
        F.col("boilerplate_heavy")
    ).count()
    assert flagged <= 2
