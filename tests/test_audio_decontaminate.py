"""Audio eval-set decontamination contract."""

from __future__ import annotations

import pytest

from data_quality_spark.plans.schemas import CLIPS_SCHEMA


@pytest.mark.usefixtures("spark")
class TestAudioDecontaminate:
    def test_ground_truth_recovery(self, spark):
        """The eval set is built as re-encodes of known corpus clips, so
        ground truth is exact: every clip with a re-encode in the eval
        set is contaminated, every other clip is clean."""
        from data_quality_spark.operators.audio_dedup import (
            audio_decontaminate,
            clip_fingerprints,
        )
        from data_quality_spark.synth import make_audio_dup_corpus

        pdf = make_audio_dup_corpus(300, seed=9)
        cols = [f.name for f in CLIPS_SCHEMA.fields]
        is_re = pdf["clip_id"].str.endswith("_re")
        corpus = spark.createDataFrame(pdf[~is_re][cols], CLIPS_SCHEMA)
        evals = spark.createDataFrame(pdf[is_re][cols], CLIPS_SCHEMA)
        out = audio_decontaminate(
            clip_fingerprints(corpus),
            clip_fingerprints(evals, shuffle=False),
        ).toPandas().set_index("clip_id")
        truth = {c[:-len("_re")] for c in pdf[is_re]["clip_id"]}
        flagged = set(out[out["contaminated"]].index)
        assert truth == flagged  # full recall, zero false positives
        assert (out.loc[sorted(truth), "min_ber"] <= 0.30).all()
        assert out.loc[sorted(set(out.index) - truth), "min_ber"].isna().all()
        # every corpus clip reports exactly one row
        assert len(out) == int((~is_re).sum())

    def test_broadcast_no_corpus_shuffle(self, spark):
        """The eval side broadcasts; the corpus fingerprint relation must
        not gain an Exchange beyond clip_fingerprints' own repartition."""
        from data_quality_spark.operators.audio_dedup import (
            audio_decontaminate,
            clip_fingerprints,
        )
        from data_quality_spark.synth import make_audio_dup_corpus

        pdf = make_audio_dup_corpus(60, seed=3)
        cols = [f.name for f in CLIPS_SCHEMA.fields]
        is_re = pdf["clip_id"].str.endswith("_re")
        corpus = spark.createDataFrame(pdf[~is_re][cols], CLIPS_SCHEMA)
        evals = spark.createDataFrame(pdf[is_re][cols], CLIPS_SCHEMA)
        plan = audio_decontaminate(
            clip_fingerprints(corpus, shuffle=False),
            clip_fingerprints(evals, shuffle=False),
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_clip_decontaminate_cross_modal(spark):
    """Either-modality leakage: relabeled re-encodes are audio-only hits;
    the bases whose captions they stole become text-only hits."""
    from data_quality_spark.operators.label_noise import clip_decontaminate
    from data_quality_spark.plans.schemas import CLIPS_SCHEMA
    from data_quality_spark.synth import make_audio_dup_corpus

    pdf = make_audio_dup_corpus(400, seed=42, relabel_every=3)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    is_re = pdf["clip_id"].str.endswith("_re")
    corpus = spark.createDataFrame(pdf[~is_re][cols], CLIPS_SCHEMA)
    evals = spark.createDataFrame(pdf[is_re][cols], CLIPS_SCHEMA)
    out = {r["clip_id"]: r for r in clip_decontaminate(corpus, evals).collect()}

    assert len(out) == int((~is_re).sum())  # one row per corpus clip
    combos = {(r["audio_hit"], r["text_hit"]) for r in out.values()}
    # all four quadrants must exist on the relabeled corpus
    assert {(True, True), (True, False), (False, True),
            (False, False)} <= combos
    for r in out.values():
        assert r["leaked"] == (r["audio_hit"] or r["text_hit"])
        if not r["audio_hit"]:
            assert r["n_matches"] == 0 and r["min_ber"] is None
        if r["text_hit"]:
            assert r["n_gram_hits"] > 0
    # every base whose re-encode kept its caption is leaked via audio
    dup_bases = {c[:-3] for c in pdf[is_re]["clip_id"]}
    hit_rate = sum(1 for b in dup_bases if b in out and out[b]["leaked"])
    assert hit_rate == len(dup_bases & set(out))
