"""Transcript-blocked audio dedup laws.

The pair relation is hash-checked end-to-end by the driver oracle;
these tests pin the cross-modal contract on the seeded corpus: every
same-caption re-encode pair is blocked AND audio-confirmed, relabeled
re-encodes are INVISIBLE to the text block (the documented tradeoff —
the label-noise audit covers that direction), and caption-collision
pairs surface as the script-reuse class (text matches, audio does not).
"""

from __future__ import annotations

import pytest

from data_quality_spark.operators.crossmodal_dedup import (
    transcript_blocked_pairs,
)
from data_quality_spark.synth import make_audio_dup_corpus


@pytest.fixture(scope="module")
def run(spark):
    from data_quality_spark.plans.schemas import CLIPS_SCHEMA

    pdf = make_audio_dup_corpus(240, seed=17, relabel_every=3)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    clips = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA)
    rows = {(r.id_a, r.id_b): r
            for r in transcript_blocked_pairs(clips).collect()}
    return pdf, rows


def test_parity_with_full_audio_matcher_on_same_caption_pairs(run, spark):
    """Blocking changes the CANDIDATE set, never the verdict: every
    seeded same-caption pair the full fingerprint matcher confirms must
    also be confirmed through the transcript block (and the audio BER
    agrees pairwise)."""
    from data_quality_spark.operators.audio_dedup import (
        clip_fingerprints,
        fingerprint_near_dup,
    )
    from data_quality_spark.plans.schemas import CLIPS_SCHEMA

    pdf, rows = run
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    clips = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA)
    full = {(r.id_a, r.id_b): r.ber
            for r in fingerprint_near_dup(clip_fingerprints(clips))
            .collect()}
    relabeled = set(
        pdf[pdf.defect.astype(str).str.contains("relabel", na=False)]
        .clip_id
    )
    txt = dict(zip(pdf.clip_id, pdf.transcript))
    seeded = [
        (c[:-3], c) for c in pdf.clip_id
        if c.endswith("_re") and c not in relabeled
        # the text block needs a shingle row: ≥ 3 tokens
        and len(str(txt[c]).split()) >= 3
    ]
    assert len(seeded) >= 20
    confirmed_by_full = [p for p in seeded if p in full]
    assert len(confirmed_by_full) >= 20
    missed = [p for p in confirmed_by_full
              if p not in rows or not rows[p].audio_match]
    assert missed == []
    for p in confirmed_by_full:
        assert rows[p].ber == pytest.approx(full[p])


def test_relabeled_pairs_invisible_to_text_block(run):
    pdf, rows = run
    relabeled = set(
        pdf[pdf.defect.astype(str).str.contains("relabel", na=False)]
        .clip_id
    )
    assert relabeled, "corpus must seed relabeled captions"
    for c in relabeled:
        assert (c[:-3], c) not in rows


def test_script_reuse_class_surfaces(run):
    pdf, rows = run
    reuse = [(p, r) for p, r in rows.items() if not r.audio_match]
    assert reuse, "caption collisions must surface as script-reuse rows"
    for p, r in reuse:
        assert r.jaccard >= 0.5
        assert r.ber is None or r.ber > 0.30
