"""Contrastive triplet mining over the acoustic identity machinery.

Speaker-embedding and audio-representation training (GE2E, SimCLR-style
contrastive objectives) consumes (anchor, positive, negative) TRIPLETS,
and the quality of the negatives decides what the model learns: random
negatives are trivially separable (different pitch, different room —
the model learns pitch, not voice), while HARD negatives — same pitch
class, different vocal tract — force the envelope representation the
verifier actually needs.

This miner reuses the identity operators' own candidate machinery as
the negative sampler, keying on the log2-F0 double grid ALONE
(``f0_keyed`` — the voice operator's pitch axis without the tilt
split):

- a bucket now means "same pitch class";
- candidates under ``DIST2_MAX`` on the exact left-fold envelope
  distance are same-voice → the anchor's POSITIVE pool (different
  utterance, same speaker);
- candidates AT or ABOVE the threshold are pitch-matched different
  voices → exactly the hard-negative class, with the distance itself
  as the hardness measure.

Per anchor the triplet takes the CLOSEST member of each pool
(min (dist2, id) — deterministic under ties), and the emitted
``margin = neg_dist2 - pos_dist2`` is the anchor's metric-learning
slack as data: a reviewer (or a curriculum scheduler) reads the
hardest anchors straight off the relation.

Engine shape: one bucket self-join (bounded by the shared
``max_bucket`` skew guard), a cheap symmetrize union, ONE
partial/final aggregate on the anchor id (conditional struct-min for
both pools in the same pass), no payload ever shuffles — profiles are
~128 B.  At 10^12 clips the pair space is bucket-bounded exactly like
the dedup/identity family.

The synthetic corpus needs the confuser class to exist:
``make_audio_voice_corpus(pitch_twins=k)`` emits pitch-matched twin
speakers (same base F0, displaced formants) — measured on the query
corpus: same-speaker candidates ≤ 0.19, twin candidates ≥ 21.9 vs the
1.0 threshold, so no decision sits near the float boundary.

Reference analog: none (the reference stops at accept/reject); this is
the training-pair producer a representation-learning pipeline bolts on
after the gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.voice import DIST2_MAX
from .audio_channel import bucket_candidate_pairs
from .audio_voice import clip_voice_profile

__all__ = ["f0_keyed", "voice_triplets"]


def f0_keyed(profiles: DataFrame) -> DataFrame:
    """(clip_id, prof, grid, cell, family): the log2-F0 double grid
    alone (grids 0/1, family fixed 0) — buckets are pitch classes, so
    candidates mix same-voice and pitch-matched different-voice pairs
    (the point, unlike ``voice_keyed`` whose tilt split is designed to
    keep confusers out)."""
    return profiles.where(F.col("ok")).select(
        "clip_id",
        "prof",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("grid"),
                         F.col("fc0").alias("cell"),
                         F.lit(0).alias("family")),
                F.struct(F.lit(1).alias("grid"),
                         F.col("fc1").alias("cell"),
                         F.lit(0).alias("family")),
            )
        ).alias("k"),
    ).select(
        "clip_id", "prof",
        F.col("k.grid").alias("grid"),
        F.col("k.cell").alias("cell"),
        F.col("k.family").alias("family"),
    )


def voice_triplets(
    df: DataFrame,
    max_bucket: int = 64,
    dist2_max: float = DIST2_MAX,
    decimals: int = 6,
) -> DataFrame:
    """(anchor, positive, pos_dist2_r, negative, neg_dist2_r, margin_r)
    — one row per clip that has BOTH a same-voice partner and a
    pitch-matched different-voice confuser in its buckets.  Anchors
    lacking either pool emit nothing: a triplet loss needs all three
    legs, and fabricating easy negatives would poison the batch."""
    prof = clip_voice_profile(df)
    cand = bucket_candidate_pairs(f0_keyed(prof), max_bucket)
    fwd = cand.select(
        F.col("id_a").alias("anchor"), F.col("id_b").alias("other"),
        "dist2",
    )
    rev = cand.select(
        F.col("id_b").alias("anchor"), F.col("id_a").alias("other"),
        "dist2",
    )
    sym = fwd.unionByName(rev)
    is_pos = F.col("dist2") < F.lit(float(dist2_max))
    agg = sym.groupBy("anchor").agg(
        F.min(F.when(is_pos, F.struct("dist2", "other"))).alias("p"),
        F.min(F.when(~is_pos, F.struct("dist2", "other"))).alias("n"),
    ).where(F.col("p").isNotNull() & F.col("n").isNotNull())
    return agg.select(
        "anchor",
        F.col("p.other").alias("positive"),
        F.round("p.dist2", decimals).alias("pos_dist2_r"),
        F.col("n.other").alias("negative"),
        F.round("n.dist2", decimals).alias("neg_dist2_r"),
        F.round(F.col("n.dist2") - F.col("p.dist2"), decimals)
        .alias("margin_r"),
    )
