"""Transcript-blocked audio dedup (cross-modal candidate generation).

At 10^12 clips the expensive part of audio dedup is the AUDIO side —
decode + fingerprint + the spacing/window bucket joins.  But clip +
transcript corpora carry a second, far cheaper blocking key: two
re-uploads of the same recording almost always share (near-)identical
TRANSCRIPTS.  This operator blocks on transcript MinHash-LSH buckets
(the existing text machinery, signatures ≈ 0.5 KB/clip) and spends
audio evidence — the fingerprint bit-error rate — ONLY on the blocked
pair set:

    candidates = minhash_lsh_pairs(transcripts)      # cheap, text-only
    verified   = BER(fingerprints) ≤ ber_max on candidates only

The trade is explicit and reported as DATA, not hidden: pairs whose
transcripts diverge (relabeled captions, empty transcripts) are
invisible to the text block — exactly the set the cross-modal
label-noise audit exists to catch from the other direction.  The
companion query compares blocked recall against the full audio-blocked
matcher per seeded defect class.

Scale shape: one text-signature pass + banded bucket join (the LSH
shape used corpus-wide), then fingerprints join ONLY the candidate
pairs — the audio relation is never self-joined.  For corpora where
the transcript block's recall tradeoff is acceptable, the audio-side
bucket machinery (and its shuffles) disappears entirely.

Reference analog: none — composes the dedup family (SURVEY §2) across
modalities.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .audio_dedup import ber_col, clip_fingerprints
from .dedup import minhash_lsh_pairs

__all__ = ["transcript_blocked_pairs"]

XMODAL_BER_MAX = 0.30   # same audio-identity cut as fingerprint_near_dup


def transcript_blocked_pairs(
    clips: DataFrame,
    text_threshold: float = 0.5,
    ber_max: float = XMODAL_BER_MAX,
) -> DataFrame:
    """(id_a, id_b, jaccard, ber, audio_match): transcript-LSH blocked
    candidates with the audio fingerprint BER verdict.  ``audio_match``
    is the audio-identity decision; pairs with matching transcripts but
    non-matching audio are returned too (they are the prompt-reuse /
    same-script-different-recording class, itself curation signal)."""
    cand = minhash_lsh_pairs(
        clips.select(F.col("clip_id"), F.col("transcript").alias("text")),
        "clip_id",
        "text",
        verify_threshold=text_threshold,
    ).select(
        F.col("id_a").cast("string").alias("id_a"),
        F.col("id_b").cast("string").alias("id_b"),
        "jaccard",
    )
    fps = clip_fingerprints(clips).select(
        F.col("clip_id").alias("__vid"), F.col("fp").alias("__vf"))
    ber = ber_col("__fa", "__fb")  # the SHARED audio-identity verify law
    n = F.least(F.size("__fa"), F.size("__fb"))  # evaluable-pair guard
    return (
        cand.join(fps.select(F.col("__vid").alias("id_a"),
                             F.col("__vf").alias("__fa")), "id_a")
        .join(fps.select(F.col("__vid").alias("id_b"),
                         F.col("__vf").alias("__fb")), "id_b")
        .withColumn("__n", n)
        .withColumn("ber", F.when(F.col("__n") > 0, ber))
        .withColumn(
            "audio_match",
            F.coalesce(F.col("ber") <= F.lit(ber_max), F.lit(False)),
        )
        .select("id_a", "id_b", "jaccard", "ber", "audio_match")
    )
