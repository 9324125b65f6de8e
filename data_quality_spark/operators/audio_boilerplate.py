"""Cross-clip audio boilerplate: intros/jingles/outros shared by many
clips — the audio analog of C4 frequent-LINE removal.

A scraped podcast or channel corpus repeats the same few seconds of
branding audio across thousands of clips; per-clip statistics can't see
it (each clip looks healthy) and pairwise dedup shouldn't collapse the
clips (the content differs).  The detector builds a LEXICON of landmark
hashes (``functions.spectral.constellation_landmarks`` — the offset-free
Shazam-style peak-pair hashes the excerpt matcher trusts) that appear in
at least ``min_clips`` DISTINCT clips, then scores every clip by the
fraction of its landmark occurrences that fall in the lexicon.

Engine shape (identical to ``quality_filters.boilerplate_ngrams``):

1. one landmark ``mapInArrow`` pass (payload dies at the boundary —
   only (clip_id, hash) pairs ever shuffle);
2. lexicon = groupBy(hash) + count_distinct(clip_id) ≥ min_clips —
   partial aggregation before the one hash-keyed exchange; the hash
   space is 23 bits so the lexicon is bounded and BROADCASTS;
3. per-clip mass via a broadcast semi-join + one clip-keyed count —
   the corpus never shuffles on anything wider than clip_id.

The flag is exact-integer: ``n_boiler · DEN > NUM · n_landmarks``.
Clips with zero landmarks (undecodable, silent) are never flagged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .audio_dedup import clip_landmarks

__all__ = [
    "boilerplate_lexicon",
    "boilerplate_audio_mass",
    "audio_boilerplate",
    "BOILER_NUM",
    "BOILER_DEN",
]

# boilerplate-heavy iff n_boiler/n_landmarks > 1/7 (cross-multiplied;
# measured on the seeded jingle corpus at min_clips=20: every jingle
# clip's mass ≥ 0.153, every natural clip's ≤ 0.136 — the threshold
# splits the classes with margin on both sides)
BOILER_NUM = 1
BOILER_DEN = 7


def boilerplate_lexicon(
    lm_df: DataFrame, min_clips: int = 20
) -> DataFrame:
    """(h, n_clips) for every landmark hash in ≥ ``min_clips`` distinct
    clips."""
    exploded = lm_df.select(
        "clip_id", F.explode("lm").alias("l")
    ).select("clip_id", F.col("l.h").alias("h"))
    return (
        exploded.groupBy("h")
        .agg(F.count_distinct("clip_id").cast("long").alias("n_clips"))
        .filter(F.col("n_clips") >= F.lit(min_clips))
    )


def boilerplate_audio_mass(
    lm_df: DataFrame, lexicon: DataFrame
) -> DataFrame:
    """Per-clip boilerplate landmark occurrences + exact-integer flag."""
    exploded = lm_df.select(
        "clip_id", F.explode("lm").alias("l")
    ).select("clip_id", F.col("l.h").alias("h"))
    hits = exploded.join(
        F.broadcast(lexicon.select("h")), "h", "left_semi"
    )
    per_clip = hits.groupBy("clip_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_boiler")
    )
    return (
        lm_df.select("clip_id", "n_landmarks")
        .join(per_clip, "clip_id", "left")
        .withColumn("n_boiler", F.coalesce("n_boiler", F.lit(0)))
        .withColumn(
            "boilerplate_heavy",
            (F.col("n_landmarks") > 0)
            & (F.col("n_boiler") * F.lit(BOILER_DEN)
               > F.lit(BOILER_NUM) * F.col("n_landmarks")),
        )
    )


def audio_boilerplate(
    clips: DataFrame, min_clips: int = 20, counter=None
) -> DataFrame:
    """End-to-end: landmarks → lexicon → per-clip mass.  The landmark
    relation is persisted across its two consumers (lexicon + mass) so
    decode runs exactly once per clip — the same execute-once law as
    the fingerprint near-dup DAG."""
    # persist: the landmark relation feeds BOTH the lexicon aggregate and
    # the mass join — without it the decode+FFT pass re-executes per
    # consumer (the same execute-once law the fingerprint near-dup DAG
    # learned in round 3); the cached rows are (id, hash-array) scalars,
    # never payloads
    lm = clip_landmarks(clips, counter=counter).persist()
    lex = boilerplate_lexicon(lm, min_clips=min_clips)
    return boilerplate_audio_mass(lm, lex)
