"""Cross-modal label-noise audit: audio near-duplicates whose
TRANSCRIPTS disagree.

Two clips whose waveforms fingerprint as the same recording (re-encode /
re-scrape chains) must carry compatible captions; an audio-match with a
text-mismatch is label noise — typically the off-by-one (audio, caption)
alignment error of a scraped corpus — and exactly the rows a training
pipeline must quarantine BEFORE dedup resolution picks an arbitrary
survivor (keep-one would silently keep the wrong caption half the time).

Engine shape (all built-in Catalyst, no UDF):

1. the verified near-dup pair relation (``audio_dedup.fingerprint_near_dup``
   — signatures shuffle, never payloads);
2. two hash joins pair → per-side token SET (``array_distinct`` of the
   shared whitespace-token law from ``dedup.tokens_col``; the token arrays
   are projected away immediately after the Jaccard, so only (id, id, ber,
   jaccard, flag) survives the stage);
3. token-set Jaccard with the two-empty-sets-agree convention
   (``union == 0 → 1.0``: two silent clips with empty captions are NOT
   label noise).

At 10^12-clip scale the pair relation is tiny relative to the corpus
(bounded by bucket candidates), both joins hash on clip_id, and AQE may
broadcast the pair side — no new shuffle shape beyond the dedup path
itself.

Reference analog: none (no media in the reference); the closest shape is
its FK-consistency orphan scan — this is the same "two relations must
agree" audit applied across modalities of one row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import tokens_col

__all__ = ["transcript_mismatch", "label_issues", "clip_decontaminate"]


def transcript_mismatch(
    pairs: DataFrame,
    clips: DataFrame,
    id_col: str = "clip_id",
    text_col: str = "transcript",
    jaccard_max: float = 0.5,
) -> DataFrame:
    """Annotate near-dup ``pairs`` (id_a, id_b, ...) with the token-set
    Jaccard of the two sides' ``text_col``, the character-level edit
    distance (``F.levenshtein`` — the classic transcript-agreement
    metric, computed JVM-side on the few verified pairs, never on the
    corpus), and a ``label_mismatch`` flag (Jaccard < ``jaccard_max``).
    Pass-through columns of ``pairs`` (e.g. the verify stage's ``ber``)
    survive unchanged."""
    toks = F.array_distinct(tokens_col(F.col(text_col)))
    slim = clips.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.col(text_col).alias("__text"),
    )
    joined = (
        pairs
        .join(
            slim.select(F.col(id_col).alias("id_a"),
                        F.col("__toks").alias("__ta"),
                        F.col("__text").alias("__xa")),
            "id_a",
        )
        .join(
            slim.select(F.col(id_col).alias("id_b"),
                        F.col("__toks").alias("__tb"),
                        F.col("__text").alias("__xb")),
            "id_b",
        )
    )
    inter = F.size(F.array_intersect(F.col("__ta"), F.col("__tb")))
    union = F.size(F.array_union(F.col("__ta"), F.col("__tb")))
    jac = (
        F.when(union > 0, inter.cast("double") / union.cast("double"))
        .otherwise(F.lit(1.0))  # two empty captions agree
    )
    return (
        joined
        .withColumn("jaccard", jac)
        .withColumn(
            "edit_dist",
            F.levenshtein(F.col("__xa"), F.col("__xb")).cast("int"),
        )
        .withColumn("label_mismatch", F.col("jaccard") < F.lit(jaccard_max))
        .drop("__ta", "__tb", "__xa", "__xb")
    )


def label_issues(mismatch: DataFrame, table: str = "clips") -> DataFrame:
    """Issue relation over the annotated pair relation (reference issue
    schema, ONE fused aggregate): ``label_mismatch`` pairs out of all
    verified near-dup pairs."""
    wide = mismatch.agg(
        F.count(F.lit(1)).alias("__total__"),
        F.count(F.when(F.col("label_mismatch"), 1)).alias("n"),
    )
    cnt, total = F.col("n"), F.col("__total__")
    return wide.select(
        F.lit(table).alias("table"),
        F.lit("transcript").alias("column"),
        F.lit("label_mismatch").alias("issue_type"),
        cnt.alias("count"),
        total.alias("total"),
        F.when(total > 0, cnt * 100.0 / total).otherwise(F.lit(0.0))
        .cast("double").alias("percent"),
        F.when(cnt > 0, F.lit("warning")).otherwise(F.lit("info"))
        .alias("severity"),
        F.lit("audio near-duplicate pairs with disagreeing transcripts")
        .alias("description"),
    )


def clip_decontaminate(
    corpus: DataFrame,
    evals: DataFrame,
    *,
    ngram_n: int = 4,
    window: int = 3,
    stride: int = 1,
    ber_max: float = 0.30,
) -> DataFrame:
    """Cross-modal eval-set leakage audit: a corpus clip is ``leaked``
    when EITHER its audio near-matches an eval clip (spectral-fingerprint
    decontamination, robust to codec/gain re-encodes) OR its transcript
    shares a word ``ngram_n``-gram with an eval transcript (the GPT-3
    text rule).  Checking one modality is not enough — a re-encoded clip
    with a rewritten caption passes the text check, and a re-read of the
    same script passes the audio check; eval leakage only needs one
    channel.

    Returns one row per corpus clip: (clip_id, audio_hit, text_hit,
    leaked, n_matches, n_gram_hits, min_ber).

    Scale shape: both detectors broadcast the (small) eval side — eval
    fingerprints/buckets for audio, the deduped eval gram set for text —
    so the corpus never shuffles on anything wider than clip_id; the
    final join attaches the text-hit relation (contaminated ids only,
    tiny) to the audio relation, which AQE broadcasts.
    """
    from .audio_dedup import audio_decontaminate, clip_fingerprints
    from .quality_filters import decontaminate

    audio = audio_decontaminate(
        clip_fingerprints(corpus),
        clip_fingerprints(evals, shuffle=False),
        window=window,
        stride=stride,
        ber_max=ber_max,
    )
    text = decontaminate(
        corpus.select("clip_id", F.col("transcript").alias("text")),
        evals.select("clip_id", F.col("transcript").alias("text")),
        n=ngram_n,
        id_col="clip_id",
    )
    return audio.join(text, "clip_id", "left").select(
        "clip_id",
        F.col("contaminated").alias("audio_hit"),
        (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("text_hit"),
        (
            F.col("contaminated")
            | (F.coalesce(F.col("n_hits"), F.lit(0)) > 0)
        ).alias("leaked"),
        "n_matches",
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_gram_hits"),
        "min_ber",
    )
