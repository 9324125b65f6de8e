"""Template-spam audit: one text pasted across many DISTINCT payloads.

The inverse of the label-noise audit (``label_noise.py``: same audio,
disagreeing captions).  Here the defect is the same CAPTION spanning
many genuinely different recordings — the scraped-corpus signature of
placeholder/template text ("no transcript available", an uploader's
boilerplate description, an SEO caption farm).  Keep-one dedup must NOT
collapse these rows (the audio differs!); they need the transcript
quarantined instead, which is why the audit counts distinct payload
WITNESSES per template rather than rows: exact re-uploads of one
recording share a payload digest and count as ONE witness, so honest
duplicate rows never masquerade as template spam.  The witness column
is the caller's dial — a byte digest is the cheap conservative choice
(codec re-encodes of one master still over-witness); pass the
codec-invariant spectral-fingerprint digest (``audio_dedup``) when the
corpus carries re-encode chains.

Engine shape: a projection computes the normalized-template MD5 and the
witness key (both fixed-width digests — payload bytes never shuffle),
then ONE groupBy on the template digest with a single distinct-count
(Catalyst rewrites it to partial-on-(template, witness) + final — two
narrow exchanges of digest pairs).  Output is O(#templates over the
support floor).  At 10^12 rows nothing wider than (16B, 16B, id)
crosses the wire.

Reference analog: none (no multimodal rows in the reference); the
closest shape is its duplicate-group scan (scanners.py) — this is that
scan keyed on one modality and witnessed by the other.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["normalize_template_col", "template_spam", "caption_spam"]


def normalize_template_col(text: Column) -> Column:
    """Whitespace-fold + trim + lowercase — the template identity law.

    ``[ \\t\\n\\r]+`` (not ``\\s``) so Java, RE2 and Python regex agree
    byte-for-byte on what folds; NULL text normalizes to ''.
    """
    return F.lower(
        F.trim(F.regexp_replace(F.coalesce(text, F.lit("")), "[ \t\n\r]+", " "))
    )


def template_spam(
    df: DataFrame,
    id_col: str,
    text_col: str,
    witness: Column | str,
    min_support: int = 5,
    min_witness: int = 3,
) -> DataFrame:
    """Per-template rows for texts repeated ``min_support``+ times::

        template_md5, template_head, n_rows, n_witness, sample_id, is_spam

    ``witness`` distinguishes genuinely different payloads (e.g. an
    audio-bytes digest, a source/site id).  ``is_spam`` fires when the
    template spans ``min_witness`` distinct witnesses — same text over
    ONE witness is ordinary duplication, not template spam.
    """
    w = F.col(witness) if isinstance(witness, str) else witness
    norm = normalize_template_col(F.col(text_col))
    t = df.select(
        F.col(id_col).alias("__id"),
        F.md5(norm.cast("binary")).alias("template_md5"),
        F.substring(norm, 1, 40).alias("__head"),
        w.alias("__wit"),
    )
    return (
        t.groupBy("template_md5")
        .agg(
            F.min("__head").alias("template_head"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.countDistinct("__wit").cast("long").alias("n_witness"),
            F.min("__id").alias("sample_id"),
        )
        .filter(F.col("n_rows") >= F.lit(int(min_support)))
        .withColumn(
            "is_spam", F.col("n_witness") >= F.lit(int(min_witness))
        )
        .orderBy("template_md5")
    )


def caption_spam(
    clips: DataFrame,
    min_support: int = 5,
    min_witness: int = 3,
) -> DataFrame:
    """Template-spam audit over the standard clips relation: templates
    keyed on the transcript, witnessed by the exact payload digest
    (md5(bytes) — re-encode chains of one master recording carry
    different bytes and may over-witness; run the fingerprint dedup
    first if byte-level witnesses are too generous for the corpus)."""
    return template_spam(
        clips,
        id_col="clip_id",
        text_col="transcript",
        witness=F.md5(F.col("bytes")),
        min_support=min_support,
        min_witness=min_witness,
    )
