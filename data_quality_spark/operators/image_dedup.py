"""Image near-duplicate detection: perceptual dHash + banded Hamming join.

Completes the dedup triad — text (MinHash/SimHash), audio (spectral
fingerprints), and now images: re-encodes, slight brightness shifts,
and small pixel-level noise survive a crawl as distinct bytes but hash
to nearly-identical dHashes.  The pipeline is the proven SimHash shape:

1. one ``mapInPandas`` decode pass → 64-bit dHash per image (payload
   dies at this boundary — at corpus scale the ONLY thing that ever
   shuffles is 8 bytes per image);
2. the dHash relation reuses ``dedup.simhash_near_pairs`` verbatim
   (Manku 4×16-bit chunk banding: full recall at Hamming ≤ 3 by
   pigeonhole, hot-bucket guard for degenerate flat images).

Reference analog: none (no media in the reference); the engine shape is
the same bucket-join family as its duplicate scans, applied to a
perceptual key.  dHash itself is the public difference-hash scheme.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .dedup import simhash_near_pairs

__all__ = ["image_hashes", "image_near_pairs", "build_image_index",
           "image_probe_index"]


_HASH_METHODS = ("dhash", "ahash", "phash")


def image_hashes(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    method: str = "dhash",
    counter=None,
) -> DataFrame:
    """(id, <method>) for every decodable BMP payload; undecodable or
    too-small images are dropped (they have no perceptual content to
    compare — the audit relations own those defects).

    ``method`` picks the perceptual family: ``dhash`` (gradient signs),
    ``ahash`` (cell-vs-global mean), or ``phash`` (fixed-point DCT
    low-frequency signs — invariant to uniform brightness shifts by
    construction, the strongest of the three against re-encode noise).
    All three are integer-exact, so whichever fills the column the
    pure-Python twin reproduces it bit-for-bit."""
    if method not in _HASH_METHODS:
        raise ValueError(f"unknown image hash method: {method!r}")
    out_schema = T.StructType([
        T.StructField(id_col, T.StringType(), False),
        T.StructField(method, T.LongType(), False),
    ])

    def run(batches):
        import pandas as pd

        from ..functions import image as I

        hash_fn = {"dhash": I.dhash64, "ahash": I.ahash64,
                   "phash": I.phash64}[method]
        for pdf in batches:
            if counter is not None:
                counter.add(len(pdf))
            ids, hashes = [], []
            for i in range(len(pdf)):
                payload = pdf[payload_col].iloc[i]
                if payload is None:
                    continue
                try:
                    h = hash_fn(I.decode_bmp(bytes(payload)))
                except ValueError:
                    continue
                ids.append(pdf[id_col].iloc[i])
                hashes.append(h)
            yield pd.DataFrame({id_col: ids, method: hashes})

    return media.mapInPandas(run, out_schema)


def build_image_index(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    method: str = "phash",
    counter=None,
) -> DataFrame:
    """The stored image near-dup index: one 64-bit perceptual hash per
    decodable image (8 B/row) — the image analog of
    ``dedup.build_lsh_index`` / ``audio_dedup.build_audio_index``.  The
    hash IS the exact-identity key (hamming 0), so there is nothing
    extra to store."""
    return image_hashes(media, id_col, payload_col, method, counter)


def image_probe_index(
    new_media: DataFrame,
    index_df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    hash_col: str = "phash",
    max_hamming: int = 3,
    max_bucket_size: int = 256,
    counter=None,
    index_entries_df: DataFrame | None = None,
    index_stats_df: DataFrame | None = None,
) -> DataFrame:
    """Incremental image near-dup: NEW images hashed (the increment's
    only decode) and probed against a STORED hash index via the shared
    SimHash chunk-band law — (new_id, index_id, hamming), NEW×INDEX
    collisions only, index-side bucket guard, equal hashes pairing at
    hamming 0 regardless of bucket heat
    (``dedup.simhash_probe_index``).  Stored entries/stats relations
    (``dedup.simhash_index_entries`` / ``simhash_index_bucket_stats``
    over the hash index) pass straight through for the
    zero-per-probe-aggregate scale shape."""
    from .dedup import simhash_probe_index

    new_h = image_hashes(
        new_media, id_col, payload_col, hash_col, counter
    ).select(F.col(id_col), F.col(hash_col).alias("simhash"))
    idx = index_df.select(F.col(id_col), F.col(hash_col).alias("simhash"))
    return simhash_probe_index(
        new_h, idx, id_col=id_col, max_hamming=max_hamming,
        max_bucket_size=max_bucket_size,
        index_entries_df=index_entries_df,
        index_stats_df=index_stats_df,
    )


def image_near_pairs(
    hashes: DataFrame,
    id_col: str = "media_id",
    hash_col: str = "dhash",
    max_hamming: int = 3,
    max_bucket_size: int = 256,
) -> DataFrame:
    """Pairs with Hamming(``hash_col``) ≤ ``max_hamming`` — delegates to
    the SimHash chunk-banding machinery (same signature relation, same
    recall guarantee, same skew guard)."""
    sigs = hashes.select(F.col(id_col), F.col(hash_col).alias("simhash"))
    return simhash_near_pairs(
        sigs, id_col, max_hamming=max_hamming,
        max_bucket_size=max_bucket_size,
    )
