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

__all__ = ["image_hashes", "image_near_pairs"]


def image_hashes(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    counter=None,
) -> DataFrame:
    """(id, dhash) for every decodable BMP payload; undecodable or
    too-small images are dropped (they have no perceptual content to
    compare — the audit relations own those defects)."""
    out_schema = T.StructType([
        T.StructField(id_col, T.StringType(), False),
        T.StructField("dhash", T.LongType(), False),
    ])

    def run(batches):
        import pandas as pd

        from ..functions.image import decode_bmp, dhash64

        for pdf in batches:
            if counter is not None:
                counter.add(len(pdf))
            ids, hashes = [], []
            for i in range(len(pdf)):
                payload = pdf[payload_col].iloc[i]
                if payload is None:
                    continue
                try:
                    h = dhash64(decode_bmp(bytes(payload)))
                except ValueError:
                    continue
                ids.append(pdf[id_col].iloc[i])
                hashes.append(h)
            yield pd.DataFrame({id_col: ids, "dhash": hashes})

    return media.mapInPandas(run, out_schema)


def image_near_pairs(
    hashes: DataFrame,
    id_col: str = "media_id",
    max_hamming: int = 3,
    max_bucket_size: int = 256,
) -> DataFrame:
    """Pairs with Hamming(dhash) ≤ ``max_hamming`` — delegates to the
    SimHash chunk-banding machinery (same signature relation, same
    recall guarantee, same skew guard)."""
    sigs = hashes.select(F.col(id_col), F.col("dhash").alias("simhash"))
    return simhash_near_pairs(
        sigs, id_col, max_hamming=max_hamming,
        max_bucket_size=max_bucket_size,
    )
