"""Multimodal binary-column plumbing: opaque media bytes + typed metadata →
Arrow-batched feature extraction via ``mapInPandas``.

The training-pipeline pattern: image/audio/video payloads travel as a
``binary`` column with a ``kind`` discriminator and a string metadata map;
per-modality kernels decode and emit fixed-width feature rows.  The audio
path is REAL (the numpy codecs in ``functions.audio``); the image and
video paths are REAL for the uncompressed formats a from-spec numpy codec
can own (24-bit BMP; the RVID raw-frame container — ``functions.image``).
Compressed formats (JPEG/PNG/H.264) need codec libraries absent from this
environment and stay STUBBED: ``fake=False`` raises ``NotImplementedError``
for them, ``fake=True`` produces deterministic pseudo-features from the
payload hash so the plumbing — schema, partitioning, mapInPandas batch
shape, Arrow transfer — is exercised for any payload.

Scale notes: one ``mapInPandas`` pass, payload crosses the JVM↔Python
boundary exactly once; ``spark.sql.execution.arrow.maxRecordsPerBatch``
bounds per-batch memory for large payloads; output drops the payload column
so the shuffle (if any) moves features, not media bytes.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "MEDIA_FEATURES_SCHEMA",
    "decode_image",
    "sample_video_frames",
    "extract_media_features",
]

N_FEATURES = 8

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # audio | image | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

MEDIA_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("ok", T.BooleanType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


def _fake_features(payload: bytes, salt: str) -> np.ndarray:
    """Deterministic pseudo-features from the payload digest: stable across
    processes/executors, so tests can assert exact values."""
    digest = hashlib.sha256(salt.encode() + (payload or b"")).digest()
    raw = np.frombuffer(digest[: N_FEATURES * 4], dtype="<u4").astype(np.float64)
    return raw / np.float64(2**32)


def decode_image(payload: bytes, meta: dict | None, fake: bool = False) -> np.ndarray:
    """REAL for uncompressed 24-bit BMP (from-spec numpy codec,
    ``functions.image``): decode → exact-integer channel/luma statistics.
    Compressed formats (JPEG/PNG/…) need codec libraries absent from this
    sandbox and remain stubbed: ``fake=True`` returns the deterministic
    digest features, ``fake=False`` raises for non-BMP payloads."""
    if payload and payload[:2] == b"BM":
        from .image import decode_bmp, image_features

        return image_features(decode_bmp(payload))
    if fake:
        return _fake_features(payload, "image")
    raise NotImplementedError(
        "compressed-image decode requires a codec library not present "
        "in this sandbox (uncompressed 24-bit BMP is decoded natively)"
    )


def sample_video_frames(
    payload: bytes, meta: dict | None, fake: bool = False
) -> np.ndarray:
    """REAL for the RVID raw-video container (``functions.image``):
    sample ≤3 evenly-spaced frames, average their per-frame image
    features.  Compressed video stays stubbed (``fake=True`` digest
    features, else NotImplementedError)."""
    if payload and payload[:4] == b"RVID":
        from .image import decode_rvid_frames, image_features

        frames = decode_rvid_frames(payload, sample_k=3)
        feats = np.stack([image_features(f) for f in frames])
        return feats.sum(axis=0) / float(feats.shape[0])
    if fake:
        return _fake_features(payload, "video")
    raise NotImplementedError(
        "compressed-video decode requires a codec library not present "
        "in this sandbox (the RVID raw container is decoded natively)"
    )


def _audio_features(payload: bytes, meta: dict | None) -> np.ndarray:
    """REAL path: decode via the numpy codecs and emit
    [rms_db, peak_db, silence_frac, clip_frac, n_samples, sr, dur_s, 0]."""
    from . import audio as A

    meta = meta or {}
    codec = meta.get("codec", "pcm16")
    sr = int(meta.get("sr_hz", "16000"))
    pcm = A.decode_clip(payload, codec, sr)
    st = A.clip_stats(pcm, sr)
    return np.array(
        [
            st["rms_db"] if st["rms_db"] is not None else -120.0,
            st["peak_db"] if st["peak_db"] is not None else -120.0,
            st["silence_frac"] if st["silence_frac"] is not None else 1.0,
            st["clip_frac"] if st["clip_frac"] is not None else 0.0,
            float(st["n_samples"]),
            float(sr),
            float(st["n_samples"]) / sr if sr > 0 else 0.0,
            0.0,
        ],
        dtype=np.float64,
    )


def extract_media_features(df: DataFrame, fake_decode: bool = False) -> DataFrame:
    """mapInPandas over a MEDIA_SCHEMA frame → MEDIA_FEATURES_SCHEMA.

    ``fake_decode=True`` routes image/video through the deterministic stub
    (audio is always real).  Unknown kinds and decode failures yield
    ok=False with a NULL feature vector instead of failing the task.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "ok": np.zeros(len(pdf), dtype=bool),
                "n_bytes": np.zeros(len(pdf), dtype=np.int64),
                "feature": [None] * len(pdf),
            }
            for i in range(len(pdf)):
                payload = pdf["payload"].iloc[i]
                payload = bytes(payload) if payload is not None else b""
                out["n_bytes"][i] = len(payload)
                kind = pdf["kind"].iloc[i]
                meta = pdf["meta"].iloc[i]
                meta = dict(meta) if meta is not None else {}
                try:
                    if kind == "audio":
                        feats = _audio_features(payload, meta)
                    elif kind == "image":
                        feats = decode_image(payload, meta, fake=fake_decode)
                    elif kind == "video":
                        feats = sample_video_frames(payload, meta, fake=fake_decode)
                    else:
                        continue
                except (ValueError, NotImplementedError):
                    continue
                out["ok"][i] = True
                out["feature"][i] = feats.tolist()
            yield pd.DataFrame(out)

    return df.mapInPandas(run, MEDIA_FEATURES_SCHEMA)
