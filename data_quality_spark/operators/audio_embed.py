"""Noise-robust audio near-dup via log-mel profile embeddings.

Closes the measured gap the noise-robustness curve exposed
(``audio_noise_robustness``): spectral fingerprints are re-encode-
invariant by DESIGN and collapse to ~0 recall under additive broadband
noise, and constellation landmarks recover only 80-95%.  The mel path is
the invariance class built for that axis — long-term spectral SHAPE
survives noise that destroys frame-level hashes:

1. **Embed** (one ``mapInArrow`` decode): per clip, the time-mean log-mel
   band profile (N_MELS doubles), its CENTERED form (profile − its own
   mean — removes the log noise-floor offset that otherwise makes every
   pair look similar), the centered norm, the temporal variance (the
   stationarity signal), and the full mel sequence bytes for the verify
   stage.  Payload bytes die at the stage boundary.
2. **Candidates**: multi-table sign-random-projection buckets over the
   centered profile (OR across tables recovers the recall a single
   SRP table loses on ~40°-apart twins), hot-bucket guard, then a
   JVM-side profile NCC prune (sequential ``aggregate`` fold —
   bit-identical to the twin's plain-Python fold).
3. **Verify**: trajectory NCC over the aligned mel SEQUENCES (noise
   twins are time-aligned by construction) in one vectorized Arrow
   batch kernel.  Pairs whose clips have almost no temporal structure
   get the ``stationary`` evidence grade — two steady tones in the same
   band ARE spectral duplicates; reported as data, never silently
   dropped or silently kept (the pitch-dup matcher's convention).

Measured on the seeded noise corpus (120 base clips, twins at
20/10/5 dB): twin recall 37/37 at (profile ≥ 0.75, trajectory ≥ 0.65);
every distinct-pair collision in 1500 sampled pairs carries the
``stationary`` grade.

Scale shape: profiles are ~0.5 KB/clip — the candidate stage shuffles
those, never audio; the verify join moves mel sequences only for
guarded-bucket candidates.  (At 10^12 clips the sequence column is the
knob: drop it from the embed relation and re-derive per candidate via
the storage-direct path.)
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.mel import N_MELS
from .similarity import _hyperplanes, bucket_col

__all__ = [
    "clip_mel_profiles", "embed_near_dup",
    "PROFILE_NCC_MIN", "TRAJ_NCC_MIN", "STATIONARY_VAR",
    "EMBED_TABLES", "EMBED_BITS", "EMBED_SEED",
]

PROFILE_NCC_MIN = 0.75   # candidate prune: centered-profile cosine
TRAJ_NCC_MIN = 0.65      # verify: aligned mel-sequence correlation
STATIONARY_VAR = 1.0     # temporal variance under this → 'stationary'
EMBED_TABLES = 6         # SRP tables (OR across tables)
EMBED_BITS = 6           # sign bits per table
EMBED_SEED = 97


def _profile_stats(m: np.ndarray):
    """(profile, centered, norm, tvar) — fixed numpy expressions shared
    verbatim with the differential twin."""
    n = float(m.shape[0])
    profile = m.sum(axis=0) / n
    centered = profile - (profile.sum() / float(profile.size))
    norm = float(np.sqrt((centered * centered).sum()))
    tvar = float(((m - profile) ** 2).sum() / float(m.size))
    return profile, centered, norm, tvar


def traj_ncc(a: np.ndarray, b: np.ndarray) -> float:
    """Aligned trajectory correlation of two mel sequences (shared with
    the twin): truncate to the shorter, mean-center the flattened
    frames, normalized dot."""
    n = min(a.shape[0], b.shape[0])
    if n == 0:
        return 0.0
    x = a[:n].ravel()
    y = b[:n].ravel()
    x = x - (x.sum() / float(x.size))
    y = y - (y.sum() / float(y.size))
    den = float(np.sqrt((x * x).sum() * (y * y).sum()))
    return float((x * y).sum() / den) if den > 0 else 0.0


def clip_mel_profiles(df: DataFrame, counter=None) -> DataFrame:
    """(clip_id, ok, n_frames, profile, centered, norm, tvar, feat) —
    one decode per clip; payload dead at the boundary."""
    col_idx = {f.name: i for i, f in enumerate(df.schema.fields)}
    out_schema = T.StructType([
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("ok", T.BooleanType(), False),
        T.StructField("n_frames", T.IntegerType(), False),
        T.StructField("profile", T.ArrayType(T.DoubleType()), False),
        T.StructField("centered", T.ArrayType(T.DoubleType()), False),
        T.StructField("norm", T.DoubleType(), False),
        T.StructField("tvar", T.DoubleType(), False),
        T.StructField("feat", T.BinaryType(), False),
    ])

    def run(batches):
        import pyarrow as pa

        from ..functions.audio import _decode_i16
        from ..functions.mel import log_mel

        for batch in batches:
            ids = batch.column(col_idx["clip_id"]).to_pylist()
            payloads = batch.column(col_idx["bytes"])
            codecs = batch.column(col_idx["codec"]).to_pylist()
            srs = batch.column(col_idx["sr_hz"]).to_pylist()
            if counter is not None:
                counter.add(batch.num_rows)
            oks, nfs, profs, cents, norms, tvars, feats = (
                [], [], [], [], [], [], []
            )
            for i in range(batch.num_rows):
                buf = payloads[i].as_buffer() if payloads[i].is_valid else None
                try:
                    q = _decode_i16(buf, codecs[i], srs[i])
                    ok = True
                except (ValueError, TypeError):
                    q = np.zeros(0, dtype=np.int16)
                    ok = False
                m = log_mel(q.astype(np.float64) / 32768.0, srs[i] or 0)
                if m.shape[0] > 0:
                    profile, centered, norm, tvar = _profile_stats(m)
                else:
                    profile = np.zeros(N_MELS)
                    centered = np.zeros(N_MELS)
                    norm, tvar = 0.0, 0.0
                oks.append(ok)
                nfs.append(int(m.shape[0]))
                profs.append([float(v) for v in profile])
                cents.append([float(v) for v in centered])
                norms.append(norm)
                tvars.append(tvar)
                feats.append(np.ascontiguousarray(m).tobytes())
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.string()),
                    pa.array(oks, type=pa.bool_()),
                    pa.array(nfs, type=pa.int32()),
                    pa.array(profs, type=pa.list_(pa.float64())),
                    pa.array(cents, type=pa.list_(pa.float64())),
                    pa.array(norms, type=pa.float64()),
                    pa.array(tvars, type=pa.float64()),
                    pa.array(feats, type=pa.binary()),
                ],
                names=[f.name for f in out_schema.fields],
            )

    return df.mapInArrow(run, out_schema)


def _dot(a: Column, b: Column) -> Column:
    """Sequential left fold over the zipped arrays — the twin replays
    the same index-order plain-float accumulation."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def embed_near_dup(
    df: DataFrame,
    n_tables: int = EMBED_TABLES,
    bits: int = EMBED_BITS,
    max_bucket: int = 64,
    profile_min: float = PROFILE_NCC_MIN,
    traj_min: float = TRAJ_NCC_MIN,
    min_frames: int = 4,
) -> DataFrame:
    """Noise-robust near-dup pairs: (id_a, id_b, profile_ncc, traj_ncc,
    evidence ∈ {trajectory, stationary}).  See module docstring."""
    rel = (
        clip_mel_profiles(df)
        .filter(
            F.col("ok") & (F.col("n_frames") >= min_frames)
            & (F.col("norm") > 0)
        )
        .persist()
    )
    slim = rel.select("clip_id", "centered", "norm", "tvar")
    buckets = None
    for t in range(n_tables):
        planes = _hyperplanes(N_MELS, bits, EMBED_SEED + t)
        part = slim.select(
            "clip_id",
            F.lit(t).alias("tbl"),
            bucket_col(F.col("centered"), planes).alias("bucket"),
        )
        buckets = part if buckets is None else buckets.unionByName(part)
    small = (
        buckets.groupBy("tbl", "bucket")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") <= max_bucket)
        .select("tbl", "bucket")
    )
    guarded = buckets.join(small, ["tbl", "bucket"])
    a = guarded.alias("a")
    b = guarded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.clip_id") < F.col("b.clip_id")),
        )
        .select(
            F.col("a.clip_id").alias("id_a"),
            F.col("b.clip_id").alias("id_b"),
        )
        .distinct()
    )
    sa = slim.select(
        F.col("clip_id").alias("id_a"),
        F.col("centered").alias("__ca"),
        F.col("norm").alias("__na"),
        F.col("tvar").alias("__va"),
    )
    sb = slim.select(
        F.col("clip_id").alias("id_b"),
        F.col("centered").alias("__cb"),
        F.col("norm").alias("__nb"),
        F.col("tvar").alias("__vb"),
    )
    pruned = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "profile_ncc",
            _dot(F.col("__ca"), F.col("__cb"))
            / (F.col("__na") * F.col("__nb")),
        )
        .filter(F.col("profile_ncc") >= F.lit(float(profile_min)))
        .select("id_a", "id_b", "profile_ncc", "__va", "__vb")
    )
    fa = rel.select(
        F.col("clip_id").alias("id_a"),
        F.col("feat").alias("__fa"), F.col("n_frames").alias("__nfa"),
    )
    fb = rel.select(
        F.col("clip_id").alias("id_b"),
        F.col("feat").alias("__fb"), F.col("n_frames").alias("__nfb"),
    )
    joined = pruned.join(fa, "id_a").join(fb, "id_b")

    @F.pandas_udf("double")
    def traj_udf(fa_s, nfa_s, fb_s, nfb_s):
        import pandas as pd

        out = []
        for fa_b, nfa, fb_b, nfb in zip(fa_s, nfa_s, fb_s, nfb_s):
            ma = np.frombuffer(fa_b, dtype=np.float64).reshape(
                int(nfa), N_MELS
            )
            mb = np.frombuffer(fb_b, dtype=np.float64).reshape(
                int(nfb), N_MELS
            )
            out.append(traj_ncc(ma, mb))
        return pd.Series(out)

    out = (
        joined.withColumn(
            "traj_ncc", traj_udf("__fa", "__nfa", "__fb", "__nfb")
        )
        .filter(F.col("traj_ncc") >= F.lit(float(traj_min)))
        .withColumn(
            "evidence",
            F.when(
                F.least("__va", "__vb") < F.lit(float(STATIONARY_VAR)),
                F.lit("stationary"),
            ).otherwise(F.lit("trajectory")),
        )
        .select("id_a", "id_b", "profile_ncc", "traj_ncc", "evidence")
        .orderBy("id_a", "id_b")
    )
    out = out.localCheckpoint(eager=True)
    rel.unpersist()
    return out
