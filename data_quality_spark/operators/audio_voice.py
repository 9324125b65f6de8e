"""Acoustic speaker clustering as a relational operator.

The third identity axis (content → ``audio_dedup``, room/mic →
``audio_channel``, voice → here): different utterances, possibly in
different rooms, one speaker.  Eval splits that separate content and
channel but not voices still leak speaker identity into "held-out"
data, and per-speaker contribution caps (``speaker_balance``) need an
acoustic key when no speaker label exists.  Evidence lives in the
VOICED frames — the exact complement of the channel operator's
VAD-inactive pool — as the harmonic-sampled spectral envelope (vocal
tract) plus median F0 (see ``functions.voice`` for the kernel law).

Execution shape (the audio-family standard): ONE ``mapInArrow`` decode
pass emits a 16-double envelope + F0 + key parts per clip — ~136
bytes/clip shuffles, never audio.  Candidate generation, exact
left-fold L2 verification, skew guard, and the large-star/small-star
closure are all SHARED with the channel operator
(``audio_channel.bucket_verified_pairs`` is generic over any keyed
(clip_id, prof, grid, cell, family) relation) — only the key law
differs: TWO composed 1-D-exact double grids, log2(median F0) ×
envelope tilt, four keys per clip (see ``functions.voice`` for why
tilt, a Lipschitz functional of the profile, replaces the argmax
family split that near-ties can flip).

Reference parity: no reference analog (no audio path there); feeds the
same duplicate-cluster machinery as ``audio_dedup_clusters``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.voice import DIST2_MAX
from .audio_channel import bucket_verified_pairs
from .cluster import cluster_members

__all__ = [
    "clip_voice_profile", "voice_keyed", "voice_pairs", "voice_clusters",
]


def clip_voice_profile(df: DataFrame, counter=None) -> DataFrame:
    """(clip_id, ok, n_voiced_frames, f0_med, fc0, fc1, tc0, tc1, prof)
    — the two double-grid cell pairs (log2-F0 and envelope tilt).
    ``ok`` False when the clip has no usable voiced evidence
    (unvoiced/noise content, too short, decode failure); profile columns
    are then NULL and ``f0_med`` is 0."""
    col_idx = {f.name: i for i, f in enumerate(df.schema.fields)}
    out_schema = T.StructType(
        [T.StructField("clip_id", T.StringType(), False),
         T.StructField("ok", T.BooleanType(), False),
         T.StructField("n_voiced_frames", T.IntegerType(), False),
         T.StructField("f0_med", T.DoubleType(), True),
         T.StructField("fc0", T.LongType(), True),
         T.StructField("fc1", T.LongType(), True),
         T.StructField("tc0", T.LongType(), True),
         T.StructField("tc1", T.LongType(), True),
         T.StructField("prof", T.ArrayType(T.DoubleType()), True)]
    )

    def run(batches):
        import numpy as np
        import pyarrow as pa

        from ..functions.audio import _decode_i16
        from ..functions.voice import voice_key_parts, voice_profile

        for batch in batches:
            ids = batch.column(col_idx["clip_id"]).to_pylist()
            payloads = batch.column(col_idx["bytes"])
            codecs = batch.column(col_idx["codec"]).to_pylist()
            srs = batch.column(col_idx["sr_hz"]).to_pylist()
            if counter is not None:
                counter.add(batch.num_rows)
            oks, nvs, f0s, profs = [], [], [], []
            cells = {k: [] for k in ("fc0", "fc1", "tc0", "tc1")}
            for i in range(batch.num_rows):
                buf = payloads[i].as_buffer() if payloads[i].is_valid \
                    else None
                try:
                    q = _decode_i16(buf, codecs[i], srs[i])
                except (ValueError, TypeError):
                    q = np.zeros(0, dtype=np.int16)
                p, nv, f0 = voice_profile(q, srs[i] or 0)
                nvs.append(nv)
                if p is None:
                    oks.append(False)
                    f0s.append(None)
                    profs.append(None)
                    for k in cells:
                        cells[k].append(None)
                else:
                    fc0, fc1, tc0, tc1 = voice_key_parts(p, f0)
                    oks.append(True)
                    f0s.append(f0)
                    profs.append([float(v) for v in p])
                    cells["fc0"].append(fc0)
                    cells["fc1"].append(fc1)
                    cells["tc0"].append(tc0)
                    cells["tc1"].append(tc1)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.string()),
                 pa.array(oks, type=pa.bool_()),
                 pa.array(nvs, type=pa.int32()),
                 pa.array(f0s, type=pa.float64()),
                 pa.array(cells["fc0"], type=pa.int64()),
                 pa.array(cells["fc1"], type=pa.int64()),
                 pa.array(cells["tc0"], type=pa.int64()),
                 pa.array(cells["tc1"], type=pa.int64()),
                 pa.array(profs, type=pa.list_(pa.float64()))],
                names=["clip_id", "ok", "n_voiced_frames", "f0_med",
                       "fc0", "fc1", "tc0", "tc1", "prof"],
            )

    return df.mapInArrow(run, out_schema)


def voice_keyed(profiles: DataFrame) -> DataFrame:
    """(clip_id, prof, grid, cell, family): the voice keying onto the
    shared bucket machinery.  Four keys per clip — the 2×2 (F0 grid ×
    tilt grid) combinations — so the composite double-grid guarantee is
    exact: |Δlog2 f0| ≤ F0_STEP/2 and |Δtilt| ≤ TILT_STEP/2 imply one
    shared key.  Encoded as grid = 2·gf + gt, cell = F0 cell of grid
    gf, family = tilt cell of grid gt."""
    combos = [
        (gf, gt, f"fc{gf}", f"tc{gt}") for gf in (0, 1) for gt in (0, 1)
    ]
    return profiles.where(F.col("ok")).select(
        "clip_id",
        "prof",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(2 * gf + gt).alias("grid"),
                    F.col(fcol).alias("cell"),
                    F.col(tcol).cast("int").alias("family"),
                )
                for gf, gt, fcol, tcol in combos
            ])
        ).alias("k"),
    ).select(
        "clip_id", "prof",
        F.col("k.grid").alias("grid"),
        F.col("k.cell").alias("cell"),
        F.col("k.family").alias("family"),
    )


def voice_pairs(profiles: DataFrame, max_bucket: int = 64) -> DataFrame:
    """(id_a, id_b, dist2) accepted same-voice pairs (see
    ``voice_keyed`` for the key law)."""
    return bucket_verified_pairs(voice_keyed(profiles), max_bucket,
                                 DIST2_MAX)


def voice_clusters(df: DataFrame, max_bucket: int = 64) -> DataFrame:
    """(clip_id, speaker, cluster_size) per clustered clip, ordered.

    ``speaker`` is the component representative (min clip_id by the
    shared connected-components law)."""
    pairs = voice_pairs(clip_voice_profile(df), max_bucket=max_bucket)
    return (
        cluster_members(pairs, "id_a", "id_b")
        .select(
            F.col("node").alias("clip_id"),
            F.col("component").alias("speaker"),
            F.col("cluster_size").cast("long").alias("cluster_size"),
        )
        .orderBy("clip_id")
    )
