"""Recording-channel (room-tone) clustering as a relational operator.

The leakage axis content dedup cannot see: two DIFFERENT utterances
captured by the same mic in the same room share a noise floor, and an
eval split that separates content but not sessions leaks the channel.
This operator clusters clips by their VAD-inactive noise-floor spectrum
(see ``functions.channel`` for the kernel law: minimum-statistics floor
pool, guard-banded against content ramps, quantization-clamped log
bands) so split tooling (``cluster_split``) and balance caps
(``speaker_balance``) can key on the CHANNEL, not just the content.

Execution shape (the audio-family standard): ONE ``mapInArrow`` decode
pass emits a 16-double profile + composite key parts per clip — 128
bytes/clip shuffles, never audio.  Candidates bucket on
(grid, tilt_cell, peak_band): the 1-D double grid over the tilt scalar
is exact (|Δtilt| ≤ TILT_STEP/2 ⇒ shared cell on one of the two grids),
the peak band splits the tilt line into channel families, and a
``max_bucket`` guard bounds the per-bucket quadratic work (hot buckets
are reported, not silently joined).  Verification is pure Catalyst: the
squared-L2 profile distance as a left-fold ``aggregate`` over
``zip_with`` squared diffs — bit-identical to the twin's Python left
fold — accepted on ``dist2 < DIST2_MAX``.  Components come from the
shared ``cluster.connected_components`` (large-star/small-star).

Reference parity: no reference analog (no audio path there); feeds the
same duplicate-cluster machinery as ``audio_dedup_clusters``
(``/root/reference/src/data_quality/validation.py`` duplicate scans are
the row-level cousins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.channel import DIST2_MAX
from .cluster import cluster_members

__all__ = [
    "clip_channel_profile", "bucket_candidate_pairs",
    "bucket_verified_pairs", "hot_buckets", "channel_keyed",
    "channel_pairs",
    "channel_clusters",
]


def clip_channel_profile(df: DataFrame, counter=None) -> DataFrame:
    """(clip_id, ok, n_noise_windows, peak_band, cell0, cell1, prof).

    ``ok`` False when the clip decodes but has no usable room tone (or
    does not decode); profile columns are then NULL."""
    col_idx = {f.name: i for i, f in enumerate(df.schema.fields)}
    out_schema = T.StructType(
        [T.StructField("clip_id", T.StringType(), False),
         T.StructField("ok", T.BooleanType(), False),
         T.StructField("n_noise_windows", T.IntegerType(), False),
         T.StructField("peak_band", T.IntegerType(), True),
         T.StructField("cell0", T.LongType(), True),
         T.StructField("cell1", T.LongType(), True),
         T.StructField("prof", T.ArrayType(T.DoubleType()), True)]
    )

    def run(batches):
        import numpy as np
        import pyarrow as pa

        from ..functions.audio import _decode_i16
        from ..functions.channel import channel_key_parts, noise_profile

        for batch in batches:
            ids = batch.column(col_idx["clip_id"]).to_pylist()
            payloads = batch.column(col_idx["bytes"])
            codecs = batch.column(col_idx["codec"]).to_pylist()
            srs = batch.column(col_idx["sr_hz"]).to_pylist()
            if counter is not None:
                counter.add(batch.num_rows)
            oks, nws, peaks, c0s, c1s, profs = [], [], [], [], [], []
            for i in range(batch.num_rows):
                buf = payloads[i].as_buffer() if payloads[i].is_valid \
                    else None
                try:
                    q = _decode_i16(buf, codecs[i], srs[i])
                except (ValueError, TypeError):
                    q = np.zeros(0, dtype=np.int16)
                p, nw = noise_profile(q, srs[i] or 0)
                nws.append(nw)
                if p is None:
                    oks.append(False)
                    peaks.append(None)
                    c0s.append(None)
                    c1s.append(None)
                    profs.append(None)
                else:
                    pk, c0, c1, _tilt = channel_key_parts(p)
                    oks.append(True)
                    peaks.append(pk)
                    c0s.append(c0)
                    c1s.append(c1)
                    profs.append([float(v) for v in p])
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.string()),
                 pa.array(oks, type=pa.bool_()),
                 pa.array(nws, type=pa.int32()),
                 pa.array(peaks, type=pa.int32()),
                 pa.array(c0s, type=pa.int64()),
                 pa.array(c1s, type=pa.int64()),
                 pa.array(profs, type=pa.list_(pa.float64()))],
                names=["clip_id", "ok", "n_noise_windows", "peak_band",
                       "cell0", "cell1", "prof"],
            )

    return df.mapInArrow(run, out_schema)


def _dist2_col(a, b):
    """Left-fold squared L2 — the order the Python twin replays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def bucket_candidate_pairs(keyed: DataFrame, max_bucket: int) -> DataFrame:
    """(id_a, id_b, dist2): every bucket-proposed candidate with its
    exact left-fold squared-L2 distance, UNTHRESHOLDED — the relation
    both the verify stage (``bucket_verified_pairs``) and the
    contrastive miner (``operators/contrastive.py``, where the
    REJECTED candidates are the hard negatives) consume.

    ``keyed`` has one row per emitted key with columns
    (clip_id, prof, grid, cell, family).  Buckets = (grid, cell,
    family); buckets larger than ``max_bucket`` are skipped (skew guard
    — at web scale a mega-bucket means a degenerate family, worth its
    own report, not an O(n²) join).  THAT REPORT IS ``hot_buckets``:
    run it alongside any clustering/audit job — a non-empty report
    means whole identity families were excluded from pairing and a
    downstream "zero leakage" audit is conditional on it."""
    sizes = keyed.groupBy("grid", "cell", "family").agg(
        F.count(F.lit(1)).alias("__bn")
    )
    keyed = keyed.join(
        sizes.where(F.col("__bn") <= max_bucket),
        ["grid", "cell", "family"],
    )
    a = keyed.select(
        "grid", "cell", "family",
        F.col("clip_id").alias("id_a"), F.col("prof").alias("pa"),
    )
    b = keyed.select(
        "grid", "cell", "family",
        F.col("clip_id").alias("id_b"), F.col("prof").alias("pb"),
    )
    cand = (
        a.join(b, ["grid", "cell", "family"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "pa", "pb")
        .dropDuplicates(["id_a", "id_b"])  # several keys can propose
    )
    return cand.select(
        "id_a", "id_b",
        _dist2_col(F.col("pa"), F.col("pb")).alias("dist2"),
    )


def hot_buckets(keyed: DataFrame, max_bucket: int) -> DataFrame:
    """(grid, cell, family, n_members): the buckets the skew guard
    SKIPPED — the report the guard's docstring promises.  Empty on a
    healthy corpus; a populated row names a degenerate family
    (hold-music tones, one mega-room) whose members were never paired,
    so any audit built on the pair graph is silent about them.  One
    aggregate over the key relation."""
    return (
        keyed.groupBy("grid", "cell", "family")
        .agg(F.count(F.lit(1)).cast("long").alias("n_members"))
        .where(F.col("n_members") > max_bucket)
    )


def bucket_verified_pairs(
    keyed: DataFrame, max_bucket: int, dist2_max: float
) -> DataFrame:
    """(id_a, id_b, dist2): the shared bucket/verify machinery —
    ``bucket_candidate_pairs`` accepted under ``dist2_max`` on the
    exact left-fold squared-L2 profile distance.  Used by the channel
    (2-key tilt grid × peak band) and voice (4-key F0 × tilt composite
    grids) operators."""
    return bucket_candidate_pairs(keyed, max_bucket).where(
        F.col("dist2") < F.lit(float(dist2_max))
    )


def channel_keyed(profiles: DataFrame) -> DataFrame:
    """(clip_id, prof, grid, cell, family): the channel keying onto the
    shared bucket machinery — double-grid tilt cells split by the
    argmax peak band."""
    prof = profiles.where(F.col("ok"))
    return prof.select(
        "clip_id",
        "prof",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("grid"),
                         F.col("cell0").alias("cell")),
                F.struct(F.lit(1).alias("grid"),
                         F.col("cell1").alias("cell")),
            )
        ).alias("k"),
        F.col("peak_band").alias("family"),
    ).select(
        "clip_id", "prof", "family",
        F.col("k.grid").alias("grid"), F.col("k.cell").alias("cell"),
    )


def channel_pairs(
    profiles: DataFrame, max_bucket: int = 64,
    dist2_max: float = DIST2_MAX,
) -> DataFrame:
    """(id_a, id_b, dist2) accepted same-channel pairs: the double-grid
    tilt keys split by peak band, run through the shared machinery."""
    return bucket_verified_pairs(channel_keyed(profiles), max_bucket,
                                 dist2_max)


def channel_clusters(df: DataFrame, max_bucket: int = 64) -> DataFrame:
    """(clip_id, channel, cluster_size) per clustered clip, ordered.

    ``channel`` is the component representative (min clip_id by the
    shared connected-components law)."""
    pairs = channel_pairs(clip_channel_profile(df), max_bucket=max_bucket)
    return (
        cluster_members(pairs, "id_a", "id_b")
        .select(
            F.col("node").alias("clip_id"),
            F.col("component").alias("channel"),
            F.col("cluster_size").cast("long").alias("cluster_size"),
        )
        .orderBy("clip_id")
    )
