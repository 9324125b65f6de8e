"""Leakage-safe split over the UNION of the three audio identity axes.

Content fingerprints, channel (room-tone) profiles, and voice (speaker)
profiles each catch a leakage vector the other two cannot; an eval
split is only leakage-safe when near-identity clips under ANY axis
stay on one side.  This operator unions the three pair graphs and
assigns train/val per union component through the shared
``cluster.split_by_cluster`` law (portable md5 of the component
representative — deterministic under any partitioning or engine).

Execution shape: ONE ``mapInArrow`` decode pass (``identity_features``)
computes all three kernels per clip — at 10^12 clips the decode pass IS
the cost, so the axes must share it, not re-decode per axis.  The slim
feature relation (fingerprints + two 16-double profiles + key cells,
~1 KB/clip, payload dropped at the boundary) is persisted and fanned
out to the three pair laws, each reusing its own operator's bucket /
verify machinery unchanged (``fingerprint_near_dup``,
``bucket_verified_pairs``); the union pair graph then drives ONE
large-star/small-star closure and the md5 split.

Reference parity: no reference analog; composes
``audio_dedup``/``audio_channel``/``audio_voice`` with the
``cluster_split`` law the text side already uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .audio_channel import channel_pairs
from .audio_dedup import (
    digest_chain_pairs,
    fingerprint_exact_pairs,
    fingerprint_near_dup,
)
from .audio_voice import voice_pairs
from .cluster import cluster_members

__all__ = [
    "identity_features", "identity_pairs", "identity_split",
    "split_from_features", "split_leakage_audit",
]


def identity_features(
    df: DataFrame, counter=None, carry_cols: tuple[str, ...] = ()
) -> DataFrame:
    """(clip_id, n_frames, fp, ch_ok, peak_band, cell0, cell1, ch_prof,
    vo_ok, fc0, fc1, tc0, tc1, vo_prof[, carry…]) — all three identity
    kernels from ONE decode per clip; payload dropped at this boundary.
    ``carry_cols`` names input columns repeated onto the output row
    (e.g. ``ingest_day`` so the resumable runner never joins back).

    ``payload_h`` (JVM-side xxhash64 of the raw payload bytes) rides
    along as the fourth identity key: a byte-identical re-upload IS the
    same recording even when it is undecodable or too short for any
    kernel — 5% of the bench corpus carries NO fp/channel/voice
    evidence, and without this key exact copies of those clips
    straddled the split at 10× replica density (1M smoke)."""
    df = df.withColumn("payload_h", F.xxhash64(F.col("bytes")))
    carry_cols = ("payload_h", *carry_cols)
    col_idx = {f.name: i for i, f in enumerate(df.schema.fields)}
    out_schema = T.StructType(
        [T.StructField("clip_id", T.StringType(), False),
         T.StructField("n_frames", T.IntegerType(), False),
         T.StructField("fp", T.ArrayType(T.IntegerType()), False),
         T.StructField("ch_ok", T.BooleanType(), False),
         T.StructField("peak_band", T.IntegerType(), True),
         T.StructField("cell0", T.LongType(), True),
         T.StructField("cell1", T.LongType(), True),
         T.StructField("ch_prof", T.ArrayType(T.DoubleType()), True),
         T.StructField("vo_ok", T.BooleanType(), False),
         T.StructField("fc0", T.LongType(), True),
         T.StructField("fc1", T.LongType(), True),
         T.StructField("tc0", T.LongType(), True),
         T.StructField("tc1", T.LongType(), True),
         T.StructField("vo_prof", T.ArrayType(T.DoubleType()), True)]
        + [df.schema[c] for c in carry_cols]
    )

    def run(batches):
        import numpy as np
        import pyarrow as pa

        from ..functions.audio import _decode_i16
        from ..functions.channel import channel_key_parts, noise_profile
        from ..functions.spectral import fingerprint_i32
        from ..functions.voice import voice_key_parts, voice_profile

        for batch in batches:
            ids = batch.column(col_idx["clip_id"]).to_pylist()
            payloads = batch.column(col_idx["bytes"])
            codecs = batch.column(col_idx["codec"]).to_pylist()
            srs = batch.column(col_idx["sr_hz"]).to_pylist()
            if counter is not None:
                counter.add(batch.num_rows)
            cols: dict[str, list] = {k: [] for k in (
                "n_frames", "fp", "ch_ok", "peak_band", "cell0", "cell1",
                "ch_prof", "vo_ok", "fc0", "fc1", "tc0", "tc1",
                "vo_prof",
            )}
            for i in range(batch.num_rows):
                buf = payloads[i].as_buffer() if payloads[i].is_valid \
                    else None
                try:
                    q = _decode_i16(buf, codecs[i], srs[i])
                except (ValueError, TypeError):
                    q = np.zeros(0, dtype=np.int16)
                fp = fingerprint_i32(q)
                cols["n_frames"].append(int(fp.size))
                cols["fp"].append([int(v) for v in fp])
                cp, _nw = noise_profile(q, srs[i] or 0)
                if cp is None:
                    cols["ch_ok"].append(False)
                    for k in ("peak_band", "cell0", "cell1", "ch_prof"):
                        cols[k].append(None)
                else:
                    pk, c0, c1, _t = channel_key_parts(cp)
                    cols["ch_ok"].append(True)
                    cols["peak_band"].append(pk)
                    cols["cell0"].append(c0)
                    cols["cell1"].append(c1)
                    cols["ch_prof"].append([float(v) for v in cp])
                vp, _nv, f0 = voice_profile(q, srs[i] or 0)
                if vp is None:
                    cols["vo_ok"].append(False)
                    for k in ("fc0", "fc1", "tc0", "tc1", "vo_prof"):
                        cols[k].append(None)
                else:
                    fc0, fc1, tc0, tc1 = voice_key_parts(vp, f0)
                    cols["vo_ok"].append(True)
                    cols["fc0"].append(fc0)
                    cols["fc1"].append(fc1)
                    cols["tc0"].append(tc0)
                    cols["tc1"].append(tc1)
                    cols["vo_prof"].append([float(v) for v in vp])
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.string()),
                 pa.array(cols["n_frames"], type=pa.int32()),
                 pa.array(cols["fp"], type=pa.list_(pa.int32())),
                 pa.array(cols["ch_ok"], type=pa.bool_()),
                 pa.array(cols["peak_band"], type=pa.int32()),
                 pa.array(cols["cell0"], type=pa.int64()),
                 pa.array(cols["cell1"], type=pa.int64()),
                 pa.array(cols["ch_prof"], type=pa.list_(pa.float64())),
                 pa.array(cols["vo_ok"], type=pa.bool_()),
                 pa.array(cols["fc0"], type=pa.int64()),
                 pa.array(cols["fc1"], type=pa.int64()),
                 pa.array(cols["tc0"], type=pa.int64()),
                 pa.array(cols["tc1"], type=pa.int64()),
                 pa.array(cols["vo_prof"], type=pa.list_(pa.float64()))]
                + [batch.column(col_idx[c]) for c in carry_cols],
                names=[f.name for f in out_schema.fields],
            )

    return df.mapInArrow(run, out_schema)


def identity_pairs(feat: DataFrame, max_bucket: int = 64) -> DataFrame:
    """(id_a, id_b, axis) — the union pair graph over a persisted
    ``identity_features`` relation; ``axis`` ∈ {content, channel,
    voice} reports which law proposed the link."""
    # exact-digest edges FIRST: k−1 chain edges per identical-
    # fingerprint family, immune to the hot-bucket guard — at high
    # replica density the LSH buckets go hot and get dropped, and
    # without this pre-pass exact re-upload families can straddle the
    # split (found by the 1M scale smoke)
    exact = fingerprint_exact_pairs(
        feat.select("clip_id", "fp")
    ).select("id_a", "id_b", F.lit("content").alias("axis"))
    content = fingerprint_near_dup(
        feat.select("clip_id", "n_frames", "fp"),
        max_bucket_size=max_bucket,
    ).select("id_a", "id_b", F.lit("content").alias("axis"))
    content = exact.unionByName(content)
    if "payload_h" in feat.columns:
        # byte-identity key: links exact copies that carry NO kernel
        # evidence (undecodable / shorter than one frame).  Guarded on
        # the column so feature tables written before the key existed
        # keep working (minus this protection).
        payload = digest_chain_pairs(
            feat.where(F.col("payload_h").isNotNull()).select(
                F.col("clip_id").alias("__id"),
                F.col("payload_h").alias("__d"),
            )
        ).select("id_a", "id_b", F.lit("content").alias("axis"))
        content = content.unionByName(payload)
    channel = channel_pairs(
        feat.select(
            "clip_id", F.col("ch_ok").alias("ok"), "peak_band",
            "cell0", "cell1", F.col("ch_prof").alias("prof"),
        ),
        max_bucket=max_bucket,
    ).select("id_a", "id_b", F.lit("channel").alias("axis"))
    voice = voice_pairs(
        feat.select(
            "clip_id", F.col("vo_ok").alias("ok"), "fc0", "fc1",
            "tc0", "tc1", F.col("vo_prof").alias("prof"),
        ),
        max_bucket=max_bucket,
    ).select("id_a", "id_b", F.lit("voice").alias("axis"))
    return content.unionByName(channel).unionByName(voice)


def identity_split(
    df: DataFrame,
    val_frac: float = 0.25,
    seed: int = 11,
    max_bucket: int = 64,
    counter=None,
) -> DataFrame:
    """(clip_id, component, cluster_size, split) per clip, ordered.

    Union components assign as a unit; singletons are their own
    representative.  ONE decode pass: the slim feature relation is
    persisted before the three pair consumers (``counter`` is the
    execute-once accumulator hook the decode-once test asserts on)."""
    feat = identity_features(df, counter=counter).persist()
    out = split_from_features(
        feat, val_frac=val_frac, seed=seed, max_bucket=max_bucket
    ).localCheckpoint(eager=True)  # materialize, then release the cache
    feat.unpersist()
    return out


def split_from_features(
    feat: DataFrame,
    val_frac: float = 0.25,
    seed: int = 11,
    max_bucket: int = 64,
) -> DataFrame:
    """The relational half of ``identity_split`` over an existing
    ``identity_features`` relation — e.g. the checkpointed feature
    tables ``runner.run_identity_pipeline`` wrote, so a split re-run (a
    different val_frac or seed) costs ZERO decode at 10^12 clips; only
    key cells, profiles, and (id, component) rows move."""
    from .sampling import fraction_threshold_hex, sample_order_col

    pairs = identity_pairs(feat, max_bucket=max_bucket).select(
        "id_a", "id_b"
    ).dropDuplicates(["id_a", "id_b"])
    # ONE star-rounds closure: cluster_members gives (component, size),
    # and the md5 split law is applied to its representative directly —
    # running split_by_cluster too would re-execute the closure AND the
    # whole unpersisted pair DAG a second time (found by review)
    members = cluster_members(pairs, "id_a", "id_b").withColumnRenamed(
        "node", "clip_id"
    )
    thresh = fraction_threshold_hex(val_frac)
    rep = F.coalesce(
        F.col("component").cast("string"), F.col("clip_id").cast("string")
    )
    return (
        feat.select("clip_id")
        .join(members, "clip_id", "left")
        .select(
            "clip_id",
            F.coalesce(F.col("component"), F.col("clip_id"))
            .alias("component"),
            F.coalesce(F.col("cluster_size"), F.lit(1))
            .cast("long").alias("cluster_size"),
            F.when(
                sample_order_col(rep, seed, portable=True)
                < F.lit(thresh),
                F.lit("val"),
            ).otherwise(F.lit("train")).alias("split"),
        )
        .orderBy("clip_id")
    )


def split_leakage_audit(
    df: DataFrame, split_col: str = "split", max_bucket: int = 64
) -> DataFrame:
    """(axis, n_pairs, n_cross_pairs, n_cross_clips) per identity axis,
    ordered — the AUDIT companion to ``identity_split`` for corpora
    that already carry a split column: instead of re-splitting, report
    how many same-identity pairs straddle the split (the exact eval
    leakage a per-row i.i.d. coin produces), per axis, plus how many
    distinct clips those leaks touch.  A clean cluster-atomic split
    audits to zero cross pairs on every axis.

    One decode pass (``identity_features`` with the split column
    carried); the pair laws and their shuffles are unchanged — the
    audit adds only a broadcast-sized (clip_id, split) join and a
    3-row aggregate.
    """
    feat = identity_features(df, carry_cols=(split_col,)).persist()
    out = _leakage_report(feat, split_col, max_bucket).localCheckpoint(
        eager=True)  # 4 tiny rows; release the ~1 KB/clip feature cache
    feat.unpersist()
    return out


def _leakage_report(
    feat: DataFrame, split_col: str, max_bucket: int
) -> DataFrame:
    pairs = identity_pairs(feat, max_bucket=max_bucket)
    splits = feat.select("clip_id", F.col(split_col).alias("__sp"))
    tagged = (
        pairs
        .join(splits.withColumnRenamed("clip_id", "id_a")
              .withColumnRenamed("__sp", "sp_a"), "id_a")
        .join(splits.withColumnRenamed("clip_id", "id_b")
              .withColumnRenamed("__sp", "sp_b"), "id_b")
        .withColumn("cross", F.col("sp_a") != F.col("sp_b"))
    )
    per_axis = tagged.groupBy("axis").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.col("cross").cast("long")).cast("long")
        .alias("n_cross_pairs"),
    )
    cross_clips = (
        tagged.where("cross")
        .select("axis", F.col("id_a").alias("clip_id"))
        .unionByName(
            tagged.where("cross")
            .select("axis", F.col("id_b").alias("clip_id"))
        )
        .groupBy("axis")
        .agg(F.countDistinct("clip_id").cast("long")
             .alias("n_cross_clips"))
    )
    return (
        per_axis.join(cross_clips, "axis", "left")
        .select(
            "axis", "n_pairs", "n_cross_pairs",
            F.coalesce("n_cross_clips", F.lit(0)).cast("long")
            .alias("n_cross_clips"),
        )
        .orderBy("axis")
    )


def split_drift(old: DataFrame, new: DataFrame) -> DataFrame:
    """(clip_id, status, old_split, new_split, old_component,
    new_component) — the blast radius of re-splitting after corpus
    growth.

    Component merges are the ONLY way an existing assignment can move
    under the md5 law (the representative is the hash key, and a merge
    can change it); singletons and unmerged components keep their
    assignment bit-for-bit, so ``status`` partitions into:

    - ``stable``: split unchanged (the overwhelming majority — the law's
      point);
    - ``moved``: the clip's component merged with one whose
      representative wins the min, and the new representative hashes to
      the other side;
    - ``added``: not present in the old assignment;
    - ``removed``: present only in the old assignment (corpus shrinkage,
      a gate change, a decode regression) — the join is FULL OUTER so a
      re-split that dropped clips cannot audit as all-stable.

    One join on clip_id; both inputs are ``identity_split`` /
    ``split_from_features`` outputs (at scale: run both halves from the
    SAME feature checkpoint — zero decode)."""
    o = old.select(
        "clip_id",
        F.col("split").alias("old_split"),
        F.col("component").alias("old_component"),
    )
    n = new.select(
        "clip_id",
        F.col("split").alias("new_split"),
        F.col("component").alias("new_component"),
    )
    return (
        n.join(o, "clip_id", "full_outer")
        .select(
            "clip_id",
            F.when(F.col("new_split").isNull(), F.lit("removed"))
            .when(F.col("old_split").isNull(), F.lit("added"))
            .when(F.col("old_split") != F.col("new_split"),
                  F.lit("moved"))
            .otherwise(F.lit("stable")).alias("status"),
            "old_split", "new_split", "old_component", "new_component",
        )
        .orderBy("clip_id")
    )
