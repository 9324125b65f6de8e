"""Music / speech / other content-class audit as a relational operator.

``functions.musicspeech`` computes the two Scheirer-Slaney separation
features per clip (syllabic envelope modulation, tonal stability); this
module labels each clip and emits the reference's issue relation —
``music_content`` is the per-clip label noise an ASR corpus cares about
(a song passes every defect audit; it is simply not speech).

Execution shape: ONE ``mapInArrow`` pass, payload dropped at the
boundary, labels are JVM when-chains over the kernel metrics, zero
shuffles — scales with input splits.

Reference analog: none (audio is beyond the reference); the shape is
an enum rule (checkpoints.py:216-252) over kernel-computed metrics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["clip_musicspeech", "musicspeech_labels", "musicspeech_issues"]


def clip_musicspeech(df: DataFrame, counter=None) -> DataFrame:
    """(clip_id, codec, n_samples, n_env, n_tone, n_active, syl_frac,
    stable_frac) via one Arrow pass; not-evaluable clips carry NULL
    fractions."""
    col_idx = {f.name: i for i, f in enumerate(df.schema.fields)}
    out_schema = T.StructType(
        [
            T.StructField("clip_id", T.StringType(), False),
            T.StructField("codec", T.StringType(), True),
            T.StructField("n_samples", T.LongType(), False),
            T.StructField("n_env", T.IntegerType(), False),
            T.StructField("n_tone", T.IntegerType(), False),
            T.StructField("n_active", T.IntegerType(), False),
            T.StructField("syl_frac", T.DoubleType(), True),
            T.StructField("stable_frac", T.DoubleType(), True),
        ]
    )

    def run(batches):
        import numpy as np
        import pyarrow as pa

        from ..functions.audio import _decode_i16
        from ..functions.musicspeech import MS_FIELDS, music_speech_stats

        empty = np.zeros(0, dtype=np.int16)
        for batch in batches:
            ids = batch.column(col_idx["clip_id"]).to_pylist()
            payloads = batch.column(col_idx["bytes"])
            codecs = batch.column(col_idx["codec"]).to_pylist()
            srs = batch.column(col_idx["sr_hz"]).to_pylist()
            if counter is not None:
                counter.add(batch.num_rows)
            cols: dict[str, list] = {name: [] for name in MS_FIELDS}
            for i in range(batch.num_rows):
                buf = payloads[i].as_buffer() if payloads[i].is_valid else None
                try:
                    q = _decode_i16(buf, codecs[i], srs[i])
                except (ValueError, TypeError):
                    q = empty
                st = music_speech_stats(q, srs[i])
                for name in MS_FIELDS:
                    cols[name].append(st[name])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.string()),
                    pa.array(codecs, type=pa.string()),
                    pa.array(cols["n_samples"], type=pa.int64()),
                    pa.array(cols["n_env"], type=pa.int32()),
                    pa.array(cols["n_tone"], type=pa.int32()),
                    pa.array(cols["n_active"], type=pa.int32()),
                    pa.array(cols["syl_frac"], type=pa.float64()),
                    pa.array(cols["stable_frac"], type=pa.float64()),
                ],
                names=["clip_id", "codec"] + MS_FIELDS,
            )

    return df.mapInArrow(run, out_schema)


def musicspeech_labels(df: DataFrame, counter=None) -> DataFrame:
    """``clip_musicspeech`` + the label when-chain: ``music`` / ``speech``
    / ``other`` / ``und`` (not evaluable).  The music law wins first —
    a clip satisfying both (impossible by the threshold geometry:
    stable ≥ 1/2 excludes speech's stable ≤ 1/4) would be music."""
    from ..functions.musicspeech import (
        MUSIC_STABLE_MIN,
        MUSIC_SYL_MAX,
        SPEECH_STABLE_MAX,
        SPEECH_SYL_MIN,
    )

    syl = F.col("syl_frac")
    stab = F.col("stable_frac")
    return clip_musicspeech(df, counter=counter).withColumn(
        "av_label",
        F.when(syl.isNull() | stab.isNull(), F.lit("und"))
        .when(
            (stab >= F.lit(MUSIC_STABLE_MIN)) & (syl <= F.lit(MUSIC_SYL_MAX)),
            F.lit("music"),
        )
        .when(
            (syl >= F.lit(SPEECH_SYL_MIN)) & (stab <= F.lit(SPEECH_STABLE_MAX)),
            F.lit("speech"),
        )
        .otherwise(F.lit("other")),
    )


def musicspeech_issues(labels: DataFrame, table: str = "clips") -> DataFrame:
    """Issue relation over the labels (reference issue schema, ONE fused
    aggregate): ``music_content`` (warning — wrong content class for a
    speech corpus), ``unclassified_content`` (info)."""
    wide = labels.agg(
        F.count(F.lit(1)).alias("__total__"),
        F.count(F.when(F.col("av_label") == "music", 1)).alias(
            "n:music_content"
        ),
        F.count(F.when(F.col("av_label") == "other", 1)).alias(
            "n:unclassified_content"
        ),
    )
    rules = [
        ("music_content", "warning", "bytes",
         "music-class content in a speech corpus (label noise)"),
        ("unclassified_content", "info", "bytes",
         "content matches neither the music nor the speech signature"),
    ]
    structs = []
    for name, sev, column, desc in rules:
        cnt = F.col(f"n:{name}")
        total = F.col("__total__")
        structs.append(F.struct(
            F.lit(table).alias("table"),
            F.lit(column).alias("column"),
            F.lit(name).alias("issue_type"),
            cnt.alias("count"),
            total.alias("total"),
            F.when(total > 0, cnt * 100.0 / total).otherwise(F.lit(0.0))
            .cast("double").alias("percent"),
            F.when(cnt > 0, F.lit(sev)).otherwise(F.lit("info"))
            .alias("severity"),
            F.lit(desc).alias("description"),
        ))
    return wide.select(F.explode(F.array(*structs)).alias("i")).select("i.*")
