"""Within-clip multi-speaker (diarize-lite) audit as a relational
operator.

Single-speaker curation (TTS corpora, per-speaker caps, voice cloning
consent) needs to know when ONE clip contains SEVERAL voices.  The
novelty-curve turn scan (``audio_turns``) catches splices inside
continuous audio but is structurally blind to the commonest dialog
shape — speakers alternating across pauses (its activity guard excludes
silence edges by design).  This operator profiles each VAD-carved
segment with the shared voice kernel and counts distinct voices via the
same squared-L2 link law the cross-clip speaker operator verifies with
(see ``functions.voice.segment_voices`` for the full law, including why
the stationarity guard is OFF segment-locally).

Execution shape: ONE ``mapInArrow`` pass (decode → VAD runs → per-run
profile → in-clip link) — payload dropped at the boundary, zero
shuffles, scales with input splits.

Reference parity: no reference analog; the flag layer follows the
row-rule → severity shape of the reference's validation scans
(``/root/reference/src/data_quality/validation.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["clip_voices", "multispeaker_flags", "voices_issues"]


def clip_voices(df: DataFrame, counter=None) -> DataFrame:
    """(clip_id, ok, n_segments, n_voiced_segments, n_voices,
    max_link_d2_r, min_cross_d2_r) via one Arrow pass; ``ok`` False
    when the clip does not decode."""
    col_idx = {f.name: i for i, f in enumerate(df.schema.fields)}
    out_schema = T.StructType(
        [T.StructField("clip_id", T.StringType(), False),
         T.StructField("ok", T.BooleanType(), False),
         T.StructField("n_segments", T.IntegerType(), False),
         T.StructField("n_voiced_segments", T.IntegerType(), False),
         T.StructField("n_voices", T.IntegerType(), False),
         T.StructField("max_link_d2_r", T.DoubleType(), False),
         T.StructField("min_cross_d2_r", T.DoubleType(), False)]
    )

    def run(batches):
        import numpy as np
        import pyarrow as pa

        from ..functions.audio import _decode_i16
        from ..functions.voice import segment_voices

        for batch in batches:
            ids = batch.column(col_idx["clip_id"]).to_pylist()
            payloads = batch.column(col_idx["bytes"])
            codecs = batch.column(col_idx["codec"]).to_pylist()
            srs = batch.column(col_idx["sr_hz"]).to_pylist()
            if counter is not None:
                counter.add(batch.num_rows)
            oks, nseg, nvseg, nv, mx, mn = [], [], [], [], [], []
            for i in range(batch.num_rows):
                buf = payloads[i].as_buffer() if payloads[i].is_valid \
                    else None
                try:
                    q = _decode_i16(buf, codecs[i], srs[i])
                    ok = True
                except (ValueError, TypeError):
                    q = np.zeros(0, dtype=np.int16)
                    ok = False
                st = segment_voices(q, srs[i] or 0)
                oks.append(ok)
                nseg.append(st["n_segments"])
                nvseg.append(st["n_voiced_segments"])
                nv.append(st["n_voices"])
                mx.append(round(st["max_link_d2"], 6))
                mn.append(round(st["min_cross_d2"], 6))
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.string()),
                 pa.array(oks, type=pa.bool_()),
                 pa.array(nseg, type=pa.int32()),
                 pa.array(nvseg, type=pa.int32()),
                 pa.array(nv, type=pa.int32()),
                 pa.array(mx, type=pa.float64()),
                 pa.array(mn, type=pa.float64())],
                names=["clip_id", "ok", "n_segments", "n_voiced_segments",
                       "n_voices", "max_link_d2_r", "min_cross_d2_r"],
            )

    return df.mapInArrow(run, out_schema)


def multispeaker_flags(voices: DataFrame) -> DataFrame:
    """Adds ``multi_speaker`` (n_voices ≥ 2) — the decision layer as a
    Column expression so Catalyst can push/prune it."""
    return voices.withColumn(
        "multi_speaker", (F.col("n_voices") >= 2)
    )


def voices_issues(flags: DataFrame, table: str = "clips") -> DataFrame:
    """Issue relation over ``multispeaker_flags`` output (reference
    issue schema, ONE fused aggregate — the audit_issues law):
    ``multi_speaker`` (warning: several voices in one clip poison
    single-speaker TTS corpora and per-speaker caps) and
    ``no_voice_evidence`` (info: decodable clips with zero profiled
    voiced segments — music/noise/silence, unusable for speaker-keyed
    curation)."""
    wide = flags.agg(
        F.count(F.lit(1)).alias("__total__"),
        F.count(F.when(F.col("multi_speaker"), 1)).alias(
            "n:multi_speaker"),
        F.count(F.when(F.col("ok") & (F.col("n_voices") == 0), 1)).alias(
            "n:no_voice_evidence"),
    )
    rules = [
        ("multi_speaker", "warning", "bytes",
         "distinct voice profiles across pause-separated segments"),
        ("no_voice_evidence", "info", "bytes",
         "no profiled voiced segment (music/noise/silence content)"),
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
    return wide.select(
        F.explode(F.array(*structs)).alias("issue")
    ).select("issue.*")
