"""Speaker-turn / splice detection as a relational operator.

Multi-speaker clips (interview segments, stitched uploads, editing
splices) are an ASR-curation defect class the energy VAD cannot see:
the audio is continuously "speech-active", but the spectral envelope
jumps at each speaker boundary.  ``functions.turns`` scans a
gain-invariant spectral-shape novelty curve over log-mel frames
(Chen & Gopalakrishnan-style sliding windows) with an activity guard so
silence edges stay owned by the VAD rules.

Measured on the seeded corpus (``synth.make_audio_turns_corpus``:
multi-voice concatenations from a 4-voice formant palette + matched
single-voice controls): see test_audio_turns for recall/zero-false-flag
numbers and the threshold margin audit.

Execution shape: ONE ``mapInArrow`` pass (decode → mel → curve → walk
per clip), payload dropped at the boundary, zero shuffles — scales with
input splits.

Reference analog: none (audio is beyond the reference); the shape is
the per-row rule scan applied to a kernel-computed metric.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["clip_turns", "turn_flags", "turn_issues"]


def clip_turns(df: DataFrame, counter=None) -> DataFrame:
    """(clip_id, codec, n_frames, n_eval, n_turns, turns_csv) via one
    Arrow pass; undecodable / too-short clips come back with zero
    counts and an empty turn list."""
    col_idx = {f.name: i for i, f in enumerate(df.schema.fields)}
    out_schema = T.StructType(
        [
            T.StructField("clip_id", T.StringType(), False),
            T.StructField("codec", T.StringType(), True),
            T.StructField("n_frames", T.IntegerType(), False),
            T.StructField("n_eval", T.IntegerType(), False),
            T.StructField("n_turns", T.IntegerType(), False),
            T.StructField("turns_csv", T.StringType(), False),
        ]
    )

    def run(batches):
        import numpy as np
        import pyarrow as pa

        from ..functions.audio import _decode_i16
        from ..functions.turns import TURN_FIELDS, turn_stats

        empty = np.zeros(0, dtype=np.int16)
        for batch in batches:
            ids = batch.column(col_idx["clip_id"]).to_pylist()
            payloads = batch.column(col_idx["bytes"])
            codecs = batch.column(col_idx["codec"]).to_pylist()
            srs = batch.column(col_idx["sr_hz"]).to_pylist()
            if counter is not None:
                counter.add(batch.num_rows)
            cols: dict[str, list] = {name: [] for name in TURN_FIELDS}
            for i in range(batch.num_rows):
                buf = payloads[i].as_buffer() if payloads[i].is_valid else None
                try:
                    q = _decode_i16(buf, codecs[i], srs[i])
                except (ValueError, TypeError):
                    q = empty
                # same float law as the mel operator (audio_mel.py)
                st = turn_stats(q.astype(np.float64) / 32768.0, srs[i] or 0)
                for name in TURN_FIELDS:
                    cols[name].append(st[name])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.string()),
                    pa.array(codecs, type=pa.string()),
                    pa.array(cols["n_frames"], type=pa.int32()),
                    pa.array(cols["n_eval"], type=pa.int32()),
                    pa.array(cols["n_turns"], type=pa.int32()),
                    pa.array(cols["turns_csv"], type=pa.string()),
                ],
                names=["clip_id", "codec"] + TURN_FIELDS,
            )

    return df.mapInArrow(run, out_schema)


def turn_flags(df: DataFrame, counter=None) -> DataFrame:
    """``clip_turns`` + the decision column: a clip is multi-voice when
    at least one suppressed novelty peak survived the guard."""
    return clip_turns(df, counter=counter).withColumn(
        "is_multi_voice", F.col("n_turns") >= F.lit(1)
    )


def turn_issues(flags: DataFrame, table: str = "clips") -> DataFrame:
    """Issue relation over the flags (reference issue schema, ONE fused
    aggregate — the audit_issues law): ``speaker_turns`` (warning:
    multi-speaker / spliced clips poison single-speaker TTS corpora and
    degrade ASR utterance alignment)."""
    wide = flags.agg(
        F.count(F.lit(1)).alias("__total__"),
        F.count(F.when(F.col("is_multi_voice"), 1)).alias("n:speaker_turns"),
    )
    rules = [
        ("speaker_turns", "warning", "bytes",
         "spectral-shape novelty peaks: multi-speaker or spliced clip"),
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
    return wide.select(F.explode(F.array(*structs)).alias("issue")).select("issue.*")
