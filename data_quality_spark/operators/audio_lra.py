"""Loudness-range (EBU R128 LRA) / over-compression audit.

The loudness war's fingerprint: a brick-limited master holds the
short-term loudness almost constant, so the 10th-95th percentile spread
of gated 3 s / 1 s-hop K-weighted blocks (EBU Tech 3342's LRA) collapses
toward 0 LU.  Integrated LUFS cannot see this — a crushed and a dynamic
program can have the SAME integrated loudness.  Over-compressed audio
is a poor training target for vocoders/TTS (dynamics are part of the
signal) and marks low-provenance re-uploads.

``functions.loudness.clip_lra`` computes LRA deterministically to the
bit (fsum power means, integer-index percentiles); this module adds the
flag and the reference's issue relation:

- ``is_overcompressed`` ⇔ LRA < 3 LU over ≥ 5 gated blocks (the seeded
  classes sit at < 0.5 LU vs > 8 LU — a > 6× margin each side);
- clips too short for the 3 s short-term grid report NULL LRA and never
  flag (evaluability is total).

Execution shape: ONE ``mapInArrow`` pass, payload dropped at the
boundary, zero shuffles.

Reference analog: none (audio is beyond the reference); the shape is a
range rule (checkpoints.py:178-214) over a kernel-computed metric.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["clip_loudness_range", "lra_flags", "lra_issues",
           "OVERCOMP_LRA_MAX"]

# flag law threshold (LU): dynamic speech programs run 5-15 LU; a
# brick-limited master sits under 1
OVERCOMP_LRA_MAX = 3.0


def clip_loudness_range(df: DataFrame, counter=None) -> DataFrame:
    """(clip_id, codec, ok, n_st_blocks, n_lra_gated, lra) via one Arrow
    pass; undecodable clips carry ok=False, too-short clips NULL lra."""
    col_idx = {f.name: i for i, f in enumerate(df.schema.fields)}
    out_schema = T.StructType(
        [
            T.StructField("clip_id", T.StringType(), False),
            T.StructField("codec", T.StringType(), True),
            T.StructField("ok", T.BooleanType(), False),
            T.StructField("n_st_blocks", T.IntegerType(), False),
            T.StructField("n_lra_gated", T.IntegerType(), False),
            T.StructField("lra", T.DoubleType(), True),
        ]
    )

    def run(batches):
        import numpy as np
        import pyarrow as pa

        from ..functions.audio import _decode_i16
        from ..functions.loudness import clip_lra

        for batch in batches:
            ids = batch.column(col_idx["clip_id"]).to_pylist()
            payloads = batch.column(col_idx["bytes"])
            codecs = batch.column(col_idx["codec"]).to_pylist()
            srs = batch.column(col_idx["sr_hz"]).to_pylist()
            if counter is not None:
                counter.add(batch.num_rows)
            oks: list[bool] = []
            cols: dict[str, list] = {
                "n_st_blocks": [], "n_lra_gated": [], "lra": []
            }
            for i in range(batch.num_rows):
                buf = payloads[i].as_buffer() if payloads[i].is_valid else None
                try:
                    q = _decode_i16(buf, codecs[i], srs[i])
                    ok = True
                except (ValueError, TypeError):
                    q = np.zeros(0, dtype=np.int16)
                    ok = False
                st = clip_lra(
                    q.astype(np.float32) / np.float32(32767.0), srs[i] or 0
                )
                oks.append(ok)
                for name in cols:
                    cols[name].append(st[name])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.string()),
                    pa.array(codecs, type=pa.string()),
                    pa.array(oks, type=pa.bool_()),
                    pa.array(cols["n_st_blocks"], type=pa.int32()),
                    pa.array(cols["n_lra_gated"], type=pa.int32()),
                    pa.array(cols["lra"], type=pa.float64()),
                ],
                names=["clip_id", "codec", "ok", "n_st_blocks",
                       "n_lra_gated", "lra"],
            )

    return df.mapInArrow(run, out_schema)


def lra_flags(df: DataFrame, counter=None) -> DataFrame:
    """``clip_loudness_range`` + the flag: NULL LRA never flags."""
    return clip_loudness_range(df, counter=counter).withColumn(
        "is_overcompressed",
        F.coalesce(F.col("lra") < F.lit(OVERCOMP_LRA_MAX), F.lit(False)),
    )


def lra_issues(flags: DataFrame, table: str = "clips") -> DataFrame:
    """Issue relation over the flags (reference issue schema, ONE fused
    aggregate): ``overcompressed`` (warning)."""
    wide = flags.agg(
        F.count(F.lit(1)).alias("__total__"),
        F.count(F.when(F.col("is_overcompressed"), 1)).alias(
            "n:overcompressed"
        ),
    )
    rules = [
        ("overcompressed", "warning", "bytes",
         "loudness range under 3 LU: brick-limited / loudness-war master"),
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
