"""True-peak / inter-sample-over audit as a relational operator.

``functions.truepeak`` oversamples each clip ×4 through a fixed Q15
interpolation filter and reports the exact-integer oversampled peak;
this module turns that into flags and the reference's issue relation:

- ``is_tp_over``   — true peak above 0 dBTP: the clip WILL clip any DAC
  or resampler downstream (critical for augmentation pipelines);
- ``is_hidden_over`` — over while the sample peak sits below the
  clipping rail: the class every sample-domain audit (clip_frac, rails,
  peak_db) reads as clean;
- ``is_hot``       — above the EBU R128 −1 dBTP program limit: no
  reconstruction headroom left.

``tp_dbtp`` (20·log10(tp_q15/FS_Q15)) is emitted for reporting only —
every flag is an integer compare against a spec constant.

Execution shape: ONE ``mapInArrow`` pass, payload dropped at the
boundary, zero shuffles — scales with input splits.

Reference analog: none (audio is beyond the reference); the shape is a
range rule (checkpoints.py:178-214) over kernel-computed metrics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["clip_truepeak", "truepeak_flags", "truepeak_issues"]


def clip_truepeak(df: DataFrame, counter=None) -> DataFrame:
    """(clip_id, codec, n_samples, sample_peak, tp_q15) via one Arrow
    pass; undecodable clips come back with n_samples = 0 and NULL
    metrics."""
    col_idx = {f.name: i for i, f in enumerate(df.schema.fields)}
    out_schema = T.StructType(
        [
            T.StructField("clip_id", T.StringType(), False),
            T.StructField("codec", T.StringType(), True),
            T.StructField("n_samples", T.LongType(), False),
            T.StructField("sample_peak", T.IntegerType(), True),
            T.StructField("tp_q15", T.LongType(), True),
        ]
    )

    def run(batches):
        import numpy as np
        import pyarrow as pa

        from ..functions.audio import _decode_i16
        from ..functions.truepeak import TP_FIELDS, truepeak_stats

        empty = np.zeros(0, dtype=np.int16)
        for batch in batches:
            ids = batch.column(col_idx["clip_id"]).to_pylist()
            payloads = batch.column(col_idx["bytes"])
            codecs = batch.column(col_idx["codec"]).to_pylist()
            srs = batch.column(col_idx["sr_hz"]).to_pylist()
            if counter is not None:
                counter.add(batch.num_rows)
            cols: dict[str, list] = {name: [] for name in TP_FIELDS}
            for i in range(batch.num_rows):
                buf = payloads[i].as_buffer() if payloads[i].is_valid else None
                try:
                    q = _decode_i16(buf, codecs[i], srs[i])
                except (ValueError, TypeError):
                    q = empty
                st = truepeak_stats(q)
                for name in TP_FIELDS:
                    cols[name].append(st[name])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.string()),
                    pa.array(codecs, type=pa.string()),
                    pa.array(cols["n_samples"], type=pa.int64()),
                    pa.array(cols["sample_peak"], type=pa.int32()),
                    pa.array(cols["tp_q15"], type=pa.int64()),
                ],
                names=["clip_id", "codec"] + TP_FIELDS,
            )

    return df.mapInArrow(run, out_schema)


def truepeak_flags(df: DataFrame, counter=None) -> DataFrame:
    """``clip_truepeak`` + the three integer decision laws and the
    reporting-only ``tp_dbtp`` column (NULL metrics never flag)."""
    from ..functions.truepeak import FS_Q15, RAIL_I16, TP_LIMIT_Q15

    tp = F.col("tp_q15")
    over = tp > F.lit(FS_Q15)
    return (
        clip_truepeak(df, counter=counter)
        .withColumn("is_tp_over", F.coalesce(over, F.lit(False)))
        .withColumn(
            "is_hidden_over",
            F.coalesce(
                over & (F.col("sample_peak") < F.lit(RAIL_I16)),
                F.lit(False),
            ),
        )
        .withColumn(
            "is_hot",
            F.coalesce(tp > F.lit(TP_LIMIT_Q15), F.lit(False)),
        )
        .withColumn(
            "tp_dbtp",
            F.when(
                tp > 0,
                F.lit(20.0)
                * F.log10(tp.cast("double") / F.lit(float(FS_Q15))),
            ),
        )
    )


def truepeak_issues(flags: DataFrame, table: str = "clips") -> DataFrame:
    """Issue relation over the flags (reference issue schema, ONE fused
    aggregate): ``true_peak_over`` (critical — downstream clipping is
    data corruption), ``true_peak_hot`` (warning)."""
    wide = flags.agg(
        F.count(F.lit(1)).alias("__total__"),
        F.count(F.when(F.col("is_tp_over"), 1)).alias("n:true_peak_over"),
        F.count(F.when(F.col("is_hot") & ~F.col("is_tp_over"), 1)).alias(
            "n:true_peak_hot"
        ),
    )
    rules = [
        ("true_peak_over", "critical", "bytes",
         "true peak above 0 dBTP: clips any DAC/resampler downstream"),
        ("true_peak_hot", "warning", "bytes",
         "true peak above the -1 dBTP program limit (no headroom)"),
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
