"""Provenance-watermark scan as a relational operator.

Detects clips carrying a known spread-spectrum provenance key (the mark
synthetic-audio generators embed in their own output) so a training
pipeline can fence machine-generated clips out of its corpus before
they cause self-training collapse.  ``functions.watermark`` holds the
exact-integer correlation law; this module gives it the standard audit
shape: one ``mapInArrow`` pass, payload dropped at the boundary, zero
shuffles — scales with input splits.  Detection is key-specific: a clip
marked under a *different* key is statistically indistinguishable from
unmarked audio (the corpus seeds both cases to prove it).

Reference analog: none (audio is beyond the reference); the shape is
the per-row rule scan (checks.py) applied to kernel-computed metrics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.watermark import WM_KEY_DEFAULT, WM_MIN_SAMPLES, WM_TAU

__all__ = ["clip_watermarks", "watermark_flags", "watermark_issues"]


def clip_watermarks(df: DataFrame, key: int = WM_KEY_DEFAULT, counter=None) -> DataFrame:
    """(clip_id, codec, n_samples, wm_corr, energy, sigma_q2) via one
    Arrow pass; undecodable clips come back with n_samples = 0 and NULL
    sigma_q2."""
    col_idx = {f.name: i for i, f in enumerate(df.schema.fields)}
    out_schema = T.StructType(
        [
            T.StructField("clip_id", T.StringType(), False),
            T.StructField("codec", T.StringType(), True),
            T.StructField("n_samples", T.LongType(), False),
            T.StructField("wm_corr", T.LongType(), False),
            T.StructField("energy", T.LongType(), False),
            T.StructField("sigma_q2", T.LongType(), True),
        ]
    )

    def run(batches):
        import numpy as np
        import pyarrow as pa

        from ..functions.audio import _decode_i16
        from ..functions.watermark import WM_FIELDS, watermark_stats

        empty = np.zeros(0, dtype=np.int16)
        for batch in batches:
            ids = batch.column(col_idx["clip_id"]).to_pylist()
            payloads = batch.column(col_idx["bytes"])
            codecs = batch.column(col_idx["codec"]).to_pylist()
            srs = batch.column(col_idx["sr_hz"]).to_pylist()
            if counter is not None:
                counter.add(batch.num_rows)
            cols: dict[str, list] = {name: [] for name in WM_FIELDS}
            for i in range(batch.num_rows):
                buf = payloads[i].as_buffer() if payloads[i].is_valid else None
                try:
                    q = _decode_i16(buf, codecs[i], srs[i])
                except (ValueError, TypeError):
                    q = empty
                st = watermark_stats(q, key)
                for name in WM_FIELDS:
                    cols[name].append(st[name])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.string()),
                    pa.array(codecs, type=pa.string()),
                    pa.array(cols["n_samples"], type=pa.int64()),
                    pa.array(cols["wm_corr"], type=pa.int64()),
                    pa.array(cols["energy"], type=pa.int64()),
                    pa.array(cols["sigma_q2"], type=pa.int64()),
                ],
                names=["clip_id", "codec"] + WM_FIELDS,
            )

    return df.mapInArrow(run, out_schema)


def watermark_flags(df: DataFrame, key: int = WM_KEY_DEFAULT, counter=None) -> DataFrame:
    """``clip_watermarks`` + the decision column, as a Catalyst expression
    over the exact statistics (the same cross-multiplied law as
    ``functions.watermark.is_watermarked_from``; ``wm_corr^2`` can reach
    ~2.7e19, past int64, so the comparison squares in decimal(38,0) —
    exact integer arithmetic, just wider)."""
    c = F.col("wm_corr").cast("decimal(38,0)")
    rhs = (
        F.lit(WM_TAU * WM_TAU).cast("decimal(38,0)")
        * F.col("energy").cast("decimal(38,0)")
    )
    return clip_watermarks(df, key=key, counter=counter).withColumn(
        "is_watermarked",
        (F.col("n_samples") >= F.lit(WM_MIN_SAMPLES))
        & (F.col("energy") > 0)
        & (F.col("wm_corr") > 0)
        & ((c * c) >= rhs),
    )


def watermark_issues(flags: DataFrame, table: str = "clips") -> DataFrame:
    """Issue relation over the flags (reference issue schema, ONE fused
    aggregate — the audit_issues law): ``provenance_watermark``
    (warning: marked clips are machine-generated, route to quarantine)."""
    wide = flags.agg(
        F.count(F.lit(1)).alias("__total__"),
        F.count(F.when(F.col("is_watermarked"), 1)).alias("n:provenance_watermark"),
    )
    rules = [
        ("provenance_watermark", "warning", "bytes",
         "known provenance key detected: machine-generated audio"),
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
