"""Click / pop detection as a relational operator.

Impulsive transients (vinyl pops, capture-card glitches, splice
artifacts) are invisible to the RMS/loudness/SNR family — a 0.2 ms
spike barely moves any energy statistic — yet are plainly audible and
poison vocoder / codec training targets.  ``functions.clicks`` decides
them with EXACT integer laws (second-difference frame dominance with
clipping-rail and dropout-edge guards; see that module's docstring), so
the flags are bit-identical between Spark and the pure-Python oracle.

Execution shape: ONE ``mapInArrow`` pass, payload dropped at the
boundary, zero shuffles — scales with input splits.

Reference analog: none (audio is beyond the reference); the shape is
the per-row rule scan (checks.py) applied to kernel-computed metrics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["clip_clicks", "click_flags", "click_issues"]


def clip_clicks(df: DataFrame, counter=None) -> DataFrame:
    """(clip_id, codec, n_samples, n_frames, n_cand, n_clicks, max_d2)
    via one Arrow pass; undecodable clips come back with n_frames = 0
    and NULL max_d2."""
    col_idx = {f.name: i for i, f in enumerate(df.schema.fields)}
    out_schema = T.StructType(
        [
            T.StructField("clip_id", T.StringType(), False),
            T.StructField("codec", T.StringType(), True),
            T.StructField("n_samples", T.LongType(), False),
            T.StructField("n_frames", T.IntegerType(), False),
            T.StructField("n_cand", T.IntegerType(), False),
            T.StructField("n_clicks", T.IntegerType(), False),
            T.StructField("max_d2", T.LongType(), True),
        ]
    )

    def run(batches):
        import numpy as np
        import pyarrow as pa

        from ..functions.audio import _decode_i16
        from ..functions.clicks import CLICK_FIELDS, click_stats

        empty = np.zeros(0, dtype=np.int16)
        for batch in batches:
            ids = batch.column(col_idx["clip_id"]).to_pylist()
            payloads = batch.column(col_idx["bytes"])
            codecs = batch.column(col_idx["codec"]).to_pylist()
            srs = batch.column(col_idx["sr_hz"]).to_pylist()
            if counter is not None:
                counter.add(batch.num_rows)
            cols: dict[str, list] = {name: [] for name in CLICK_FIELDS}
            for i in range(batch.num_rows):
                buf = payloads[i].as_buffer() if payloads[i].is_valid else None
                try:
                    q = _decode_i16(buf, codecs[i], srs[i])
                except (ValueError, TypeError):
                    q = empty
                st = click_stats(q, srs[i])
                for name in CLICK_FIELDS:
                    cols[name].append(st[name])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.string()),
                    pa.array(codecs, type=pa.string()),
                    pa.array(cols["n_samples"], type=pa.int64()),
                    pa.array(cols["n_frames"], type=pa.int32()),
                    pa.array(cols["n_cand"], type=pa.int32()),
                    pa.array(cols["n_clicks"], type=pa.int32()),
                    pa.array(cols["max_d2"], type=pa.int64()),
                ],
                names=["clip_id", "codec"] + CLICK_FIELDS,
            )

    return df.mapInArrow(run, out_schema)


def click_flags(df: DataFrame, counter=None) -> DataFrame:
    """``clip_clicks`` + the decision column: ``is_clicky`` when the clip
    carries at least ``CLICK_MIN_EVENTS`` click events (integer law; an
    undecodable clip has n_clicks = 0 and never flags)."""
    from ..functions.clicks import CLICK_MIN_EVENTS

    return clip_clicks(df, counter=counter).withColumn(
        "is_clicky", F.col("n_clicks") >= F.lit(CLICK_MIN_EVENTS)
    )


def click_issues(flags: DataFrame, table: str = "clips") -> DataFrame:
    """Issue relation over the flags (reference issue schema, ONE fused
    aggregate — the audit_issues law): ``clicks`` (warning)."""
    wide = flags.agg(
        F.count(F.lit(1)).alias("__total__"),
        F.count(F.when(F.col("is_clicky"), 1)).alias("n:clicks"),
    )
    rules = [
        ("clicks", "warning", "bytes",
         "impulsive click/pop transients detected"),
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
