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

__all__ = [
    "clip_watermarks",
    "watermark_flags",
    "watermark_issues",
    "mark_clips",
    "watermark_detection_curve",
]


def mark_clips(df: DataFrame, key: int = WM_KEY_DEFAULT) -> DataFrame:
    """The embedding side: re-emit the table with the key's carrier
    embedded in every ELIGIBLE clip (decodable, >= WM_MIN_SAMPLES —
    marks below the integration floor would be undetectable), re-encoded
    pcm16; a ``marked`` column records what actually happened.  The
    transform a pipeline applies to its own synthetic/TTS output so the
    detector can fence it out of future training corpora.  One
    ``mapInArrow`` pass, zero shuffles; columns other than bytes/codec
    pass through as the original zero-copy Arrow arrays."""
    col_idx = {f.name: i for i, f in enumerate(df.schema.fields)}
    names = [f.name for f in df.schema.fields]
    schema = T.StructType(
        df.schema.fields + [T.StructField("marked", T.BooleanType(), False)]
    )

    def run(batches):
        import pyarrow as pa

        from ..functions.audio import _decode_i16
        from ..functions.watermark import WM_MIN_SAMPLES as _MINS
        from ..functions.watermark import embed_watermark

        b_idx, c_idx = col_idx["bytes"], col_idx["codec"]
        for batch in batches:
            payloads = batch.column(b_idx)
            codecs = batch.column(c_idx).to_pylist()
            srs = batch.column(col_idx["sr_hz"]).to_pylist()
            out_bytes: list = []
            out_codec: list = []
            marked: list = []
            for i in range(batch.num_rows):
                raw = payloads[i].as_buffer() if payloads[i].is_valid else None
                ok = False
                try:
                    q = _decode_i16(raw, codecs[i], srs[i])
                    if len(q) >= _MINS:
                        # embed returns int16 — emit the samples exactly,
                        # no float round-trip
                        out_bytes.append(
                            embed_watermark(q, key).astype("<i2").tobytes()
                        )
                        out_codec.append("pcm16")
                        ok = True
                except (ValueError, TypeError):
                    pass
                if not ok:
                    out_bytes.append(bytes(raw) if raw is not None else None)
                    out_codec.append(codecs[i])
                marked.append(ok)
            arrays = []
            for j, name in enumerate(names):
                if j == b_idx:
                    arrays.append(pa.array(out_bytes, type=payloads.type))
                elif j == c_idx:
                    arrays.append(pa.array(out_codec, type=batch.column(c_idx).type))
                else:
                    arrays.append(batch.column(j))
            arrays.append(pa.array(marked, type=pa.bool_()))
            yield pa.RecordBatch.from_arrays(arrays, names=names + ["marked"])

    return df.mapInArrow(run, schema)


def clip_watermarks(
    df: DataFrame,
    key: int = WM_KEY_DEFAULT,
    counter=None,
    carry_cols: tuple = (),
) -> DataFrame:
    """(clip_id, codec, n_samples, wm_corr, energy, sigma_q2) via one
    Arrow pass; undecodable clips come back with n_samples = 0 and NULL
    sigma_q2.  ``carry_cols`` names extra input columns to pass through
    zero-copy (e.g. ``mark_clips``'s ``marked`` flag — carrying it beats
    a join that would re-run the upstream embed pass)."""
    col_idx = {f.name: i for i, f in enumerate(df.schema.fields)}
    by_name = {f.name: f for f in df.schema.fields}
    out_schema = T.StructType(
        [
            T.StructField("clip_id", T.StringType(), False),
            T.StructField("codec", T.StringType(), True),
            T.StructField("n_samples", T.LongType(), False),
            T.StructField("wm_corr", T.LongType(), False),
            T.StructField("energy", T.LongType(), False),
            T.StructField("sigma_q2", T.LongType(), True),
        ]
        + [by_name[c] for c in carry_cols]
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
                ]
                + [batch.column(col_idx[c]) for c in carry_cols],
                names=["clip_id", "codec"] + WM_FIELDS + list(carry_cols),
            )

    return df.mapInArrow(run, out_schema)


def watermark_flags(
    df: DataFrame,
    key: int = WM_KEY_DEFAULT,
    counter=None,
    carry_cols: tuple = (),
) -> DataFrame:
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
    return clip_watermarks(
        df, key=key, counter=counter, carry_cols=carry_cols
    ).withColumn(
        "is_watermarked",
        (F.col("n_samples") >= F.lit(WM_MIN_SAMPLES))
        & (F.col("energy") > 0)
        & (F.col("wm_corr") > 0)
        & ((c * c) >= rhs),
    )


def watermark_detection_curve(flags: DataFrame, *group_cols: str) -> DataFrame:
    """Detection-rate curve over ``watermark_flags`` output, grouped by
    caller-supplied condition columns (perturbation config, marked vs
    control arm, ...): per group, clip count, detections, the rate, and
    the minimum detected ``sigma_q2`` (the decision margin's worst case
    — NULL where nothing detected).  ONE fused partial/final aggregate;
    the only shuffle carries a handful of group rows, never clips —
    the accuracy-tradeoff-as-data shape at 10^12-clip scale."""
    return flags.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.count(F.lit(1)).cast("long").alias("n_clips"),
        F.count(F.when(F.col("is_watermarked"), 1)).cast("long")
        .alias("n_detected"),
        F.round(
            F.count(F.when(F.col("is_watermarked"), 1))
            / F.count(F.lit(1)), 4
        ).alias("detect_rate_r"),
        F.min(F.when(F.col("is_watermarked"), F.col("sigma_q2")))
        .alias("min_sigma_q2"),
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
