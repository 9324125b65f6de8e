"""Per-clip effective-bit-depth audit as a relational operator.

Finds audio whose 16-bit container lies about its resolution — 8-bit or
G.711 µ-law sources upconverted in place (see ``functions.quantization``
for the lattice signatures and why amplitude/spectral/transport stats
all miss this).  Complements the declared-metadata codec checks of the
reference (``/root/reference/src/data_quality/validation.py``) with a
sample-level test.

Execution shape matches the rest of the audio family: ONE ``mapInArrow``
pass, zero-copy Arrow buffer -> numpy, payload dropped at the boundary,
exact integer outputs (no rounding discipline needed).  Pure map — scales
with input splits, no shuffle; verdicts are Column expressions over the
exact stats so Catalyst sees (and can prune/push) the decision layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.quantization import MIN_NONZERO_DEFAULT, UPCONVERT_TZ_BITS

__all__ = ["clip_quantization", "quantization_flags", "QUANT_FIELDS"]

QUANT_FIELDS = ["n_samples", "n_nonzero", "n_distinct", "tz_bits",
                "mulaw_hits"]


def clip_quantization(df: DataFrame, counter=None) -> DataFrame:
    """(clip_id, codec, ok, n_samples, n_nonzero, n_distinct, tz_bits,
    mulaw_hits) via one Arrow pass; ``ok`` False when the clip does not
    decode (stats NULL)."""
    col_idx = {name: i for i, name in enumerate(df.schema.fieldNames())}
    out_schema = T.StructType(
        [T.StructField("clip_id", T.StringType(), False),
         T.StructField("codec", T.StringType(), True),
         T.StructField("ok", T.BooleanType(), False)]
        + [T.StructField(name, T.LongType(), True) for name in QUANT_FIELDS]
    )

    def run(batches):
        import pyarrow as pa

        from ..functions.audio import _decode_i16
        from ..functions.quantization import quantization_stats_i16

        for batch in batches:
            ids = batch.column(col_idx["clip_id"]).to_pylist()
            payloads = batch.column(col_idx["bytes"])
            codecs = batch.column(col_idx["codec"]).to_pylist()
            srs = batch.column(col_idx["sr_hz"]).to_pylist()
            if counter is not None:
                counter.add(batch.num_rows)
            oks: list[bool] = []
            cols: dict[str, list] = {name: [] for name in QUANT_FIELDS}
            for i in range(batch.num_rows):
                buf = payloads[i].as_buffer() if payloads[i].is_valid else None
                try:
                    x = _decode_i16(buf, codecs[i], srs[i])
                    st = quantization_stats_i16(x)
                    oks.append(True)
                    for name in QUANT_FIELDS:
                        cols[name].append(st[name])
                except (ValueError, TypeError):
                    oks.append(False)
                    for name in QUANT_FIELDS:
                        cols[name].append(None)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.string()),
                 pa.array(codecs, type=pa.string()),
                 pa.array(oks, type=pa.bool_())]
                + [pa.array(cols[name], type=pa.int64())
                   for name in QUANT_FIELDS],
                names=["clip_id", "codec", "ok"] + QUANT_FIELDS,
            )

    return df.mapInArrow(run, out_schema)


def quantization_flags(
    stats: DataFrame, min_nonzero: int = MIN_NONZERO_DEFAULT
) -> DataFrame:
    """Verdicts over ``clip_quantization`` output, all exact integer
    comparisons.

    Only full-resolution containers (pcm16 / wav) can be *up*converted —
    a declared µ-law clip is honestly coarse.  Clips with fewer than
    ``min_nonzero`` nonzero samples are not evaluable (verdicts NULL):
    a handful of residual samples can land on any lattice by chance.
    ``effective_bits`` (16 - tz_bits) is reported unconditionally; it is
    meaningful only alongside ``n_nonzero``.
    """
    full_res = F.col("codec").isin("pcm16", "wav")
    evaluable = F.col("ok") & (F.col("n_nonzero") >= F.lit(min_nonzero))
    bit_up = full_res & (F.col("tz_bits") >= F.lit(UPCONVERT_TZ_BITS))
    mulaw_up = full_res & (F.col("mulaw_hits") == F.col("n_nonzero"))
    return stats.select(
        "*",
        (F.lit(16) - F.col("tz_bits")).alias("effective_bits"),
        F.when(evaluable, bit_up).alias("bit_upconverted"),
        F.when(evaluable, mulaw_up).alias("mulaw_upconverted"),
        F.when(evaluable, bit_up | mulaw_up).alias("upconverted"),
    )
