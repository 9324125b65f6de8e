"""Per-clip transport/DAC defect stats as a relational operator.

Third leg of the audio-QC triad next to ``pipeline.featurize`` (energy) and
``operators/audio_features`` (spectrum): dropouts (interior zero runs),
stuck-sample plateaus, and DC offset — see ``functions.dropout`` for the
definitions and why amplitude/spectral stats miss them.

Same execution shape as every kernel stage here: ONE ``mapInArrow`` pass,
zero-copy Arrow buffer → numpy, payload dropped at the boundary, exact
integer outputs (hash-stable with no rounding discipline needed).  Pure
map — scales with input splits, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.dropout import DROPOUT_MS_DEFAULT

__all__ = ["clip_dropout", "DROPOUT_FIELDS", "dropout_flags"]

DROPOUT_FIELDS = [
    "n_samples",
    "max_zero_run",
    "n_dropouts",
    "dropout_samples",
    "max_const_run",
    "dc_sum",
]

# |mean| > (DC_NUM/DC_DEN)·32768 full-scale flags a biased converter; 1/50
# = 2% of full scale, far above dither yet far below program material
DC_NUM, DC_DEN = 1, 50
STUCK_MIN_DEFAULT = 64  # ≥ this many identical nonzero samples = stuck


def clip_dropout(
    df: DataFrame, dropout_ms: int = DROPOUT_MS_DEFAULT, counter=None
) -> DataFrame:
    """(clip_id, ok, n_samples, max_zero_run, n_dropouts, dropout_samples,
    max_const_run, dc_sum) via one Arrow pass; ``ok`` False when the clip
    does not decode (stats NULL)."""
    col_idx = {name: i for i, name in enumerate(df.schema.fieldNames())}
    out_schema = T.StructType(
        [T.StructField("clip_id", T.StringType(), False),
         T.StructField("ok", T.BooleanType(), False)]
        + [T.StructField(name, T.LongType(), True) for name in DROPOUT_FIELDS]
    )

    def run(batches):
        import pyarrow as pa

        from ..functions.audio import _decode_i16
        from ..functions.dropout import dropout_stats_i16

        for batch in batches:
            ids = batch.column(col_idx["clip_id"]).to_pylist()
            payloads = batch.column(col_idx["bytes"])
            codecs = batch.column(col_idx["codec"]).to_pylist()
            srs = batch.column(col_idx["sr_hz"]).to_pylist()
            if counter is not None:
                counter.add(batch.num_rows)
            oks: list[bool] = []
            cols: dict[str, list] = {name: [] for name in DROPOUT_FIELDS}
            for i in range(batch.num_rows):
                buf = payloads[i].as_buffer() if payloads[i].is_valid else None
                try:
                    x = _decode_i16(buf, codecs[i], srs[i])
                    st = dropout_stats_i16(x, srs[i], dropout_ms)
                    oks.append(True)
                    for name in DROPOUT_FIELDS:
                        cols[name].append(st[name])
                except (ValueError, TypeError):
                    oks.append(False)
                    for name in DROPOUT_FIELDS:
                        cols[name].append(None)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.string()),
                 pa.array(oks, type=pa.bool_())]
                + [pa.array(cols[name], type=pa.int64())
                   for name in DROPOUT_FIELDS],
                names=["clip_id", "ok"] + DROPOUT_FIELDS,
            )

    return df.mapInArrow(run, out_schema)


def dropout_flags(
    stats: DataFrame, stuck_min: int = STUCK_MIN_DEFAULT
) -> DataFrame:
    """Boolean defect verdicts over ``clip_dropout`` output, all exact
    integer comparisons (the DC law cross-multiplies |dc_sum|·DEN against
    NUM·n·32768 — no float ever materializes)."""
    return stats.select(
        "*",
        (F.col("n_dropouts") > 0).alias("has_dropout"),
        (F.col("max_const_run") >= stuck_min).alias("has_stuck"),
        (
            F.abs(F.col("dc_sum")) * F.lit(DC_DEN)
            > F.lit(DC_NUM) * F.col("n_samples") * F.lit(32768)
        ).alias("has_dc_offset"),
    )
