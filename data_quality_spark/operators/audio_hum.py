"""Mains-hum detection as a relational operator.

Electrical 50/60 Hz hum (ground loops, unbalanced cables) is a LINE
spectrum: almost all of its power sits in a handful of FFT bins at the
fundamental and low harmonics, where natural speech spreads its
low-frequency energy across the band.  ``functions.spectral.hum_stats``
measures the ±1-bin comb power fraction at both candidate fundamentals
over a long (4096-sample) Hann-windowed frame — fine enough resolution to
separate 50 from 60 Hz at every corpus rate — and the operator decides
``is_hum`` on two signals: the comb must be audible (>= 1% of total
power) AND dominate the <200 Hz band (line-vs-spread contrast).  On the
seeded corpus: 46/48 injected hums caught; the 2 misses have dominant
off-grid low-frequency content burying the comb (admissible, documented
in the kernel), and the only natural flags are genuine stationary lines
on the mains grid (the intended semantics).

The broadband ``band_low`` feature in ``audio_features`` flags "something
lives below 300 Hz"; this operator answers the follow-up a curation
pipeline actually asks — is it mains hum (fixable by a notch filter, clip
salvageable) and on which grid (50 Hz Europe/Asia vs 60 Hz Americas).

Execution shape: ONE ``mapInArrow`` pass, payload dropped at the
boundary, zero shuffles — scales with input splits.

Reference analog: none (audio is beyond the reference); the shape is the
per-row rule scan (checks.py) applied to a kernel-computed metric.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["clip_hum", "hum_flags", "HUM_FIELDS"]

HUM_FIELDS = ["hum_frac_50", "hum_frac_60", "hum_frac", "low_frac",
              "hum_contrast", "hum_hz", "hum_db"]


def clip_hum(df: DataFrame, counter=None) -> DataFrame:
    """(clip_id, codec, n_frames, hum_frac_50, hum_frac_60, hum_frac,
    low_frac, hum_contrast, hum_hz, hum_db) via one Arrow pass;
    undecodable or shorter-than-one-frame clips come back with
    n_frames = 0 and NULL metrics."""
    in_names = [f.name for f in df.schema.fields]
    col_idx = {name: i for i, name in enumerate(in_names)}
    out_schema = T.StructType(
        [
            T.StructField("clip_id", T.StringType(), False),
            T.StructField("codec", T.StringType(), True),
            T.StructField("n_frames", T.IntegerType(), False),
        ]
        + [T.StructField(name, T.DoubleType(), True) for name in HUM_FIELDS]
    )

    def run(batches):
        import numpy as np
        import pyarrow as pa

        from ..functions.audio import _decode_i16
        from ..functions.spectral import hum_stats

        empty = np.zeros(0, dtype=np.int16)
        for batch in batches:
            ids = batch.column(col_idx["clip_id"]).to_pylist()
            payloads = batch.column(col_idx["bytes"])
            codecs = batch.column(col_idx["codec"]).to_pylist()
            srs = batch.column(col_idx["sr_hz"]).to_pylist()
            if counter is not None:
                counter.add(batch.num_rows)
            nf: list[int] = []
            cols: dict[str, list] = {name: [] for name in HUM_FIELDS}
            for i in range(batch.num_rows):
                buf = payloads[i].as_buffer() if payloads[i].is_valid else None
                try:
                    x = _decode_i16(buf, codecs[i], srs[i])
                except (ValueError, TypeError):
                    x = empty
                st = hum_stats(x, srs[i])
                nf.append(int(st["n_frames"]))
                for name in HUM_FIELDS:
                    cols[name].append(st[name])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.string()),
                    pa.array(codecs, type=pa.string()),
                    pa.array(nf, type=pa.int32()),
                ]
                + [pa.array(cols[name], type=pa.float64())
                   for name in HUM_FIELDS],
                names=["clip_id", "codec", "n_frames"] + HUM_FIELDS,
            )

    return df.mapInArrow(run, out_schema)


def hum_flags(df: DataFrame, counter=None) -> DataFrame:
    """``clip_hum`` + the decision column: ``is_hum`` when the comb power
    fraction reaches the threshold (NULL metrics never flag)."""
    from ..functions.spectral import HUM_MIN_CONTRAST, HUM_MIN_FRAC

    return clip_hum(df, counter=counter).withColumn(
        "is_hum",
        F.coalesce(
            (F.col("hum_frac") >= F.lit(HUM_MIN_FRAC))
            & (F.col("hum_contrast") >= F.lit(HUM_MIN_CONTRAST)),
            F.lit(False),
        ),
    )
