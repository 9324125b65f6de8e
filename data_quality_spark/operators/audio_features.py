"""Whole-clip spectral quality features as a relational operator.

Frequency-domain counterpart of the time-domain stats in
``pipeline.featurize`` (RMS / peak / silence / clipping): spectral centroid,
85% rolloff, flatness, and low/mid/high band balance expose the quality
defects amplitude statistics cannot see —

- **bandwidth-limited audio** (8 kHz telephony upsampled to 16 kHz):
  rolloff and band_high collapse;
- **mains hum / rumble**: band_low (< 300 Hz) dominates;
- **hiss / broadband noise**: flatness → 1 while speech sits near 0;
- **tonal artifacts** (test tones, beeps): flatness → 0 with a centroid
  pinned to the tone.

Same execution shape as every kernel stage in this repo: ONE ``mapInArrow``
pass, zero-copy Arrow buffer → numpy, payload dropped at the boundary, all
reductions float64 fixed-order (driver oracle and executors agree bitwise).
No shuffle — this is a pure map, so it scales with input splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (kept for callers)
from pyspark.sql import types as T

__all__ = ["clip_spectral", "SPECTRAL_FIELDS"]

SPECTRAL_FIELDS = [
    "centroid_hz",
    "rolloff85_hz",
    "flatness",
    "band_low",
    "band_mid",
    "band_high",
]


def clip_spectral(df: DataFrame, counter=None) -> DataFrame:
    """(clip_id, ok, centroid_hz, rolloff85_hz, flatness, band_low,
    band_mid, band_high) via one Arrow pass; ``ok`` is False when the clip
    does not decode or is shorter than one analysis frame (features NULL).
    """
    in_names = [f.name for f in df.schema.fields]
    col_idx = {name: i for i, name in enumerate(in_names)}
    out_schema = T.StructType(
        [T.StructField("clip_id", T.StringType(), False),
         T.StructField("ok", T.BooleanType(), False)]
        + [T.StructField(name, T.DoubleType(), True) for name in SPECTRAL_FIELDS]
    )

    def run(batches):
        import numpy as np
        import pyarrow as pa

        from ..functions.audio import _decode_i16
        from ..functions.spectral import spectral_features

        _EMPTY_PCM = np.zeros(0, dtype=np.int16)
        for batch in batches:
            ids = batch.column(col_idx["clip_id"]).to_pylist()
            payloads = batch.column(col_idx["bytes"])
            codecs = batch.column(col_idx["codec"]).to_pylist()
            srs = batch.column(col_idx["sr_hz"]).to_pylist()
            if counter is not None:
                counter.add(batch.num_rows)
            oks: list[bool] = []
            cols: dict[str, list] = {name: [] for name in SPECTRAL_FIELDS}
            for i in range(batch.num_rows):
                buf = payloads[i].as_buffer() if payloads[i].is_valid else None
                try:
                    x = _decode_i16(buf, codecs[i], srs[i])
                except (ValueError, TypeError):
                    x = _EMPTY_PCM
                feats = spectral_features(x, srs[i])
                oks.append(feats["centroid_hz"] is not None)
                for name in SPECTRAL_FIELDS:
                    cols[name].append(feats[name])
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.string()),
                 pa.array(oks, type=pa.bool_())]
                + [pa.array(cols[name], type=pa.float64())
                   for name in SPECTRAL_FIELDS],
                names=["clip_id", "ok"] + SPECTRAL_FIELDS,
            )

    return df.mapInArrow(run, out_schema)
