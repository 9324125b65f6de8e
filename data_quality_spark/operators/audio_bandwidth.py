"""Effective-bandwidth audit: claimed sample rate vs actual content.

A 10^12-clip corpus accumulates upsampled audio — 8 kHz telephony
re-encoded into 16 kHz containers, codec chains that low-passed
everything above 4 kHz — and a model conditioned on "16 kHz speech"
degrades on it.  The container says sr_hz; only the spectrum says
whether the top octave carries native content or just interpolation
images.

One ``mapInArrow`` pass (decode → ``spectral.bandwidth_stats``: Hann-
windowed frames, deep band at [0.4·sr, sr/2]), then a JVM projection
for the flag: ``upsampled`` when the clip is loud enough to measure
(near-silent clips measure their own quantization noise, flat at the
container rate) and the deep band sits below ``max_hf_db``.  Measured
on the seeded corpus after 8→16 kHz polyphase upsampling: upsampled
clips ≤ −64 dB, native ≥ −41 dB — a 24 dB decision gap.  Known false
negative: hard-clipped content re-acquires HF through resampler
overshoot re-clipping (the clipping rule owns those clips).  Composes
with ``audio_resample.normalize_sr`` — run it after SR normalization
and it flags exactly the clips whose content did not fill the target
rate.

Reference analog: no audio path in the reference; nearest shape is its
range rules (``/root/reference/src/data_quality/checkpoints.py:178``)
— this mints the measurement such a rule would judge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["clip_bandwidth", "bandwidth_flags"]


def clip_bandwidth(df: DataFrame, counter=None) -> DataFrame:
    """(clip_id, ok, sr_hz, n_frames, rms, rolloff99_hz, hf_frac, hf_db)."""
    col_idx = {f.name: i for i, f in enumerate(df.schema.fields)}
    out_schema = T.StructType([
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("ok", T.BooleanType(), False),
        T.StructField("sr_hz", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), False),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("rolloff99_hz", T.DoubleType(), True),
        T.StructField("hf_frac", T.DoubleType(), True),
        T.StructField("hf_db", T.DoubleType(), True),
    ])

    def run(batches):
        import numpy as np
        import pyarrow as pa

        from ..functions.audio import _decode_i16
        from ..functions.spectral import bandwidth_stats

        for batch in batches:
            ids = batch.column(col_idx["clip_id"]).to_pylist()
            payloads = batch.column(col_idx["bytes"])
            codecs = batch.column(col_idx["codec"]).to_pylist()
            srs = batch.column(col_idx["sr_hz"]).to_pylist()
            if counter is not None:
                counter.add(batch.num_rows)
            out = {k: [] for k in ("ok", "n_frames", "rms", "rolloff99_hz",
                                   "hf_frac", "hf_db")}
            for i in range(batch.num_rows):
                buf = payloads[i].as_buffer() if payloads[i].is_valid else None
                try:
                    q = _decode_i16(buf, codecs[i], srs[i])
                    ok = True
                except (ValueError, TypeError):
                    q = np.zeros(0, dtype=np.int16)
                    ok = False
                st = bandwidth_stats(
                    q.astype(np.float32) / np.float32(32767.0), srs[i] or 0)
                out["ok"].append(ok)
                for k in ("n_frames", "rms", "rolloff99_hz", "hf_frac",
                          "hf_db"):
                    out[k].append(st[k])
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.string()),
                 pa.array(out["ok"], type=pa.bool_()),
                 pa.array(srs, type=pa.int32()),
                 pa.array(out["n_frames"], type=pa.int32()),
                 pa.array(out["rms"], type=pa.float64()),
                 pa.array(out["rolloff99_hz"], type=pa.float64()),
                 pa.array(out["hf_frac"], type=pa.float64()),
                 pa.array(out["hf_db"], type=pa.float64())],
                names=["clip_id", "ok", "sr_hz", "n_frames", "rms",
                       "rolloff99_hz", "hf_frac", "hf_db"],
            )

    return df.mapInArrow(run, out_schema)


MIN_MEASURABLE_RMS = 0.01   # −40 dBFS: below this the flat quantization
                            # noise of the re-encode dominates the deep band
MAX_UPSAMPLED_HF_DB = -52.0  # midpoint of the measured 24 dB gap


def bandwidth_flags(
    bw: DataFrame,
    *,
    min_rms: float = MIN_MEASURABLE_RMS,
    max_hf_db: float = MAX_UPSAMPLED_HF_DB,
) -> DataFrame:
    """Adds ``upsampled``: loud-enough-to-measure clip whose deep top
    band is empty.  NULL-measurement and near-silent rows get False —
    other rules own those failure modes."""
    return bw.withColumn(
        "upsampled",
        F.coalesce(
            (F.col("rms") >= F.lit(min_rms))
            & (F.col("hf_db") < F.lit(max_hf_db)),
            F.lit(False),
        ),
    )
