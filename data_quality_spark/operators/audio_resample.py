"""Sample-rate normalization as a relational transform.

Training consumers want ONE sample rate; a web-scale clip table mixes them
(this corpus: 8 kHz + 16 kHz, with a 44.1 kHz declared-rate defect class).
Two shapes over ``functions.resample``:

- ``normalize_sr``   — the production transform: decode → polyphase
  resample to ``target_hz`` → re-encode pcm16, recomputing ``dur_ms`` from
  the actual output length.  Rows that cannot decode (or carry a
  non-positive rate) pass through unchanged with ``resampled = false`` —
  the gate's sr-sanity rules own their fate; a normalizer must never drop
  or damage rows it cannot read.
- ``resample_stats`` — the audit: per-clip input/output length and RMS, so
  energy conservation through the filter is a hash-checkable relation.

Both are single ``mapInArrow`` passes (pure map, no shuffle; scales with
input splits).  The polyphase tap table is designed once per (sr_in,
target) ratio per executor (lru_cache) and shared across all clips in the
partition — at 10^12 rows the design cost is zero and the per-clip cost is
one strided-GEMV pass.

Reference analog: none (no audio in the reference); this is the transform
sibling of its repair operators (``fix_critical_issues.py``) — mutate the
payload, preserve the row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = ["normalize_sr", "resample_stats", "TARGET_HZ"]

TARGET_HZ = 16000


def _resampled_f64(buf, codec, sr, target_hz):
    """decode → float64 → resample; raises on undecodable input."""
    import numpy as np

    from ..functions.audio import _decode_i16
    from ..functions.resample import resample_poly

    q = _decode_i16(buf, codec, sr)
    x = (q.astype(np.float32) / np.float32(32767.0)).astype(np.float64)
    return x, resample_poly(x, int(sr), int(target_hz))


def normalize_sr(df: DataFrame, target_hz: int = TARGET_HZ,
                 counter=None) -> DataFrame:
    """Clips table → clips table at ``target_hz`` (pcm16), plus a
    ``resampled`` flag; undecodable rows pass through untouched."""
    in_fields = list(df.schema.fields)
    col_idx = {f.name: i for i, f in enumerate(in_fields)}
    out_schema = T.StructType(
        in_fields + [T.StructField("resampled", T.BooleanType(), False)])
    names = [f.name for f in in_fields]

    def run(batches):
        import pyarrow as pa

        from ..functions.audio import encode_pcm16

        for batch in batches:
            n = batch.num_rows
            payloads = batch.column(col_idx["bytes"])
            codecs = batch.column(col_idx["codec"]).to_pylist()
            srs = batch.column(col_idx["sr_hz"]).to_pylist()
            if counter is not None:
                counter.add(n)
            # Only the four mutated columns are rebuilt; every other column
            # (including any wide passthrough payloads a caller attached) is
            # re-emitted as the original Arrow array, zero-copy.  Passthrough
            # payload rows go out as memoryviews over the input buffer — one
            # memcpy into the output array, never a Python-bytes detour.
            vals: list = [None] * n
            flags = [False] * n
            durs = batch.column(col_idx["dur_ms"]).to_pylist()
            for i in range(n):
                valid = payloads[i].is_valid
                buf = payloads[i].as_buffer() if valid else None
                sr = srs[i]
                try:
                    if sr is None or sr <= 0:
                        raise ValueError("bad sr")
                    _, y = _resampled_f64(buf, codecs[i], sr, target_hz)
                except (ValueError, TypeError):
                    if valid:
                        vals[i] = memoryview(buf)
                    continue
                vals[i] = encode_pcm16(y)
                flags[i] = True
                srs[i] = int(target_hz)
                codecs[i] = "pcm16"
                durs[i] = int(round(y.size * 1000 / target_hz))
            arrays = [batch.column(j) for j in range(batch.num_columns)]
            arrays[col_idx["bytes"]] = pa.array(vals, type=payloads.type)
            arrays[col_idx["sr_hz"]] = pa.array(
                srs, type=batch.column(col_idx["sr_hz"]).type)
            arrays[col_idx["codec"]] = pa.array(
                codecs, type=batch.column(col_idx["codec"]).type)
            arrays[col_idx["dur_ms"]] = pa.array(
                durs, type=batch.column(col_idx["dur_ms"]).type)
            arrays.append(pa.array(flags, type=pa.bool_()))
            yield pa.RecordBatch.from_arrays(arrays, names=names + ["resampled"])

    return df.mapInArrow(run, out_schema)


def resample_stats(df: DataFrame, target_hz: int = TARGET_HZ,
                   counter=None) -> DataFrame:
    """(clip_id, ok, sr_in, n_in, n_out, rms_in, rms_out) — the audit
    relation for SR normalization; rms in float64 over the float waveform,
    energy conservation through the lowpass is the checkable invariant."""
    col_idx = {f.name: i for i, f in enumerate(df.schema.fields)}
    out_schema = T.StructType([
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("ok", T.BooleanType(), False),
        T.StructField("sr_in", T.IntegerType(), True),
        T.StructField("n_in", T.IntegerType(), False),
        T.StructField("n_out", T.IntegerType(), False),
        T.StructField("rms_in", T.DoubleType(), True),
        T.StructField("rms_out", T.DoubleType(), True),
    ])

    def run(batches):
        import numpy as np
        import pyarrow as pa

        for batch in batches:
            ids = batch.column(col_idx["clip_id"]).to_pylist()
            payloads = batch.column(col_idx["bytes"])
            codecs = batch.column(col_idx["codec"]).to_pylist()
            srs = batch.column(col_idx["sr_hz"]).to_pylist()
            if counter is not None:
                counter.add(batch.num_rows)
            out = {k: [] for k in
                   ("ok", "sr_in", "n_in", "n_out", "rms_in", "rms_out")}
            for i in range(batch.num_rows):
                buf = payloads[i].as_buffer() if payloads[i].is_valid else None
                sr = srs[i]
                try:
                    if sr is None or sr <= 0:
                        raise ValueError("bad sr")
                    x, y = _resampled_f64(buf, codecs[i], sr, target_hz)
                    out["ok"].append(True)
                    out["sr_in"].append(int(sr))
                    out["n_in"].append(int(x.size))
                    out["n_out"].append(int(y.size))
                    out["rms_in"].append(
                        float(np.sqrt(np.mean(np.square(x))))
                        if x.size else None)
                    out["rms_out"].append(
                        float(np.sqrt(np.mean(np.square(y))))
                        if y.size else None)
                except (ValueError, TypeError):
                    out["ok"].append(False)
                    out["sr_in"].append(sr if sr is None else int(sr))
                    out["n_in"].append(0)
                    out["n_out"].append(0)
                    out["rms_in"].append(None)
                    out["rms_out"].append(None)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.string()),
                 pa.array(out["ok"], type=pa.bool_()),
                 pa.array(out["sr_in"], type=pa.int32()),
                 pa.array(out["n_in"], type=pa.int32()),
                 pa.array(out["n_out"], type=pa.int32()),
                 pa.array(out["rms_in"], type=pa.float64()),
                 pa.array(out["rms_out"], type=pa.float64())],
                names=["clip_id", "ok", "sr_in", "n_in", "n_out",
                       "rms_in", "rms_out"],
            )

    return df.mapInArrow(run, out_schema)
