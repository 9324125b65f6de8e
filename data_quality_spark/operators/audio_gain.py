"""Loudness normalization as a relational transform + audit.

Sibling of ``audio_resample``: two shapes over ``functions.gain``:

- ``normalize_gain`` — the production transform: decode → two-constraint
  gain (RMS target, peak ceiling) → re-encode pcm16 in one fused integer
  pass; rows that cannot decode, or are silent (gain undefined), pass
  through unchanged with ``gained = false`` — a normalizer must never drop
  or damage rows it cannot read.
- ``gain_stats`` — the audit relation: per-clip gain, in/out RMS dBFS and
  rail-clip count, so loudness convergence is a hash-checkable relation
  (differential oracle: ``oracles._audio_gain_expected``).

Both are single ``mapInArrow`` passes (pure map, no shuffle; scales with
input splits).  Same zero-copy discipline as ``normalize_sr``: only the
mutated columns are rebuilt, passthrough payloads re-emit the input Arrow
buffers via memoryview.

Reference analog: none (no audio in the reference); this is the loudness
sibling of its repair operators (``fix_critical_issues.py``) — mutate the
payload, preserve the row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..functions.gain import PEAK_CEILING_DB, TARGET_RMS_DB

__all__ = ["normalize_gain", "gain_stats"]


def normalize_gain(
    df: DataFrame,
    target_rms_db: float = TARGET_RMS_DB,
    peak_ceiling_db: float = PEAK_CEILING_DB,
    counter=None,
) -> DataFrame:
    """Clips table → clips table at the target loudness (pcm16), plus a
    ``gained`` flag; undecodable / silent rows pass through untouched."""
    in_fields = list(df.schema.fields)
    col_idx = {f.name: i for i, f in enumerate(in_fields)}
    out_schema = T.StructType(
        in_fields + [T.StructField("gained", T.BooleanType(), False)])
    names = [f.name for f in in_fields]

    def run(batches):
        import pyarrow as pa

        from ..functions.audio import _decode_i16
        from ..functions.gain import apply_gain_i16, gain_factor

        for batch in batches:
            n = batch.num_rows
            payloads = batch.column(col_idx["bytes"])
            codecs = batch.column(col_idx["codec"]).to_pylist()
            srs = batch.column(col_idx["sr_hz"]).to_pylist()
            if counter is not None:
                counter.add(n)
            vals: list = [None] * n
            flags = [False] * n
            for i in range(n):
                valid = payloads[i].is_valid
                buf = payloads[i].as_buffer() if valid else None
                try:
                    q = _decode_i16(buf, codecs[i], srs[i])
                    g = gain_factor(q, target_rms_db, peak_ceiling_db)
                    if g is None:
                        raise ValueError("silent clip")
                except (ValueError, TypeError):
                    if valid:
                        vals[i] = memoryview(buf)
                    continue
                y, _ = apply_gain_i16(q, g)
                vals[i] = y.tobytes()
                flags[i] = True
                codecs[i] = "pcm16"
            arrays = [batch.column(j) for j in range(batch.num_columns)]
            arrays[col_idx["bytes"]] = pa.array(vals, type=payloads.type)
            arrays[col_idx["codec"]] = pa.array(
                codecs, type=batch.column(col_idx["codec"]).type)
            arrays.append(pa.array(flags, type=pa.bool_()))
            yield pa.RecordBatch.from_arrays(arrays, names=names + ["gained"])

    return df.mapInArrow(run, out_schema)


def gain_stats(
    df: DataFrame,
    target_rms_db: float = TARGET_RMS_DB,
    peak_ceiling_db: float = PEAK_CEILING_DB,
    counter=None,
) -> DataFrame:
    """(clip_id, ok, gained, gain, rms_in_db, rms_out_db, n_clipped) —
    the audit relation for loudness normalization.  ``rms_out_db`` is
    measured on the actual quantized output samples, so quantization loss
    is inside the checked invariant, not assumed away."""
    col_idx = {f.name: i for i, f in enumerate(df.schema.fields)}
    out_schema = T.StructType([
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("ok", T.BooleanType(), False),
        T.StructField("gained", T.BooleanType(), False),
        T.StructField("gain", T.DoubleType(), True),
        T.StructField("rms_in_db", T.DoubleType(), True),
        T.StructField("rms_out_db", T.DoubleType(), True),
        T.StructField("n_clipped", T.IntegerType(), False),
    ])

    def run(batches):
        import pyarrow as pa

        from ..functions.audio import _decode_i16
        from ..functions.gain import apply_gain_i16, gain_factor, rms_db_i16

        for batch in batches:
            ids = batch.column(col_idx["clip_id"]).to_pylist()
            payloads = batch.column(col_idx["bytes"])
            codecs = batch.column(col_idx["codec"]).to_pylist()
            srs = batch.column(col_idx["sr_hz"]).to_pylist()
            if counter is not None:
                counter.add(batch.num_rows)
            out = {k: [] for k in ("ok", "gained", "gain", "rms_in_db",
                                   "rms_out_db", "n_clipped")}
            for i in range(batch.num_rows):
                buf = payloads[i].as_buffer() if payloads[i].is_valid else None
                try:
                    q = _decode_i16(buf, codecs[i], srs[i])
                except (ValueError, TypeError):
                    out["ok"].append(False)
                    out["gained"].append(False)
                    out["gain"].append(None)
                    out["rms_in_db"].append(None)
                    out["rms_out_db"].append(None)
                    out["n_clipped"].append(0)
                    continue
                g = gain_factor(q, target_rms_db, peak_ceiling_db)
                out["ok"].append(True)
                out["rms_in_db"].append(rms_db_i16(q))
                if g is None:
                    out["gained"].append(False)
                    out["gain"].append(None)
                    out["rms_out_db"].append(None)
                    out["n_clipped"].append(0)
                    continue
                y, n_clip = apply_gain_i16(q, g)
                out["gained"].append(True)
                out["gain"].append(g)
                out["rms_out_db"].append(rms_db_i16(y))
                out["n_clipped"].append(n_clip)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.string()),
                 pa.array(out["ok"], type=pa.bool_()),
                 pa.array(out["gained"], type=pa.bool_()),
                 pa.array(out["gain"], type=pa.float64()),
                 pa.array(out["rms_in_db"], type=pa.float64()),
                 pa.array(out["rms_out_db"], type=pa.float64()),
                 pa.array(out["n_clipped"], type=pa.int32())],
                names=["clip_id", "ok", "gained", "gain", "rms_in_db",
                       "rms_out_db", "n_clipped"],
            )

    return df.mapInArrow(run, out_schema)
