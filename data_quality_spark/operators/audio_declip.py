"""Declipping as a relational repair transform.

``declip_audio`` — clips table in, clips table out: decode → cubic-Hermite
rail-run reconstruction (``functions.declip``) → pcm16 re-encode, in ONE
``mapInArrow`` pass that also carries the repair accounting columns
(``declipped / n_railed / n_runs / n_repaired / max_run / atten``), so the
audit relation costs no second decode.  Rows that cannot decode, or have
nothing to repair, pass through with their ORIGINAL payload re-emitted
zero-copy (memoryview over the input Arrow buffer) — a repairer must never
drop or damage rows it cannot improve.

Pure map, no shuffle; scales with input splits.  Rail detection runs on the
decoded int16 domain: µ-law saturation tops out at ±32124 and is therefore
*not* treated as rail contact here — that defect class belongs to the
quantization/upconversion audit (``operators/audio_quantization.py``).

Reference analog: none (no audio in the reference); signal-domain sibling
of its repair operators (``fix_critical_issues.py`` — mutate the payload,
preserve the row), alongside ``audio_gain.normalize_gain`` and
``audio_stereo.downmix_mono``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = ["declip_audio"]

_STAT_FIELDS = [
    T.StructField("ok", T.BooleanType(), False),
    T.StructField("declipped", T.BooleanType(), False),
    T.StructField("n_railed", T.IntegerType(), False),
    T.StructField("n_runs", T.IntegerType(), False),
    T.StructField("n_repaired", T.IntegerType(), False),
    T.StructField("max_run", T.IntegerType(), False),
    T.StructField("atten", T.DoubleType(), True),
]


def declip_audio(
    df: DataFrame,
    guard: int = 0,
    max_run_ms: float = 1.0,
    counter=None,
) -> DataFrame:
    """Clips table → clips table with rail-clipped runs reconstructed
    (pcm16), plus repair-accounting columns; undecodable rows pass
    through untouched with ``ok = false``.  ``max_run_ms`` converts to a
    per-row sample cap via the row's ``sr_hz`` (``DEFAULT_MAX_RUN_LEN``
    samples when sr is missing/zero)."""
    in_fields = list(df.schema.fields)
    col_idx = {f.name: i for i, f in enumerate(in_fields)}
    names = [f.name for f in in_fields]
    stat_names = [f.name for f in _STAT_FIELDS]
    out_schema = T.StructType(in_fields + _STAT_FIELDS)

    def run(batches):
        import pyarrow as pa

        from ..functions.audio import _decode_i16
        from ..functions.declip import DEFAULT_MAX_RUN_LEN, declip_i16

        for batch in batches:
            n = batch.num_rows
            payloads = batch.column(col_idx["bytes"])
            codecs = batch.column(col_idx["codec"]).to_pylist()
            srs = batch.column(col_idx["sr_hz"]).to_pylist()
            if counter is not None:
                counter.add(n)
            vals: list = [None] * n
            stats = {k: [] for k in stat_names}
            for i in range(n):
                valid = payloads[i].is_valid
                buf = payloads[i].as_buffer() if valid else None
                try:
                    q = _decode_i16(buf, codecs[i], srs[i])
                except (ValueError, TypeError):
                    if valid:
                        vals[i] = memoryview(buf)
                    stats["ok"].append(False)
                    stats["declipped"].append(False)
                    for k in ("n_railed", "n_runs", "n_repaired", "max_run"):
                        stats[k].append(0)
                    stats["atten"].append(None)
                    continue
                sr = srs[i]
                cap = (int(sr * max_run_ms / 1000.0)
                       if sr is not None and sr > 0 else DEFAULT_MAX_RUN_LEN)
                y, st = declip_i16(q, guard, max_run_len=cap)
                stats["ok"].append(True)
                if st["n_repaired"] > 0:
                    vals[i] = y.tobytes()
                    codecs[i] = "pcm16"
                    stats["declipped"].append(True)
                else:
                    vals[i] = memoryview(buf)
                    stats["declipped"].append(False)
                for k in ("n_railed", "n_runs", "n_repaired", "max_run"):
                    stats[k].append(st[k])
                stats["atten"].append(st["atten"])
            arrays = [batch.column(j) for j in range(batch.num_columns)]
            arrays[col_idx["bytes"]] = pa.array(vals, type=payloads.type)
            arrays[col_idx["codec"]] = pa.array(
                codecs, type=batch.column(col_idx["codec"]).type)
            arrays.extend([
                pa.array(stats["ok"], type=pa.bool_()),
                pa.array(stats["declipped"], type=pa.bool_()),
                pa.array(stats["n_railed"], type=pa.int32()),
                pa.array(stats["n_runs"], type=pa.int32()),
                pa.array(stats["n_repaired"], type=pa.int32()),
                pa.array(stats["max_run"], type=pa.int32()),
                pa.array(stats["atten"], type=pa.float64()),
            ])
            yield pa.RecordBatch.from_arrays(arrays, names=names + stat_names)

    return df.mapInArrow(run, out_schema)
