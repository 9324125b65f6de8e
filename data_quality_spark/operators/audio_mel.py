"""Log-mel feature extraction as a relational transform.

The produce-the-training-input stage of an ASR data pipeline: decode →
25 ms / 10 ms log-mel matrix per clip (``functions.mel``), carried as a
binary column of float64 little-endian bytes next to its accounting
scalars.  Downstream consumers either write the table as the model's
input or drop the payload and keep the hash for lineage.

ONE ``mapInArrow`` pass, zero shuffle — the same pure-map shape as
``pipeline.featurize``; output bytes are ~n_frames·320 per clip (a 3 s
clip ≈ 96 KB), so the stage is IO-shaped exactly like the decode it
fuses with.  The per-clip matrix is batch-layout independent float64,
so its BYTES are hashable: the driver oracle demands bit-equality via
``xxhash64`` against a per-clip replay (the declip payload-hash
pattern), which catches Arrow boundary bugs, dispatch errors, and any
nondeterminism in the kernel.

Undecodable / too-short / rate-less clips emit ``ok=false`` with an
EMPTY feature matrix (zero frames) — totality, never an exception.

Reference analog: none (no audio path in the reference); this is the
transform family (downmix / trim / declip / resample) extended to the
feature domain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["mel_features"]


def mel_features(
    df: DataFrame,
    carry_cols: tuple[str, ...] = (),
    counter=None,
) -> DataFrame:
    """(clip_id, ok, sr_hz, n_frames, n_mels, feat binary[, carry…]) —
    float64 LE bytes, C-order (n_frames, n_mels).  ``carry_cols`` names
    input columns repeated onto the output row (e.g. ``ingest_day`` so
    the feature runner never joins back to the source)."""
    col_idx = {f.name: i for i, f in enumerate(df.schema.fields)}
    out_schema = T.StructType(
        [
            T.StructField("clip_id", T.StringType(), False),
            T.StructField("ok", T.BooleanType(), False),
            T.StructField("sr_hz", T.IntegerType(), True),
            T.StructField("n_frames", T.IntegerType(), False),
            T.StructField("n_mels", T.IntegerType(), False),
            T.StructField("feat", T.BinaryType(), False),
        ]
        + [df.schema[c] for c in carry_cols]
    )

    def run(batches):
        import numpy as np
        import pyarrow as pa

        from ..functions.audio import _decode_i16
        from ..functions.mel import N_MELS, log_mel

        for batch in batches:
            ids = batch.column(col_idx["clip_id"]).to_pylist()
            payloads = batch.column(col_idx["bytes"])
            codecs = batch.column(col_idx["codec"]).to_pylist()
            srs = batch.column(col_idx["sr_hz"]).to_pylist()
            if counter is not None:
                counter.add(batch.num_rows)
            oks, nfs, feats = [], [], []
            for i in range(batch.num_rows):
                buf = payloads[i].as_buffer() if payloads[i].is_valid else None
                try:
                    q = _decode_i16(buf, codecs[i], srs[i])
                    ok = True
                except (ValueError, TypeError):
                    q = np.zeros(0, dtype=np.int16)
                    ok = False
                m = log_mel(q.astype(np.float64) / 32768.0, srs[i] or 0)
                oks.append(ok)
                nfs.append(int(m.shape[0]))
                feats.append(np.ascontiguousarray(m).tobytes())
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.string()),
                    pa.array(oks, type=pa.bool_()),
                    pa.array(srs, type=pa.int32()),
                    pa.array(nfs, type=pa.int32()),
                    pa.array([N_MELS] * batch.num_rows, type=pa.int32()),
                    pa.array(feats, type=pa.binary()),
                ]
                + [batch.column(col_idx[c]) for c in carry_cols],
                names=[f.name for f in out_schema.fields],
            )

    return df.mapInArrow(run, out_schema)
