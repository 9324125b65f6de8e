"""Per-clip K-weighted gated loudness (LUFS) as a relational operator.

One ``mapInArrow`` pass over (clip_id, bytes, codec, sr_hz): decode →
``functions.loudness.clip_loudness`` → scalar row.  Payload dropped at
the boundary, no shuffle — a pure map that scales with input splits
exactly like ``pipeline.featurize``.  ``ok`` is False when the clip
fails to decode (loudness fields then NULL with zero blocks); a clip
shorter than one 400 ms block or gated to nothing reports NULL LUFS
with ``ok`` True — "undecodable" and "unmeasurable" are distinct.

Reference analog: no audio path in the reference; nearest shape is its
range rules (``/root/reference/src/data_quality/checkpoints.py:178-296``)
— this mints the level measurement a presentation-loudness range rule
(e.g. ``lufs_i BETWEEN -30 AND -10``) would judge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = ["clip_lufs", "LOUDNESS_FIELDS"]

LOUDNESS_FIELDS = [
    ("n_blocks", T.IntegerType(), "int32", False),
    ("n_gated", T.IntegerType(), "int32", False),
    ("lufs_i", T.DoubleType(), "float64", True),
    ("lufs_max_m", T.DoubleType(), "float64", True),
]


def clip_lufs(df: DataFrame, counter=None) -> DataFrame:
    """(clip_id, ok, n_blocks, n_gated, lufs_i, lufs_max_m)."""
    col_idx = {f.name: i for i, f in enumerate(df.schema.fields)}
    out_schema = T.StructType(
        [T.StructField("clip_id", T.StringType(), False),
         T.StructField("ok", T.BooleanType(), False)]
        + [T.StructField(name, dt, nullable)
           for name, dt, _, nullable in LOUDNESS_FIELDS]
    )

    def run(batches):
        import numpy as np
        import pyarrow as pa

        from ..functions.audio import _decode_i16
        from ..functions.loudness import clip_loudness

        for batch in batches:
            ids = batch.column(col_idx["clip_id"]).to_pylist()
            payloads = batch.column(col_idx["bytes"])
            codecs = batch.column(col_idx["codec"]).to_pylist()
            srs = batch.column(col_idx["sr_hz"]).to_pylist()
            if counter is not None:
                counter.add(batch.num_rows)
            oks: list[bool] = []
            cols: dict[str, list] = {
                name: [] for name, _, _, _ in LOUDNESS_FIELDS
            }
            for i in range(batch.num_rows):
                buf = payloads[i].as_buffer() if payloads[i].is_valid else None
                try:
                    q = _decode_i16(buf, codecs[i], srs[i])
                    ok = True
                except (ValueError, TypeError):
                    q = np.zeros(0, dtype=np.int16)
                    ok = False
                stats = clip_loudness(
                    q.astype(np.float32) / np.float32(32767.0), srs[i] or 0
                )
                oks.append(ok)
                for name, _, _, _ in LOUDNESS_FIELDS:
                    cols[name].append(stats[name])
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.string()),
                 pa.array(oks, type=pa.bool_())]
                + [pa.array(cols[name], type=getattr(pa, pat)())
                   for name, _, pat, _ in LOUDNESS_FIELDS],
                names=["clip_id", "ok"] + [n for n, _, _, _ in LOUDNESS_FIELDS],
            )

    return df.mapInArrow(run, out_schema)
