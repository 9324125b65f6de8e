"""Augmented-copy writer as a relational operator (training-data
producer).

Emits one augmented clip row per (decodable input clip × spec) with
full provenance (``src_clip_id``, ``aug_name``) and a valid clips
schema, so the ENTIRE existing operator family — the gate, every audit,
the dedup ladder — runs unchanged on augmented corpora.  Byte
determinism is the contract (see ``functions.augment``): the same
(clip, spec) produces the same payload on any executor, any
partitioning, any rerun — which is what makes augmented corpora
resumable and their lineage meaningful at 10^12 clips.

Execution shape: ONE ``mapInArrow`` pass, 1→len(specs) fan-out inside
the Arrow batch (no join, no explode-shuffle); undecodable inputs emit
nothing (they are the audit family's finding, not the producer's).
Payload bytes stay columnar Arrow end-to-end.

Reference parity: no reference analog; the provenance columns follow
the lineage-ledger discipline of the runners.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..functions.augment import DEFAULT_SPECS

__all__ = ["augment_clips"]


def augment_clips(
    df: DataFrame,
    specs: tuple = DEFAULT_SPECS,
    counter=None,
) -> DataFrame:
    """(clip_id, bytes, sr_hz, dur_ms, codec, transcript, ingest_day,
    src_clip_id, aug_name) — one row per decodable clip per spec;
    ``clip_id`` = ``src~aug_name``."""
    col_idx = {f.name: i for i, f in enumerate(df.schema.fields)}
    out_schema = T.StructType(
        [T.StructField("clip_id", T.StringType(), False),
         T.StructField("bytes", T.BinaryType(), False),
         T.StructField("sr_hz", T.IntegerType(), True),
         T.StructField("dur_ms", T.IntegerType(), True),
         T.StructField("codec", T.StringType(), False),
         T.StructField("transcript", T.StringType(), True),
         T.StructField("ingest_day", T.StringType(), True),
         T.StructField("src_clip_id", T.StringType(), False),
         T.StructField("aug_name", T.StringType(), False)]
    )

    def run(batches):
        import numpy as np
        import pyarrow as pa

        from ..functions.audio import _decode_i16
        from ..functions.augment import augment_i16

        for batch in batches:
            ids = batch.column(col_idx["clip_id"]).to_pylist()
            payloads = batch.column(col_idx["bytes"])
            codecs = batch.column(col_idx["codec"]).to_pylist()
            srs = batch.column(col_idx["sr_hz"]).to_pylist()
            trans = batch.column(col_idx["transcript"]).to_pylist()
            days = batch.column(col_idx["ingest_day"]).to_pylist()
            if counter is not None:
                counter.add(batch.num_rows)
            cols = {k: [] for k in (
                "clip_id", "bytes", "sr_hz", "dur_ms", "codec",
                "transcript", "ingest_day", "src_clip_id", "aug_name",
            )}
            for i in range(batch.num_rows):
                buf = payloads[i].as_buffer() if payloads[i].is_valid \
                    else None
                try:
                    q = _decode_i16(buf, codecs[i], srs[i])
                except (ValueError, TypeError):
                    continue
                if not srs[i] or srs[i] <= 0:
                    continue
                for name, params in specs:
                    y, dur_ms = augment_i16(
                        np.asarray(q), srs[i], ids[i], name, params
                    )
                    cols["clip_id"].append(f"{ids[i]}~{name}")
                    cols["bytes"].append(y.astype("<i2").tobytes())
                    cols["sr_hz"].append(srs[i])
                    cols["dur_ms"].append(dur_ms)
                    cols["codec"].append("pcm16")
                    cols["transcript"].append(trans[i])
                    cols["ingest_day"].append(days[i])
                    cols["src_clip_id"].append(ids[i])
                    cols["aug_name"].append(name)
            yield pa.RecordBatch.from_arrays(
                [pa.array(cols["clip_id"], type=pa.string()),
                 pa.array(cols["bytes"], type=pa.binary()),
                 pa.array(cols["sr_hz"], type=pa.int32()),
                 pa.array(cols["dur_ms"], type=pa.int32()),
                 pa.array(cols["codec"], type=pa.string()),
                 pa.array(cols["transcript"], type=pa.string()),
                 pa.array(cols["ingest_day"], type=pa.string()),
                 pa.array(cols["src_clip_id"], type=pa.string()),
                 pa.array(cols["aug_name"], type=pa.string())],
                names=[f.name for f in out_schema.fields],
            )

    return df.mapInArrow(run, out_schema)
