"""SpecAugment over stored log-mel feature tables (training-input
producer, second stage).

Park et al. 2019's masking policy applied to the mel tables
``run_feature_pipeline`` / ``mel_features`` write: ``n_freq_masks``
bands of width U[0, ``freq_mask``] mel bins and ``n_time_masks`` spans
of width U[0, ``time_mask``] frames are set to the kernel's
``LOG_FLOOR`` log value (silence — masking to the floor, not to zero,
keeps the masked cells inside the feature's own value domain).  All
mask draws come from the from-spec XXH64 of ``clip_id`` — the same
clip always gets the same masks on any executor, so augmented feature
tables are byte-deterministic and resumable exactly like every other
producer here.

This operator consumes FEATURES, not audio: at 10^12 clips the decode
+ mel pass is checkpointed once (the feature runner) and each
augmentation policy is a cheap map over the stored tables — no decode,
no shuffle, scales with input splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = ["specaugment"]


def specaugment(
    feats: DataFrame,
    freq_mask: int = 8,
    time_mask: int = 20,
    n_freq_masks: int = 2,
    n_time_masks: int = 2,
    counter=None,
) -> DataFrame:
    """(clip_id, ok, n_frames, n_mels, feat, n_freq_masked,
    n_time_masked) — masked float64 feature bytes; non-ok rows pass
    through untouched with zero mask counts."""
    col_idx = {f.name: i for i, f in enumerate(feats.schema.fields)}
    out_schema = T.StructType(
        [T.StructField("clip_id", T.StringType(), False),
         T.StructField("ok", T.BooleanType(), False),
         T.StructField("n_frames", T.IntegerType(), False),
         T.StructField("n_mels", T.IntegerType(), False),
         T.StructField("feat", T.BinaryType(), False),
         T.StructField("n_freq_masked", T.IntegerType(), False),
         T.StructField("n_time_masked", T.IntegerType(), False)]
    )

    def run(batches):
        import numpy as np
        import pyarrow as pa

        from ..functions.mel import LOG_FLOOR
        from ..functions.xxh64 import xxh64_string

        log_floor = float(np.log(LOG_FLOOR))

        for batch in batches:
            ids = batch.column(col_idx["clip_id"]).to_pylist()
            oks = batch.column(col_idx["ok"]).to_pylist()
            nfs = batch.column(col_idx["n_frames"]).to_pylist()
            nms = batch.column(col_idx["n_mels"]).to_pylist()
            payloads = batch.column(col_idx["feat"])
            if counter is not None:
                counter.add(batch.num_rows)
            out_feat, out_fm, out_tm = [], [], []
            for i in range(batch.num_rows):
                raw = payloads[i].as_py() if payloads[i].is_valid else b""
                nf, nm = int(nfs[i] or 0), int(nms[i] or 0)
                if not oks[i] or nf == 0 or nm == 0:
                    out_feat.append(raw)
                    out_fm.append(0)
                    out_tm.append(0)
                    continue
                m = np.frombuffer(raw, dtype="<f8").reshape(
                    nf, nm
                ).copy()
                seed = xxh64_string(f"{ids[i]}:specaug", 42) \
                    & ((1 << 64) - 1)
                rng = np.random.default_rng(seed)
                fm_cells = tm_cells = 0
                for _ in range(n_freq_masks):
                    w = int(rng.integers(0, freq_mask + 1))
                    if w == 0 or w >= nm:
                        continue
                    f0 = int(rng.integers(0, nm - w + 1))
                    m[:, f0: f0 + w] = log_floor
                    fm_cells += w
                for _ in range(n_time_masks):
                    w = int(rng.integers(0, time_mask + 1))
                    if w == 0 or w >= nf:
                        continue
                    t0 = int(rng.integers(0, nf - w + 1))
                    m[t0: t0 + w, :] = log_floor
                    tm_cells += w
                out_feat.append(m.astype("<f8").tobytes())
                out_fm.append(fm_cells)
                out_tm.append(tm_cells)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.string()),
                 pa.array(oks, type=pa.bool_()),
                 pa.array([int(v or 0) for v in nfs], type=pa.int32()),
                 pa.array([int(v or 0) for v in nms], type=pa.int32()),
                 pa.array(out_feat, type=pa.binary()),
                 pa.array(out_fm, type=pa.int32()),
                 pa.array(out_tm, type=pa.int32())],
                names=[f.name for f in out_schema.fields],
            )

    return feats.mapInArrow(run, out_schema)
