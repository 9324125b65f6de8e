"""Corpus-level CMVN statistics over stored mel-feature tables.

Cepstral/feature mean-variance normalization is the standard ASR input
transform: at training time every mel band is shifted/scaled by the
CORPUS mean and standard deviation, so the stats job is a required
pipeline stage between feature extraction (``operators/audio_mel``) and
the trainer.  The catch at engine level is determinism: a float sum
over 10^14 frames is partition-order dependent (the same corpus gives
different last-ulp stats on every run), which breaks both the repo's
hash-oracle law and byte-reproducible training configs.

The fix is the BM25/tfidf fixed-point trick: each float64 mel cell is
quantized once, per clip, to ``q = round(x * 2^16)`` (int64 — cells
are log energies, |x| < 50, so |q| < 2^23), and all cross-clip
aggregation is EXACT INTEGER arithmetic on ``q`` and ``q^2`` — sums are
associative, so the result is bit-identical under any partitioning,
batch layout, or cluster size.  Per-clip partials stay int64 (a clip
has < 10^4 frames → |Σq²| < 2^46); corpus totals are summed as
DECIMAL(38,0) so 10^12 clips cannot overflow.  The one float step —
mean/std from the exact integer moments — is a fixed expression tree of
scalar IEEE ops, replayed operation-for-operation by the twin.

Precision: 2^-16 per-cell quantization error shifts a mean by < 8e-6
and a std by < 2e-5 — noise relative to inter-band spreads (~5-20 log
units), and the REPORTED stats are rounded to 6 dp anyway; what the
quantization buys is that the 6th decimal is the same on every run.

Engine shape: ONE vectorized Arrow pass over the feature table emits
(clip, band)-level integer partials (40 longs per clip, the payload is
never shuffled); a posexplode + single partial/final aggregate on the
40 band keys produces the stats — map-side combine collapses each
partition to ≤ 40 rows before the exchange.

Reference analog: none (no audio path in the reference); this is the
feature-domain sibling of the corpus profiling family
(``operators/profiling.py``) and the consumer-side complement of
``audio_mel`` / ``audio_specaugment``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "CMVN_SCALE",
    "cmvn_partials",
    "cmvn_moments",
    "merge_cmvn_moments",
    "stats_from_moments",
    "cmvn_stats",
    "apply_cmvn",
]

CMVN_SCALE = 1 << 16  # fixed-point quantum: round(x * 2^16) per mel cell


def cmvn_partials(mel_df: DataFrame) -> DataFrame:
    """(clip_id, n_frames, sum_q array<long>, sum_q2 array<long>) —
    per-clip per-band exact integer moments of the quantized mel cells.
    Feature-less clips (``ok = false`` → zero frames) emit zero
    partials: totality, and they cancel in the corpus aggregate."""
    out_schema = T.StructType([
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("n_frames", T.IntegerType(), False),
        T.StructField("n_mels", T.IntegerType(), False),
        T.StructField("sum_q", T.ArrayType(T.LongType(), False), False),
        T.StructField("sum_q2", T.ArrayType(T.LongType(), False), False),
    ])
    col_idx = {n: i for i, n in enumerate(mel_df.columns)}

    def run(batches):
        import numpy as np
        import pyarrow as pa

        for batch in batches:
            ids, nfs, nms, sqs, sq2s = [], [], [], [], []
            feat_col = batch.column(col_idx["feat"])
            nm_col = batch.column(col_idx["n_mels"])
            id_col = batch.column(col_idx["clip_id"])
            for i in range(batch.num_rows):
                nm = nm_col[i].as_py()
                buf = feat_col[i].as_py()
                x = np.frombuffer(buf, dtype="<f8") if buf else \
                    np.zeros(0, dtype=np.float64)
                mat = x.reshape(-1, nm) if nm else x.reshape(0, 0)
                q = np.rint(mat * CMVN_SCALE).astype(np.int64)
                ids.append(id_col[i].as_py())
                nfs.append(mat.shape[0])
                nms.append(nm)
                sqs.append([int(v) for v in q.sum(axis=0)])
                sq2s.append([int(v) for v in (q * q).sum(axis=0)])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.string()),
                    pa.array(nfs, type=pa.int32()),
                    pa.array(nms, type=pa.int32()),
                    pa.array(sqs, type=pa.list_(pa.int64())),
                    pa.array(sq2s, type=pa.list_(pa.int64())),
                ],
                names=[f.name for f in out_schema.fields],
            )

    return mel_df.mapInArrow(run, out_schema)


def cmvn_moments(mel_df: DataFrame, by: tuple[str, ...] = ()) -> DataFrame:
    """(by..., band, n_clips, n_frames, s, s2) — the exact
    DECIMAL(38,0) moments per (group, band).  This is the relation an
    INCREMENTAL stats job stores: integer sums are associative, so
    moments from corpus increments merge EXACTLY
    (``merge_cmvn_moments``) — growing the corpus never re-reads
    yesterday's features.

    ``by`` keys the stats per group — e.g. join the voice-cluster label
    onto the mel table and pass ``by=("speaker",)`` for the
    ASR-standard per-speaker CMVN instead of corpus CMVN; the
    partial-aggregate shape is unchanged (group cardinality × n_mels
    rows cross the exchange)."""
    by = list(by)
    parts = cmvn_partials(mel_df.select("clip_id", "n_mels", "feat"))
    if by:
        parts = parts.join(
            mel_df.select("clip_id", *by), "clip_id")
    dec = "decimal(38,0)"
    ex = parts.select(
        *by,
        "n_frames",
        F.posexplode(F.arrays_zip("sum_q", "sum_q2")).alias("band", "z"),
    )
    return ex.groupBy(*by, "band").agg(
        F.count(F.lit(1)).cast("long").alias("n_clips"),
        F.sum("n_frames").cast("long").alias("n_frames"),
        F.sum(F.col("z.sum_q").cast(dec)).alias("s"),
        F.sum(F.col("z.sum_q2").cast(dec)).alias("s2"),
    )


def merge_cmvn_moments(*moments: DataFrame,
                       by: tuple[str, ...] = ()) -> DataFrame:
    """Exact union of moment relations (corpus increments → the full
    corpus's moments, bit-identical to a single-pass computation —
    tested).  Pass the same ``by`` keys the moments were built with."""
    if not moments:
        raise ValueError("need at least one moments relation")
    out = moments[0]
    for m in moments[1:]:
        out = out.unionByName(m)
    return out.groupBy(*by, "band").agg(
        F.sum("n_clips").cast("long").alias("n_clips"),
        F.sum("n_frames").cast("long").alias("n_frames"),
        F.sum("s").cast("decimal(38,0)").alias("s"),
        F.sum("s2").cast("decimal(38,0)").alias("s2"),
    )


def cmvn_stats(mel_df: DataFrame, decimals: int = 6) -> DataFrame:
    """(band, n_clips, n_frames, mean_r, std_r) — corpus CMVN statistics
    per mel band, bit-deterministic under any partitioning.

    ``mean``/``std`` (population) come from the exact DECIMAL(38,0)
    moments through a FIXED scalar float tree —

        mean = ((double) S  / 2^16)  / n
        ex2  = ((double) S2 / 2^32)  / n
        std  = sqrt(max(ex2 - mean*mean, 0))

    — which the differential oracle replays operation-for-operation, so
    the rounded stats hash identically.  Clips with zero frames count
    in ``n_clips`` but contribute nothing else."""
    return stats_from_moments(cmvn_moments(mel_df), decimals)


def stats_from_moments(moments: DataFrame, decimals: int = 6,
                       by: tuple[str, ...] = ()) -> DataFrame:
    """The fixed scalar float tree over a (merged) moments relation —
    see :func:`cmvn_stats` for the law.  ``by`` columns pass through
    (per-group stats, e.g. per-speaker CMVN)."""
    agg = moments.select(
        *by, "band", "n_clips", "n_frames",
        F.col("s").alias("__s"), F.col("s2").alias("__s2"),
    )
    n = F.col("n_frames").cast("double")
    mean = (F.col("__s").cast("double") / F.lit(float(CMVN_SCALE))) / n
    ex2 = (F.col("__s2").cast("double")
           / F.lit(float(CMVN_SCALE) * CMVN_SCALE)) / n
    std = F.sqrt(F.greatest(ex2 - mean * mean, F.lit(0.0)))
    return agg.select(
        *by,
        F.col("band").cast("int").alias("band"),
        "n_clips",
        "n_frames",
        F.when(F.col("n_frames") > 0, F.round(mean, decimals))
        .otherwise(F.lit(0.0)).alias("mean_r"),
        F.when(F.col("n_frames") > 0, F.round(std, decimals))
        .otherwise(F.lit(0.0)).alias("std_r"),
    )


def apply_cmvn(mel_df: DataFrame, stats: DataFrame) -> DataFrame:
    """Normalized feature table: every mel cell shifted/scaled by the
    CORPUS constants, ``y = (x - mean_b) / std_b`` per band (bands with
    ``std_r <= 0`` — degenerate, e.g. an all-floor corpus — are only
    shifted).  Schema preserved; ``feat`` is replaced by the normalized
    float64 bytes.

    ``stats`` is the (committed) ``cmvn_stats`` relation — the stats
    job runs ONCE, is stored next to the features, and every training
    shard normalizes against the same constants; this function
    ``collect()``s it (≤ n_mels rows, the bounded-collect law) and
    broadcasts the constants inside the Arrow kernel closure.  Because
    the constants are the ROUNDED published values and the arithmetic
    is two scalar IEEE ops per cell, the output bytes are
    byte-deterministic under any partitioning — the payload-grade
    oracle hashes them directly (SpecAugment pattern).

    Producer→auditor loop: ``cmvn_stats(apply_cmvn(t, s))`` reads back
    mean ≈ 0 / std ≈ 1 per band (tested) — the auditor certifies the
    producer with no shared shortcut."""
    rows = stats.select("band", "mean_r", "std_r").collect()
    means = {int(r["band"]): float(r["mean_r"]) for r in rows}
    stds = {int(r["band"]): float(r["std_r"]) for r in rows}
    col_idx = {n: i for i, n in enumerate(mel_df.columns)}
    schema = mel_df.schema

    def run(batches):
        import numpy as np
        import pyarrow as pa

        # constants per n_mels, built once (n_mels is uniform in
        # practice — the row loop must stay two vectorized ops per row)
        const_cache: dict[int, tuple] = {}

        def consts(nm: int):
            if nm not in const_cache:
                mu = np.array([means.get(b, 0.0) for b in range(nm)])
                sd = np.array([stds.get(b, 0.0) for b in range(nm)])
                const_cache[nm] = (mu, np.where(sd > 0.0, sd, 1.0))
            return const_cache[nm]

        for batch in batches:
            nm_col = batch.column(col_idx["n_mels"])
            feat_col = batch.column(col_idx["feat"])
            feats = []
            for i in range(batch.num_rows):
                nm = nm_col[i].as_py()
                mu, sd = consts(nm)
                buf = feat_col[i].as_py()
                x = np.frombuffer(buf, dtype="<f8") if buf else \
                    np.zeros(0, dtype=np.float64)
                mat = x.reshape(-1, nm) if nm else x.reshape(0, 0)
                y = (mat - mu) / sd
                feats.append(np.ascontiguousarray(y).tobytes())
            arrays = [
                pa.array(feats, type=pa.binary())
                if n == "feat" else batch.column(col_idx[n])
                for n in (f.name for f in schema.fields)
            ]
            yield pa.RecordBatch.from_arrays(
                arrays, names=[f.name for f in schema.fields])

    return mel_df.mapInArrow(run, schema)
