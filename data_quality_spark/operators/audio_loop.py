"""Looped-audio detection: clips whose waveform is a tiled copy of a
short segment.

Synthesized padding, stuck stream buffers, and TTS cache bugs all
produce clips that LOOK like normal-length audio but carry only a few
hundred ms of real signal repeated end-to-end — worthless (and
distribution-skewing) as training data, and invisible to every
per-clip statistic that is invariant under tiling (RMS, silence
fraction, loudness, language of the transcript).

Detector: the clip's own Philips-style subfingerprint stream
(``functions.spectral.fingerprint_i32`` — the SAME kernel the dedup
path trusts) compared against itself at every lag.  A loop of period P
frames makes ``fp[i] == fp[i+P]`` for nearly every i; natural speech
never repeats 15-bit double-difference patterns frame-exactly at a
constant lag.  Two guards keep the decision honest:

- **degenerate-stream guard**: near-silent or pure-tone clips have
  near-constant fingerprints that "match" at EVERY lag; they are
  skipped via a minimum distinct-word count AND a dominant-word share
  bound (most frequent word covering > half the frames — measured on
  the 100k corpus, 92-96%-silent clips carry one silence word at ~90%
  share with just enough distinct burst words to pass a count-only
  guard).  The audit relations own silence/tonality defects;
- **exact-integer decision law**: the flag is
  ``matches · DEN ≥ NUM · valid`` (cross-multiplied rational compare)
  and the best lag maximizes ``matches/valid`` by integer
  cross-multiplication with smallest-lag tiebreak — no float ever
  decides a flag or a lag, so the pure-Python twin reproduces every
  row bit-for-bit.

Engine shape: ONE ``mapInArrow`` pass (decode → fingerprint → O(n²)
lag scan over ≤ a few hundred ints per clip), zero shuffles — the scan
is per-row work bounded by clip length, the 10^12-clip shape.

Alignment envelope (measured, tested): the scan catches loops whose
period lands on the fingerprint hop grid after a whole number of
periods (a half-hop period matches at the 2-period lag with fraction
1.0); a period at an ARBITRARY sample offset never frame-aligns and is
invisible to frame-exact equality (measured best fraction ~0.06) —
the same aligned/arbitrary split as the excerpt matchers, where only
the constellation path recovers arbitrary offsets.  Buffer-repeat
defects are hop-aligned by construction (buffers are power-of-two
sized); :func:`loop_scan_samples` below IS the arbitrary-offset
extension — FFT autocorrelation proposes the lag, exact int16 sample
equality decides.

Reference analog: none (no media in the reference); the nearest shape
is its duplicate scan, applied WITHIN one row's payload instead of
across rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "loop_scan",
    "loop_scan_samples",
    "propose_lag_samples",
    "loop_issues",
    "LOOP_FRAC_NUM",
    "LOOP_FRAC_DEN",
    "MIN_DISTINCT",
    "DOMINANT_NUM",
    "DOMINANT_DEN",
]

LOOP_FRAC_NUM = 9       # looped iff matches·DEN ≥ NUM·valid (i.e. ≥ 0.9)
LOOP_FRAC_DEN = 10
MIN_DISTINCT = 8        # fewer distinct fingerprint words = degenerate
# degenerate too when ONE word covers more than half the frames
# (2·n_dominant > n_frames, exact-integer)
DOMINANT_NUM = 1
DOMINANT_DEN = 2
# sample-domain scans need a higher distinct floor: a near-silent dither
# stream has single-digit distinct int16 VALUES and matches ~94% at any
# lag by chance (measured: 9 distinct at −65.6 dB), while the quietest
# real tonal content in the corpus carries 204+ — 64 splits the classes
# with margin on both sides
SAMPLE_MIN_DISTINCT = 64


def _is_degenerate(n_frames: int, n_distinct: int, n_dominant: int) -> bool:
    """The shared guard law (kernel + issue rollup + twin)."""
    return (
        n_distinct < MIN_DISTINCT
        or n_dominant * DOMINANT_DEN > DOMINANT_NUM * n_frames
    )


def loop_scan(
    df: DataFrame,
    min_lag: int = 8,
    min_overlap: int = 16,
    counter=None,
) -> DataFrame:
    """One row per clip: best self-match lag and its exact match
    fraction, plus the ``looped`` decision.

    Columns: clip_id, ok (decode), n_frames, n_distinct, n_dominant
    (occurrences of the most frequent word — the degenerate guard's
    second input), best_lag (NULL when no admissible lag),
    match_num/match_den (the exact rational — ``match_num/match_den``
    is the fraction the flag is computed from), looped.
    """
    col_idx = {f.name: i for i, f in enumerate(df.schema.fields)}
    out_schema = T.StructType([
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("ok", T.BooleanType(), False),
        T.StructField("n_frames", T.IntegerType(), False),
        T.StructField("n_distinct", T.IntegerType(), False),
        T.StructField("n_dominant", T.IntegerType(), False),
        T.StructField("best_lag", T.IntegerType(), True),
        T.StructField("match_num", T.LongType(), True),
        T.StructField("match_den", T.LongType(), True),
        T.StructField("looped", T.BooleanType(), False),
    ])

    def run(batches):
        import numpy as np
        import pyarrow as pa

        from ..functions.audio import _decode_i16
        from ..functions.spectral import fingerprint_i32

        for batch in batches:
            ids = batch.column(col_idx["clip_id"]).to_pylist()
            payloads = batch.column(col_idx["bytes"])
            codecs = batch.column(col_idx["codec"]).to_pylist()
            srs = batch.column(col_idx["sr_hz"]).to_pylist()
            if counter is not None:
                counter.add(batch.num_rows)
            out = {k: [] for k in ("ok", "n_frames", "n_distinct",
                                   "n_dominant", "best_lag", "match_num",
                                   "match_den", "looped")}
            for i in range(batch.num_rows):
                buf = payloads[i].as_buffer() if payloads[i].is_valid else None
                try:
                    q = _decode_i16(buf, codecs[i], srs[i])
                    ok = True
                except (ValueError, TypeError):
                    q = np.zeros(0, dtype=np.int16)
                    ok = False
                fp = fingerprint_i32(q)
                n = int(fp.size)
                if n:
                    _, cnts = np.unique(fp, return_counts=True)
                    distinct = int(cnts.size)
                    dominant = int(cnts.max())
                else:
                    distinct = dominant = 0
                best = None  # (matches, valid, lag)
                for lag in range(min_lag, n - min_overlap + 1):
                    valid = n - lag
                    m = int((fp[:valid] == fp[lag:]).sum())
                    if best is None or m * best[1] > best[0] * valid:
                        best = (m, valid, lag)
                looped = (
                    best is not None
                    and not _is_degenerate(n, distinct, dominant)
                    and best[0] * LOOP_FRAC_DEN >= LOOP_FRAC_NUM * best[1]
                )
                out["ok"].append(ok)
                out["n_frames"].append(n)
                out["n_distinct"].append(distinct)
                out["n_dominant"].append(dominant)
                out["best_lag"].append(best[2] if best else None)
                out["match_num"].append(best[0] if best else None)
                out["match_den"].append(best[1] if best else None)
                out["looped"].append(looped)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.string()),
                 pa.array(out["ok"], type=pa.bool_()),
                 pa.array(out["n_frames"], type=pa.int32()),
                 pa.array(out["n_distinct"], type=pa.int32()),
                 pa.array(out["n_dominant"], type=pa.int32()),
                 pa.array(out["best_lag"], type=pa.int32()),
                 pa.array(out["match_num"], type=pa.int64()),
                 pa.array(out["match_den"], type=pa.int64()),
                 pa.array(out["looped"], type=pa.bool_())],
                names=["clip_id", "ok", "n_frames", "n_distinct",
                       "n_dominant", "best_lag", "match_num", "match_den",
                       "looped"],
            )

    return df.mapInArrow(run, out_schema)


def loop_issues(scan: DataFrame, table: str = "clips") -> DataFrame:
    """Issue relation over the loop scan (reference issue schema, ONE
    fused aggregate — the audit_issues law): ``looped`` (critical) and
    ``degenerate_stream`` (info — too few distinct fingerprint words to
    even test; the silence/tonality audits own those clips)."""
    degenerate = (F.col("n_distinct") < F.lit(MIN_DISTINCT)) | (
        F.col("n_dominant") * F.lit(DOMINANT_DEN)
        > F.lit(DOMINANT_NUM) * F.col("n_frames")
    )
    wide = scan.agg(
        F.count(F.lit(1)).alias("__total__"),
        F.count(F.when(F.col("looped"), 1)).alias("n:looped"),
        F.count(
            F.when((F.col("n_frames") > 0) & degenerate, 1)
        ).alias("n:degenerate_stream"),
    )
    rules = [
        ("looped", "critical", "bytes",
         "payload is a tiled copy of a short segment"),
        ("degenerate_stream", "info", "bytes",
         "too few distinct fingerprint words to test for loops"),
    ]
    structs = []
    for name, sev, column, desc in rules:
        cnt = F.col(f"n:{name}")
        total = F.col("__total__")
        structs.append(F.struct(
            F.lit(table).alias("table"),
            F.lit(column).alias("column"),
            F.lit(name).alias("issue_type"),
            cnt.alias("count"),
            total.alias("total"),
            F.when(total > 0, cnt * 100.0 / total).otherwise(F.lit(0.0))
            .cast("double").alias("percent"),
            F.when(cnt > 0, F.lit(sev)).otherwise(F.lit("info"))
            .alias("severity"),
            F.lit(desc).alias("description"),
        ))
    return wide.select(F.explode(F.array(*structs)).alias("i")).select("i.*")


def propose_lag_candidates(
    q, min_lag: int, min_overlap: int, k: int = 64
):
    """Shared proposal kernel for the sample-domain scan: zero-padded
    FFT autocorrelation, top-``k`` LOCAL MAXIMA over the admissible lag
    window, returned as candidate lags.

    A candidate SET (not a single argmax) because quasi-periodic audio's
    autocorrelation peaks hardest at the PITCH period (measured: ~350
    samples on the synthetic voiced clips) while the tiling period sits
    at a lower local max — exact integer verification downstream
    disambiguates them for free.  The float autocorrelation only
    PROPOSES; every decision (best candidate, flag) is exact integer
    arithmetic, so no float ever decides anything.  The proposal is a
    pure function of the decoded samples (per-clip FFT — batch-layout
    independent), shared verbatim by the twin (the same precedent as
    the decode and fingerprint kernels)."""
    import numpy as np

    n = int(q.size)
    hi = n - min_overlap
    if hi <= min_lag:
        return []
    x = q.astype(np.float64)
    m = 1 << int(np.ceil(np.log2(max(2 * n, 2))))
    X = np.fft.rfft(x, m)
    r = np.fft.irfft(X * np.conj(X), m)
    # overlap-normalize: raw r grows with (n - lag), so small-lag pitch
    # harmonics would crowd every top-k slot; the unbiased per-sample
    # correlation ranks the PERFECT tiling peak above the ~0.9 pitch
    # peaks regardless of lag
    lags = np.arange(min_lag, hi + 1, dtype=np.float64)
    w = r[min_lag:hi + 1] / (n - lags)
    if w.size <= 2:
        return [min_lag + int(np.argmax(w))]
    interior = (w[1:-1] >= w[:-2]) & (w[1:-1] >= w[2:])
    mask = np.concatenate(([w[0] >= w[1]], interior, [w[-1] >= w[-2]]))
    idx = np.nonzero(mask)[0]
    if idx.size == 0:
        idx = np.array([int(np.argmax(w))])
    if idx.size > k:
        top = np.argpartition(-w[idx], k - 1)[:k]
        idx = idx[top]
    return sorted(min_lag + int(i) for i in idx)


def loop_scan_samples(
    df: DataFrame,
    min_lag_ms: int = 20,
    min_overlap_ms: int = 100,
    counter=None,
) -> DataFrame:
    """Sample-domain loop scan — the arbitrary-offset extension of
    :func:`loop_scan` (whose frame-equality law provably cannot see
    periods off the fingerprint hop grid; see the alignment envelope).

    FFT autocorrelation proposes up to 64 candidate lags per clip
    (local maxima — the pitch peak and the tiling peak both survive);
    each candidate is verified by EXACT int16 sample equality and the
    best is chosen by integer cross-multiplication (ties → smallest
    lag); the flag is ``matches·DEN ≥ NUM·valid`` at the winner — valid
    because the tiled-payload defect class is exactly periodic in the
    sample domain and both pcm16 and µ-law are per-sample memoryless
    codecs (a re-encoded loop decodes to a tiled stream).  The
    degenerate guard is the same law on sample values with a higher
    distinct floor (``SAMPLE_MIN_DISTINCT`` — near-silent dither has
    single-digit distinct int16 values and matches ~94% at any lag by
    chance; exact-zero silence is owned by the silence audit).  Rows
    with ``sr_hz ≤ 0`` or too little audio for a lag window emit
    ``best_lag = NULL`` (structurally not evaluable — the invalid-rate
    audit owns them).  One ``mapInArrow`` pass, zero shuffles.
    """
    col_idx = {f.name: i for i, f in enumerate(df.schema.fields)}
    out_schema = T.StructType([
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("ok", T.BooleanType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
        T.StructField("n_distinct", T.IntegerType(), False),
        T.StructField("n_dominant", T.IntegerType(), False),
        T.StructField("best_lag", T.IntegerType(), True),
        T.StructField("match_num", T.LongType(), True),
        T.StructField("match_den", T.LongType(), True),
        T.StructField("looped", T.BooleanType(), False),
    ])

    def run(batches):
        import numpy as np
        import pyarrow as pa

        from ..functions.audio import _decode_i16

        for batch in batches:
            ids = batch.column(col_idx["clip_id"]).to_pylist()
            payloads = batch.column(col_idx["bytes"])
            codecs = batch.column(col_idx["codec"]).to_pylist()
            srs = batch.column(col_idx["sr_hz"]).to_pylist()
            if counter is not None:
                counter.add(batch.num_rows)
            out = {k: [] for k in ("ok", "n_samples", "n_distinct",
                                   "n_dominant", "best_lag", "match_num",
                                   "match_den", "looped")}
            for i in range(batch.num_rows):
                buf = payloads[i].as_buffer() if payloads[i].is_valid else None
                try:
                    q = _decode_i16(buf, codecs[i], srs[i])
                    ok = True
                except (ValueError, TypeError):
                    q = np.zeros(0, dtype=np.int16)
                    ok = False
                sr = srs[i] or 0
                n = int(q.size)
                if n:
                    _, cnts = np.unique(q, return_counts=True)
                    distinct = int(cnts.size)
                    dominant = int(cnts.max())
                else:
                    distinct = dominant = 0
                min_lag = max(1, sr * min_lag_ms // 1000)
                min_overlap = max(1, sr * min_overlap_ms // 1000)
                cands = (propose_lag_candidates(q, min_lag, min_overlap)
                         if ok and sr > 0 else [])
                lag = valid = m = None
                for c in cands:
                    v = n - c
                    mc = int((q[:v] == q[c:]).sum())
                    if lag is None or mc * valid > m * v:
                        lag, valid, m = c, v, mc
                looped = (
                    lag is not None
                    and distinct >= SAMPLE_MIN_DISTINCT
                    and dominant * DOMINANT_DEN <= DOMINANT_NUM * n
                    and m * LOOP_FRAC_DEN >= LOOP_FRAC_NUM * valid
                )
                out["ok"].append(ok)
                out["n_samples"].append(n)
                out["n_distinct"].append(distinct)
                out["n_dominant"].append(dominant)
                out["best_lag"].append(lag)
                out["match_num"].append(m)
                out["match_den"].append(valid)
                out["looped"].append(looped)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.string()),
                 pa.array(out["ok"], type=pa.bool_()),
                 pa.array(out["n_samples"], type=pa.int32()),
                 pa.array(out["n_distinct"], type=pa.int32()),
                 pa.array(out["n_dominant"], type=pa.int32()),
                 pa.array(out["best_lag"], type=pa.int32()),
                 pa.array(out["match_num"], type=pa.int64()),
                 pa.array(out["match_den"], type=pa.int64()),
                 pa.array(out["looped"], type=pa.bool_())],
                names=["clip_id", "ok", "n_samples", "n_distinct",
                       "n_dominant", "best_lag", "match_num", "match_den",
                       "looped"],
            )

    return df.mapInArrow(run, out_schema)
