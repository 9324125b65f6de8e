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
sized); a waveform-domain autocorrelation pass would be the arbitrary-
offset extension.

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
