"""Speed/tempo-perturbed duplicate detection (resampled re-uploads).

A 0.9x/1.1x resampled copy ("slowed"/"nightcore" re-uploads, PAL/NTSC
pitch shift) evades every matcher in ``audio_dedup``: the Philips bit
stream and the constellation hashes both key on ABSOLUTE frequency bins
and frame gaps, and a 10% scale moves every bin.  On a log-frequency
axis the scale is a pure SHIFT of ``SPEED_B*log2(s)`` cells, and — the
load-bearing trick — that shift is PREDICTED by the pair's duration
ratio, so verification needs no shift search at all:

1. per clip (ONE Arrow pass, payload dropped at the boundary): the
   L1-normalized log-frequency power profile
   (``functions.spectral.logf_profile``) + its top-3 peak cells;
2. candidates: clips sharing a quantized PEAK SPACING (differences of
   log-frequencies are exactly shift-invariant); ±1-step multi-probe on
   one join side absorbs grid rounding; hot spacings are dropped by
   ``max_bucket_size`` (the LSH skew-guard law used repo-wide);
3. verify at the duration-implied shift only: bidirectional top-2
   peak-partner law (every major peak must map across, both ways) +
   profile correlation >= ``SPEED_CORR_MIN`` at the 4 integer shifts
   bracketing the implied (fractional) one;
4. optional CONFIRM (``speed_dup_confirm``): for the surviving pair
   set — tiny by construction — re-join the payloads, resample one side
   at the rational factor implied by the sample counts, and vote
   constellation landmarks at a consistent offset: exact content
   evidence that kills the one measured false-positive class
   (unrelated stationary 2-tone clips whose spikes AND duration ratio
   coincide; ~1 per 60k pairs on the adversarial pure-tone corpus).

Measured (``synth.make_audio_speed_corpus``, 300 clips + ~23 resampled
twins at 9/10, 11/10, 5/4, three seeds): recall 93-100% of evaluable
pairs (both sides >= 2 profile peaks), 0-1 profile-stage false pairs,
0 after confirm.  Single-peak clips are not bucketable (degenerate —
reported, never silently matched).

Scale shape: profiles shuffle instead of payloads (~2 KB/clip); the
spacing join is one Exchange with the bucket guard; the confirm stage
touches payloads only for candidate pairs.  Reference analog: none —
this extends the dedup family (SURVEY §2) to the speed axis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["clip_profiles", "bucket_candidates", "speed_dup_pairs",
           "speed_dup_confirm"]

PEAK_COARSE = 32         # cells per coarse top-peak bucket key
CONFIRM_MIN_VOTES = 20   # landmark votes at one offset to confirm
CONFIRM_MAX_DEN = 64     # rational-speed approximation bound


def clip_profiles(df: DataFrame, counter=None) -> DataFrame:
    """(clip_id, codec, n_samples, sr_hz, n_peaks, peaks array<int>,
    profile array<double>) via one Arrow pass."""
    col_idx = {f.name: i for i, f in enumerate(df.schema.fields)}
    out_schema = T.StructType(
        [
            T.StructField("clip_id", T.StringType(), False),
            T.StructField("codec", T.StringType(), True),
            T.StructField("n_samples", T.LongType(), False),
            T.StructField("sr_hz", T.IntegerType(), True),
            T.StructField("n_peaks", T.IntegerType(), False),
            T.StructField("peaks", T.ArrayType(T.IntegerType()), False),
            T.StructField("profile", T.ArrayType(T.DoubleType()), True),
        ]
    )

    def run(batches):
        import numpy as np
        import pyarrow as pa

        from ..functions.audio import _decode_i16
        from ..functions.spectral import logf_profile, profile_peaks

        empty = np.zeros(0, dtype=np.int16)
        for batch in batches:
            ids = batch.column(col_idx["clip_id"]).to_pylist()
            payloads = batch.column(col_idx["bytes"])
            codecs = batch.column(col_idx["codec"]).to_pylist()
            srs = batch.column(col_idx["sr_hz"]).to_pylist()
            if counter is not None:
                counter.add(batch.num_rows)
            ns, np_, pks, profs = [], [], [], []
            for i in range(batch.num_rows):
                buf = payloads[i].as_buffer() if payloads[i].is_valid else None
                try:
                    q = _decode_i16(buf, codecs[i], srs[i])
                except (ValueError, TypeError):
                    q = empty
                x = q.astype(np.float64) / 32768.0
                prof = logf_profile(x, srs[i])
                peaks = profile_peaks(prof) if prof is not None else []
                ns.append(int(q.size))
                np_.append(len(peaks))
                pks.append([int(c) for c in peaks])
                profs.append(
                    None if prof is None else [float(v) for v in prof])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.string()),
                    pa.array(codecs, type=pa.string()),
                    pa.array(ns, type=pa.int64()),
                    pa.array(srs, type=pa.int32()),
                    pa.array(np_, type=pa.int32()),
                    pa.array(pks, type=pa.list_(pa.int32())),
                    pa.array(profs, type=pa.list_(pa.float64())),
                ],
                names=["clip_id", "codec", "n_samples", "sr_hz",
                       "n_peaks", "peaks", "profile"],
            )

    out = df.mapInArrow(run, out_schema)
    par = df.sparkSession.sparkContext.defaultParallelism
    return out.repartition(par, "clip_id")


def _spacing_keys(probe: bool):
    """Explode a profile relation into quantized peak-spacing keys; the
    probe side fans each key out to its ±1 neighbours."""
    from ..functions.spectral import SPEED_KEY_Q

    c = F.array_sort("peaks")
    pairs = F.flatten(F.transform(
        F.sequence(F.lit(0), F.size(c) - 2),
        lambda i: F.transform(
            F.sequence(i + 1, F.size(c) - 1),
            lambda j: F.element_at(c, j + 1) - F.element_at(c, i + 1),
        ),
    ))
    q = F.array_distinct(F.transform(
        pairs, lambda d: F.round(d / F.lit(float(SPEED_KEY_Q))).cast("int")))
    if probe:
        q = F.array_distinct(F.flatten(F.transform(
            q, lambda v: F.array(v - 1, v, v + 1))))
    return q


def bucket_candidates(evaluable, max_bucket_size: int):
    """Shared candidate stage for the speed AND pitch detectors:
    composite (quantized peak spacing, coarse top-peak) bucket keys with
    a 3x3 probe fan.  Spacings are exactly shift-invariant; the coarse
    top-peak (PEAK_COARSE cells per step) moves by at most ONE step
    under the bounded shift |B*log2 s| <= B*SPEED_MAX_LOG2 < PEAK_COARSE,
    so +/-1 probing preserves invariance while multiplying key entropy
    ~32x — measured necessary at 100k clips, where single-spacing keys
    go hot on tone-degenerate corpora and the skew guard starves the
    candidate stage.  Top-mass-aligned verified pairs survive the finer
    keys (the partner law bounds their top-peak distance below one
    coarse step); a pair whose peak-MASS order swaps between sides can
    drop (measured: one coincidence pair at oracle scale, zero seeded
    twins)."""
    coarse = F.floor(
        F.element_at("peaks", 1) / F.lit(PEAK_COARSE)
    ).cast("int")

    def keyed(probe: bool):
        base = evaluable.select(
            F.col("clip_id").alias("__id"),
            coarse.alias("__pc"),
            F.explode(_spacing_keys(probe=probe)).alias("k"),
        )
        if not probe:
            return base.select("__id", "k", F.col("__pc").alias("pc"))
        return base.select(
            "__id", "k",
            F.explode(F.array(F.col("__pc") - 1, F.col("__pc"),
                              F.col("__pc") + 1)).alias("pc"),
        )

    exact = keyed(probe=False)
    probe = keyed(probe=True)
    small = (
        exact.groupBy("k", "pc")
        .agg(F.count(F.lit(1)).alias("__bn"))
        .filter(F.col("__bn") <= max_bucket_size)
        .select("k", "pc")
    )
    return (
        exact.join(small, ["k", "pc"])
        .select("k", "pc", F.col("__id").alias("id_a"))
        .join(probe.select("k", "pc", F.col("__id").alias("id_b")),
              ["k", "pc"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def speed_dup_pairs(
    profiles: DataFrame,
    max_bucket_size: int = 64,
) -> DataFrame:
    """Candidate generation + implied-shift verification.

    Returns (id_a, id_b, shift_r, corr_r, speed_est) for pairs passing
    the peak-partner law and the correlation cut; ``speed_est`` is the
    playback-speed of b relative to a (duration-derived: da/db > 1
    means b is the sped-up copy, equal to b's frequency scale)."""
    # the profile relation feeds FIVE consumers (exact keys, probe keys,
    # bucket counts, and both join sides); without a persist each one
    # re-runs the decode-heavy mapInArrow (measured: 6 scans in the
    # physical plan).  The relation is payload-free (~2 KB/clip), so
    # caching it is the cheap side of the trade at any scale — at 10^12
    # rows it would be a written profiles table instead.
    evaluable = profiles.filter(F.col("n_peaks") >= 2).select(
        "clip_id", "n_samples", "sr_hz", "peaks", "profile").persist()
    cands = bucket_candidates(evaluable, max_bucket_size)
    a = evaluable.select(
        F.col("clip_id").alias("id_a"), F.col("n_samples").alias("na"),
        F.col("sr_hz").alias("sra"), F.col("peaks").alias("pka"),
        F.col("profile").alias("pra"))
    b = evaluable.select(
        F.col("clip_id").alias("id_b"), F.col("n_samples").alias("nb"),
        F.col("sr_hz").alias("srb"), F.col("peaks").alias("pkb"),
        F.col("profile").alias("prb"))
    joined = cands.join(a, ["id_a"]).join(b, ["id_b"])

    out_schema = T.StructType(
        [
            T.StructField("id_a", T.StringType(), False),
            T.StructField("id_b", T.StringType(), False),
            T.StructField("shift_r", T.DoubleType(), False),
            T.StructField("corr_r", T.DoubleType(), False),
            T.StructField("speed_est", T.DoubleType(), False),
        ]
    )

    def verify(batches):
        import math

        import numpy as np
        import pyarrow as pa

        from ..functions.spectral import (
            SPEED_B,
            SPEED_CORR_MIN,
            SPEED_MAX_LOG2,
            corr_at_shift,
        )

        for batch in batches:
            d = batch.to_pydict()
            oa, ob, osh, oco, osp = [], [], [], [], []
            for i in range(batch.num_rows):
                da = d["na"][i] / d["sra"][i]
                db = d["nb"][i] / d["srb"][i]
                if da <= 0 or db <= 0:
                    continue
                r = math.log2(db / da)
                if abs(r) > SPEED_MAX_LOG2:
                    continue
                sh = SPEED_B * r
                ka, kb = d["pka"][i], d["pkb"][i]
                ok_a = all(any(abs(p1 - sh - p2) <= 2.5 for p2 in kb)
                           for p1 in ka[:2])
                ok_b = all(any(abs(p2 + sh - p1) <= 2.5 for p1 in ka)
                           for p2 in kb[:2])
                if not (ok_a and ok_b):
                    continue
                pa_ = np.asarray(d["pra"][i], dtype=np.float64)
                pb_ = np.asarray(d["prb"][i], dtype=np.float64)
                lo = int(math.floor(sh))
                hi = int(math.ceil(sh))
                best = max(corr_at_shift(pa_, pb_, s)
                           for s in {lo - 1, lo, hi, hi + 1})
                if best < SPEED_CORR_MIN:
                    continue
                oa.append(d["id_a"][i])
                ob.append(d["id_b"][i])
                osh.append(round(sh, 2))
                oco.append(round(best, 4))
                osp.append(round(2.0 ** (-r), 4))
            yield pa.RecordBatch.from_arrays(
                [pa.array(oa, type=pa.string()),
                 pa.array(ob, type=pa.string()),
                 pa.array(osh, type=pa.float64()),
                 pa.array(oco, type=pa.float64()),
                 pa.array(osp, type=pa.float64())],
                names=["id_a", "id_b", "shift_r", "corr_r", "speed_est"],
            )

    return joined.mapInArrow(verify, out_schema)


def speed_dup_confirm(
    clips: DataFrame,
    pairs: DataFrame,
    min_votes: int = CONFIRM_MIN_VOTES,
) -> DataFrame:
    """Exact content confirmation for the candidate pair set: resample
    side b at the rational factor implied by the SAMPLE COUNTS (bounded
    denominator), then vote constellation landmarks at one consistent
    frame offset — the same integer evidence ``landmark_match`` uses for
    the unit-speed case.  Payloads are joined ONLY for the pair set."""
    pay = clips.select("clip_id", "bytes", "codec", "sr_hz")
    joined = (
        pairs
        .join(pay.select(F.col("clip_id").alias("id_a"),
                         F.col("bytes").alias("ba"),
                         F.col("codec").alias("ca"),
                         F.col("sr_hz").alias("sa")), ["id_a"])
        .join(pay.select(F.col("clip_id").alias("id_b"),
                         F.col("bytes").alias("bb"),
                         F.col("codec").alias("cb"),
                         F.col("sr_hz").alias("sb")), ["id_b"])
    )
    out_schema = T.StructType(
        [
            T.StructField("id_a", T.StringType(), False),
            T.StructField("id_b", T.StringType(), False),
            T.StructField("shift_r", T.DoubleType(), False),
            T.StructField("corr_r", T.DoubleType(), False),
            T.StructField("speed_est", T.DoubleType(), False),
            T.StructField("votes", T.IntegerType(), False),
            T.StructField("confirmed", T.BooleanType(), False),
        ]
    )

    def run(batches):
        from collections import Counter
        from fractions import Fraction

        import numpy as np
        import pyarrow as pa

        from ..functions.audio import _decode_i16
        from ..functions.resample import resample_poly
        from ..functions.spectral import constellation_landmarks

        for batch in batches:
            d = batch.to_pydict()
            cols = {k: [] for k in ("id_a", "id_b", "shift_r", "corr_r",
                                    "speed_est", "votes", "confirmed")}
            for i in range(batch.num_rows):
                votes = 0
                try:
                    qa = _decode_i16(d["ba"][i], d["ca"][i], d["sa"][i])
                    qb = _decode_i16(d["bb"][i], d["cb"][i], d["sb"][i])
                except (ValueError, TypeError):
                    qa = qb = np.zeros(0, dtype=np.int16)
                if qa.size and qb.size:
                    # b spans nb samples of the same content as a's na:
                    # bring b onto a's timeline with a bounded rational
                    frac = Fraction(int(qa.size), int(qb.size))
                    frac = frac.limit_denominator(CONFIRM_MAX_DEN)
                    xb = resample_poly(
                        qb / 32768.0,
                        frac.denominator, frac.numerator)
                    ha, ta = constellation_landmarks(qa / 32768.0)
                    hb, tb = constellation_landmarks(xb)
                    if ha.size and hb.size:
                        by_hash: dict[int, list[int]] = {}
                        for h, t in zip(hb.tolist(), tb.tolist()):
                            by_hash.setdefault(h, []).append(t)
                        c: Counter = Counter()
                        for h, t in zip(ha.tolist(), ta.tolist()):
                            for t2 in by_hash.get(h, ()):
                                c[t - t2] += 1
                        if c:
                            # fractional offsets split votes over two
                            # adjacent bins — score bin + best neighbour
                            votes = max(
                                c[o] + max(c.get(o - 1, 0), c.get(o + 1, 0))
                                for o in c)
                cols["id_a"].append(d["id_a"][i])
                cols["id_b"].append(d["id_b"][i])
                cols["shift_r"].append(d["shift_r"][i])
                cols["corr_r"].append(d["corr_r"][i])
                cols["speed_est"].append(d["speed_est"][i])
                cols["votes"].append(int(votes))
                cols["confirmed"].append(bool(votes >= min_votes))
            yield pa.RecordBatch.from_arrays(
                [pa.array(cols["id_a"], type=pa.string()),
                 pa.array(cols["id_b"], type=pa.string()),
                 pa.array(cols["shift_r"], type=pa.float64()),
                 pa.array(cols["corr_r"], type=pa.float64()),
                 pa.array(cols["speed_est"], type=pa.float64()),
                 pa.array(cols["votes"], type=pa.int32()),
                 pa.array(cols["confirmed"], type=pa.bool_())],
                names=["id_a", "id_b", "shift_r", "corr_r", "speed_est",
                       "votes", "confirmed"],
            )

    return joined.mapInArrow(run, out_schema)
