"""Pitch-shift / time-stretch duplicate detection (vocoder re-uploads).

``audio_speed`` closes the RESAMPLE axis (linked pitch+tempo); this
operator closes the other two re-upload perturbation classes a phase
vocoder produces — the ones every scraped music/speech corpus contains:

- **time stretch**: duration × r, pitch preserved.  The log-frequency
  profile is UNCHANGED, so verification needs no shift search at all:
  the bidirectional peak-partner law and profile correlation at shift 0
  (±1 for grid rounding), with the duration ratio itself the evidence
  that the pair is not an exact duplicate (|B·log2(db/da)| > tol).
- **pitch shift**: frequency × s, duration preserved.  Here the shift is
  unknown, but a FREE search is unsafe (sliding spiky profiles until
  they align produces false positives), so two anchors replace it:
  the durations must match near-exactly (|B·log2(db/da)| ≤ 0.5 cells —
  pitch-shift tools preserve sample count), and the hypothesis shifts
  are generated only by pairing the clips' own top profile peaks
  (≤ 5 candidates), each verified by the partner law + correlation.

Both classes then pass through ``pitch_dup_confirm`` — exact content
evidence that kills the one measured false-positive class (unrelated
stationary tone clips whose peak geometry AND duration coincide; profile
space cannot distinguish a transposition of the same tones):

1. snap the measured cell shift to a small rational frequency scale
   (``limit_denominator(16)`` — recovers 9/8 from the integer cell
   grid exactly);
2. ONE polyphase resample brings side b onto side a's sample grid with
   the pitch undone (the rational also absorbs a sample-rate mismatch);
3. vote constellation landmarks on a TIME-SCALED offset
   ``t_a − round(t_b·g)`` (g = the pair's exact residual time scale).
   The integer cell grid cannot always name the right rational (shift
   9 ≈ both 7/8 and 8/9), so every bounded-denominator rational within
   the cell quantization band is tried and the best vote kept.

One measured limit is reported as DATA rather than hidden: for purely
STATIONARY content (sustained tones), content identity and spectral
identity are the same thing — an independent clip of the same sustained
chord votes exactly like a vocoder twin of it (measured: 154 votes for
a seeded-independent pair vs 59–2626 for twins), and no audio-only
evidence can separate them (they ARE duplicates as signals).  The
``distinct`` column (distinct hashes at the winning offset) and the
``stationary`` flag (distinct < ``PITCH_DISTINCT_MIN``) mark which
confirmations rest on tonal-coincidence-grade evidence, mirroring the
loop scan's degenerate-stream deferral.

Scale shape: identical to ``audio_speed`` — profiles (~2 KB/clip)
shuffle instead of payloads, candidates come from one bucketed
spacing-key join with the ``max_bucket_size`` skew guard, and payloads
are joined ONLY for the surviving pair set (tiny by construction).
Reference analog: none — this extends the dedup family (SURVEY §2)
to the vocoder axes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .audio_speed import bucket_candidates, clip_profiles  # shared stage-1

__all__ = ["clip_profiles", "pitch_dup_pairs", "pitch_dup_confirm"]

PITCH_TOL = 2.5          # peak-partner tolerance (cells), top-1 peaks
PITCH_TOL2 = 4.5         # second-peak slack: band-edge truncation and
                         # close-peak interference move minor peaks by
                         # up to ~4 cells under a real pitch shift
PITCH_DUR_EQ = 0.5       # |B*log2(db/da)| ≤ this = "same duration"
STRETCH_CORR_MIN = 0.90  # profile corr at shift 0 for the stretch class
PITCH_CORR_MIN = 0.85    # profile corr at the anchored shift
PITCH_SNAP_DEN = 16      # denominator bound snapping shift → freq scale
PITCH_SNAP_BAND = 2.5    # cells: quantization band the rationals must hit
                         # (the repo-wide grid tolerance — the measured
                         # shift can sit up to ~2 cells off the true one)
PITCH_RESAMPLE_DEN = 64  # denominator bound for the undo resample
PITCH_CONFIRM_VOTES = 50 # landmark votes at one scaled offset
PITCH_DISTINCT_MIN = 32  # distinct hashes below this = stationary-grade


def snap_rationals(shift: int) -> list:
    """All reduced L/M (M ≤ PITCH_SNAP_DEN) whose frequency scale lands
    within PITCH_SNAP_BAND cells of the measured integer shift — the
    rational hypotheses the confirm stage tries (the cell grid alone
    cannot distinguish e.g. 7/8 from 8/9 at shift 9)."""
    import math
    from fractions import Fraction

    from ..functions.spectral import SPEED_B

    out = set()
    for m in range(1, PITCH_SNAP_DEN + 1):
        # -B*log2(l/m) in [shift - band, shift + band]
        lo = m * 2.0 ** (-(shift + PITCH_SNAP_BAND) / SPEED_B)
        hi = m * 2.0 ** (-(shift - PITCH_SNAP_BAND) / SPEED_B)
        for l in range(max(1, math.ceil(lo)), math.floor(hi) + 1):
            f = Fraction(l, m)
            if f.denominator <= PITCH_SNAP_DEN:
                out.add(f)
    return sorted(out)


def pitch_dup_pairs(
    profiles: DataFrame,
    max_bucket_size: int = 64,
) -> DataFrame:
    """Candidate generation + anchored-hypothesis verification.

    Returns (id_a, id_b, edit_class, shift, dur_cells_r, corr_r,
    scale_est_r): ``edit_class`` ∈ {time_stretch, pitch_shift};
    ``shift`` is the integer profile shift (b_peaks = a_peaks − shift);
    ``scale_est`` = 2^(−shift/B) is b's frequency scale relative to a."""
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
            T.StructField("edit_class", T.StringType(), False),
            T.StructField("shift", T.IntegerType(), False),
            T.StructField("dur_cells_r", T.DoubleType(), False),
            T.StructField("corr_r", T.DoubleType(), False),
            T.StructField("scale_est_r", T.DoubleType(), False),
        ]
    )

    def verify(batches):
        import math

        import numpy as np
        import pyarrow as pa

        from ..functions.spectral import (
            SPEED_B,
            SPEED_MAX_LOG2,
            corr_at_shift,
        )

        max_cells = SPEED_B * SPEED_MAX_LOG2

        def partner(ka, kb, sh):
            tols = (PITCH_TOL, PITCH_TOL2)
            ok_a = all(any(abs(p1 - sh - p2) <= tols[i] for p2 in kb)
                       for i, p1 in enumerate(ka[:2]))
            ok_b = all(any(abs(p2 + sh - p1) <= tols[i] for p1 in ka)
                       for i, p2 in enumerate(kb[:2]))
            return ok_a and ok_b

        for batch in batches:
            d = batch.to_pydict()
            out = {k: [] for k in ("id_a", "id_b", "edit_class", "shift",
                                   "dur_cells_r", "corr_r", "scale_est_r")}
            for i in range(batch.num_rows):
                if not d["sra"][i] or not d["srb"][i]:
                    continue
                da = d["na"][i] / d["sra"][i]
                db = d["nb"][i] / d["srb"][i]
                if da <= 0 or db <= 0:
                    continue
                dc = SPEED_B * math.log2(db / da)
                ka, kb = d["pka"][i], d["pkb"][i]
                pa_ = np.asarray(d["pra"][i], dtype=np.float64)
                pb_ = np.asarray(d["prb"][i], dtype=np.float64)
                cls, sh, corr = None, 0, -2.0
                if PITCH_TOL < abs(dc) <= max_cells and partner(ka, kb, 0):
                    c = max(corr_at_shift(pa_, pb_, s) for s in (-1, 0, 1))
                    if c >= STRETCH_CORR_MIN:
                        cls, sh, corr = "time_stretch", 0, c
                elif abs(dc) <= PITCH_DUR_EQ:
                    # anchored shifts: pair each side's top peak with the
                    # other's top-3 (convention b_peaks = a_peaks - shift),
                    # ±2 for the peak grid's cell rounding (measured: a
                    # fractional true shift can sit 2.2 cells off the
                    # quantized top-peak delta)
                    raw = {ka[0] - p for p in kb[:3]}
                    raw |= {p - kb[0] for p in ka[:3]}
                    anchors = {s + d for s in raw for d in (-2, -1, 0, 1, 2)}
                    # one corr per expanded anchor at its EXACT shift
                    # (the ±1 expansion supplies the window; a shared
                    # window would tie distinct anchors bit-exactly and
                    # make the argmax engine-dependent)
                    for cand in sorted(anchors):
                        if abs(cand) <= PITCH_TOL or abs(cand) > max_cells:
                            continue
                        if not partner(ka, kb, cand):
                            continue
                        c = corr_at_shift(pa_, pb_, cand)
                        if c >= PITCH_CORR_MIN and c > corr:
                            cls, sh, corr = "pitch_shift", cand, c
                if cls is None:
                    continue
                out["id_a"].append(d["id_a"][i])
                out["id_b"].append(d["id_b"][i])
                out["edit_class"].append(cls)
                out["shift"].append(int(sh))
                out["dur_cells_r"].append(round(dc, 2))
                out["corr_r"].append(round(corr, 4))
                out["scale_est_r"].append(round(2.0 ** (-sh / SPEED_B), 4))
            yield pa.RecordBatch.from_arrays(
                [pa.array(out["id_a"], type=pa.string()),
                 pa.array(out["id_b"], type=pa.string()),
                 pa.array(out["edit_class"], type=pa.string()),
                 pa.array(out["shift"], type=pa.int32()),
                 pa.array(out["dur_cells_r"], type=pa.float64()),
                 pa.array(out["corr_r"], type=pa.float64()),
                 pa.array(out["scale_est_r"], type=pa.float64())],
                names=[f.name for f in out_schema.fields],
            )

    return joined.mapInArrow(verify, out_schema)


def pitch_dup_confirm(
    clips: DataFrame,
    pairs: DataFrame,
    min_votes: int = PITCH_CONFIRM_VOTES,
) -> DataFrame:
    """Exact content confirmation: ONE rational resample undoes the
    snapped frequency scale (and any sample-rate mismatch), then
    constellation landmarks vote on the time-scaled offset.  Payloads
    are joined ONLY for the candidate pair set."""
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
    carried = ["edit_class", "shift", "dur_cells_r", "corr_r",
               "scale_est_r"]
    out_schema = T.StructType(
        [
            T.StructField("id_a", T.StringType(), False),
            T.StructField("id_b", T.StringType(), False),
            T.StructField("edit_class", T.StringType(), False),
            T.StructField("shift", T.IntegerType(), False),
            T.StructField("dur_cells_r", T.DoubleType(), False),
            T.StructField("corr_r", T.DoubleType(), False),
            T.StructField("scale_est_r", T.DoubleType(), False),
            T.StructField("votes", T.IntegerType(), False),
            T.StructField("distinct", T.IntegerType(), False),
            T.StructField("stationary", T.BooleanType(), False),
            T.StructField("confirmed", T.BooleanType(), False),
        ]
    )

    def run(batches):
        from fractions import Fraction

        import numpy as np
        import pyarrow as pa

        from ..functions.audio import _decode_i16
        from ..functions.resample import resample_poly
        from ..functions.spectral import constellation_landmarks

        def scaled_votes(qa, ha, ta, qb, sa, sb, s):
            # one resample undoes the hypothesized scale + sr mismatch,
            # then landmarks vote at a time-scaled offset; returns
            # (votes, distinct hashes at the winning offset)
            frac = (Fraction(sb, sa) / s).limit_denominator(
                PITCH_RESAMPLE_DEN)
            xb = resample_poly(
                qb / 32768.0, frac.numerator, frac.denominator)
            hb, tb = constellation_landmarks(xb)
            if not (ha.size and hb.size and len(xb)):
                return 0, 0
            g = qa.size / len(xb)
            by_hash: dict[int, list[int]] = {}
            for h, t in zip(hb.tolist(), tb.tolist()):
                by_hash.setdefault(h, []).append(t)
            per: dict[int, list] = {}
            for h, t in zip(ha.tolist(), ta.tolist()):
                for t2 in by_hash.get(h, ()):
                    per.setdefault(t - round(t2 * g), []).append(h)
            if not per:
                return 0, 0
            cnt = {o: len(hs) for o, hs in per.items()}
            best = max(
                per,
                key=lambda o: (cnt[o] + max(cnt.get(o - 1, 0),
                                            cnt.get(o + 1, 0)), -abs(o)),
            )
            votes = cnt[best] + max(cnt.get(best - 1, 0),
                                    cnt.get(best + 1, 0))
            dset = set(per[best])
            dset.update(per.get(best - 1, ()))
            dset.update(per.get(best + 1, ()))
            return votes, len(dset)

        for batch in batches:
            d = batch.to_pydict()
            cols = {k: [] for k in ("id_a", "id_b", "votes", "distinct",
                                    "stationary", "confirmed")}
            for c in carried:
                cols[c] = []
            for i in range(batch.num_rows):
                votes = dist = 0
                try:
                    qa = _decode_i16(d["ba"][i], d["ca"][i], d["sa"][i])
                    qb = _decode_i16(d["bb"][i], d["cb"][i], d["sb"][i])
                except (ValueError, TypeError):
                    qa = qb = np.zeros(0, dtype=np.int16)
                if qa.size and qb.size:
                    ha, ta = constellation_landmarks(qa / 32768.0)
                    for s in snap_rationals(int(d["shift"][i])):
                        v, dd = scaled_votes(
                            qa, ha, ta, qb,
                            int(d["sa"][i]), int(d["sb"][i]), s)
                        if v > votes:
                            votes, dist = v, dd
                cols["id_a"].append(d["id_a"][i])
                cols["id_b"].append(d["id_b"][i])
                for cc in carried:
                    cols[cc].append(d[cc][i])
                cols["votes"].append(int(votes))
                cols["distinct"].append(int(dist))
                cols["stationary"].append(bool(dist < PITCH_DISTINCT_MIN))
                cols["confirmed"].append(bool(votes >= min_votes))
            yield pa.RecordBatch.from_arrays(
                [pa.array(cols["id_a"], type=pa.string()),
                 pa.array(cols["id_b"], type=pa.string()),
                 pa.array(cols["edit_class"], type=pa.string()),
                 pa.array(cols["shift"], type=pa.int32()),
                 pa.array(cols["dur_cells_r"], type=pa.float64()),
                 pa.array(cols["corr_r"], type=pa.float64()),
                 pa.array(cols["scale_est_r"], type=pa.float64()),
                 pa.array(cols["votes"], type=pa.int32()),
                 pa.array(cols["distinct"], type=pa.int32()),
                 pa.array(cols["stationary"], type=pa.bool_()),
                 pa.array(cols["confirmed"], type=pa.bool_())],
                names=[f.name for f in out_schema.fields],
            )

    return joined.mapInArrow(run, out_schema)
