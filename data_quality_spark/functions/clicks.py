"""Click / pop (impulsive transient) detection kernels.

Digitized analog media (vinyl, worn tape), cheap capture cards and
glitchy resamplers leave *clicks*: a handful of samples that jump far
off the local waveform and back.  They survive loudness/SNR/silence
audits untouched (a 0.2 ms spike barely moves RMS) yet are plainly
audible and poison codec / vocoder training targets.

Detection law — exact integers only, no float ever decides a flag:

1. ``d2[i] = |q[i-1] - 2*q[i] + q[i+1]|`` (int64; the discrete second
   difference — a smooth or slowly-curving waveform has small ``d2``, an
   isolated spike has ``d2`` on the order of twice its amplitude).
2. Cheap frame prefilter on the shared 20 ms grid: a sample is a
   *pre-candidate* when it carries an outsized share of its frame's
   second-difference mass AND clears an absolute floor::

       d2[i] * n_frame >= CLICK_PRE_K * frame_sum_d2   (cross-multiplied)
       d2[i] >= CLICK_ABS_MIN

   A pure tone's rectified second difference has max/mean = pi/2 < 3,
   so tonal frames produce no pre-candidates; the absolute floor keeps
   near-silence (whose frame sum is ~0) from flagging on noise.
3. Locality law (the actual decision): a pre-candidate is a *click*
   sample only if it towers over its own local background — the maximum
   ``d2`` inside ±``CLICK_BG_WIN`` samples *excluding* the spike's own
   ±``CLICK_SELF`` neighbourhood::

       d2[i] >= CLICK_LOC_K * max(d2[i-W..i+W] minus d2[i-3..i+3])

   A click is a point event (the exclusion removes all of its own
   energy); sustained high-frequency content has a flat ``d2`` envelope
   and fails the ratio.  Content whose local background already rivals
   a spike (near-Nyquist tones at high amplitude) is *not evaluable* —
   a click buried under it is genuinely unmeasurable.
4. Two guards hand ambiguous spikes to the audits that own them:
   *rail guard* — a candidate whose ±1 neighbourhood touches the int16
   rails (|q| >= 32700) is a clipping edge, owned by the clipping rule;
   *zero guard* — a candidate with >= ``ZERO_GUARD_MIN`` exactly-zero
   samples inside ±``ZERO_GUARD_WIN`` sits on a dropout / digital-splice
   boundary, owned by the dropout rule.
5. Surviving candidates merge into events when separated by
   <= ``CLICK_GAP`` samples; an event wider than 1 ms is sustained
   content, not a click, and is discarded.  ``n_clicks`` = event count.

Every quantity above is integer arithmetic on int16 samples, so the
Spark kernel and the pure-Python differential oracle are bit-identical
by construction.

Reference analog: none (audio is beyond the reference); the shape is
the per-row rule scan (checks.py) applied to kernel-computed metrics.
"""

from __future__ import annotations

import numpy as np

from .audio import FRAME_MS

__all__ = [
    "click_stats",
    "CLICK_FIELDS",
    "CLICK_PRE_K",
    "CLICK_LOC_K",
    "CLICK_BG_WIN",
    "CLICK_SELF",
    "CLICK_ABS_MIN",
    "CLICK_GAP",
    "CLICK_MAX_WIDTH_MS",
    "ZERO_GUARD_WIN",
    "ZERO_GUARD_MIN",
    "RAIL_I16",
    "CLICK_MIN_EVENTS",
]

# prefilter: pre-candidate carries >= K x the frame-mean |d2| (a pure
# tone's rectified d2 has max/mean = pi/2, far below 3)
CLICK_PRE_K = 3
# locality decision: spike >= K x the local background d2 max
CLICK_LOC_K = 4
# local background window half-width (samples) ...
CLICK_BG_WIN = 64
# ... excluding the spike's own +-CLICK_SELF samples (a 1-sample
# replacement spike perturbs d2 at exactly p-1, p, p+1)
CLICK_SELF = 3
# absolute floor (int16 second-difference units); the synthetic noise
# floor (sigma ~ 0.01 FS) has d2 std ~ 800, max-over-frame ~ 3.5 sigma
# ~ 2800 — 4096 sits comfortably above it
CLICK_ABS_MIN = 4096
# candidates closer than this merge into one event (multi-sample pops)
CLICK_GAP = 8
# an event wider than this is sustained content, not a click
CLICK_MAX_WIDTH_MS = 1.0
# dropout-edge guard: window half-width / zero count that disqualifies
ZERO_GUARD_WIN = 16
ZERO_GUARD_MIN = 12
# clipping-edge guard: |q| at or above this within ±1 of the candidate
RAIL_I16 = 32700
# clip flags when it carries at least this many click events
CLICK_MIN_EVENTS = 1

CLICK_FIELDS = ["n_samples", "n_frames", "n_cand", "n_clicks", "max_d2"]


def _empty(n: int = 0) -> dict:
    return {"n_samples": int(n), "n_frames": 0, "n_cand": 0,
            "n_clicks": 0, "max_d2": None}


def click_stats(q: np.ndarray, sr_hz) -> dict:
    """Click metrics for one int16 clip: ``(n_samples, n_frames, n_cand,
    n_clicks, max_d2)``.  ``max_d2`` is the largest second difference over
    counted events (NULL when no event).  Undecodable / too-short clips
    return zero frames and NULL ``max_d2`` — never a flag."""
    n = int(q.size)
    if n < 3 or sr_hz is None or sr_hz <= 0:
        return _empty(n)
    frame = max(int(sr_hz * FRAME_MS / 1000), 1)
    x = q.astype(np.int64)
    d2 = np.abs(x[:-2] - 2 * x[1:-1] + x[2:])  # center index i+1
    m = d2.size
    n_frames = (m + frame - 1) // frame
    starts = np.arange(0, m, frame)
    sums = np.add.reduceat(d2, starts)
    # per-frame lengths (last frame may be short)
    lens = np.full(n_frames, frame, dtype=np.int64)
    lens[-1] = m - starts[-1]
    rel = d2 * np.repeat(lens, lens) >= CLICK_PRE_K * np.repeat(sums, lens)
    pre = np.nonzero(rel & (d2 >= CLICK_ABS_MIN))[0]
    # locality law: spike must tower over its own local background (the
    # d2 max in +-CLICK_BG_WIN excluding the spike's +-CLICK_SELF).
    # Pre-candidates are rare, so a per-candidate window max stays cheap.
    keep = []
    for j in pre:
        lo = max(int(j) - CLICK_BG_WIN, 0)
        hi = min(int(j) + CLICK_BG_WIN + 1, m)
        slo = max(int(j) - CLICK_SELF, lo)
        shi = min(int(j) + CLICK_SELF + 1, hi)
        bg = 0
        if slo > lo:
            bg = int(d2[lo:slo].max())
        if shi < hi:
            bg = max(bg, int(d2[shi:hi].max()))
        if int(d2[j]) >= CLICK_LOC_K * bg:
            keep.append(int(j))
    pos = np.asarray(keep, dtype=np.int64) + 1  # center-sample index in q
    if pos.size:
        # rail guard: clipping edges belong to the clipping rule
        aq = np.abs(x)
        near_rail = (
            (aq[pos] >= RAIL_I16)
            | (aq[pos - 1] >= RAIL_I16)
            | (aq[np.minimum(pos + 1, n - 1)] >= RAIL_I16)
        )
        pos = pos[~near_rail]
    if pos.size:
        # zero guard: dropout / splice boundaries belong to the dropout rule
        zc = np.concatenate(([0], np.cumsum((x == 0).astype(np.int64))))
        lo = np.maximum(pos - ZERO_GUARD_WIN, 0)
        hi = np.minimum(pos + ZERO_GUARD_WIN + 1, n)
        zeros_near = zc[hi] - zc[lo]
        pos = pos[zeros_near < ZERO_GUARD_MIN]
    n_cand = int(pos.size)
    if not n_cand:
        return {"n_samples": n, "n_frames": int(n_frames), "n_cand": 0,
                "n_clicks": 0, "max_d2": None}
    max_w = max(int(sr_hz * CLICK_MAX_WIDTH_MS / 1000), 3)
    splits = np.nonzero(np.diff(pos) > CLICK_GAP)[0] + 1
    n_clicks = 0
    max_d2 = None
    for ev in np.split(pos, splits):
        if int(ev[-1] - ev[0]) + 1 > max_w:
            continue  # sustained, not impulsive
        n_clicks += 1
        peak = int(d2[ev - 1].max())
        if max_d2 is None or peak > max_d2:
            max_d2 = peak
    return {"n_samples": n, "n_frames": int(n_frames), "n_cand": n_cand,
            "n_clicks": int(n_clicks), "max_d2": max_d2}
