"""Speaker-turn / splice detection over log-mel frames.

The ASR-curation question "is this clip one speaker, or several (or two
recordings stitched together)?" answered with a BIC-style novelty scan
(Chen & Gopalakrishnan 1998's sliding-window segmentation, reduced to a
spectral-shape distance):

1. ``log_mel`` frames (shared kernel, 25 ms / 10 ms — deterministic
   fixed-order sums, see mel.py).
2. Per-frame SHAPE vector = log-mel minus its own across-band mean.  A
   pure gain change shifts every band of a log spectrum by the same
   ln(g²), so shape is exactly gain-invariant — loudness steps alone
   cannot fake a turn.
3. Novelty curve d(t) at candidate boundaries (every ``TURN_STEP``
   frames): mean squared distance between the mean shape vectors of the
   ``TURN_WIN`` frames before and after t.
4. Activity guard: a boundary is evaluable only when BOTH windows are
   ≥ ``TURN_ACT_FRAC`` active frames (band-mean log energy above
   ``TURN_ACT_FLOOR``) — silence↔speech edges are not speaker turns and
   are owned by the VAD rules.
5. Decision: d(t) > ``TURN_THETA`` AND d(t) is the maximum within
   ± ``TURN_WIN`` frames (ties → earliest) — non-max suppression keeps
   one detection per true boundary.

The curve derivation (steps 1-3) is a shared kernel (operator and
differential twin consume the same float64 array — the reverb-oracle
pattern); the WALK (guard, threshold, suppression: pure integer/compare
logic once the curve exists) is replayed independently in the twin.

Threshold: measured on the seeded voice palette (300-clip corpus),
every cross-voice boundary scores d >= 8.29 while single-voice and
natural-corpus curves peak at d <= 0.07 — a ~130x gap
(test_turn_threshold_margin keeps it honest); TURN_THETA = 1.5 sits
well inside it.
"""

from __future__ import annotations

import numpy as np

from .mel import log_mel

__all__ = [
    "TURN_WIN",
    "TURN_STEP",
    "TURN_THETA",
    "TURN_ACT_FLOOR",
    "TURN_ACT_FRAC",
    "TURN_FIELDS",
    "shape_vectors",
    "turn_curve",
    "turn_walk",
    "turn_stats",
]

TURN_WIN = 50  # frames each side (0.5 s at the 10 ms mel hop)
TURN_STEP = 10  # candidate-boundary grid (100 ms)
TURN_THETA = 1.5  # novelty threshold (see module docstring)
TURN_ACT_FLOOR = -18.0  # band-mean log energy above ⇒ active frame
TURN_ACT_FRAC = 0.8  # both windows ≥ this fraction active

TURN_FIELDS = ["n_frames", "n_eval", "n_turns", "turns_csv"]


def shape_vectors(lm: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(shape, band_mean): per-frame gain-invariant spectral shape and
    the per-frame across-band mean log energy (the activity statistic)."""
    if lm.shape[0] == 0:
        return lm, np.zeros(0, dtype=np.float64)
    mean = lm.mean(axis=1)
    return lm - mean[:, None], mean


def turn_curve(
    shape: np.ndarray,
    active: np.ndarray,
    win: int = TURN_WIN,
    step: int = TURN_STEP,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(positions, d, evaluable) over the candidate grid.

    d(t) = mean((mean shape[t-win:t] − mean shape[t:t+win])²); evaluable
    requires both windows ≥ TURN_ACT_FRAC active.  Vectorized with
    cumulative sums — O(n_frames · n_mels); fixed-order, deterministic.
    """
    n = shape.shape[0]
    pos = np.arange(win, n - win + 1, step, dtype=np.int64)
    if pos.size == 0:
        return pos, np.zeros(0), np.zeros(0, dtype=bool)
    cs = np.vstack([np.zeros((1, shape.shape[1])), np.cumsum(shape, axis=0)])
    ca = np.concatenate([[0], np.cumsum(active.astype(np.int64))])
    left = (cs[pos] - cs[pos - win]) / win
    right = (cs[pos + win] - cs[pos]) / win
    diff = left - right
    d = (diff * diff).mean(axis=1)
    la = ca[pos] - ca[pos - win]
    ra = ca[pos + win] - ca[pos]
    need = int(np.ceil(TURN_ACT_FRAC * win))
    ev = (la >= need) & (ra >= need)
    return pos, d, ev


def turn_walk(
    pos: np.ndarray,
    d: np.ndarray,
    ev: np.ndarray,
    win: int = TURN_WIN,
    theta: float = TURN_THETA,
) -> list[int]:
    """Threshold + non-max suppression over the curve: keep t where d(t)
    exceeds theta and is the max among evaluable candidates within ±win
    (ties → earliest).  Pure compares — the part the twin replays
    independently."""
    out: list[int] = []
    for i in range(len(pos)):
        if not ev[i] or not d[i] > theta:
            continue
        t = pos[i]
        best = True
        for j in range(len(pos)):
            if j == i or not ev[j] or abs(int(pos[j]) - int(t)) > win:
                continue
            if d[j] > d[i] or (d[j] == d[i] and pos[j] < t):
                best = False
                break
        if best:
            out.append(int(t))
    return out


def turn_stats(x: np.ndarray, sr_hz: int) -> dict:
    """Full per-clip law over float PCM: mel → shape → curve → walk."""
    lm = log_mel(x, sr_hz)
    shape, band_mean = shape_vectors(lm)
    active = band_mean > TURN_ACT_FLOOR
    pos, d, ev = turn_curve(shape, active)
    turns = turn_walk(pos, d, ev)
    return {
        "n_frames": int(lm.shape[0]),
        "n_eval": int(ev.sum()),
        "n_turns": len(turns),
        "turns_csv": ",".join(str(t) for t in turns),
    }
