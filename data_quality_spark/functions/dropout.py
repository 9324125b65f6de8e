"""Sample-domain defect detection: dropouts, stuck samples, DC offset.

Complements the energy stats (``functions.audio.clip_stats_i16``) and the
spectral features (``functions.spectral``) with the three transport/DAC
defect classes both of those miss:

- **dropout**: an interior run of exact-zero samples (buffer underrun,
  packet loss, splice) — leading/trailing silence is normal and excluded;
- **stuck samples**: a run of identical NONZERO values (sample-and-hold
  DAC failure, saturated limiter plateaus — clipping shows up here too);
- **DC offset**: a biased converter shifts the whole waveform off zero;
  reported as the exact integer sample sum so the threshold compare
  (|sum|·den > num·n·32768) is bit-stable in any engine.

Everything is computed on the int16 lattice in one vectorized pass:
run boundaries from ``np.diff`` on the zero/equality masks, no Python
per-sample loop.  The differential oracle replays the SAME definitions with
a naive per-sample state machine (``oracles._dropout_naive``), so the
vectorized boundary arithmetic is the verified surface.
"""

from __future__ import annotations

import numpy as np

__all__ = ["dropout_stats_i16", "DROPOUT_MS_DEFAULT"]

DROPOUT_MS_DEFAULT = 30  # interior zero-run ≥ this long counts as a dropout


def _runs(mask: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(starts, ends) of True runs; ends exclusive.  Empty mask → empty."""
    if mask.size == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z
    m = mask.astype(np.int8)
    d = np.diff(m)
    starts = np.flatnonzero(d == 1) + 1
    ends = np.flatnonzero(d == -1) + 1
    if mask[0]:
        starts = np.concatenate(([0], starts))
    if mask[-1]:
        ends = np.concatenate((ends, [mask.size]))
    return starts.astype(np.int64), ends.astype(np.int64)


def dropout_stats_i16(
    q: np.ndarray, sr_hz: int, dropout_ms: int = DROPOUT_MS_DEFAULT
) -> dict[str, int]:
    """Exact-integer defect stats for one int16 clip.

    Returns ``n_samples, max_zero_run, n_dropouts, dropout_samples,
    max_const_run, dc_sum``; a *dropout* is an interior zero run (neither
    end touches a clip edge) of at least ``sr_hz·dropout_ms/1000`` samples
    (threshold floor-rounded; sr_hz ≤ 0 disables the length test so every
    interior zero run counts).  ``max_const_run`` is the longest run of
    identical nonzero samples (1 if any nonzero sample exists, 0 for
    all-zero/empty clips).
    """
    n = int(q.size)
    if n == 0:
        return {
            "n_samples": 0, "max_zero_run": 0, "n_dropouts": 0,
            "dropout_samples": 0, "max_const_run": 0, "dc_sum": 0,
        }
    z = q == 0
    zs, ze = _runs(z)
    lens = ze - zs
    max_zero = int(lens.max()) if lens.size else 0
    min_len = (int(sr_hz) * int(dropout_ms)) // 1000 if sr_hz and sr_hz > 0 else 1
    interior = (zs > 0) & (ze < n) & (lens >= max(min_len, 1))
    n_drop = int(interior.sum())
    drop_samples = int(lens[interior].sum()) if n_drop else 0

    # runs of equal consecutive samples: k equal diffs = k+1 equal samples
    if n >= 2:
        eq = np.diff(q) == 0
        cs, ce = _runs(eq)
        vals_nonzero = q[cs] != 0 if cs.size else np.zeros(0, dtype=bool)
        clens = (ce - cs + 1)[vals_nonzero]
        max_const = int(clens.max()) if clens.size else 0
    else:
        max_const = 0
    if max_const == 0 and bool((q != 0).any()):
        max_const = 1  # an isolated nonzero sample is a length-1 run

    return {
        "n_samples": n,
        "max_zero_run": max_zero,
        "n_dropouts": n_drop,
        "dropout_samples": drop_samples,
        "max_const_run": max_const,
        "dc_sum": int(q.sum(dtype=np.int64)),
    }
