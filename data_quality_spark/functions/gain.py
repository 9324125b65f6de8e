"""Loudness (gain) normalization kernel — integer-domain, single pass.

Training consumers want clips at one nominal loudness; a web-scale corpus
mixes quiet phone audio with hot studio takes.  The normalizer targets an
RMS level (default -20 dBFS) but never lets the peak exceed a ceiling
(default -1 dBFS): ``gain = min(rms_gain, peak_headroom)`` — the standard
two-constraint formulation (RMS target, true-peak ceiling).

All math is float64 over the int16 samples directly: decoding to [-1, 1]
floats and re-encoding is algebraically ``rint(q * g)`` because the
32767-scalings cancel, so the kernel applies gain in ONE fused pass with no
float waveform materialized (the decode+transform family is DRAM-bound at
32 executor threads; see functions/audio.py decode notes).

Silence (all-zero) has no defined RMS gain — callers pass those rows
through untouched, mirroring ``normalize_sr``'s never-damage-a-row rule.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = [
    "TARGET_RMS_DB",
    "PEAK_CEILING_DB",
    "gain_factor",
    "apply_gain_i16",
    "rms_db_i16",
]

TARGET_RMS_DB = -20.0
PEAK_CEILING_DB = -1.0


def rms_db_i16(q: np.ndarray) -> float | None:
    """RMS level of an int16 clip in dBFS (0 dB == full-scale sine-free
    32767); None for empty or all-zero input."""
    if q.size == 0:
        return None
    ms = float(np.mean(np.square(q.astype(np.float64) / 32767.0)))
    if ms == 0.0:
        return None
    return 10.0 * math.log10(ms)


def gain_factor(
    q: np.ndarray,
    target_rms_db: float = TARGET_RMS_DB,
    peak_ceiling_db: float = PEAK_CEILING_DB,
) -> float | None:
    """Linear gain bringing the clip to ``target_rms_db``, limited so the
    post-gain peak stays <= ``peak_ceiling_db``; None when undefined
    (empty / all-zero input)."""
    if q.size == 0:
        return None
    x = q.astype(np.float64)
    peak = float(np.max(np.abs(x))) / 32767.0
    if peak == 0.0:
        return None
    ms = float(np.mean(np.square(x / 32767.0)))
    g = 10.0 ** ((target_rms_db - 10.0 * math.log10(ms)) / 20.0)
    ceiling = 10.0 ** (peak_ceiling_db / 20.0)
    if peak * g > ceiling:
        g = ceiling / peak
    return float(g)


def apply_gain_i16(q: np.ndarray, g: float) -> tuple[np.ndarray, int]:
    """Scale int16 samples by linear gain ``g``; returns (int16 samples,
    count of samples that hit the int16 clip rails).  Identical to
    decode→scale→``encode_pcm16`` because the 1/32767 scalings cancel."""
    y = np.rint(q.astype(np.float64) * g)
    n_clipped = int(np.count_nonzero((y < -32768) | (y > 32767)))
    return np.clip(y, -32768, 32767).astype(np.int16), n_clipped
