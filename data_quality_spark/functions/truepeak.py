"""True-peak (inter-sample over) estimation kernels — BS.1770-4 Annex 2
shape, made exact-integer.

A sample-domain peak meter misses *inter-sample peaks*: a waveform whose
samples all sit below full scale can reconstruct (in the DAC / in any
resampler) to a peak ABOVE full scale — the classic case is a full-scale
sine at fs/4 sampled at 45°, whose samples never exceed 0.707 FS while
the analog peak is 1.0 FS.  Such clips clip downstream converters and
audio augmentation pipelines (resample → hard overflow) even though
every per-sample audit reads clean.  BS.1770-4 measures this by
oversampling ×4 through an interpolation lowpass and taking the peak of
the oversampled stream.

Exact-integer formulation (the repo's decision-law discipline):

- The interpolation filter is a FIXED Q15 spec table: 48 taps of a
  Kaiser(β=8)-windowed sinc for L=4, quantized ``round(h·2^15)``
  (``TP_TAPS_Q15``; per-phase DC gains 32766..32769 ≈ unity).  The spec
  numbers themselves are part of the operator definition — like the
  rounded-cosine DCT table in ``image.phash64`` — so every engine
  convolves the same integers.
- Oversampled values are exact int64 accumulations: phase ``p`` of the
  ×4 stream is ``conv(x, TP_TAPS_Q15[p::4])`` over int64 (|acc| ≤
  12·2^15·2^15 ≈ 1.2e10, far inside int64).  ``tp_q15`` = max |acc|
  across all phases and positions (full convolution: edges count, a
  peak against the zero boundary is still a peak).
- Decision laws are integer compares against spec constants — no float
  ever decides a flag:

  * over 0 dBTP (will clip on reconstruction):  ``tp_q15 > FS_Q15``
    where ``FS_Q15 = 32767·2^15``;
  * hidden over: over AND sample peak below the clipping rail
    (``RAIL_I16 = 32700``, shared with the click/clipping audits) — the
    insidious class every sample-domain audit passes;
  * hot master (EBU R128 headroom breach): ``tp_q15 > TP_LIMIT_Q15``
    where ``TP_LIMIT_Q15 = round(FS_Q15 · 10^(−1/20))`` — the −1 dBTP
    program limit as a fixed integer spec constant.

The production kernel runs the polyphase form (4 short int64 convs — no
multiplies against stuffed zeros); the differential oracle replays the
LITERAL definition (zero-stuff → full convolution in arbitrary-precision
Python ints).  In exact integer arithmetic the two are the same sums
term for term, so equality is bit-for-bit and an int64 overflow in the
kernel could not hide.

Reference analog: none (audio is beyond the reference); the shape is a
range rule (checkpoints.py:178-214) over a kernel-computed metric.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "truepeak_stats",
    "TP_FIELDS",
    "TP_TAPS_Q15",
    "TP_L",
    "FS_Q15",
    "TP_LIMIT_Q15",
    "RAIL_I16",
]

# ×4 oversampling, 12 taps per phase: Kaiser(8)-windowed sinc quantized
# to Q15 (see module docstring; regeneration recipe in tests).
TP_L = 4
TP_TAPS_Q15 = np.array([
    -2, -11, -25, -19, 32, 125, 190, 115, -164, -548, -742, -409,
    536, 1674, 2147, 1133, -1441, -4431, -5695, -3090, 4197, 14777,
    25308, 31878, 31878, 25308, 14777, 4197, -3090, -5695, -4431,
    -1441, 1133, 2147, 1674, 536, -409, -742, -548, -164, 115, 190,
    125, 32, -19, -25, -11, -2,
], dtype=np.int64)

# full scale / program limit in oversampled Q15 units
FS_Q15 = 32767 * 32768
TP_LIMIT_Q15 = 956944203  # round(FS_Q15 * 10 ** (-1/20)) — −1 dBTP
RAIL_I16 = 32700  # shared with the click audit's clipping-edge guard

TP_FIELDS = ["n_samples", "sample_peak", "tp_q15"]


def _empty(n: int = 0) -> dict:
    return {"n_samples": int(n), "sample_peak": None, "tp_q15": None}


def truepeak_stats(q: np.ndarray) -> dict:
    """True-peak metrics for one int16 clip: ``(n_samples, sample_peak,
    tp_q15)``.  Undecodable / empty clips return NULL metrics — never a
    flag.  Pure integer arithmetic end to end."""
    n = int(q.size)
    if n == 0:
        return _empty(n)
    x = q.astype(np.int64)
    best = 0
    for p in range(TP_L):
        y = np.convolve(x, TP_TAPS_Q15[p::TP_L])
        m = int(np.abs(y).max())
        if m > best:
            best = m
    return {
        "n_samples": n,
        "sample_peak": int(np.abs(x).max()),
        "tp_q15": best,
    }
