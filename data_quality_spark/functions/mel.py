"""Log-mel filterbank features (the standard ASR training input).

From-spec implementation (Davis & Mermelstein 1980 filterbank; HTK mel
scale ``m = 2595·log10(1 + f/700)``) — no audio library exists in this
sandbox, and the from-spec route makes every constant auditable:

- 25 ms periodic-Hann frames at a 10 ms hop (sample counts derived from
  the clip's own rate, so 8 kHz and 16 kHz clips both produce the
  100-frames/second grid models expect);
- power spectrum |rfft|² at ``n_fft = next_pow2(frame)``;
- ``N_MELS`` triangular filters with centers uniform on the mel axis
  between ``FMIN`` and the clip's Nyquist, Slaney-style unit *peak*
  (each triangle peaks at 1.0 — band energies stay comparable across
  sample rates);
- ``log(max(E, LOG_FLOOR))`` so silence is finite and deterministic.

Everything is float64 with fixed reduction order — the per-clip matrix
is a pure function of (payload, sr), independent of Arrow batch layout,
which is what lets the operator hash the raw feature BYTES and the
differential oracle demand bit-equality (the declip payload-hash
pattern).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "N_MELS",
    "MEL_FRAME_MS",
    "MEL_HOP_MS",
    "FMIN_HZ",
    "LOG_FLOOR",
    "hz_to_mel",
    "mel_to_hz",
    "mel_filterbank",
    "log_mel",
]

N_MELS = 40
MEL_FRAME_MS = 25
MEL_HOP_MS = 10
FMIN_HZ = 20.0
LOG_FLOOR = 1e-10

_FB_CACHE: dict[tuple[int, int], np.ndarray] = {}
_BAND_CACHE: dict[tuple[int, int], list] = {}


def hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(sr_hz: int, n_fft: int, n_mels: int = N_MELS) -> np.ndarray:
    """(n_mels, n_fft//2 + 1) triangular filters, unit peak, centers
    uniform in mel between FMIN_HZ and sr/2.  Cached per (sr, n_fft)."""
    key = (sr_hz, n_fft)
    fb = _FB_CACHE.get(key)
    if fb is not None:
        return fb
    n_bins = n_fft // 2 + 1
    freqs = np.arange(n_bins, dtype=np.float64) * sr_hz / n_fft
    edges = mel_to_hz(
        np.linspace(hz_to_mel(FMIN_HZ), hz_to_mel(sr_hz / 2.0), n_mels + 2)
    )
    fb = np.zeros((n_mels, n_bins), dtype=np.float64)
    for i in range(n_mels):
        lo, ctr, hi = edges[i], edges[i + 1], edges[i + 2]
        up = (freqs - lo) / (ctr - lo)
        down = (hi - freqs) / (hi - ctr)
        fb[i] = np.maximum(0.0, np.minimum(up, down))
    _FB_CACHE[key] = fb
    return fb


def _hann(n: int) -> np.ndarray:
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)


def log_mel(x: np.ndarray, sr_hz: int) -> np.ndarray:
    """(n_frames, N_MELS) float64 log-mel energies; zero frames when the
    clip is shorter than one 25 ms window or the rate is invalid."""
    if sr_hz is None or sr_hz <= 0:
        return np.zeros((0, N_MELS), dtype=np.float64)
    frame = int(sr_hz * MEL_FRAME_MS / 1000)
    hop = int(sr_hz * MEL_HOP_MS / 1000)
    xf = np.ascontiguousarray(x, dtype=np.float64)
    if frame <= 0 or hop <= 0 or len(xf) < frame:
        return np.zeros((0, N_MELS), dtype=np.float64)
    n_fft = 1
    while n_fft < frame:
        n_fft *= 2
    frames = (
        np.lib.stride_tricks.sliding_window_view(xf, frame)[::hop]
        * _hann(frame)
    )
    spec = np.fft.rfft(frames, n=n_fft, axis=1)
    power = spec.real * spec.real + spec.imag * spec.imag
    # per-filter slice-multiply + pairwise sum instead of a BLAS matmul:
    # dgemm picks blocking/threading per process and drifts by 1 ULP
    # between driver and executors, which would break the byte-hash
    # contract; numpy's axis reduction is fixed-order everywhere
    key = (sr_hz, n_fft)
    bands = _BAND_CACHE.get(key)
    if bands is None:
        fb = mel_filterbank(sr_hz, n_fft)
        bands = []
        for i in range(fb.shape[0]):
            idx = np.nonzero(fb[i])[0]
            if idx.size:
                bands.append((int(idx[0]), int(idx[-1]) + 1,
                              fb[i, idx[0]: idx[-1] + 1].copy()))
            else:
                bands.append((0, 0, np.zeros(0)))
        _BAND_CACHE[key] = bands
    out = np.empty((power.shape[0], len(bands)), dtype=np.float64)
    for i, (lo, hi, w) in enumerate(bands):
        out[:, i] = (power[:, lo:hi] * w).sum(axis=1) if hi > lo else 0.0
    return np.log(np.maximum(out, LOG_FLOOR))
