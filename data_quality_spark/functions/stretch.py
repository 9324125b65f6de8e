"""Phase-vocoder time stretch + rational pitch shift (pure numpy).

The two perturbations a resampler CANNOT express: ``time_stretch``
changes duration while preserving pitch (the log-frequency profile is
unchanged); ``pitch_shift`` changes pitch while preserving duration
(the profile translates by ``B*log2(s)`` cells with the duration
fixed).  Together with plain resampling (linked pitch+tempo,
``functions.resample``) they span the re-upload perturbation space the
dedup family must be invariant to — ``synth.make_audio_stretch_corpus``
uses these to seed ground-truth twins for ``operators.audio_pitch``.

Standard phase vocoder (Flanagan & Golden 1966; Laroche & Dolson 1999
identity-phase-locking omitted — the synthetic program material is
stationary): STFT at hop ``HOP``, magnitude linearly interpolated at
fractional frame positions, phase accumulated from the wrapped
deviation of the measured frame-to-frame phase advance from the bin's
expected advance ``2π·hop·k/frame``, overlap-add resynthesis with
squared-window normalization.  Fully deterministic float64.
"""

from __future__ import annotations

import numpy as np

__all__ = ["time_stretch", "pitch_shift_rational", "PV_FRAME", "PV_HOP"]

PV_FRAME = 1024
PV_HOP = 256


def _hann(n: int) -> np.ndarray:
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)


def _stft(x: np.ndarray, frame: int, hop: int) -> np.ndarray:
    if len(x) < frame:
        x = np.pad(x, (0, frame - len(x)))
    frames = np.lib.stride_tricks.sliding_window_view(x, frame)[::hop]
    return np.fft.rfft(frames * _hann(frame), axis=1)


def _istft(S: np.ndarray, frame: int, hop: int) -> np.ndarray:
    win = _hann(frame)
    nf = S.shape[0]
    out = np.zeros(frame + (nf - 1) * hop, dtype=np.float64)
    wsum = np.zeros_like(out)
    frames = np.fft.irfft(S, n=frame, axis=1) * win
    for i in range(nf):
        sl = slice(i * hop, i * hop + frame)
        out[sl] += frames[i]
        wsum[sl] += win * win
    good = wsum > 1e-8
    out[good] /= wsum[good]
    return out


def time_stretch(
    x: np.ndarray,
    rate: float,
    out_len: int | None = None,
    frame: int = PV_FRAME,
    hop: int = PV_HOP,
) -> np.ndarray:
    """Play ``x`` at ``rate`` (rate > 1 → faster → SHORTER output) with
    pitch preserved; optionally trim/zero-pad to exactly ``out_len``
    samples (the stft frame grid truncates by up to frame+hop samples —
    seeded corpora need exact duration ratios)."""
    x = np.ascontiguousarray(x, dtype=np.float64)
    D = _stft(x, frame, hop)
    nf, nb = D.shape
    if nf < 2:
        y = x.copy()
    else:
        steps = np.arange(0.0, nf - 1, rate)
        phi_adv = 2.0 * np.pi * hop * np.arange(nb) / frame
        mag = np.abs(D)
        ph = np.angle(D)
        out = np.empty((len(steps), nb), dtype=np.complex128)
        phase = ph[0].copy()
        for i, t in enumerate(steps):
            k = int(t)
            fr = t - k
            m = (1.0 - fr) * mag[k] + fr * mag[k + 1]
            out[i] = m * np.exp(1j * phase)
            dph = ph[k + 1] - ph[k] - phi_adv
            dph -= 2.0 * np.pi * np.round(dph / (2.0 * np.pi))
            phase = phase + phi_adv + dph
        y = _istft(out, frame, hop)
    if out_len is None:
        return y
    if len(y) >= out_len:
        return y[:out_len]
    return np.pad(y, (0, out_len - len(y)))


def pitch_shift_rational(x: np.ndarray, L: int, M: int) -> np.ndarray:
    """Scale every frequency by ``L/M`` keeping duration EXACTLY
    ``len(x)``: polyphase-resample from rate L to rate M (duration ×
    M/L, played-back frequency × L/M), then phase-vocoder stretch the
    duration back by L/M."""
    from .resample import resample_poly

    y = resample_poly(np.ascontiguousarray(x, dtype=np.float64), L, M)
    return time_stretch(y, rate=len(y) / len(x), out_len=len(x))
