"""Deterministic audio augmentation kernels (the training-data
PRODUCER side of the perturbation axes the detectors audit).

An ASR pipeline doesn't just detect speed/noise/gain/stretch
perturbations — it MANUFACTURES them for training robustness.  These
kernels reuse the exact detector-side primitives (``functions.gain``
scalar law, ``functions.resample`` polyphase, ``functions.stretch``
phase vocoder) so the producer and the auditor share one definition of
each transform, and every output is BYTE-DETERMINISTIC under any
partitioning or engine placement:

- gain: ``apply_gain_i16`` integer law (rint + rail clip);
- noise: additive white noise at a target SNR vs the clip's own RMS,
  realization seeded from the from-spec XXH64 of ``clip_id:aug_name``
  — the same clip always gets the same noise, on any executor;
- speed: polyphase rational resample played back at the original rate
  (duration scales exactly by den/num via ``output_length``);
- stretch: phase-vocoder time stretch, pitch preserved;
- reverb: convolution with a synthetic room impulse response (unit
  direct tap + seeded noise tail decaying at −60/RT60 dB/s, wet tail
  −6 dB), FFT convolution trimmed to the input length.

Outputs are (int16 samples, dur_ms) pairs; encoding is the shared
pcm16 law.  No clock, no process RNG — augmentation is a pure function
of (payload, clip_id, spec).
"""

from __future__ import annotations

import numpy as np

from .gain import apply_gain_i16
from .resample import output_length, resample_poly
from .stretch import time_stretch
from .xxh64 import xxh64_string

__all__ = ["DEFAULT_SPECS", "augment_i16"]

# (name, params) — names become clip_id suffixes and provenance labels
DEFAULT_SPECS = (
    ("gain-6db", {"kind": "gain", "db": -6.0}),
    ("noise20db", {"kind": "noise", "snr_db": 20.0}),
    ("speed1.1", {"kind": "speed", "num": 11, "den": 10}),
    ("stretch0.9", {"kind": "stretch", "rate": 0.9}),
    ("reverb0.6", {"kind": "reverb", "rt60_s": 0.6}),
)


def augment_i16(
    q: np.ndarray, sr_hz: int, clip_id: str, name: str, params: dict
) -> tuple[np.ndarray, int]:
    """(augmented int16 samples, dur_ms).  Pure function of its
    arguments — see module docstring for the per-kind laws."""
    kind = params["kind"]
    if kind == "gain":
        g = 10.0 ** (float(params["db"]) / 20.0)
        y, _clipped = apply_gain_i16(q, g)
    elif kind == "noise":
        rms = float(np.sqrt(np.mean(q.astype(np.float64) ** 2)))
        if rms == 0.0 or q.size == 0:
            y = q.copy()
        else:
            seed = xxh64_string(f"{clip_id}:{name}", 42) & ((1 << 64) - 1)
            rng = np.random.default_rng(seed)
            amp = rms / (10.0 ** (float(params["snr_db"]) / 20.0))
            noise = rng.standard_normal(q.size) * amp
            y = np.clip(
                np.rint(q.astype(np.float64) + noise), -32768, 32767
            ).astype(np.int16)
    elif kind == "speed":
        num, den = int(params["num"]), int(params["den"])
        # play num/den× faster: resample num→den, keep the original rate
        yf = resample_poly(
            q.astype(np.float64) / 32767.0, sr_hz * num, sr_hz * den
        )
        assert yf.size == output_length(q.size, den, num)
        y = np.clip(
            np.rint(yf * 32767.0), -32768, 32767
        ).astype(np.int16)
    elif kind == "reverb":
        # synthetic RIR: unit direct path + exponentially-decaying noise
        # tail at -60/RT60 dB/s, realization seeded like the noise kind;
        # output trimmed to the input length (the room does not change
        # the utterance's duration bookkeeping)
        rt60 = float(params["rt60_s"])
        if q.size == 0:
            y = q.copy()
        else:
            seed = xxh64_string(f"{clip_id}:{name}", 42) & ((1 << 64) - 1)
            rng = np.random.default_rng(seed)
            n_h = int(rt60 * sr_hz)
            t = np.arange(1, n_h + 1) / sr_hz
            # tail INITIAL amplitude -6 dB vs the unit direct tap (the
            # per-sample level is what blind RT60 estimation sees; an
            # energy-normalized tail starts ~40 dB down and the decay
            # never clears the detector's dynamic range)
            tail = 0.5 * rng.standard_normal(n_h) * (
                10.0 ** (-3.0 * t / rt60)
            )
            h = np.concatenate(([1.0], tail))
            n_fft = 1 << int(np.ceil(np.log2(q.size + n_h)))
            yf = np.fft.irfft(
                np.fft.rfft(q.astype(np.float64), n_fft)
                * np.fft.rfft(h, n_fft),
                n_fft,
            )[: q.size]
            # preserve the source's peak headroom (gain-invariant
            # consumers unaffected; rails never clip the room)
            peak_in = float(np.max(np.abs(q))) or 1.0
            peak_out = float(np.max(np.abs(yf))) or 1.0
            if peak_out > peak_in:
                yf *= peak_in / peak_out
            y = np.clip(np.rint(yf), -32768, 32767).astype(np.int16)
    elif kind == "stretch":
        rate = float(params["rate"])
        yf = time_stretch(q.astype(np.float64) / 32767.0, rate)
        y = np.clip(
            np.rint(yf * 32767.0), -32768, 32767
        ).astype(np.int16)
    else:
        raise ValueError(f"unknown augmentation kind: {kind}")
    dur_ms = int(round(y.size * 1000 / sr_hz)) if sr_hz > 0 else 0
    return y, dur_ms
