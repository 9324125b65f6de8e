"""Speech-SNR estimation from the VAD's frame partition.

The gate's whole-clip ``rms_db`` mixes speech and background into one
number; the quality signal ASR corpus filters actually want is the *ratio*
between them — a clip recorded next to a fan can have healthy RMS and be
unusable.  Classic segmental estimate (the NIST STNR / WADA-SNR family of
blind estimators reduces to this when the speech/noise partition is taken
from an energy VAD):

1. frame the clip with the shared 20 ms grid (``vad.frame_mean_squares`` —
   the ONE reduction the VAD, the segmenter, and the differential oracle
   all share, so threshold compares are bit-identical);
2. label frames speech/noise with the VAD's smoothed mask (hangover then
   debounce, ``vad.smooth_active``);
3. ``snr_db = 10·log10(mean_ms2[speech] / mean_ms2[noise])`` — the signal
   estimate deliberately includes the noise under the speech (true S+N/N,
   like every blind estimator; at the SNRs worth filtering on the bias is
   < 0.5 dB and monotone, so thresholds transfer).

Degenerate partitions yield NULLs rather than fake numbers: a clip with no
noise frames (wall-to-wall speech) has no in-clip noise reference, and a
clip with no speech frames has nothing to measure — both surface as
``snr_db IS NULL`` with the one-sided level still reported, so a gate rule
can treat "unmeasurable" distinctly from "bad".

Scale shape: pure per-clip map over the decoded PCM — no shuffle, runs
inside the same single ``mapInArrow`` pass style as every kernel here.

Reference analog: the reference has no audio path; this feeds the same
predicate → severity machinery as its row rules
(``/root/reference/src/data_quality/checkpoints.py:178-296``).
"""

from __future__ import annotations

import numpy as np

from .audio import SILENCE_DB
from .vad import frame_mean_squares, smooth_active

__all__ = ["speech_snr", "SNR_FLOOR_DB", "SNR_CAP_DB"]

SNR_FLOOR_DB = -120.0
# int16 dynamic range bounds any real in-clip ratio (~87 dB); only an
# exact digital-zero noise floor can exceed it through the eps guard, and
# those clips should compare equal, not by epsilon artifacts
SNR_CAP_DB = 120.0
_EPS2 = 1e-24  # matches the VAD's (1e-12)^2 energy floor


def _db(ms2: float) -> float:
    return float(max(10.0 * np.log10(max(ms2, _EPS2)), SNR_FLOOR_DB))


def speech_snr(
    x: np.ndarray, sr_hz: int,
    frames: tuple[np.ndarray, int] | None = None,
) -> dict:
    """Whole-clip speech-vs-noise summary over normalized float PCM.

    Returns ``{"n_frames", "speech_frames", "snr_db", "speech_db",
    "noise_db"}``; the dB fields are None when their side of the partition
    is empty (and ``snr_db`` is None when either side is).  ``frames``
    short-circuits the energy reduction with a precomputed
    ``frame_mean_squares`` result (the fused-audit decode-once law) —
    bit-identical, it is the same function either way.
    """
    if x.size == 0 or sr_hz is None or sr_hz <= 0:
        return {"n_frames": 0, "speech_frames": 0,
                "snr_db": None, "speech_db": None, "noise_db": None}
    ms2, _frame = (frames if frames is not None
                   else frame_mean_squares(x, sr_hz))
    n = int(ms2.size)
    if n == 0:
        return {"n_frames": 0, "speech_frames": 0,
                "snr_db": None, "speech_db": None, "noise_db": None}
    frame_db = 10.0 * np.log10(np.maximum(ms2, _EPS2))
    act = smooth_active(frame_db >= SILENCE_DB)
    k = int(np.count_nonzero(act))
    speech_ms = float(np.mean(ms2[act], dtype=np.float64)) if k else None
    noise_ms = (
        float(np.mean(ms2[~act], dtype=np.float64)) if k < n else None
    )
    snr = (
        float(min(10.0 * np.log10(max(speech_ms, _EPS2) / max(noise_ms, _EPS2)),
                  SNR_CAP_DB))
        if (speech_ms is not None and noise_ms is not None)
        else None
    )
    return {
        "n_frames": n,
        "speech_frames": k,
        "snr_db": snr,
        "speech_db": _db(speech_ms) if speech_ms is not None else None,
        "noise_db": _db(noise_ms) if noise_ms is not None else None,
    }
