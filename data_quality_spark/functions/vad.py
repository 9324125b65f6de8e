"""Energy-based voice-activity detection + silence-split segmentation.

The training-data step the gate's whole-clip ``silence_frac`` cannot do:
*where* the activity sits.  A clip with silence_frac 0.5 could be speech
with long gaps (salvageable by splitting) or a half-dead recording (drop);
VAD run-lengths distinguish them, and silence-split segmentation turns one
long clip into the per-utterance chunks an ASR/TTS training pipeline
actually consumes.

Algorithm (classic energy VAD with hangover, from public practice — e.g.
ITU-T G.729B / WebRTC VAD use the same frame-energy + hangover-smoothing
shape, here reduced to its deterministic core):

1. frame the decoded PCM into non-overlapping ``FRAME_MS`` (20 ms) windows
   (tail samples ignored — same convention as ``audio.clip_stats``);
2. a frame is *active* when its RMS ≥ ``SILENCE_DB`` (-40 dBFS);
3. **hangover**: an inactive run of ≤ ``HANG_FRAMES`` frames *between two
   active runs* is re-labelled active (breaths/plosive gaps stay inside
   one utterance);
4. **debounce**: an active run of < ``MIN_SPEECH_FRAMES`` frames is
   re-labelled inactive (isolated clicks are not speech).
   Hangover runs first, so two clicks 40 ms apart can legitimately merge
   into one ≥ MIN_SPEECH burst before debounce judges it.

Everything here is numpy run-length encoding over the frame-energy vector —
no per-sample Python.  The differential oracle in ``oracles.py`` replays
steps 2-4 as an explicit per-frame state machine in pure Python, so the
smoothing logic (the part most likely to harbour an off-by-one) is verified
by an independently-structured implementation; frame energies themselves
reuse one shared reduction so the float boundary cannot flake the compare.

Reference analog: the reference has no audio path; this feeds the same
predicate → severity → gate machinery as its row rules
(``/root/reference/src/data_quality/checkpoints.py:178-296``).
"""

from __future__ import annotations

import numpy as np

from .audio import FRAME_MS, SILENCE_DB

__all__ = [
    "HANG_FRAMES",
    "MIN_SPEECH_FRAMES",
    "frame_mean_squares",
    "frame_energies_db",
    "smooth_active",
    "active_runs",
    "vad_stats",
    "vad_segments",
]

HANG_FRAMES = 2  # ≤40 ms silence inside an utterance is not a split point
MIN_SPEECH_FRAMES = 2  # <40 ms of activity is a click, not speech

_EPS = 1e-12


def frame_mean_squares(x: np.ndarray, sr_hz: int) -> tuple[np.ndarray, int]:
    """(per-frame mean-square energy float64, frame length in samples).

    The ONE shared reduction: Spark kernel, segment-RMS computation, and
    the oracle state machine all take their frame energies from here, so
    the active/inactive threshold compare happens on bit-identical float64
    values and the differential surface is purely the run-length logic.
    """
    frame = max(int(sr_hz * FRAME_MS / 1000), 1)
    n_frames = int(x.size) // frame
    if n_frames == 0:
        return np.zeros(0, dtype=np.float64), frame
    x2 = np.square(np.asarray(x[: n_frames * frame]))
    return np.mean(x2.reshape(n_frames, frame), axis=1, dtype=np.float64), frame


def frame_energies_db(
    x: np.ndarray, sr_hz: int,
    frames: tuple[np.ndarray, int] | None = None,
) -> tuple[np.ndarray, int]:
    """(per-frame RMS in dBFS float64, frame length in samples).

    ``frames`` short-circuits the reduction with a precomputed
    ``frame_mean_squares`` result — the fused audit computes the O(n)
    energy pass ONCE and feeds both the VAD and the SNR kernel; floats
    stay bit-identical because it is the same function either way."""
    frame_ms2, frame = (frames if frames is not None
                        else frame_mean_squares(x, sr_hz))
    return 10.0 * np.log10(np.maximum(frame_ms2, _EPS * _EPS)), frame


def _runs(mask: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Start/end (exclusive) frame indices of True runs, vectorized RLE."""
    if mask.size == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z
    b = mask.astype(np.int8)
    d = np.diff(b)
    starts = np.flatnonzero(d == 1) + 1
    ends = np.flatnonzero(d == -1) + 1
    if b[0]:
        starts = np.concatenate(([0], starts))
    if b[-1]:
        ends = np.concatenate((ends, [mask.size]))
    return starts.astype(np.int64), ends.astype(np.int64)


def smooth_active(active: np.ndarray, hang: int = HANG_FRAMES,
                  min_speech: int = MIN_SPEECH_FRAMES) -> np.ndarray:
    """Hangover (close interior silence gaps ≤ hang) then debounce (drop
    active runs < min_speech).  Pure boolean-vector surgery, order matters
    and is part of the contract (see module docstring)."""
    out = active.copy()
    if out.size == 0:
        return out
    # hangover: interior inactive runs only — leading/trailing silence is
    # real silence, never bridged
    s, e = _runs(~out)
    for i in range(s.size):
        if s[i] > 0 and e[i] < out.size and (e[i] - s[i]) <= hang:
            out[s[i]:e[i]] = True
    # debounce
    s, e = _runs(out)
    for i in range(s.size):
        if (e[i] - s[i]) < min_speech:
            out[s[i]:e[i]] = False
    return out


def active_runs(
    x: np.ndarray, sr_hz: int,
    frames: tuple[np.ndarray, int] | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """(starts, ends, frame_db, frame) after smoothing; starts/ends in frames."""
    frame_db, frame = frame_energies_db(x, sr_hz, frames)
    active = smooth_active(frame_db >= SILENCE_DB)
    s, e = _runs(active)
    return s, e, frame_db, frame


def _frames_to_ms(k: int | np.integer, frame: int, sr_hz: int) -> int:
    # exact integer arithmetic — no float rounding disagreement possible
    return int(round(int(k) * frame * 1000 / sr_hz))


def vad_stats(
    x: np.ndarray, sr_hz: int,
    frames: tuple[np.ndarray, int] | None = None,
) -> dict:
    """Whole-clip VAD summary.  All *_ms fields are integer milliseconds on
    the 20 ms frame grid; speech_ratio is speech frames / total frames after
    smoothing (0.0 for a clip shorter than one frame)."""
    if x.size == 0 or sr_hz is None or sr_hz <= 0:
        return {
            "n_frames": 0, "speech_ratio": 0.0, "speech_ms": 0,
            "n_segments": 0,
            "longest_speech_ms": 0, "longest_silence_ms": 0,
            "leading_silence_ms": 0, "trailing_silence_ms": 0,
        }
    s, e, frame_db, frame = active_runs(x, sr_hz, frames)
    n_frames = int(frame_db.size)
    if n_frames == 0:
        return {
            "n_frames": 0, "speech_ratio": 0.0, "speech_ms": 0,
            "n_segments": 0,
            "longest_speech_ms": 0, "longest_silence_ms": 0,
            "leading_silence_ms": 0, "trailing_silence_ms": 0,
        }
    speech_frames = int((e - s).sum()) if s.size else 0
    longest_speech = int((e - s).max()) if s.size else 0
    if s.size == 0:
        leading = n_frames
        trailing = n_frames
        longest_sil = n_frames
    else:
        leading = int(s[0])
        trailing = n_frames - int(e[-1])
        gaps = (s[1:] - e[:-1]) if s.size > 1 else np.zeros(0, dtype=np.int64)
        longest_sil = int(max(leading, trailing, gaps.max() if gaps.size else 0))
    return {
        "n_frames": n_frames,
        "speech_ratio": float(speech_frames / n_frames),
        "speech_ms": _frames_to_ms(speech_frames, frame, sr_hz),
        "n_segments": int(s.size),
        "longest_speech_ms": _frames_to_ms(longest_speech, frame, sr_hz),
        "longest_silence_ms": _frames_to_ms(longest_sil, frame, sr_hz),
        "leading_silence_ms": _frames_to_ms(leading, frame, sr_hz),
        "trailing_silence_ms": _frames_to_ms(trailing, frame, sr_hz),
    }


def vad_segments(x: np.ndarray, sr_hz: int) -> list[dict]:
    """Silence-split segments: one dict per active run with start/end/dur in
    ms (frame-grid) and the segment's own RMS in dBFS (float64, energy over
    exactly the run's frames)."""
    if x.size == 0 or sr_hz is None or sr_hz <= 0:
        return []
    frame_ms2, frame = frame_mean_squares(x, sr_hz)
    if frame_ms2.size == 0:
        return []
    frame_db = 10.0 * np.log10(np.maximum(frame_ms2, _EPS * _EPS))
    active = smooth_active(frame_db >= SILENCE_DB)
    s, e = _runs(active)
    if s.size == 0:
        return []
    out = []
    for i in range(s.size):
        seg_ms2 = float(np.mean(frame_ms2[s[i]:e[i]], dtype=np.float64))
        out.append({
            "seg_idx": i,
            "start_ms": _frames_to_ms(s[i], frame, sr_hz),
            "end_ms": _frames_to_ms(e[i], frame, sr_hz),
            "dur_ms": _frames_to_ms(e[i] - s[i], frame, sr_hz),
            # exact sample bounds on the frame grid — the chunk extractor
            # slices on these, never on the (rounded) ms fields
            "start_sample": int(s[i]) * frame,
            "end_sample": int(e[i]) * frame,
            "rms_db": float(max(10.0 * np.log10(max(seg_ms2, _EPS * _EPS)),
                                -120.0)),
        })
    return out
