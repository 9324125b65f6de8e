"""Blind reverberation estimate from free-decay segments.

A far-field / echoey recording (the classic "recorded across the room"
web-scrape defect) shows up as slow energy decay after every speech
offset: instead of falling off a cliff into the noise floor within one
20 ms frame, the level ramps down at ``-60/RT60`` dB per second.  This
kernel measures that ramp where it is unambiguous — BELOW the activity
threshold, where direct sound is over and only the room tail remains:

1. frame dB from ``vad.frame_energies_db`` (the ONE shared 20 ms
   reduction — bit-identical between the Spark kernel and the oracle);
2. active frames are ``>= SILENCE_DB`` (-40 dBFS, the VAD law); each
   active run's END is a candidate offset;
3. the decay segment is the run of frames after the offset that keeps
   falling (``RIPPLE_DB`` tolerance for the ragged tail of a real
   impulse response) and stays above the pcm16 quantization floor
   (``QUANT_FLOOR_DB``), capped at ``MAX_SEG`` frames;
4. a segment counts only with >= ``MIN_POINTS`` frames and a total fall
   >= ``MIN_DROP_DB`` — a dry offset crosses from burst level to digital
   silence inside 1-2 frames and never yields 4 sub-threshold points,
   while a reverberant tail spends ``~RT60/2`` seconds there;
5. slope in dB/s by least squares over the segment's (frame, dB)
   points; ``rt60_est = -60 / median slope``.

Decision law (in ``operators.audio_reverb``): ``n_decays >= MIN_DECAYS``
and ``RT60_FLAG_MIN <= rt60_est <= RT60_FLAG_MAX`` — one slow dip can be
a beat null between close tones; a *consistent population* of slow
sub-threshold decays inside the plausible room band is reverberation.

Documented limits: blind RT60 is only observable at offsets followed by
enough gap; clips with no offsets (continuous tones, wall-to-wall
speech) report ``n_decays = 0`` and are NOT evaluable — absence of
decays is "no evidence", never "dry".

Reference analog: none (audio is beyond the reference); the shape is
the per-row metric + threshold rule of checks.py.
"""

from __future__ import annotations

import numpy as np

from .audio import SILENCE_DB
from .vad import frame_energies_db

__all__ = [
    "decay_stats",
    "MIN_POINTS", "MIN_DROP_DB", "RIPPLE_DB", "QUANT_FLOOR_DB", "MAX_SEG",
    "MIN_DECAYS", "RT60_FLAG_MIN", "RT60_FLAG_MAX",
]

BACK_STEP_DB = 0.5     # backward walk climbs the ramp while frames fall this much
REJOIN_DB = 6.0        # forward walk stops when level rises this far off the min
MIN_POINTS = 6         # >= 6 frames (120 ms) of observable decay ramp
MIN_DROP_DB = 20.0     # total fall from segment start to its minimum
QUANT_FLOOR_DB = -95.0  # pcm16 1-LSB sits near -90; below is digital silence
MAX_SEG = 100          # 2 s cap per segment bounds the scan
MIN_DECAYS = 2         # one slow dip can be a beat null; a population can't
RT60_FLAG_MIN = 0.35   # plausible-room decision band for the flag
RT60_FLAG_MAX = 4.0

_EMPTY = {
    "n_frames": 0,
    "n_offsets": 0,
    "n_decays": 0,
    "decay_db_s": None,
    "rt60_est": None,
}


def _ls_slope(y: np.ndarray) -> float:
    """Least-squares slope of y over x = 0..len(y)-1 (dB per frame)."""
    n = y.size
    x = np.arange(n, dtype=np.float64)
    sx = float(x.sum())
    sy = float(y.sum())
    sxx = float((x * x).sum())
    sxy = float((x * y).sum())
    return (n * sxy - sx * sy) / (n * sxx - sx * sx)


def decay_stats(x: np.ndarray, sr_hz: int) -> dict:
    """Free-decay statistics for one clip; zero counts / ``None`` rates
    when the clip has no measurable offsets."""
    if sr_hz is None or sr_hz <= 0:
        return dict(_EMPTY)
    db, frame = frame_energies_db(np.asarray(x, dtype=np.float64), sr_hz)
    nf = int(db.size)
    out = dict(_EMPTY)
    out["n_frames"] = nf
    if nf < MIN_POINTS + 1:
        return out
    fps = float(sr_hz) / float(frame)
    active = db >= SILENCE_DB
    n_offsets = 0
    slopes: list[float] = []
    last_end = -1  # offsets inside an already-consumed segment are spent
    for e in range(nf - 1):
        if not (active[e] and not active[e + 1]):
            continue
        n_offsets += 1
        if e <= last_end:
            continue
        # backward: climb the ramp while frames keep falling forward —
        # stops at the burst plateau (steps there are ~0 dB)
        b = e
        while (b > 0 and e - b < MAX_SEG
               and db[b - 1] >= db[b] + BACK_STEP_DB):
            b -= 1
        # forward: follow the ragged tail; stop only when the level
        # rises clearly off the running minimum (the next onset) or
        # reaches digital silence
        j = e + 1
        run_min = db[j]
        while (j + 1 < nf and j - e < MAX_SEG
               and db[j + 1] > QUANT_FLOOR_DB
               and db[j + 1] <= run_min + REJOIN_DB):
            j += 1
            if db[j] < run_min:
                run_min = db[j]
        seg = db[b: j + 1]
        last_end = j
        if (seg.size >= MIN_POINTS
                and float(seg[0]) - float(seg.min()) >= MIN_DROP_DB):
            s = _ls_slope(seg) * fps  # dB/s
            if s < 0.0:
                slopes.append(s)
    out["n_offsets"] = n_offsets
    out["n_decays"] = len(slopes)
    if slopes:
        slopes.sort()
        m = len(slopes)
        med = (slopes[m // 2] if m % 2
               else 0.5 * (slopes[m // 2 - 1] + slopes[m // 2]))
        out["decay_db_s"] = med
        out["rt60_est"] = -60.0 / med
    return out
