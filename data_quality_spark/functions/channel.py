"""Recording-channel (room-tone) fingerprinting kernels.

Content dedup (fingerprints, embeddings, transcripts) finds SAME AUDIO;
it cannot find *same recording session* — different utterances captured
by the same mic in the same room, the classic eval-leakage and
speaker-overfit vector in ASR corpora (a model keys on the channel, and
"held-out" clips from a training session are not held out at all).
The channel evidence lives where the content isn't: the noise floor.

Kernel law:

1. VAD-inactive frames on the shared 20 ms grid (``functions.vad``
   energies + smoothing — the exact complement of the speech the
   content operators use) are the room-tone sample pool.
2. The pool must hold ≥ ``MIN_NOISE_WINDOWS`` full ``FRAME``-sample
   analysis windows AND sit above digital silence
   (mean power > ``MIN_NOISE_POWER``, i.e. a real noise floor — an
   all-zero floor carries no channel evidence and must NOT cluster).
3. Mean power spectrum over the pool windows → the shared
   ``spectral.frame_band_energies`` log-band fold (``N_BANDS`` bands)
   → log10 → subtract the band mean (gain invariance: the same chain
   at a different preamp level is the same channel).

The profile is a 16-double vector per clip — at 10^12 clips the decode
pass is the cost (one ``mapInArrow``, shared shape with every audio
operator) and what shuffles afterwards is 128 bytes/clip, not audio.

Bucketing: a full-vector quantized key does NOT compose across bands
(each band may need a different grid offset, so two near-identical
profiles can miss on every joint key — the same failure the pitch/speed
detectors hit with single-spacing keys).  The composite key here is
1-D-exact instead: the double grid (offset 0 and half-step, step
``TILT_STEP``) over a scalar spectral TILT carries the guarantee — two
profiles with equal peak band and |tilt_a − tilt_b| ≤ TILT_STEP/2 share
at least one cell, unconditionally — and the argmax resonance band
splits the tilt line into channel families.  Candidate pairs then
verify on the EXACT squared-L2 distance over all ``N_BANDS`` bands with
a left-fold sum (IEEE-identical in Catalyst ``aggregate`` and the
Python twin).
"""

from __future__ import annotations

import numpy as np

from .spectral import FRAME, N_BANDS, frame_band_energies
from .vad import frame_mean_squares, smooth_active

__all__ = [
    "MIN_NOISE_WINDOWS", "MIN_NOISE_POWER", "TILT_STEP", "DIST2_MAX",
    "noise_profile", "channel_key_parts", "TILT_W",
]

MIN_NOISE_WINDOWS = 16       # >= 16 x 256-sample windows of room tone
FLOOR_SPAN = 10.0 ** (8.0 / 10.0)  # pool = frames within 8 dB of the
# quietest inactive frame (minimum-statistics floor tracking, Martin'01
# shape): VAD-inactive alone is not enough — a burst tail can sit just
# under the -40 dB threshold yet 12 dB above a -52 dB floor, and those
# frames carry CONTENT, not channel
MIN_NOISE_POWER = 1e-10      # mean power (float domain): -100 dBFS —
# excludes digital-zero / denormal floors, which carry no channel
# evidence and must not cluster
GUARD_FRAMES = 2             # inactive frames within 40 ms of an active
# run are content ramps (onset/decay through the threshold), never tone
REL_BAND_FLOOR = 1e-3        # clamp bands 30 dB under the band mean
TILT_STEP = 0.5              # log10 units per tilt grid cell
DIST2_MAX = 0.40             # squared L2 over the 16 log10 bands

# centered linear ramp over band indices: tilt = prof . TILT_W — positive
# for hiss-weighted (rising) floors, negative for rumble-weighted ones
TILT_W = (np.arange(N_BANDS, dtype=np.float64) - (N_BANDS - 1) / 2.0) \
    / float(N_BANDS)

# VAD active threshold: audio.SILENCE_DB (-40 dBFS) as mean-square power
# in the shared float32/32767 decode domain (the clip_vad convention)
_SIL_MS2 = 10.0 ** (-40.0 / 10.0)


def noise_profile(x_i16: np.ndarray, sr_hz: int):
    """(profile float64[N_BANDS] | None, n_noise_windows int).

    None when the clip has no usable room tone (too little inactive
    audio, or a digitally-silent floor).  Input is decoded int16; the
    VAD grid runs in the clip_vad float32/32767 domain so the
    active/inactive split is the SAME split every VAD consumer sees."""
    if x_i16.size == 0 or not sr_hz or sr_hz <= 0:
        return None, 0
    xf = x_i16.astype(np.float32) / np.float32(32767.0)
    ms, frame = frame_mean_squares(xf, sr_hz)
    if ms.size == 0:
        return None, 0
    active = smooth_active(ms >= _SIL_MS2)
    # guard band: a content onset/offset ramps THROUGH the threshold, so
    # the frames flanking an active run are sub-threshold content (burst
    # tails, reverb decay), not room tone — dilate the active mask
    dilated = active.copy()
    for g in range(1, GUARD_FRAMES + 1):
        dilated[g:] |= active[:-g]
        dilated[:-g] |= active[g:]
    idx = np.flatnonzero(~dilated)
    if idx.size == 0:
        return None, 0
    # minimum-statistics floor: only frames near the clip's quietest
    # inactive frame are room tone; near-threshold content tails are not
    ref = float(ms[idx].min())
    idx = idx[ms[idx] <= ref * FLOOR_SPAN]
    # gather the floor frames' samples (contiguous per frame)
    pool = np.concatenate(
        [xf[i * frame: (i + 1) * frame] for i in idx]
    ).astype(np.float64)
    n_windows = pool.size // FRAME
    if n_windows < MIN_NOISE_WINDOWS:
        return None, int(n_windows)
    bands = frame_band_energies(pool[: n_windows * FRAME], FRAME)
    mean_bands = bands.mean(axis=0) / FRAME  # per-sample power scale
    if float(mean_bands.sum()) / N_BANDS <= MIN_NOISE_POWER:
        return None, int(n_windows)
    # bands ≥30 dB under the clip's band mean are below (or near) the
    # int16 quantization floor on quiet room tone — their log values are
    # realization noise, and through the mean-centering they would smear
    # EVERY band.  Clamp them to a stable constant instead.
    floor = float(mean_bands.mean()) * REL_BAND_FLOOR
    logb = np.log10(np.maximum(mean_bands, floor))
    prof = logb - logb.mean()
    return prof.astype(np.float64), int(n_windows)


def channel_key_parts(prof: np.ndarray) -> tuple[int, int, int, float]:
    """(peak_band, tilt_cell0, tilt_cell1, tilt).

    peak_band = argmax band (ties to the lowest index, numpy argmax
    law); the two tilt cells are the offset-0 and half-step grids — the
    1-D double-grid guarantee: |tilt_a − tilt_b| ≤ TILT_STEP/2 implies a
    shared cell on at least one grid."""
    # left-fold dot product: bit-identical in the Python twin
    tilt = 0.0
    for i in range(prof.size):
        tilt = tilt + float(prof[i]) * float(TILT_W[i])
    peak = int(np.argmax(prof))
    c0 = int(np.floor(tilt / TILT_STEP))
    c1 = int(np.floor(tilt / TILT_STEP + 0.5))
    return peak, c0, c1, tilt
