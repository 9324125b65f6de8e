"""Acoustic speaker-fingerprint kernels (voiced-frame voice profile).

The third identity axis of the dedup/leakage family, orthogonal to the
other two: content fingerprints find SAME AUDIO, channel profiles
(``functions.channel``) find SAME ROOM/MIC (evidence in the VAD-inactive
noise floor), and this module finds SAME VOICE — different utterances,
possibly different rooms, one speaker.  An eval split that separates
content and channel but not speakers still leaks speaker identity, and
per-speaker contribution caps (``speaker_balance``) need an acoustic key
when no speaker label exists.

Kernel law (classic source-filter reasoning, deterministic core):

1. Frame the decoded PCM into ``V_FRAME``-sample windows with
   ``V_HOP``-sample hop (32 ms / 16 ms at 16 kHz).
2. Per frame, the normalized autocorrelation (computed exactly as
   irfft(|rfft|²) over a 2·V_FRAME transform — circular-correlation-free
   by zero padding) is searched over the pitch lag band
   [sr/``F0_MAX``, sr/``F0_MIN``]; a frame is VOICED when its energy
   clears the shared −40 dBFS VAD floor and the peak normalized
   autocorrelation ≥ ``VOICED_MIN`` (strong periodicity).
3. A clip needs ≥ ``MIN_VOICED_FRAMES`` voiced frames; fewer (silence,
   music-free noise, fricative-only content) → no voice evidence, the
   clip must NOT cluster.  A clip whose voiced-frame FRACTION exceeds
   ``MAX_VOICED_FRAC`` is stationary periodicity — a held tone, hold
   music, a beep — not a voice either: real speech breaks periodicity
   at pauses, stops, and unvoiced consonants (measured: synthetic
   speakers ≤ 0.56 voiced, pure-tone corpus clips at 1.0), and at web
   scale the tone family otherwise floods the (F0, tilt) buckets into
   the skew guard, silently suppressing REAL speaker pairs that share
   a cell with it.  Tone families remain deduplicable — by the content
   axis, where identical audio belongs.
4. The voice profile is the HARMONIC-SAMPLED spectral envelope: per
   voiced frame, power is peak-picked (±1 bin) at each harmonic
   k·sr/lag of that frame's own pitch lag up to ``ENV_F_HI``, the
   log10 envelope is linearly interpolated onto a fixed
   ``N_ENV``-point log-frequency grid [``ENV_F_LO``, ``ENV_F_HI``],
   and the per-frame grids are averaged, then mean-centered.
   Sampling AT the harmonics (rather than folding the whole spectrum
   into bands) cancels the comb itself: between-harmonic bins carry
   only window leakage that varies per utterance, and for a
   high-pitched voice the sub-F0 bands are pure leakage — folding them
   in swamps the vocal-tract signal (measured: band-fold intra/inter
   margin ratio 0.18–0.63, envelope sampling ≥ 2).  F0 is the median
   over per-frame sr/lag.

Bucketing composes TWO 1-D-exact double grids — log2(median F0) under
``F0_STEP`` and the envelope TILT scalar (prof · ``TILT_W``, the
high-vs-low vocal-tract balance) under ``TILT_STEP`` — as the 2×2 grid
combinations, four keys per clip.  The composite guarantee is exact:
|Δlog2 f0| ≤ F0_STEP/2 AND |Δtilt| ≤ TILT_STEP/2 ⇒ some (f0-grid,
tilt-grid) combination shares both cells.  Tilt is Lipschitz in the
profile (|Δtilt| ≤ ‖Δprof‖·‖TILT_W‖), so a stable profile implies a
stable key — unlike an argmax family split, which flips on near-ties
between envelope points no matter how stable the profile is (measured:
F1-region points within 0.02 of each other swap ranks between clips of
one speaker).  Verification is the exact left-fold squared-L2 over the
16 envelope points, accepted under ``DIST2_MAX``.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "V_FRAME", "V_HOP", "F0_MIN", "F0_MAX", "VOICED_MIN",
    "MIN_VOICED_FRAMES", "MAX_VOICED_FRAC", "N_ENV", "F0_STEP",
    "TILT_STEP", "TILT_W", "DIST2_MAX", "MIN_SEG_MS", "SEG_MIN_VOICED",
    "voice_profile", "voice_key_parts", "segment_voices",
]

V_FRAME = 512        # 32 ms at 16 kHz — ≥2 pitch periods at 62.5 Hz
V_HOP = 256
F0_MIN = 60.0        # Hz — pitch search band (human speech)
F0_MAX = 400.0
VOICED_MIN = 0.50    # normalized autocorr peak for a voiced frame
MIN_VOICED_FRAMES = 12
MAX_VOICED_FRAC = 0.90  # above this the clip is a stationary tone, not
# a voice (speech breaks periodicity at pauses/stops/consonants)
N_ENV = 16           # envelope grid points
ENV_F_LO = 300.0     # Hz — grid spans the F1..F3 vocal-tract range
ENV_F_HI = 3800.0
F0_STEP = 0.15       # log2 units per pitch grid cell (~11% per cell;
# the half-step guarantee covers ±5.3% median-F0 drift between clips)
TILT_STEP = 0.8      # envelope-tilt units per family grid cell: measured
# intra-speaker tilt spread ≤ 0.33 < half-step 0.4, speaker means span ~4
DIST2_MAX = 1.00     # squared L2 over the 16 log10 envelope points;
# margins measured on the synth corpus (intra ≪ 1 ≪ inter)

# centered linear ramp over envelope indices: tilt = prof · TILT_W
TILT_W = (np.arange(16, dtype=np.float64) - 7.5) / 16.0

# shared VAD silence floor (-40 dBFS) as mean-square in the float domain
_SIL_MS2 = 10.0 ** (-40.0 / 10.0)

_ENV_LOGF = np.log10(np.geomspace(ENV_F_LO, ENV_F_HI, N_ENV))


def voice_profile(
    x_i16: np.ndarray,
    sr_hz: int,
    min_voiced: int = MIN_VOICED_FRAMES,
    max_voiced_frac: float = MAX_VOICED_FRAC,
):
    """(profile float64[N_BANDS] | None, n_voiced int, f0_med float).

    None profile when the clip has no usable voiced evidence; ``f0_med``
    is 0.0 then.  Input is decoded int16; energies run in the shared
    float32/32767 VAD domain.  ``max_voiced_frac`` is the stationarity
    guard — within-clip SEGMENT profiling (``audio_diarize``) disables
    it (> 1.0): a VAD-carved utterance is legitimately voiced
    throughout, and the guard exists to keep tone mega-families out of
    the cross-clip buckets, a hazard segment-local comparison doesn't
    have."""
    if x_i16.size < V_FRAME or not sr_hz or sr_hz <= 0:
        return None, 0, 0.0
    lag_lo = max(2, int(np.floor(sr_hz / F0_MAX)))
    lag_hi = min(V_FRAME - 1, int(np.ceil(sr_hz / F0_MIN)))
    if lag_lo >= lag_hi:
        return None, 0, 0.0
    xf = (x_i16.astype(np.float32) / np.float32(32767.0)).astype(np.float64)
    n_frames = (xf.size - V_FRAME) // V_HOP + 1
    idx = np.arange(V_FRAME)[None, :] + V_HOP * np.arange(n_frames)[:, None]
    frames = xf[idx]
    # zero-padded transform: irfft(|rfft|²) is the exact linear
    # autocorrelation (no circular wrap at lags < V_FRAME)
    spec = np.fft.rfft(frames, n=2 * V_FRAME, axis=1)
    power = spec.real * spec.real + spec.imag * spec.imag
    ac = np.fft.irfft(power, n=2 * V_FRAME, axis=1)
    r0 = ac[:, 0]
    band = ac[:, lag_lo: lag_hi + 1]
    peak_lag = lag_lo + np.argmax(band, axis=1)
    peak_val = band[np.arange(n_frames), peak_lag - lag_lo]
    energetic = r0 / V_FRAME >= _SIL_MS2
    with np.errstate(divide="ignore", invalid="ignore"):
        voiced = energetic & (peak_val >= VOICED_MIN * np.maximum(r0, 1e-30))
    vi = np.flatnonzero(voiced)
    if vi.size < min_voiced or vi.size > max_voiced_frac * n_frames:
        return None, int(vi.size), 0.0
    f0_med = float(np.median(sr_hz / peak_lag[vi].astype(np.float64)))
    # per-frame spectrum at the V_FRAME-point resolution (bins
    # 0..V_FRAME/2 of the padded transform are its even bins)
    pw = power[vi][:, : V_FRAME + 1: 2] / float(V_FRAME)
    n_bins = pw.shape[1]
    env_sum = np.zeros(N_ENV, dtype=np.float64)
    for row, lag in zip(pw, peak_lag[vi]):
        # harmonic bins of THIS frame's pitch: k * V_FRAME / lag
        kmax = int(min(np.floor((ENV_F_HI / sr_hz) * lag),
                       (n_bins - 2) * lag / V_FRAME))
        if kmax < 2:
            continue
        ks = np.arange(1, kmax + 1, dtype=np.float64)
        centers = np.rint(ks * V_FRAME / lag).astype(np.int64)
        centers = np.clip(centers, 1, n_bins - 2)
        # ±1-bin peak pick tolerates rounding + pitch wobble
        peaks = np.maximum(
            row[centers - 1], np.maximum(row[centers], row[centers + 1])
        )
        logf = np.log10(ks * (sr_hz / lag))
        logp = np.log10(np.maximum(peaks, 1e-300))
        env_sum += np.interp(_ENV_LOGF, logf, logp)
    env = env_sum / float(vi.size)
    prof = env - env.mean()
    return prof.astype(np.float64), int(vi.size), f0_med


def voice_key_parts(
    prof: np.ndarray, f0_med: float
) -> tuple[int, int, int, int]:
    """(f0_cell0, f0_cell1, tilt_cell0, tilt_cell1).

    Each axis is the offset-0 / half-step double grid; a clip emits the
    four (f0 grid × tilt grid) combinations, so |Δlog2 f0| ≤ F0_STEP/2
    and |Δtilt| ≤ TILT_STEP/2 together guarantee one shared composite
    key.  The tilt dot product is a left fold, bit-identical in the
    Python twin."""
    lf = float(np.log2(f0_med))
    tilt = 0.0
    for i in range(prof.size):
        tilt = tilt + float(prof[i]) * float(TILT_W[i])
    fc0 = int(np.floor(lf / F0_STEP))
    fc1 = int(np.floor(lf / F0_STEP + 0.5))
    tc0 = int(np.floor(tilt / TILT_STEP))
    tc1 = int(np.floor(tilt / TILT_STEP + 0.5))
    return fc0, fc1, tc0, tc1


MIN_SEG_MS = 150      # runs shorter than this carry too few analysis
# frames to profile a voice
SEG_MIN_VOICED = 8    # per-segment voiced-frame minimum (~0.16 s voiced)


def segment_voices(x_i16: np.ndarray, sr_hz: int) -> dict:
    """Within-clip diarize-lite: voice profiles per VAD-carved segment,
    clustered into distinct voices.

    The speaker-change case the novelty-curve turn detector
    (``functions.turns``) is structurally blind to: a dialog whose
    speakers alternate ACROSS PAUSES never shows an envelope jump
    inside active audio (the turn scan's activity guard excludes
    silence edges by design), yet every A→pause→B boundary is a
    speaker change.  Here each active run (the shared 20 ms VAD grid,
    hangover+debounce smoothing) gets its own harmonic-envelope
    profile — stationarity guard OFF, since a carved utterance is
    legitimately voiced throughout and the guard's tone-mega-family
    hazard is a cross-clip bucketing concern — and segments link under
    the same left-fold squared-L2 ``DIST2_MAX`` law the cross-clip
    operator verifies with.  ``n_voices`` is the number of connected
    components among profiled segments.

    Returns {n_segments, n_voiced_segments, n_voices, max_link_d2,
    min_cross_d2}: the largest accepted link distance and the smallest
    rejected one (0.0 when no pair of that kind exists) — the decision
    margins as data."""
    from .vad import active_runs

    out = {"n_segments": 0, "n_voiced_segments": 0, "n_voices": 0,
           "max_link_d2": 0.0, "min_cross_d2": 0.0}
    if x_i16.size == 0 or not sr_hz or sr_hz <= 0:
        return out
    xf = x_i16.astype(np.float32) / np.float32(32767.0)
    starts, ends, _db, frame = active_runs(xf, sr_hz)
    out["n_segments"] = int(starts.size)
    profs = []
    min_len = int(MIN_SEG_MS * sr_hz / 1000)
    for s, e in zip(starts, ends):
        seg = x_i16[int(s) * frame: int(e) * frame]
        if seg.size < min_len:
            continue
        p, _nv, f0 = voice_profile(
            seg, sr_hz, min_voiced=SEG_MIN_VOICED, max_voiced_frac=1.01
        )
        if p is not None:
            profs.append(p)
    out["n_voiced_segments"] = len(profs)
    if not profs:
        return out
    # explicit pairwise linking (segments per clip are few)
    parent = list(range(len(profs)))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    max_link, min_cross = 0.0, 0.0
    for i in range(len(profs)):
        for j in range(i + 1, len(profs)):
            d2 = 0.0
            for a, b in zip(profs[i], profs[j]):
                d2 = d2 + (float(a) - float(b)) * (float(a) - float(b))
            if d2 < DIST2_MAX:
                parent[find(i)] = find(j)
                max_link = max(max_link, d2)
            else:
                min_cross = d2 if min_cross == 0.0 else min(min_cross, d2)
    out["n_voices"] = len({find(i) for i in range(len(profs))})
    out["max_link_d2"] = max_link
    out["min_cross_d2"] = min_cross
    return out
