"""Wow / flutter (periodic pitch-modulation) kernels.

Tape digitizations, worn cassette transports, and drifting sample
clocks impose a *periodic* speed modulation on playback: the whole
spectrum wobbles together at the transport's rotation rate — "wow"
below ~6 Hz, "flutter" above.  The content is otherwise intact, so
amplitude-domain audits (SNR, dropout, clipping) see nothing; the
defect lives entirely in the instantaneous-frequency trajectory.

Detection: track the dominant spectral peak per short Hann frame with
parabolic (log-magnitude) interpolation, keep the longest contiguous
stretch where a tonal carrier is present and stable to ±4%, and
measure the relative frequency deviation series over that stretch.
A clip is flagged when the deviation is BOTH large enough
(rms ≥ 0.35% — wow/flutter audible thresholds sit near 0.1-0.3%) and
periodic (≥ 25% of the deviation power concentrated at one modulation
frequency in the 0.5-30 Hz band) — broadband deviation is tracker
noise or genuinely varying content, not a transport.

Documented limits: content without a sustained tonal carrier
(unpitched noise, very short clips) is not evaluable (n_track = 0 —
absence of evidence); deliberate musical vibrato at a stable rate is
indistinguishable from flutter by trajectory alone (flagging it is the
intended semantics for a *speech* corpus); frame averaging attenuates
modulation above ~30 Hz (sinc(pi*fm*T_frame)), so very fast scrape
flutter needs a shorter frame than the 64 ms used here.
"""

from __future__ import annotations

import numpy as np

__all__ = ["flutter_stats", "FLUT_FIELDS", "DEV_FLAG_PCT",
           "MOD_MIN_FRAC", "MIN_TRACK_S"]

MIN_CARRIER_HZ = 150.0   # dodge mains hum / rumble when picking the carrier
TRACK_TOL = 0.04         # frames within ±4% of the track median stay on it
MIN_TRACK_S = 1.0        # need ≥ 1 s of continuous carrier to measure
TONALITY_MIN = 0.10      # ±1-bin dominant power / total non-DC frame power
DEV_FLAG_PCT = 0.35      # rms relative deviation (%) decision threshold
MOD_MIN_FRAC = 0.25      # periodicity: peak mod bin (±1) / total dev power
MOD_MIN_HZ = 0.5
MOD_MAX_HZ = 30.0

FLUT_FIELDS = ["n_frames", "n_track", "carrier_hz", "dev_pct",
               "mod_hz", "mod_frac"]

_EMPTY = {"n_frames": 0, "n_track": 0, "carrier_hz": None,
          "dev_pct": None, "mod_hz": None, "mod_frac": None}

_HANN_CACHE: dict[int, np.ndarray] = {}


def _hann(n: int) -> np.ndarray:
    return 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n)


def _frame_len(sr_hz: int) -> int:
    """~64 ms rounded to a power of two (512 @ 8 kHz … 2048 @ 44.1 kHz):
    short enough that 8 Hz flutter survives the frame average, long
    enough for ±1 Hz parabolic peak resolution on a tonal carrier."""
    return int(2 ** round(np.log2(0.064 * sr_hz)))


def flutter_stats(x: np.ndarray, sr_hz: int) -> dict:
    """Dominant-peak trajectory statistics over hop = frame/4.

    Returns n_frames (analysis frames), n_track (longest stable-carrier
    run used), carrier_hz (track median), dev_pct (rms relative
    deviation * 100 over the track), mod_hz (strongest modulation
    frequency of the deviation series), mod_frac (its ±1-bin share of
    total deviation power).  Metrics are None when no ≥ MIN_TRACK_S
    stable carrier exists.
    """
    if sr_hz is None or sr_hz <= 0 or len(x) == 0:
        return dict(_EMPTY)
    frame = _frame_len(int(sr_hz))
    hop = frame // 4
    if len(x) < frame:
        return dict(_EMPTY)
    n_frames = 1 + (len(x) - frame) // hop
    win = _HANN_CACHE.get(frame)
    if win is None:
        win = _hann(frame)
        _HANN_CACHE[frame] = win
    sw = np.lib.stride_tricks.sliding_window_view(
        np.asarray(x, dtype=np.float64), frame
    )[::hop]
    spec = np.fft.rfft(sw * win, axis=1)
    p = spec.real * spec.real + spec.imag * spec.imag
    p[:, 0] = 0.0
    k_min = int(np.ceil(MIN_CARRIER_HZ * frame / sr_hz))
    k_min = max(k_min, 1)
    body = p[:, k_min:-1] if p.shape[1] - 1 > k_min else p[:, k_min:]
    if body.shape[1] == 0:
        return {**_EMPTY, "n_frames": int(n_frames)}
    k = body.argmax(axis=1) + k_min
    rows = np.arange(p.shape[0])
    # parabolic interpolation on log power (guard zero bins)
    lp = np.log(np.maximum(p, 1e-300))
    a = lp[rows, k - 1]
    b = lp[rows, k]
    c = lp[rows, np.minimum(k + 1, p.shape[1] - 1)]
    denom = a - 2 * b + c
    delta = np.where(np.abs(denom) > 1e-12, 0.5 * (a - c) / denom, 0.0)
    delta = np.clip(delta, -0.5, 0.5)
    f = (k + delta) * (sr_hz / frame)
    total = p.sum(axis=1)
    peak3 = (p[rows, k - 1] + p[rows, k]
             + p[rows, np.minimum(k + 1, p.shape[1] - 1)])
    tonal = np.where(total > 0, peak3 / np.maximum(total, 1e-300), 0.0)
    valid = (tonal >= TONALITY_MIN) & (f >= MIN_CARRIER_HZ)
    if not np.any(valid):
        return {**_EMPTY, "n_frames": int(n_frames)}
    f_med = float(np.median(f[valid]))
    on = valid & (np.abs(f / f_med - 1.0) <= TRACK_TOL)
    # longest contiguous True run
    best_s = best_e = cur_s = -1
    best_len = cur_len = 0
    for i, v in enumerate(on):
        if v:
            if cur_len == 0:
                cur_s = i
            cur_len += 1
            if cur_len > best_len:
                best_len, best_s, best_e = cur_len, cur_s, i
        else:
            cur_len = 0
    frame_rate = sr_hz / hop
    min_track = int(np.ceil(MIN_TRACK_S * frame_rate))
    if best_len < max(min_track, 8):
        return {**_EMPTY, "n_frames": int(n_frames)}
    track = f[best_s:best_e + 1]
    med = float(np.median(track))
    d = track / med - 1.0
    dev_pct = float(np.sqrt(np.mean(d * d)) * 100.0)
    e = d - d.mean()
    mw = _HANN_CACHE.get(-len(e))
    if mw is None or len(mw) != len(e):
        mw = _hann(len(e))
        _HANN_CACHE[-len(e)] = mw
    ds = np.fft.rfft(e * mw)
    dp = ds.real * ds.real + ds.imag * ds.imag
    dp[0] = 0.0
    freqs = np.arange(len(dp)) * frame_rate / len(e)
    # periodicity demands >= 3 full modulation cycles inside the track:
    # a monotonic drift (clock skew, not transport flutter) leaks all
    # its power into mod bins 1-2 and must not read as "periodic"
    band = (np.arange(len(dp)) >= 3) & (freqs >= MOD_MIN_HZ) \
        & (freqs <= min(MOD_MAX_HZ, frame_rate / 2.0))
    if not np.any(band) or dp.sum() <= 0:
        mod_hz, mod_frac = None, None
    else:
        bi = np.flatnonzero(band)
        kb = bi[dp[bi].argmax()]
        lo, hi = max(kb - 1, 0), min(kb + 1, len(dp) - 1)
        mod_frac = float(dp[lo:hi + 1].sum() / dp.sum())
        mod_hz = float(freqs[kb])
    return {
        "n_frames": int(n_frames),
        "n_track": int(best_len),
        "carrier_hz": med,
        "dev_pct": dev_pct,
        "mod_hz": mod_hz,
        "mod_frac": mod_frac,
    }
