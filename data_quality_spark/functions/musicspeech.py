"""Music / speech content discrimination kernels.

Web-scraped "speech" corpora are full of music: jingles, background
beds, full songs mislabeled as talk.  For ASR / TTS training that is
label noise at the CLIP level — and none of the existing audits see it
(music passes VAD, SNR, loudness, bandwidth and every defect rule; it
is simply the wrong *kind* of signal).  The classic two-feature
separation (Scheirer & Slaney ICASSP'97; the public MARSYAS feature
family) distinguishes them physically:

- **Syllabic envelope modulation** (``syl_frac``): speech energy is
  gated by the articulators at the 2–8 Hz syllable rate, so the 20 ms
  RMS-envelope spectrum concentrates there; sustained music does not.
  The 2–8 Hz band edges are INTEGER bin laws (``k·sr`` vs
  ``hz·n_env·frame``, cross-multiplied) — no float frequency compare.
- **Tonal stability** (``stable_frac``): music holds pitched partials
  for hundreds of milliseconds — the dominant spectral bin of 64 ms
  Hann frames persists (±1 bin) across long runs; speech phonemes churn
  it every few frames.  Counted over energetic frames only.

On the seeded corpus the classes separate by >3× on BOTH features
(music: syl ≤ 0.13 / stable ≥ 0.90; speech bursts: syl ≥ 0.85 /
stable = 0.0), so the decision thresholds sit far from either
population.  Per-clip, pure numpy float64, batch-layout independent —
the kernel is shared with the differential twin (flutter/hum
precedent) and the label LAW is replayed independently.

Decision law (operator side):

- ``music``  ⇔ stable_frac ≥ 1/2  AND  syl_frac ≤ 3/10
- ``speech`` ⇔ syl_frac   ≥ 1/2  AND  stable_frac ≤ 1/4
- ``other`` otherwise; ``und`` when not evaluable (< ~1 s decodable or
  digital silence).

Reference analog: none (audio is beyond the reference); the shape is
an enum rule (checkpoints.py:216-252) over kernel-computed metrics.
"""

from __future__ import annotations

import numpy as np

from .audio import FRAME_MS

__all__ = [
    "music_speech_stats",
    "MS_FIELDS",
    "MS_MIN_ENV_FRAMES",
    "MS_TONE_FRAME_MS",
    "MS_RUN_MIN",
    "MS_SYL_LO_HZ",
    "MS_SYL_HI_HZ",
    "MUSIC_STABLE_MIN",
    "MUSIC_SYL_MAX",
    "SPEECH_SYL_MIN",
    "SPEECH_STABLE_MAX",
]

# evaluability: ≥ 50 envelope frames (1 s at the 20 ms grid)
MS_MIN_ENV_FRAMES = 50
# long-frame grid for carrier tracking (matches the flutter tracker's
# 64 ms scale: ~15 Hz bin spacing at 16 kHz — partials a semitone apart
# resolve, vibrato stays inside ±1 bin)
MS_TONE_FRAME_MS = 64
# a stable-carrier run must span ≥ 8 long frames (≈ 0.5 s) to count
MS_RUN_MIN = 8
# syllabic band (Hz) — integer band-edge law in the kernel
MS_SYL_LO_HZ = 2
MS_SYL_HI_HZ = 8
# active-frame gate: energy > max/100 (40 dB below the loudest frame)
_ACT_DIV = 100

# decision constants (rationals; see module docstring for margins)
MUSIC_STABLE_MIN = 0.5
MUSIC_SYL_MAX = 0.3
SPEECH_SYL_MIN = 0.5
SPEECH_STABLE_MAX = 0.25

MS_FIELDS = ["n_samples", "n_env", "n_tone", "n_active",
             "syl_frac", "stable_frac"]


def _empty(n: int = 0) -> dict:
    return {"n_samples": int(n), "n_env": 0, "n_tone": 0, "n_active": 0,
            "syl_frac": None, "stable_frac": None}


def music_speech_stats(q: np.ndarray, sr_hz) -> dict:
    """Content-class metrics for one int16 clip.  Not-evaluable clips
    (undecodable, < 1 s, or all-zero) return NULL fractions — the
    operator labels them ``und``, never a content class."""
    n = int(q.size)
    if n == 0 or sr_hz is None or sr_hz <= 0:
        return _empty(n)
    sr = int(sr_hz)
    frame = max(int(sr * FRAME_MS / 1000), 1)
    nf = n // frame
    lf = max(int(sr * MS_TONE_FRAME_MS / 1000), 1)
    nlf = n // lf
    if nf < MS_MIN_ENV_FRAMES or nlf < MS_RUN_MIN:
        return _empty(n)
    x = q.astype(np.float64) / 32768.0

    # --- syllabic envelope modulation -------------------------------
    fr = x[: nf * frame].reshape(nf, frame)
    env = np.sqrt((fr * fr).mean(axis=1))
    e = env - env.mean()
    E = np.abs(np.fft.rfft(e)) ** 2
    # bin k is f = k·sr/(nf·frame) Hz; band edges as integer laws
    k_lo = max(-((-MS_SYL_LO_HZ * nf * frame) // sr), 1)  # ceil, skip DC
    k_hi = (MS_SYL_HI_HZ * nf * frame) // sr  # floor
    tot = float(E[1:].sum())
    if tot > 0.0 and k_hi >= k_lo:
        syl = float(E[k_lo: k_hi + 1].sum()) / tot
    else:
        syl = 0.0

    # --- tonal stability --------------------------------------------
    L = x[: nlf * lf].reshape(nlf, lf) * np.hanning(lf)
    mags = np.abs(np.fft.rfft(L, axis=1))
    energy = (mags * mags).sum(axis=1)
    emax = float(energy.max())
    if emax <= 0.0:
        return _empty(n)  # digital silence: no content class
    act = energy > emax / _ACT_DIV
    dom = mags.argmax(axis=1).astype(np.int64)
    n_active = int(act.sum())
    # run lengths of consecutive (active, active, |Δdom| ≤ 1) frames
    long_mass = 0
    run = 1
    for i in range(1, nlf):
        if act[i] and act[i - 1] and abs(int(dom[i]) - int(dom[i - 1])) <= 1:
            run += 1
        else:
            if run >= MS_RUN_MIN:
                long_mass += run
            run = 1
    if run >= MS_RUN_MIN:
        long_mass += run
    stable = float(long_mass) / n_active if n_active > 0 else 0.0

    return {"n_samples": n, "n_env": int(nf), "n_tone": int(nlf),
            "n_active": n_active, "syl_frac": syl, "stable_frac": stable}
