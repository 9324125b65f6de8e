"""Spread-spectrum provenance-watermark detection kernels.

Synthetic-audio generators increasingly embed an imperceptible
pseudo-random carrier into their output so downstream pipelines can
recognise machine-generated clips (AudioSeal-style provenance marking,
public spec: additive PN watermarking from the classic spread-spectrum
literature — Cox et al., "Secure Spread Spectrum Watermarking for
Multimedia", IEEE Trans. Image Proc. 1997).  A training-data pipeline
wants exactly that detector: clips that carry a known provenance key
are model output, not human speech, and feeding them back in causes
self-training collapse.  None of the other audio audits can see the
mark — it is ~22 dB below the signal and spectrally white.

Detection law — exact integers only, no float ever decides a flag:

1. The carrier is a ±1 chip sequence ``p`` derived from a 64-bit key by
   the splitmix64 mix (Steele/Lea/Flood, public domain; 64 chips per
   state word, MSB-first), aligned to sample 0 — the convention a
   generator that marks its own output naturally satisfies.  (A
   stripped-prefix clip would need an offset search, the same
   extension the excerpt matcher already demonstrates; out of scope
   here and documented as such.)
2. ``C = sum(q[i] * p[i])``  (int64-exact: |C| <= 32768 * n) and
   ``E = sum(q[i]^2)`` (int64-exact: <= 2^30 * n).
3. Decision (Python-int cross-multiplication, no overflow anywhere)::

       is_watermarked :=  n >= WM_MIN_SAMPLES
                      and E > 0
                      and C > 0
                      and C*C >= WM_TAU^2 * E

   Under the null (no mark), C/sqrt(E) is asymptotically N(0,1), so
   ``WM_TAU = 6`` bounds the false-positive rate at ~1e-9 per clip —
   zero expected false flags even at the 1M-clip smoke scale.  An
   embedded mark of amplitude ``a = rms/WM_EMBED_DIV`` sits at
   ``sqrt(n)/WM_EMBED_DIV`` sigma: 10.5 sigma at the 16 000-sample
   eligibility floor, rising with length — comfortably above WM_TAU
   with margin for codec-transcoding quantization noise.
4. Reported effect size ``sigma_q2 = (C*C << 20) // E`` — the squared
   detection sigma in 2^-20 units, an exact integer (NULL when E = 0).

Embedding (synth side, for the seeded corpus): ``q + a*p`` clipped to
the int16 rails with ``a = max(8, isqrt(E//n) // WM_EMBED_DIV)`` — at
WM_EMBED_DIV = 12 the mark sits ~21.6 dB below the signal.  Real
systems shape the carrier under a psychoacoustic mask to hide more
energy; the flat-amplitude embed keeps the corpus law replayable in
exact integers.

Every quantity is integer arithmetic on int16 samples, so the Spark
kernel and the pure-Python differential oracle are bit-identical by
construction.

Reference analog: none (audio is beyond the reference); the shape is
the per-row rule scan (checks.py) applied to kernel-computed metrics.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = [
    "pn_chips",
    "embed_watermark",
    "watermark_stats",
    "is_watermarked_from",
    "WM_FIELDS",
    "WM_TAU",
    "WM_MIN_SAMPLES",
    "WM_EMBED_DIV",
    "WM_KEY_DEFAULT",
]

_MASK64 = (1 << 64) - 1
# decision threshold in null-hypothesis sigmas (see module docstring)
WM_TAU = 6
# clips shorter than this carry too little integration gain to separate
# a rms/12 mark from WM_TAU sigma with margin; they report, never flag
WM_MIN_SAMPLES = 16_000
# embed amplitude divisor: a = rms // WM_EMBED_DIV  (~21.6 dB down)
WM_EMBED_DIV = 12
# the pipeline's provenance key (any 64-bit value; detection is
# key-specific — a clip marked under a different key reads as null)
WM_KEY_DEFAULT = 0xD0C5_EED5_0F5A_11D5

WM_FIELDS = ["n_samples", "wm_corr", "energy", "sigma_q2"]


def _splitmix64_words(key: int, n_words: int) -> list[int]:
    """The splitmix64 output stream seeded at ``key`` (pure Python ints —
    the same loop the differential oracle replays)."""
    x = key & _MASK64
    out = []
    for _ in range(n_words):
        x = (x + 0x9E3779B97F4A7C15) & _MASK64
        z = x
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _MASK64
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _MASK64
        z ^= z >> 31
        out.append(z)
    return out


_PN_CACHE: dict[int, np.ndarray] = {}


def pn_chips(key: int, n: int) -> np.ndarray:
    """First ``n`` carrier chips for ``key`` as int8 in {-1, +1}.

    Chips unpack MSB-first from successive splitmix64 words, so any
    prefix is stable under extension; a per-key cache grows to the
    longest clip seen (executor lifetime, <= 2 bytes/sample)."""
    cached = _PN_CACHE.get(key)
    if cached is None or cached.size < n:
        n_words = max((n + 63) // 64, 64)
        raw = b"".join(w.to_bytes(8, "big") for w in _splitmix64_words(key, n_words))
        bits = np.unpackbits(np.frombuffer(raw, dtype=np.uint8))
        cached = (bits.astype(np.int8) << 1) - 1
        _PN_CACHE[key] = cached
    return cached[:n]


def embed_watermark(
    q: np.ndarray, key: int = WM_KEY_DEFAULT, embed_div: int = WM_EMBED_DIV
) -> np.ndarray:
    """Additively embed the key's carrier into int16 PCM (synth side).

    Amplitude is ``max(8, isqrt(E//n) // embed_div)`` — tied to the
    clip's own rms so the mark stays a fixed ~21.6 dB below signal."""
    q64 = q.astype(np.int64)
    n = q64.size
    if n == 0:
        return q.astype(np.int16)
    energy = int(np.dot(q64, q64))
    amp = max(8, math.isqrt(energy // n) // embed_div)
    marked = q64 + amp * pn_chips(key, n).astype(np.int64)
    return np.clip(marked, -32768, 32767).astype(np.int16)


def watermark_stats(q: np.ndarray, key: int = WM_KEY_DEFAULT) -> dict:
    """Exact-integer detection statistics for one decoded clip.

    Returns n_samples, wm_corr (C), energy (E), sigma_q2 (see module
    docstring); the flag itself is derived by the operator so the
    decision law lives in one place (``is_watermarked_from``)."""
    q64 = q.astype(np.int64)
    n = int(q64.size)
    if n == 0:
        return {"n_samples": 0, "wm_corr": 0, "energy": 0, "sigma_q2": None}
    p = pn_chips(key, n).astype(np.int64)
    corr = int(np.dot(q64, p))
    energy = int(np.dot(q64, q64))
    sigma_q2 = ((corr * corr) << 20) // energy if energy > 0 else None
    return {
        "n_samples": n,
        "wm_corr": corr,
        "energy": energy,
        "sigma_q2": sigma_q2,
    }


def is_watermarked_from(n: int, corr: int, energy: int) -> bool:
    """The decision law on the exact-integer statistics (Python ints —
    ``corr*corr`` exceeds int64 only here, where it cannot overflow)."""
    return (
        n >= WM_MIN_SAMPLES
        and energy > 0
        and corr > 0
        and corr * corr >= WM_TAU * WM_TAU * energy
    )
