"""Stereo / channel-layout kernels.

Web-scraped audio is full of channel-layout defects that a mono-only
pipeline silently mangles: *dual mono* (two identical channels — the
bytes cost of stereo with none of the information), a *dead channel*
(one side of an unbalanced cable or a broken capture device — digital
silence on exactly one channel), *phase inversion* (R = -L from a
miswired connector; the clip cancels to silence under the standard
(L+R)/2 mono downmix every ASR front-end applies), and gross *channel
imbalance* (a panned or half-broken gain stage).  These are decided
here from EXACT integer sample statistics so the flags are
deterministic across engines and batch layouts — no float ever decides
the dual-mono / inversion / dead-channel laws.

The container parser accepts 1- or 2-channel 16-bit PCM RIFF/WAVE.  It
is deliberately separate from ``functions.audio.decode_wav`` (the mono
gate path, whose strictness — channels must be 1 — is itself a tested
contract); a 2-channel file reaching the mono gate stays a decode
defect there, while this module is the operator that understands it.

Reference analog: none (audio is beyond the reference); the shape is
the per-row rule scan (checks.py) applied to kernel-computed metrics.
"""

from __future__ import annotations

import math
import struct

import numpy as np

__all__ = [
    "decode_wav_frames",
    "stereo_sums",
    "derive_stereo",
    "IMBALANCE_DB",
    "SUM_FIELDS",
    "DERIVED_FIELDS",
]

# |10*log10(ss_l/ss_r)| at or above this is a gross left/right power
# imbalance (6 dB = one channel carrying 4x the power of the other).
IMBALANCE_DB = 6.0

# full-scale reference power for int16 rms (32767^2), as an exact int
_FS2 = 32767 * 32767

SUM_FIELDS = [
    "n_samples", "sum_l", "sum_r", "ss_l", "ss_r", "s_lr",
    "nz_l", "nz_r", "n_diff", "n_anti",
]
DERIVED_FIELDS = ["rms_db_l", "rms_db_r", "balance_db", "corr"]


def decode_wav_frames(data) -> tuple[np.ndarray, int, int]:
    """Minimal RIFF parser for 1- or 2-channel 16-bit PCM.

    Returns ``(frames, channels, sr)`` where ``frames`` is an
    ``int16[n, channels]`` array.  Raises ValueError on malformed
    containers or unsupported formats (drives n_ch = 0 upstream).
    """
    if data is None:
        raise ValueError("missing bytes")
    if not isinstance(data, (bytes, bytearray)):
        data = bytes(data)
    if len(data) < 44 or data[0:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    sr = None
    channels = None
    raw: bytes | None = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + size]
        if cid == b"fmt " and size >= 16:
            fmt_code, channels, sr = struct.unpack("<HHI", body[0:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt_code != 1 or channels not in (1, 2) or bits != 16:
                raise ValueError(
                    f"unsupported wav format fmt={fmt_code} "
                    f"ch={channels} bits={bits}"
                )
        elif cid == b"data":
            raw = bytes(body)
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sr is None or channels is None or raw is None:
        raise ValueError("missing fmt/data chunk")
    width = 2 * channels
    if len(raw) % width:
        raw = raw[: len(raw) - (len(raw) % width)]
    frames = np.frombuffer(raw, dtype="<i2").reshape(-1, channels)
    return frames, int(channels), int(sr)


def encode_wav_stereo(left: np.ndarray, right: np.ndarray,
                      sr_hz: int) -> bytes:
    """int16 L/R sample arrays → interleaved 2-channel 16-bit PCM
    RIFF/WAVE bytes (the synth-corpus writer)."""
    n = len(left)
    inter = np.empty(2 * n, dtype="<i2")
    inter[0::2] = left
    inter[1::2] = right
    payload = inter.tobytes()
    byte_rate = sr_hz * 4
    hdr = b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, sr_hz, byte_rate,
                                4, 16)
    data = b"data" + struct.pack("<I", len(payload))
    return hdr + fmt + data + payload


def stereo_sums(frames: np.ndarray) -> dict:
    """EXACT integer channel statistics over ``int16[n, 2]`` frames.

    Every value is a Python int: sums/dots accumulate in int64 (the
    largest possible dot, 10 s @ 48 kHz of full-scale, is ~5e14 —
    comfortably inside int64), cross-engine equality is therefore
    guaranteed rather than approximate.  ``n_anti`` counts samples
    where R != -L in int64 (so a -32768 sample can never falsely
    "match" its own negation).
    """
    a = frames[:, 0].astype(np.int64)
    b = frames[:, 1].astype(np.int64)
    return {
        "n_samples": int(frames.shape[0]),
        "sum_l": int(a.sum()),
        "sum_r": int(b.sum()),
        "ss_l": int(a @ a),
        "ss_r": int(b @ b),
        "s_lr": int(a @ b),
        "nz_l": int(np.count_nonzero(a)),
        "nz_r": int(np.count_nonzero(b)),
        "n_diff": int(np.count_nonzero(a != b)),
        "n_anti": int(np.count_nonzero(a != -b)),
    }


def derive_stereo(n: int, sum_l: int, sum_r: int, ss_l: int, ss_r: int,
                  s_lr: int) -> dict:
    """Derived channel metrics from the exact integer sums.

    SHARED by the operator and the differential oracle on purpose: the
    inputs are exact integers, so running this one formula on both
    sides makes the doubles bit-identical — the differential surface is
    everything that produces the sums, not IEEE association order.

    - ``rms_db_*``: per-channel power vs int16 full scale, dBFS.
    - ``balance_db``: L-vs-R power ratio in dB (positive = left hot).
    - ``corr``: Pearson correlation of the two channels (the
      dual-mono / inversion *metric*; the flags themselves use the
      exact counting laws, not this float).
    """
    if n <= 0:
        return {k: None for k in DERIVED_FIELDS}
    out: dict = {}
    fs = n * _FS2
    out["rms_db_l"] = 10.0 * math.log10(ss_l / fs) if ss_l > 0 else None
    out["rms_db_r"] = 10.0 * math.log10(ss_r / fs) if ss_r > 0 else None
    out["balance_db"] = (
        10.0 * math.log10(ss_l / ss_r) if ss_l > 0 and ss_r > 0 else None
    )
    num = n * s_lr - sum_l * sum_r
    d1 = n * ss_l - sum_l * sum_l
    d2 = n * ss_r - sum_r * sum_r
    out["corr"] = (
        num / math.sqrt(d1 * d2) if d1 > 0 and d2 > 0 else None
    )
    return out
