"""From-spec image/video codecs in pure numpy — the visual analog of
``functions.audio``'s self-implemented pcm16/µ-law/WAV.

No image codec libraries exist in this sandbox, so the REAL formats are
the uncompressed ones a from-spec implementation can own end-to-end:

- **BMP** (Windows V3 ``BITMAPINFOHEADER``, 24-bit BI_RGB): 14-byte file
  header + 40-byte info header + bottom-up BGR rows padded to 4 bytes —
  the documented public layout.  Encode and decode are exact inverses.
- **RVID**, a raw-video container defined HERE (like the headerless
  pcm16 the audio path owns): magic ``RVID`` + u16 (n_frames, height,
  width) little-endian + n_frames raw RGB24 frames.  "Decoding" is a
  reshape; frame sampling is real indexing.

Compressed formats (JPEG/PNG/H.264) remain honestly stubbed in
``functions.multimodal`` — the engine contract (schema, Arrow batching,
payload-drops-at-the-boundary) is identical whichever decoder fills the
slot.

Features are exact small statistics chosen to be reproducible in a
pure-Python twin (integer sums over uint8 → exact float64 means).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "encode_bmp",
    "decode_bmp",
    "encode_rvid",
    "decode_rvid_frames",
    "image_features",
    "dhash64",
    "ahash64",
    "phash64",
    "DCT16_TABLE",
    "N_IMAGE_FEATURES",
]

N_IMAGE_FEATURES = 8

_BMP_FILE_HDR = 14
_BMP_INFO_HDR = 40


def encode_bmp(arr: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB → 24-bit BI_RGB BMP (bottom-up, 4-byte row pad)."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_bmp expects HxWx3 uint8")
    h, w, _ = arr.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    stride = row_bytes + pad
    pixel_bytes = stride * h
    off = _BMP_FILE_HDR + _BMP_INFO_HDR
    file_hdr = struct.pack("<2sIHHI", b"BM", off + pixel_bytes, 0, 0, off)
    info_hdr = struct.pack(
        "<IiiHHIIiiII", _BMP_INFO_HDR, w, h, 1, 24, 0, pixel_bytes,
        2835, 2835, 0, 0,
    )
    # bottom-up rows, BGR order, padded
    bgr = arr[::-1, :, ::-1]
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
    return file_hdr + info_hdr + rows.tobytes()


def decode_bmp(data) -> np.ndarray:
    """24-bit BI_RGB BMP → HxWx3 uint8 RGB (validates the public layout)."""
    buf = np.frombuffer(data, dtype=np.uint8)
    if buf.size < _BMP_FILE_HDR + _BMP_INFO_HDR or bytes(buf[:2]) != b"BM":
        raise ValueError("not a BMP file")
    (off,) = struct.unpack("<I", bytes(buf[10:14]))
    hdr_size, w, h, planes, bpp, comp = struct.unpack(
        "<IiiHHI", bytes(buf[14:34])
    )
    if hdr_size < _BMP_INFO_HDR or planes != 1 or bpp != 24 or comp != 0:
        raise ValueError(
            f"unsupported BMP variant hdr={hdr_size} bpp={bpp} comp={comp}"
        )
    if w <= 0 or h == 0:
        raise ValueError("degenerate BMP dimensions")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    need = off + stride * h
    if buf.size < need:
        raise ValueError("truncated BMP pixel array")
    rows = buf[off : off + stride * h].reshape(h, stride)[:, : w * 3]
    bgr = rows.reshape(h, w, 3)
    rgb = bgr[:, :, ::-1]
    if not top_down:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


_RVID_MAGIC = b"RVID"


def encode_rvid(frames: np.ndarray) -> bytes:
    """FxHxWx3 uint8 RGB → RVID container."""
    if frames.ndim != 4 or frames.shape[3] != 3 or frames.dtype != np.uint8:
        raise ValueError("encode_rvid expects FxHxWx3 uint8")
    f, h, w, _ = frames.shape
    return (
        _RVID_MAGIC
        + struct.pack("<HHH", f, h, w)
        + frames.tobytes()
    )


def decode_rvid_frames(data, sample_k: int = 3) -> np.ndarray:
    """RVID → up to ``sample_k`` evenly-spaced frames (KxHxWx3 uint8).

    Sampling indices are ``round(i·(F−1)/(k−1))`` for i in 0..k−1 (first
    and last frames always included), deduplicated in order — exact
    integer arithmetic, so the twin reproduces them trivially.
    """
    buf = np.frombuffer(data, dtype=np.uint8)
    if buf.size < 10 or bytes(buf[:4]) != _RVID_MAGIC:
        raise ValueError("not an RVID container")
    f, h, w = struct.unpack("<HHH", bytes(buf[4:10]))
    if f == 0 or h == 0 or w == 0:
        raise ValueError("degenerate RVID dimensions")
    need = 10 + f * h * w * 3
    if buf.size < need:
        raise ValueError("truncated RVID frames")
    frames = buf[10:need].reshape(f, h, w, 3)
    if f <= sample_k:
        idx = list(range(f))
    else:
        k = max(sample_k, 2)
        idx = []
        for i in range(k):
            j = (i * (f - 1) * 2 + (k - 1)) // (2 * (k - 1))  # round(i(F-1)/(k-1))
            if not idx or j != idx[-1]:
                idx.append(j)
    return np.ascontiguousarray(frames[idx])


def image_features(rgb: np.ndarray) -> np.ndarray:
    """[h, w, mean_r, mean_g, mean_b, mean_luma, min_luma, max_luma] —
    integer-exact sums over uint8 so a pure-Python twin reproduces every
    float64 bit.  Luma is the exact-integer Rec.601 numerator
    (299·R + 587·G + 114·B) / 1000."""
    h, w, _ = rgb.shape
    n = h * w
    px = rgb.reshape(n, 3).astype(np.int64)
    sums = px.sum(axis=0)
    luma1000 = px[:, 0] * 299 + px[:, 1] * 587 + px[:, 2] * 114
    return np.array(
        [
            float(h),
            float(w),
            float(sums[0]) / n,
            float(sums[1]) / n,
            float(sums[2]) / n,
            (float(luma1000.sum()) / n) / 1000.0,
            float(luma1000.min()) / 1000.0,
            float(luma1000.max()) / 1000.0,
        ],
        dtype=np.float64,
    )


def _luma_block_sums(
    rgb: np.ndarray, n_rows: int, n_cols: int
) -> tuple[np.ndarray, np.ndarray]:
    """Exact-integer Rec.601 luma-numerator block sums + counts on an
    ``n_rows × n_cols`` grid with ``(i·h)//n`` boundaries (the shared
    grid law of the whole perceptual-hash family)."""
    h, w, _ = rgb.shape
    px = rgb.astype(np.int64)
    luma = px[:, :, 0] * 299 + px[:, :, 1] * 587 + px[:, :, 2] * 114
    integ = np.zeros((h + 1, w + 1), dtype=np.int64)
    integ[1:, 1:] = luma.cumsum(axis=0).cumsum(axis=1)
    rb = [(i * h) // n_rows for i in range(n_rows + 1)]
    cb = [(j * w) // n_cols for j in range(n_cols + 1)]
    sums = np.empty((n_rows, n_cols), dtype=np.int64)
    cnts = np.empty((n_rows, n_cols), dtype=np.int64)
    for i in range(n_rows):
        for j in range(n_cols):
            r0, r1 = rb[i], rb[i + 1]
            c0, c1 = cb[j], cb[j + 1]
            sums[i, j] = (
                integ[r1, c1] - integ[r0, c1] - integ[r1, c0] + integ[r0, c0]
            )
            cnts[i, j] = (r1 - r0) * (c1 - c0)
    return sums, cnts


def _to_signed64(v: int) -> int:
    return v - (1 << 64) if v >= 1 << 63 else v


def ahash64(rgb: np.ndarray) -> int:
    """64-bit average hash (aHash, public perceptual-hash family): bit
    (i, j) of the 8×8 grid is 1 iff cell (i,j)'s mean luma exceeds the
    WHOLE image's mean luma.  Like :func:`dhash64` every comparison is
    cross-multiplied integer arithmetic (cell_sum·total_cnt >
    total_sum·cell_cnt) so no float ever decides a bit.  Requires
    h ≥ 8 and w ≥ 8.  Returned signed 64-bit (Spark LongType)."""
    h, w, _ = rgb.shape
    if h < 8 or w < 8:
        raise ValueError(f"image too small to ahash: {h}x{w}")
    sums, cnts = _luma_block_sums(rgb, 8, 8)
    total_sum = int(sums.sum())
    total_cnt = int(cnts.sum())
    v = 0
    for i in range(8):
        for j in range(8):
            if int(sums[i, j]) * total_cnt > total_sum * int(cnts[i, j]):
                v |= 1 << (i * 8 + j)
    return _to_signed64(v)


# Fixed-point DCT-II spec constants shared by the kernel and its twin
# (precedent: the loudness biquad coefficient formulas — the SPEC is
# shared, the execution is independent).  C[k][m] =
# round(cos(π·(2m+1)·k / 32) · 2^20), round-half-even.
_DCT16_SCALE = 1 << 20
_PHASH_MEAN_SCALE = 1 << 8


def _dct16_table() -> np.ndarray:
    k = np.arange(16, dtype=np.float64)[:, None]
    m = np.arange(16, dtype=np.float64)[None, :]
    return np.rint(
        np.cos(np.pi * (2.0 * m + 1.0) * k / 32.0) * _DCT16_SCALE
    ).astype(np.int64)


DCT16_TABLE = _dct16_table()


def phash64(rgb: np.ndarray) -> int:
    """64-bit DCT perceptual hash (pHash family), fixed-point so the
    pure-Python twin reproduces it bit-for-bit:

    1. block-mean luma to a 16×16 grid (``(i·h)//16`` boundaries),
       each mean as the FLOOR fixed-point ``(block_sum·2^8)//block_cnt``;
    2. 2-D DCT-II via the shared integer table ``DCT16_TABLE``
       (cos·2^20 rounded half-even): ``t1 = floor((C·grid)/2^20)``,
       ``coef = t1·Cᵀ`` — all int64, overflow-safe by construction
       (|grid| ≤ 255000·2^8, |C| ≤ 2^20 ⇒ |coef| < 2^55);
    3. keep the low-frequency 8×8 block, EXCLUDE the DC term (so
       uniform brightness shifts don't flip bits), threshold the 63
       remaining coefficients at their median (the 32nd smallest — an
       order statistic, exact on integers): bit ``u·8+v`` = 1 iff
       ``coef[u][v] > median``; bit 0 is always 0.

    Requires h ≥ 16 and w ≥ 16.  Returned signed 64-bit (LongType).
    """
    h, w, _ = rgb.shape
    if h < 16 or w < 16:
        raise ValueError(f"image too small to phash: {h}x{w}")
    sums, cnts = _luma_block_sums(rgb, 16, 16)
    grid = (sums * _PHASH_MEAN_SCALE) // cnts
    t1 = np.floor_divide(DCT16_TABLE @ grid, _DCT16_SCALE)
    coef = t1 @ DCT16_TABLE.T
    low = coef[:8, :8]
    vals = sorted(
        int(low[u, v]) for u in range(8) for v in range(8)
        if (u, v) != (0, 0)
    )
    med = vals[31]
    v = 0
    for u in range(8):
        for j in range(8):
            if (u, j) != (0, 0) and int(low[u, j]) > med:
                v |= 1 << (u * 8 + j)
    return _to_signed64(v)


def dhash64(rgb: np.ndarray) -> int:
    """64-bit difference hash (dHash, public perceptual-hash family):
    exact-integer luma block means on an 8-row × 9-column grid, bit
    (i, j) = 1 iff cell (i,j) is brighter than cell (i,j+1).

    Everything is integer-exact: luma is the Rec.601 numerator
    (299·R+587·G+114·B), block boundaries are ``(i·h)//8`` /
    ``(j·w)//9``, and the mean comparison is cross-multiplied
    (sum_a·cnt_b > sum_b·cnt_a) so no float ever decides a bit — the
    pure-Python twin reproduces the hash bit-for-bit.  Requires
    h ≥ 8 and w ≥ 9 (smaller images raise: a thumbnail that small has
    no stable perceptual content to hash).

    Returned as a SIGNED 64-bit value (two's complement) so it maps
    directly onto Spark LongType.
    """
    h, w, _ = rgb.shape
    if h < 8 or w < 9:
        raise ValueError(f"image too small to dhash: {h}x{w}")
    px = rgb.astype(np.int64)
    luma = px[:, :, 0] * 299 + px[:, :, 1] * 587 + px[:, :, 2] * 114
    # exact 2-D prefix sums → O(1) block sums
    integ = np.zeros((h + 1, w + 1), dtype=np.int64)
    integ[1:, 1:] = luma.cumsum(axis=0).cumsum(axis=1)
    rb = [(i * h) // 8 for i in range(9)]
    cb = [(j * w) // 9 for j in range(10)]
    sums = np.empty((8, 9), dtype=np.int64)
    cnts = np.empty((8, 9), dtype=np.int64)
    for i in range(8):
        for j in range(9):
            r0, r1 = rb[i], rb[i + 1]
            c0, c1 = cb[j], cb[j + 1]
            sums[i, j] = (
                integ[r1, c1] - integ[r0, c1] - integ[r1, c0] + integ[r0, c0]
            )
            cnts[i, j] = (r1 - r0) * (c1 - c0)
    v = 0
    for i in range(8):
        for j in range(8):
            if int(sums[i, j]) * int(cnts[i, j + 1]) > int(
                sums[i, j + 1]
            ) * int(cnts[i, j]):
                v |= 1 << (i * 8 + j)
    if v >= 1 << 63:
        v -= 1 << 64
    return v
