"""Pure-Python XXH64 matching Spark's ``xxhash64`` expression bit-for-bit.

Spark's ``XxHash64`` expression (sql/catalyst XXH64.java) is the public
XXH64 algorithm (Yann Collet, xxhash.c — public domain spec) applied per
input column with the running result as the seed for the next column:

    result = seed (42 by default)
    for col in cols: result = hash(value_of(col), result)

- long values hash as their 8-byte little-endian representation,
- int values as 4-byte little-endian,
- strings as their UTF-8 bytes,
- arrays fold element-wise (element hash feeds the next element's seed).

This module exists so the *driver-side differential oracles* for the
MinHash-LSH / SimHash operators (``oracles.py``) can reproduce the exact
bucket assignments the Spark expressions produce — turning those queries
from rows-only checks into hash-verified ones.  It is pure stdlib, used
only on small oracle inputs (hundreds of documents), never in the Spark
hot path.
"""

from __future__ import annotations

import struct

__all__ = ["xxh64_bytes", "xxh64_long", "xxh64_int", "xxh64_string", "xxh64_fold"]

_M = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * P2) & _M
    return (_rotl(acc, 31) * P1) & _M


def _merge(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * P1 + P4) & _M


def xxh64_bytes(data: bytes, seed: int) -> int:
    """Standard XXH64 of a byte string (unsigned 64-bit result)."""
    seed &= _M
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & _M
        v2 = (seed + P2) & _M
        v3 = seed
        v4 = (seed - P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, struct.unpack_from("<Q", data, i)[0])
            v2 = _round(v2, struct.unpack_from("<Q", data, i + 8)[0])
            v3 = _round(v3, struct.unpack_from("<Q", data, i + 16)[0])
            v4 = _round(v4, struct.unpack_from("<Q", data, i + 24)[0])
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge(h, v1)
        h = _merge(h, v2)
        h = _merge(h, v3)
        h = _merge(h, v4)
    else:
        h = (seed + P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h ^= _round(0, struct.unpack_from("<Q", data, i)[0])
        h = (_rotl(h, 27) * P1 + P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (struct.unpack_from("<I", data, i)[0] * P1) & _M
        h = (_rotl(h, 23) * P2 + P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * P5) & _M
        h = (_rotl(h, 11) * P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * P2) & _M
    h ^= h >> 29
    h = (h * P3) & _M
    h ^= h >> 32
    return h


def _signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def xxh64_long(value: int, seed: int) -> int:
    """Spark's hash of a LongType value (signed 64-bit result)."""
    return _signed(xxh64_bytes(struct.pack("<q", value), seed))


def xxh64_int(value: int, seed: int) -> int:
    """Spark's hash of an IntegerType value (signed 64-bit result)."""
    return _signed(xxh64_bytes(struct.pack("<i", value), seed))


def xxh64_string(value: str, seed: int) -> int:
    """Spark's hash of a StringType value (signed 64-bit result)."""
    return _signed(xxh64_bytes(value.encode("utf-8"), seed))


def xxh64_fold(values, seed: int = 42) -> int:
    """Spark's multi-column / array fold: each value's hash seeds the next.

    ``values`` items: str | ("int", i) | int (treated as long).  NULLs (None)
    are skipped, matching the expression's null handling.
    """
    h = seed
    for v in values:
        if v is None:
            continue
        if isinstance(v, str):
            h = xxh64_string(v, h)
        elif isinstance(v, tuple) and v[0] == "int":
            h = xxh64_int(v[1], h)
        else:
            h = xxh64_long(v, h)
    return h
