"""Pure-Python XXH64 matching Spark's ``F.xxhash64`` on string columns.

Spark's xxhash64 expression hashes a string column as XXH64 over its UTF-8
bytes with seed 42 (the expression's default seed). The sequential parity
oracle (tests/reference_oracle.py) uses this implementation so that
url_hash values — and therefore crawl ordering tie-breaks and seen-set
contents — are bit-identical between the Spark engine and the oracle.

XXH64 is a public, specified algorithm (xxHash by Yann Collet, BSD);
implemented here from the specification.
"""

from __future__ import annotations

M = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5

SPARK_DEFAULT_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * P2) & M
    acc = _rotl(acc, 31)
    return (acc * P1) & M


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * P1 + P4) & M


def xxh64(data: bytes, seed: int = SPARK_DEFAULT_SEED) -> int:
    """XXH64 of ``data``; returns SIGNED int64 (Spark LongType semantics)."""
    n = len(data)
    pos = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & M
        v2 = (seed + P2) & M
        v3 = seed & M
        v4 = (seed - P1) & M
        while pos <= n - 32:
            v1 = _round(v1, int.from_bytes(data[pos : pos + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[pos + 8 : pos + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[pos + 16 : pos + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[pos + 24 : pos + 32], "little"))
            pos += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while pos <= n - 8:
        h ^= _round(0, int.from_bytes(data[pos : pos + 8], "little"))
        h = (_rotl(h, 27) * P1 + P4) & M
        pos += 8
    if pos <= n - 4:
        h ^= (int.from_bytes(data[pos : pos + 4], "little") * P1) & M
        h = (_rotl(h, 23) * P2 + P3) & M
        pos += 4
    while pos < n:
        h ^= (data[pos] * P5) & M
        h = (_rotl(h, 11) * P1) & M
        pos += 1
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def xxh64_str(s: str, seed: int = SPARK_DEFAULT_SEED) -> int:
    """Oracle-side twin of ``F.xxhash64(string_col)``."""
    return xxh64(s.encode("utf-8"), seed)
