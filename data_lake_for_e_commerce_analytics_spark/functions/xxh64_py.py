"""Pure-Python Spark XXH64 — for folding hashes of COMPILE-TIME
constants into generated oracle SQL (e.g. the LSH hyperplane grid
``xxhash64(p, d)`` over plane/dimension literals), so the emitted SQL
carries plain numeric literals instead of hash arithmetic.

Bit-for-bit with Spark's XXH64 (sql/catalyst XXH64.java, public Apache
source); pinned against F.xxhash64 in tests/test_xxh64_sql.py.
"""

from __future__ import annotations

from .xxh64_sql import P1, P2, P3, P4, P5, SPARK_SEED

_M = (1 << 64) - 1


def _rotl(x: int, n: int) -> int:
    return ((x << n) | (x >> (64 - n))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & _M
    h ^= h >> 29
    h = (h * P3) & _M
    h ^= h >> 32
    return h


def hash_long(v: int, seed: int = SPARK_SEED) -> int:
    """XXH64.hashLong — unsigned result; ``to_signed`` for Spark's."""
    h = (seed + P5 + 8) & _M
    k1 = (_rotl((v & _M) * P2 & _M, 31) * P1) & _M
    h = (_rotl(h ^ k1, 27) * P1 + P4) & _M
    return _fmix(h)


def hash_int(v: int, seed: int = SPARK_SEED) -> int:
    """XXH64.hashInt — IntegerType columns hash 4 bytes, not 8."""
    h = (seed + P5 + 4) & _M
    h ^= ((v & 0xFFFFFFFF) * P1) & _M
    h = (_rotl(h, 23) * P2 + P3) & _M
    return _fmix(h)


def hash_bytes(b: bytes, seed: int = SPARK_SEED) -> int:
    """XXH64.hashUnsafeBytes over UTF-8 payloads (StringType)."""
    n = len(b)
    if n >= 32:
        v1 = (seed + P1 + P2) & _M
        v2 = (seed + P2) & _M
        v3 = seed & _M
        v4 = (seed - P1) & _M
        i = 0
        while i + 32 <= (n // 32) * 32:
            for off, acc in ((0, "v1"), (8, "v2"), (16, "v3"), (24, "v4")):
                k = int.from_bytes(b[i + off : i + off + 8], "little")
                val = {"v1": v1, "v2": v2, "v3": v3, "v4": v4}[acc]
                val = (_rotl((val + k * P2) & _M, 31) * P1) & _M
                if acc == "v1":
                    v1 = val
                elif acc == "v2":
                    v2 = val
                elif acc == "v3":
                    v3 = val
                else:
                    v4 = val
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for val in (v1, v2, v3, v4):
            h ^= (_rotl((val * P2) & _M, 31) * P1) & _M
            h = (h * P1 + P4) & _M
    else:
        h = (seed + P5) & _M
    h = (h + n) & _M
    # 8-byte words of the aligned region not consumed by the 32-byte loop
    aligned = (n // 8) * 8
    i = (n // 32) * 32
    while i < aligned:
        k = int.from_bytes(b[i : i + 8], "little")
        h ^= (_rotl((k * P2) & _M, 31) * P1) & _M
        h = (_rotl(h, 27) * P1 + P4) & _M
        i += 8
    if i + 4 <= n:
        k = int.from_bytes(b[i : i + 4], "little")
        h ^= (k * P1) & _M
        h = (_rotl(h, 23) * P2 + P3) & _M
        i += 4
    while i < n:
        h ^= (b[i] * P5) & _M
        h = (_rotl(h, 11) * P1) & _M
        i += 1
    return _fmix(h)


def to_signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def spark_xxhash64(*values, seed: int = SPARK_SEED) -> int:
    """F.xxhash64(...) over int ('int'), long ('long'), or str values.
    Pass ints as ('int', v) / ('long', v) tuples, strings bare."""
    h = seed
    for v in values:
        if isinstance(v, str):
            h = hash_bytes(v.encode("utf-8"), h)
        else:
            kind, x = v
            h = hash_int(x, h) if kind == "int" else hash_long(x, h)
    return to_signed(h)
