"""Portable deterministic hashing — identical results in Spark SQL and
DuckDB SQL, so sketch-based operators (minhash, simhash, LSH) can be
verified by the driver's DuckDB oracle bit-for-bit.

Scheme: md5 (available in both engines) truncated to 32/48 bits via hex →
integer conversion, then universal-hash permutations ``(a*h + b) mod p``
in pure 64-bit-safe integer arithmetic:
- ``p`` = 2038074743 (prime < 2^31), inputs reduced mod p first, so
  ``a*h' + b < 2^62`` never overflows signed 64-bit in either engine.

This deliberately avoids engine-native hashes (Spark murmur3 ``F.hash`` /
xxhash64 vs DuckDB's) which do not agree across engines. At 100 TB, md5 in
whole-stage codegen is still JVM-side and vectorizable; swap for
``F.xxhash64`` when oracle parity is not required (one constant).
"""

from __future__ import annotations

import pyspark.sql.functions as F

#: prime modulus < 2^31
P = 2038074743

#: fixed universal-hash coefficients (deterministic; generated once from a
#: seeded PRNG and frozen here so both engines agree forever)
MINHASH_COEFFS: list[tuple[int, int]] = [
    (1664525, 1013904223),
    (22695477, 1),
    (134775813, 1),
    (214013, 2531011),
    (1103515245, 12345),
    (69069, 0),
    (1220703125, 7),
    (32719, 3),
    (100005491, 334333),
    (747796405, 2891336453 % P),
    (65793, 28411),
    (8405, 4930),
    (197331, 7777),
    (9301, 49297),
    (171, 11213),
    (950706376, 88888),
]

#: simhash width in bits (48 keeps every shift result < 2^62, signed-safe)
SIMHASH_BITS = 48


# -- Spark side -------------------------------------------------------------

def h32(col):
    """First 32 bits of md5 as a non-negative BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def h48(col):
    """First 48 bits of md5 as a non-negative BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("long")


def perm(col, a: int, b: int):
    """Universal-hash permutation of a 32-bit hash, mod P."""
    return (h32(col) % P * F.lit(a) + F.lit(b)) % P


# -- Driver side ------------------------------------------------------------

_XXP1 = 0x9E3779B185EBCA87
_XXP2 = 0xC2B2AE3D27D4EB4F
_XXP3 = 0x165667B19E3779F9
_XXP4 = 0x85EBCA77C2B2AE63
_XXP5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxh64(data: bytes, seed: int = 42) -> int:
    """Standard XXH64 over ``data`` as a SIGNED 64-bit int —
    bit-identical to Spark's ``F.xxhash64`` on a string/binary column
    (Spark's default seed is 42). Driver-side twin of the engine hash,
    used by the r14 local micro-batch probe to compute the partition
    key bucket ``pmod(xxhash64(key), n)`` without a Spark job; parity
    is pinned by test against ``F.xxhash64`` itself."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _XXP1 + _XXP2) & _M64
        v2 = (seed + _XXP2) & _M64
        v3 = seed & _M64
        v4 = (seed - _XXP1) & _M64
        while i + 32 <= n:
            for j, v in enumerate((v1, v2, v3, v4)):
                k = int.from_bytes(data[i + 8 * j:i + 8 * j + 8], "little")
                v = (_rotl64((v + k * _XXP2) & _M64, 31) * _XXP1) & _M64
                if j == 0:
                    v1 = v
                elif j == 1:
                    v2 = v
                elif j == 2:
                    v3 = v
                else:
                    v4 = v
            i += 32
        h = (
            _rotl64(v1, 1) + _rotl64(v2, 7)
            + _rotl64(v3, 12) + _rotl64(v4, 18)
        ) & _M64
        for v in (v1, v2, v3, v4):
            k = (_rotl64((v * _XXP2) & _M64, 31) * _XXP1) & _M64
            h = (((h ^ k) * _XXP1) + _XXP4) & _M64
    else:
        h = (seed + _XXP5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        k = (
            _rotl64(
                (int.from_bytes(data[i:i + 8], "little") * _XXP2) & _M64,
                31,
            )
            * _XXP1
        ) & _M64
        h = ((_rotl64(h ^ k, 27) * _XXP1) + _XXP4) & _M64
        i += 8
    if i + 4 <= n:
        k = (int.from_bytes(data[i:i + 4], "little") * _XXP1) & _M64
        h = ((_rotl64(h ^ k, 23) * _XXP2) + _XXP3) & _M64
        i += 4
    while i < n:
        h = (_rotl64(h ^ ((data[i] * _XXP5) & _M64), 11) * _XXP1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _XXP2) & _M64
    h ^= h >> 29
    h = (h * _XXP3) & _M64
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


# -- DuckDB side (SQL text generators) --------------------------------------

def h32_sql(expr: str) -> str:
    return f"CAST(('0x' || substring(md5({expr}), 1, 8)) AS BIGINT)"


def h48_sql(expr: str) -> str:
    return f"CAST(('0x' || substring(md5({expr}), 1, 12)) AS BIGINT)"


def perm_sql(expr: str, a: int, b: int) -> str:
    return f"(({h32_sql(expr)} % {P}) * {a} + {b}) % {P}"
