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


# -- DuckDB side (SQL text generators) --------------------------------------

def h32_sql(expr: str) -> str:
    return f"CAST(('0x' || substring(md5({expr}), 1, 8)) AS BIGINT)"


def h48_sql(expr: str) -> str:
    return f"CAST(('0x' || substring(md5({expr}), 1, 12)) AS BIGINT)"


def perm_sql(expr: str, a: int, b: int) -> str:
    return f"(({h32_sql(expr)} % {P}) * {a} + {b}) % {P}"
