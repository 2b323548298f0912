"""Deterministic, engine-portable hashing primitives.

Everything here is defined so the identical value is computable in Spark SQL
and ANSI/DuckDB SQL (the correctness oracle): md5 → hex prefix → integer.
Spark's native ``hash``/``xxhash64`` are seeded Murmur variants with no
cross-engine twin, so they are deliberately avoided in oracle-matched paths
(they remain fine for internal-only partitioning/salting).

All arithmetic stays within int64: hash32 < 2^32, permutation multipliers
< 2^31, so a·h + b < 2^63 — no overflow on either engine (DuckDB errors on
int64 overflow; Spark wraps — keeping the range safe means neither happens).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# prime just above 2^32 for minhash universal hashing
MINHASH_PRIME = 4294967311

# fixed coefficients for minhash permutations h_i(x) = (a_i*x + b_i) % P —
# constants (not runtime-random) so Spark plan and SQL oracle share them.
# Drawn once from numpy default_rng(42) in [1, 2^31).
MINHASH_COEF: list[tuple[int, int]] = [
    (196337567, 1985943324),
    (1146801480, 192641798),
    (861853183, 1465411558),
    (1898626059, 983015342),
    (725074866, 1866039359),
    (1563270145, 1621763967),
    (1333258851, 1860900078),
    (804671344, 838858691),
]


def md5_hash32(c: Column) -> Column:
    """Stable 32-bit non-negative int64 from the first 8 hex chars of md5.
    Oracle twin: ``('0x' || substr(md5(x), 1, 8))::BIGINT``."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def md5_hash60(c: Column) -> Column:
    """Stable 60-bit non-negative int64 (15 hex chars) — token hash for
    simhash. Oracle twin: ``('0x' || substr(md5(x), 1, 15))::BIGINT``."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def sql_hash32(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 8))::BIGINT"


def sql_hash60(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def minhash_value(h: Column, perm: int) -> Column:
    a, b = MINHASH_COEF[perm]
    return (h * F.lit(a) + F.lit(b)) % F.lit(MINHASH_PRIME)


def sql_minhash_value(hexpr: str, perm: int) -> str:
    a, b = MINHASH_COEF[perm]
    return f"(({hexpr}) * {a} + {b}) % {MINHASH_PRIME}"
