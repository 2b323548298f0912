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
    (191664964, 1662057958),
    (1405681632, 942484273),
    (929893138, 1843824993),
    (184566855, 1497586439),
    (432652534, 202244315),
    (1130604998, 2095133046),
    (1580016184, 1634535063),
    (1540770720, 1688060241),
    (1102145673, 275121931),
    (1803345591, 967196437),
    (1074497556, 796282694),
    (392022360, 1990212659),
    (1678403331, 1382689816),
    (864178267, 1766867110),
    (1171300113, 952224741),
    (967354525, 487991439),
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


POLY_MULT = 65599  # SDBM-style rolling hash multiplier
POLY_MOD = 4294967296  # 2^32 — keeps every intermediate < 2^48, int64-safe


def poly_shingle_hash(codes: Column, g: Column, k: int) -> Column:
    """32-bit rolling hash of the k-char shingle starting at 1-based
    position ``g`` of a per-char code array: h = fold((h·65599 + c) mod 2³²).
    ~10× cheaper than md5 per shingle and equally portable (oracle twin:
    :func:`sql_poly_shingle_hash`). Defined on ASCII/codepoint arrays;
    engines agree for any codepoint. Positions past the end (only possible
    for docs shorter than k) contribute code 0 — matching DuckDB, where
    ``text[pos]`` out of range is ``''`` and ``ascii('') = 0``. Guarded with
    try_element_at so ANSI mode (Spark 4 default) never throws on short or
    empty documents."""
    h = F.lit(0).cast("long")
    for i in range(k):
        c = F.coalesce(F.try_element_at(codes, g + F.lit(i)), F.lit(0))
        h = (h * F.lit(POLY_MULT) + c) % F.lit(POLY_MOD)
    return h


def sql_poly_shingle_hash(text_expr: str, g_expr: str, k: int) -> str:
    h = "CAST(0 AS BIGINT)"
    for i in range(k):
        h = f"(({h}) * {POLY_MULT} + ascii({text_expr}[{g_expr} + {i}])) % {POLY_MOD}"
    return h


def minhash_value(h: Column, perm: int) -> Column:
    a, b = MINHASH_COEF[perm]
    return (h * F.lit(a) + F.lit(b)) % F.lit(MINHASH_PRIME)


def sql_minhash_value(hexpr: str, perm: int) -> str:
    a, b = MINHASH_COEF[perm]
    return f"(({hexpr}) * {a} + {b}) % {MINHASH_PRIME}"
