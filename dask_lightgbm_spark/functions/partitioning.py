"""Partitioning & skew utilities.

AQE's skew-join handling covers joins; for *aggregations* over pathological
hot keys the classic fix is two-phase salted aggregation: shuffle once on
(key, salt) so no single reducer owns a hot key, then combine the ≤ n_salt
partials per key — a second, tiny shuffle. Only algebraic aggregates
(sum/count/min/max) compose this way; the helpers here expose the safe ones.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salt: int, cols: list[str], salt_col: str = "__salt") -> DataFrame:
    """Deterministic salt derived from the row's non-key columns (hash-mod),
    so retries produce identical assignments (F.rand would not)."""
    return df.withColumn(
        salt_col, F.pmod(F.hash(*[F.col(c) for c in cols]), F.lit(n_salt))
    )


def salted_sum_count(
    df: DataFrame, keys: list[str], value_col: str, n_salt: int = 16
) -> DataFrame:
    """Two-phase skew-proof sum+count per key. Result is identical to a
    direct groupBy (integer/exact inputs) — the salt only reshapes the
    shuffle: phase 1 reduces (key, salt) partitions in parallel, phase 2
    merges ≤ n_salt partial rows per key."""
    non_key = [c for c in df.columns if c not in keys]
    salted = with_salt(df, n_salt, non_key or keys)
    partial = salted.groupBy(*keys, "__salt").agg(
        F.sum(value_col).alias("__psum"), F.count(F.lit(1)).alias("__pcnt")
    )
    return partial.groupBy(*keys).agg(
        F.sum("__psum").alias(f"sum_{value_col}"),
        F.sum("__pcnt").alias("n_rows"),
    )


#: bytes of (compressed, columnar) input one spread task should own. 1 MiB
#: of parquet text is ~0.3-1 s of shingle/score kernel work — coarse enough
#: that task launch doesn't dominate, fine enough to load-balance. Cluster
#: deployments tune via env; the cap is always defaultParallelism, so a
#: wide cluster never over-splits a small input and a big input still
#: reaches every core.
_SPREAD_TASK_BYTES_ENV = "SPARK_GRAFT_SPREAD_TASK_BYTES"
_SPREAD_TASK_BYTES_DEFAULT = 1 << 20


def _plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's logical size estimate for the frame (file bytes for
    scans, width-scaled for projections; conservatively huge for nodes
    with no stats, e.g. Python maps)."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return None


def ensure_parallelism(
    df: DataFrame,
    min_parts: int | None = None,
    bytes_per_task: int | None = None,
) -> DataFrame:
    """Spread a narrow input across the cluster before a CPU-heavy
    projection. Single-file/single-row-group parquet scans arrive as ONE
    partition — any expensive per-row work would run on one core. Inputs
    that are already wide pass through untouched (at 100 TB the scan is
    thousands of partitions and this is a no-op).

    The spread width is SIZE-adaptive, not a core-count constant: target =
    clamp(ceil(plan-size / SPARK_GRAFT_SPREAD_TASK_BYTES), 1,
    defaultParallelism). A tiny input (one ~0.5 MB row group) stays in one
    task — round-robin-exchanging 5k rows to 32 partitions cost more wall
    in task launches than the kernel it fed (measured: t05 sf0.1 1.30 s at
    spread=32 vs 0.64 s unspread) — while anything ≥ cap×bytes-per-task
    still reaches every core. Row ORDER downstream of the spread depends
    on the width; no declared query's results do (the driver hash is
    order-insensitive, ORDER BY queries sort last).

    ``bytes_per_task`` is the caller's COST hint — bytes of input that
    amount to roughly 0.3–1 s of its per-row work. The 1 MiB default fits
    the vectorized NumPy kernels (~0.2–0.5 core-s/MB); callers running
    heavier per-byte work (interpreted Catalyst HOF folds ~1 core-s/MB,
    matmul scoring) pass a smaller budget so the same byte count spreads
    wider. The env knob scales the DEFAULT only (cluster-level tuning);
    explicit hints are relative measurements, not deploy-tunables."""
    if df.isStreaming:
        # micro-batch partitioning is the source's business; also .rdd is
        # illegal on a streaming frame
        return df
    cap = df.sparkSession.sparkContext.defaultParallelism
    if min_parts is not None:
        target = min_parts
    else:
        est = _plan_size_bytes(df)
        if est is None or est < 0:
            target = cap
        else:
            bpt = bytes_per_task or int(
                os.environ.get(_SPREAD_TASK_BYTES_ENV, _SPREAD_TASK_BYTES_DEFAULT)
            )
            target = max(1, min(cap, -(-est // max(bpt, 1))))
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def grouped_topk(
    df: DataFrame,
    group_cols: list[str],
    order: list,
    k: int,
    salt_on: list[str],
    n_salt: int = 64,
) -> DataFrame:
    """Exact per-group top-k under the TOTAL order ``order`` without ever
    sorting a hot group on one task (the q05 two-level pattern as a
    reusable operator): phase 1 ranks within (group, salt) partitions —
    each ~|group|/n_salt, spill-bounded and parallel — and keeps k per
    salt; phase 2 re-ranks the ≤ n_salt×k survivors per group. Any global
    top-k row is necessarily its salt-group's top-k under the same order,
    so the selected set and the ``__rank`` column are IDENTICAL to a
    single rank window's. ``order`` must be a total order of the group's
    rows (tie-break to uniqueness) or the selection is ill-defined;
    ``salt_on`` picks the hashed columns (deterministic under retries)."""
    from pyspark.sql import Window as W

    s = with_salt(df, n_salt, salt_on)
    w1 = W.partitionBy(*group_cols, "__salt").orderBy(*order)
    w2 = W.partitionBy(*group_cols).orderBy(*order)
    return (
        s.withColumn("__prank", F.row_number().over(w1))
        .filter(F.col("__prank") <= k)
        .withColumn("__rank", F.row_number().over(w2))
        .filter(F.col("__rank") <= k)
        .drop("__salt", "__prank")
    )


def key_skew_stats(
    df: DataFrame, key_cols: list[str], by: list[str] | None = None
) -> DataFrame:
    """Frequency-skew stats for a prospective shuffle/join/dedup key — the
    q85 diagnostic as a reusable operator, living next to the salting
    utilities it decides between. One row per ``by`` group (or one row
    total): ``n_keys``, ``n_rows``, ``max_n`` (heaviest key), and
    ``skew_ratio_permille`` = max key count ×1000 ÷ floor-mean key count
    (integer — 1000 = perfectly uniform). The division happens BEFORE the
    cardinality multiply: ``max_n*1000*n_keys`` exceeds int64 at the
    row/key cardinalities this diagnostic targets (1e9 keys × 1e9 max ×
    1000), which raises under Spark 4's default ANSI mode; ``max_n*1000``
    is overflow-safe for any realistic corpus and the floor-mean
    denominator is ≥1 by construction (n_rows ≥ n_keys). Both aggregations
    partial-combine map-side; output is key-cardinality-, then
    group-cardinality-sized."""
    grp = list(by or [])
    counts = df.groupBy(*grp, *key_cols).agg(F.count(F.lit(1)).alias("n"))
    return _skew_from_counts(counts, grp)


def _skew_from_counts(counts: DataFrame, grp: list[str]) -> DataFrame:
    """Aggregate a per-key count table (column ``n``) into skew stats —
    split out so the int64-overflow regime (counts the group-by above can't
    produce in a test) is directly pinnable."""
    return counts.groupBy(*grp).agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_n"),
        F.expr(
            "max(n) * 1000 div (sum(n) div count(*))"
        ).alias("skew_ratio_permille"),
    )


def repartition_for_join(df: DataFrame, keys: list[str], n: int | None = None) -> DataFrame:
    """Hash-partition on the join keys ahead of multiple joins/aggs on the
    same keys so the exchange is reused across stages (bucketing-without-
    tables for ephemeral pipelines)."""
    cols = [F.col(k) for k in keys]
    return df.repartition(n, *cols) if n else df.repartition(*cols)


def largest_remainder_allocation(
    df: DataFrame, key_col: str, weight_col: str, budget: int
) -> DataFrame:
    """Split an integer ``budget`` across keys proportionally to integer
    ``weight_col`` using the largest-remainder method — pure int64
    arithmetic (floor-division base shares, leftover units to the largest
    remainders, ties by key), so results are exact and reproducible on any
    engine. Allocations sum to the budget by construction; every key
    receives at least its floor share. Raises if total weight is 0
    (allocation undefined). The per-key frame is assumed small (it is an
    aggregate over keys); the windows here are over keys, not rows."""
    from pyspark.sql import Window as W

    total_w = df.agg(F.sum(weight_col)).collect()[0][0]
    if not total_w:
        raise ValueError("largest_remainder_allocation: total weight is 0")
    b = F.lit(int(budget)).cast("long")
    wall = W.partitionBy()
    base = df.select(
        key_col,
        F.col(weight_col).cast("long").alias("__w"),
        F.expr(f"({int(budget)} * {weight_col}) div {int(total_w)}").alias("__base"),
        ((b * F.col(weight_col).cast("long")) % F.lit(int(total_w))).alias("__rem"),
    )
    ranked = base.select(
        key_col,
        "__w",
        "__base",
        F.row_number().over(W.orderBy(F.desc("__rem"), F.asc(key_col))).alias("__rk"),
        (b - F.sum("__base").over(wall)).alias("__left"),
    )
    return ranked.select(
        key_col,
        F.col("__w").alias(weight_col),
        (
            F.col("__base")
            + F.when(F.col("__rk") <= F.col("__left"), F.lit(1)).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("allocation"),
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    n_salt: int = 16,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Skew-proof inner equi-join: salt the skewed (fact) side into
    ``n_salt`` sub-streams per key and REPLICATE the other (dim) side once
    per salt value, joining on (key, salt) — no single reducer owns a hot
    key's entire row set. Semantically identical to
    ``skewed.join(other, key)``; the salt only reshapes the shuffle.

    This is the manual form of what AQE's skew-join does adaptively at
    runtime; it exists for engines/paths where AQE can't see the skew
    (e.g. skew created mid-stage) and as the deterministic baseline the
    q62 oracle checks. Applicability window: if ``other`` fits a broadcast
    there is no shuffle to skew — just broadcast-join; salting pays off
    when ``other`` is too big to broadcast yet n_salt copies of it are
    still far smaller than the hot key's row set on one reducer.

    ``salt_cols`` picks the skewed-side columns whose hash assigns the
    salt (default: all non-key columns — deterministic under retries,
    unlike F.rand; a key-only frame falls back to hashing the key, which
    degenerates to no spreading but stays correct)."""
    if "__salt" in skewed.columns or "__salt" in other.columns:
        raise ValueError("salted_join: inputs must not already have a __salt column")
    salt_cols = salt_cols or [c for c in skewed.columns if c != key] or [key]
    s = with_salt(skewed, n_salt, salt_cols)
    replicated = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return s.join(replicated, [key, "__salt"]).drop("__salt")
