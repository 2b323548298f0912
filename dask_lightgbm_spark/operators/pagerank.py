"""Integer-exact PageRank — the canonical iterative graph algorithm,
expressed as driver-iterated DataFrame joins (the Pregel-style topology
GraphX uses, minus the RDD API).

Determinism contract: ranks are int64 micro-units (1e6 = 1.0) and every
step is integer arithmetic — contribution = rank div out_degree,
new_rank = 150000 + (85 * sum_contribs) div 100 (i.e. damping 0.85,
teleport 0.15, both as exact integer ratios). Floor losses make this an
approximation of real-valued PageRank, but every engine computes the
identical integers, so the DuckDB oracle (the same iterations as chained
CTEs) matches bit-exactly — the property float PageRank cannot have
(summation order changes the double sum).

Scale: edges shuffle once per iteration on dst (the contribution agg);
ranks are joined to edges on src — both are equi hash joins keyed on node
id; out-degrees are computed once. Iteration count is fixed (no
convergence collect). At 100 TB the edge table partitioning can be reused
across iterations (bucketing on src) to drop the per-iteration rank
shuffle."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000  # rank micro-units
TELEPORT = 150_000  # 0.15 * SCALE
DAMP_NUM, DAMP_DEN = 85, 100  # 0.85 as an exact ratio


def pagerank_int(edges: DataFrame, n_iters: int = 3) -> DataFrame:
    """``edges``: (src, dst) directed edge list, assumed dedup'd. Every
    node must have at least one out-edge (undirected graphs symmetrized by
    the caller satisfy this). Returns (node, rank) with rank in int64
    micro-units after ``n_iters`` synchronous iterations from a uniform
    start of SCALE per node."""
    if n_iters < 1:
        raise ValueError(f"n_iters must be >= 1, got {n_iters}")
    from dask_lightgbm_spark.session import track_lazy_persist

    # Materialize the edge list ONCE for the whole loop (guide §5): the
    # caller's edge lineage (fact⋈fact join + distinct) would otherwise be
    # re-inlined into every iteration's plan — measured 80 parquet scans in
    # the 3-iteration q60 plan. Persisting AFTER a hash repartition on src
    # also lets every per-iteration edges⋈ranks / edges⋈deg join reuse the
    # cached partitioning instead of re-exchanging the edges each round
    # (§2.4). The returned ranks still depend on the cache lazily, so it
    # registers with the session's release registry rather than
    # unpersisting here (same contract as minhash_lsh_neardup's carrier).
    edges = track_lazy_persist(edges.repartition(F.col("src")).persist())
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    deg = track_lazy_persist(deg.persist())
    ranks = deg.select(
        F.col("src").alias("node"), F.lit(SCALE).cast("long").alias("rank")
    )
    nodes = deg.select(F.col("src").alias("node"))
    for _ in range(n_iters):
        contribs = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank div out_deg").alias("contrib"),
            )
            .groupBy("node")
            .agg(F.sum("contrib").alias("sum_contrib"))
        )
        # keep in-degree-0 nodes at pure teleport mass (left join + 0)
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(TELEPORT)
                    + F.expr(
                        f"({DAMP_NUM} * coalesce(sum_contrib, 0)) div {DAMP_DEN}"
                    )
                ).cast("long").alias("rank"),
            )
        )
    return ranks
