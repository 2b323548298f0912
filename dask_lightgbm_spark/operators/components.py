"""Connected components via iterative min-label propagation — the step that
turns near-dup PAIRS into dedup GROUPS (keep one doc per component).

A genuinely iterative distributed algorithm on the DataFrame API: each
round, every node adopts the minimum label among itself and its neighbors;
convergence in O(component diameter) rounds. Near-dup graphs have tiny
diameters (dup clusters are near-cliques), so 3-5 rounds typically suffice.

Scale shape per round: one join edges⋈labels + one min-aggregation — both
shuffle on node id; persisting each round's labels keeps the lineage flat
(no exponential plan growth). The driver loop only checks a converged
count — no data is collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Label every node with the minimum node id reachable from it.
    ``edges``: undirected pair list (src, dst); ``nodes``: one row per node
    (singletons become their own component). Output: (id_col, component)."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    labels = nodes.select(F.col(id_col).alias("a"), F.col(id_col).alias("component")).persist()
    converged = False
    for _ in range(max_iter):
        # neighbor minimum: for each node, min label among its neighbors
        neigh = (
            sym.join(labels.withColumnRenamed("a", "b2"), sym.b == F.col("b2"))
            .groupBy("a")
            .agg(F.min("component").alias("n_min"))
        )
        new_labels = (
            labels.join(neigh, "a", "left")
            .select(
                "a",
                F.least(F.col("component"), F.coalesce(F.col("n_min"), F.col("component"))).alias(
                    "component"
                ),
            )
            .persist()
        )
        # full count (not limit(1)): materializes EVERY partition of the new
        # cache before dropping the parent — a partial materialization would
        # recompute through the whole unpersisted lineage next round
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "a")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            converged = True
            break
    sym.unpersist()
    if not converged:
        labels.unpersist()  # don't leak the unreachable cache on the error path
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds — "
            "component diameter exceeds max_iter; raise it"
        )
    # returned DataFrame stays persisted (it is the converged result; callers
    # re-deriving it through the loop lineage would be far costlier)
    return labels.select(F.col("a").alias(id_col), "component")
