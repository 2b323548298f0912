"""Connected components via iterative min-label propagation — the step that
turns near-dup PAIRS into dedup GROUPS (keep one doc per component).

A genuinely iterative distributed algorithm on the DataFrame API: each
round, every node adopts the minimum label among itself and its neighbors;
convergence in O(component diameter) rounds. Near-dup graphs have tiny
diameters (dup clusters are near-cliques), so 3-5 rounds typically suffice.

Scale shape per round: one join edges⋈labels + one min-aggregation — both
shuffle on node id. Each round's labels are CHECKPOINTED, not merely
persisted: the round's plan references the previous labels twice (neighbor
min + the join back), so the logical/physical plan TREE doubles per round
even though a cache bounds execution — and anything that walks the plan as
a tree (the SQL listener's per-action plan description, explain) goes
exponential in round count. A path-shaped graph needing ~15 rounds made
that walk take 2^15 subtree visits — minutes of driver CPU per count().
Checkpointing (reliable if a checkpoint dir is set, else localCheckpoint —
the GraphFrames discipline) truncates lineage to O(1) per round; old
rounds' blocks are reclaimed by the ContextCleaner when their handles drop.
The driver loop only checks a converged count — no data is collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _truncate_lineage(df: DataFrame) -> DataFrame:
    """Materialize ``df`` and cut its plan back to a leaf. Reliable
    ``checkpoint`` when the session has a checkpoint dir (survives executor
    loss — set one for production-scale runs); ``localCheckpoint``
    otherwise (executor-local blocks: a lost executor fails the job and the
    caller retries — acceptable for an iterative loop whose rounds are
    cheap relative to exponential plan growth)."""
    sc = df.sparkSession.sparkContext
    try:
        has_dir = sc.getCheckpointDir() is not None
    except Exception:
        has_dir = False
    if has_dir:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


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
    labels = _truncate_lineage(
        nodes.select(F.col(id_col).alias("a"), F.col(id_col).alias("component"))
    )
    converged = False
    for _ in range(max_iter):
        # neighbor minimum: for each node, min label among its neighbors
        neigh = (
            sym.join(labels.withColumnRenamed("a", "b2"), sym.b == F.col("b2"))
            .groupBy("a")
            .agg(F.min("component").alias("n_min"))
        )
        # eager checkpoint materializes EVERY partition of the new round
        # before the convergence check, and both sides of that check are
        # checkpoint leaves — the count's plan (and its listener-event plan
        # string) stays O(1) regardless of round number
        new_labels = _truncate_lineage(
            labels.join(neigh, "a", "left").select(
                "a",
                F.least(F.col("component"), F.coalesce(F.col("n_min"), F.col("component"))).alias(
                    "component"
                ),
            )
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "a")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    sym.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds — "
            "component diameter exceeds max_iter; raise it"
        )
    # returned DataFrame is a checkpoint leaf (already materialized); its
    # blocks live until the handle is dropped and the ContextCleaner runs
    return labels.select(F.col("a").alias(id_col), "component")
