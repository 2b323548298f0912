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


def _truncate_lineage(
    df: DataFrame, created: list | None = None, lazy_local: bool = False
) -> DataFrame:
    """Materialize ``df`` and cut its plan back to a leaf. Reliable
    ``checkpoint`` when the session has a checkpoint dir (survives executor
    loss — set one for production-scale runs); ``localCheckpoint``
    otherwise (executor-local blocks: a lost executor fails the job and the
    caller retries — acceptable for an iterative loop whose rounds are
    cheap relative to exponential plan growth).

    ``created``: optional list; when reliable checkpointing, the set of
    rdd-* checkpoint paths this call wrote is appended so the caller can
    delete superseded rounds (Spark does NOT delete reliable checkpoint
    files unless spark.cleaner.referenceTracking.cleanCheckpoints is set,
    and even then only on GC — an iterating service would otherwise
    accumulate unbounded checkpoint data on disk).

    ``lazy_local``: on the localCheckpoint branch only, defer
    materialization to the caller's next action — a local checkpoint is
    cache-backed, so the first action computes AND stores it in one job
    (the caller's convergence count doubles as the materializer, halving
    the per-round job count). Reliable checkpoints stay eager: a lazy
    ``checkpoint()`` re-RUNS the whole computation in a second job to
    write the files, which is strictly worse."""
    sc = df.sparkSession.sparkContext
    try:
        has_dir = sc.getCheckpointDir() is not None
    except Exception:
        has_dir = False
    if has_dir:
        before = _list_ckpt_paths(sc) if created is not None else set()
        out = df.checkpoint(eager=True)
        if created is not None:
            created.append(_list_ckpt_paths(sc) - before)
        return out
    return df.localCheckpoint(eager=not lazy_local)


def _ckpt_fs_root(sc):
    """(Hadoop FileSystem, Path) of the context's checkpoint root — the
    UUID-suffixed dir rdd-* subdirs are written into. Works for any
    Hadoop-supported scheme (local, HDFS, s3a)."""
    d = sc.getCheckpointDir()
    path = sc._jvm.org.apache.hadoop.fs.Path(d)
    fs = path.getFileSystem(sc._jsc.hadoopConfiguration())
    return fs, path


def _list_ckpt_paths(sc) -> set:
    try:
        fs, root = _ckpt_fs_root(sc)
        if not fs.exists(root):
            return set()
        return {st.getPath().toString() for st in fs.listStatus(root)}
    except Exception:  # noqa: BLE001 — bookkeeping only, never fail the job
        return set()


def _delete_ckpt_paths(sc, paths) -> None:
    try:
        fs, _ = _ckpt_fs_root(sc)
        Path = sc._jvm.org.apache.hadoop.fs.Path
        for p in paths:
            fs.delete(Path(p), True)
    except Exception:  # noqa: BLE001
        pass


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
    sc = edges.sparkSession.sparkContext
    ckpts: list = []  # per-round rdd-* paths (reliable-checkpoint mode only)
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    labels = _truncate_lineage(
        nodes.select(F.col(id_col).alias("a"), F.col(id_col).alias("component")),
        ckpts,
    )
    converged = False
    for _ in range(max_iter):
        # neighbor minimum: for each node, min label among its neighbors
        neigh = (
            sym.join(labels.withColumnRenamed("a", "b2"), sym.b == F.col("b2"))
            .groupBy("a")
            .agg(F.min("component").alias("n_min"))
        )
        # the checkpoint truncates the round's lineage so the plan (and its
        # listener-event plan string) stays O(1) regardless of round
        # number; the convergence count is the action that materializes
        # it (lazy_local). The old/new label pair is already side by side
        # in this join, so the changed flag rides the checkpoint as a
        # boolean column instead of a second full join of old vs new
        # labels per round (one shuffle + one job saved per round).
        new_min = F.least(
            F.col("component"), F.coalesce(F.col("n_min"), F.col("component"))
        )
        stepped = _truncate_lineage(
            labels.join(neigh, "a", "left").select(
                "a",
                new_min.alias("component"),
                (new_min < F.col("component")).alias("__changed"),
            ),
            ckpts,
            lazy_local=True,
        )
        changed = stepped.filter(F.col("__changed")).count()
        labels = stepped.select("a", "component")
        if changed == 0:
            converged = True
            break
    sym.unpersist()
    # reliable-checkpoint mode: delete every superseded round's files now
    # (keep only the final labels' — the returned leaf still reads them);
    # without this, repeated invocations in a long-lived service accumulate
    # unbounded checkpoint data on disk
    if len(ckpts) > 1:
        stale = set().union(*ckpts[:-1]) - ckpts[-1]
        _delete_ckpt_paths(sc, stale)
    if not converged:
        if ckpts:
            _delete_ckpt_paths(sc, ckpts[-1])
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds — "
            "component diameter exceeds max_iter; raise it"
        )
    # returned DataFrame is a checkpoint leaf (already materialized); its
    # blocks live until the handle is dropped and the ContextCleaner runs
    return labels.select(F.col("a").alias(id_col), "component")
