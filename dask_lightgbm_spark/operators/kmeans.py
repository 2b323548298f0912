"""K-means centroid training (Lloyd's algorithm) as DataFrame ops — the
"learn your own IVF cells" companion to operators/similarity.py
(round-1 design note: IVF used ad-hoc centroid filters; real pipelines
learn them).

Scale design (100 TB story) — the MLlib-KMeans shape:
- centroids live on the DRIVER between iterations (k × dim doubles — a few
  KB) and are embedded as literal arrays into the next assignment
  projection. Assignment is therefore a pure map over the corpus: ZERO
  shuffle, no join, whole-stage-codegen'd distance folds.
- **update**: posexplode to (cid, pos, val) then groupBy(cid, pos) — the
  dim× row fan-out feeds a partial (map-side) agg that collapses to
  k × dim rows before the shuffle, so the shuffle is tiny regardless of
  corpus size.
- one tiny collect per iteration (k × dim values) — the corpus never moves
  to the driver. Chaining iterations lazily instead would grow a deep
  lineage (assign ⋈ update per round) that Catalyst must re-analyze each
  round — the driver-iterated form is how MLlib's own KMeans works.

Determinism contract (DuckDB-oracle bit-parity): per-dimension means use
the fixed-point trick (sum of µ-unit-rounded int64 → one double division),
so aggregation order cannot perturb results; Python float literals
round-trip exactly into Spark literals; distance folds are sequential
left-folds evaluated identically on both engines; ties break on lowest
centroid id via lexicographic struct min.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from dask_lightgbm_spark.operators.similarity import to_double_array

FIXED_POINT = 1_000_000


def sq_dist(a: Column, b: Column) -> Column:
    """Sequential left-fold squared L2 distance (bit-portable)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _lit_arr(vals: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in vals])


def assign_to_literal_centroids(
    vectors: DataFrame, cents: list[tuple[int, list[float]]]
) -> DataFrame:
    """Nearest centroid by squared L2 (tie → lowest cid) against
    driver-held centroids: one projection, no join, no shuffle.
    vectors: (.., v array<double>) → same + cid."""
    structs = F.array(
        *[
            F.struct(
                sq_dist(F.col("v"), _lit_arr(cv)).alias("dist"),
                F.lit(int(cid)).alias("cid"),
            )
            for cid, cv in cents
        ]
    )
    # lexicographic struct min ≡ ORDER BY dist ASC, cid ASC LIMIT 1
    return vectors.withColumn("cid", F.array_min(structs)["cid"])


def assign_vectorized(
    vectors: DataFrame, cents: list[tuple[int, list[float]]]
) -> DataFrame:
    """Bit-exact vectorized twin of :func:`assign_to_literal_centroids`
    (same contract as similarity.assign_cells_vectorized): nearest centroid
    by squared L2 computed in an Arrow ``mapInPandas`` kernel that
    accumulates DIMENSION-BY-DIMENSION across the row block
    (``acc += (V[:,i]-C[:,i])**2``) — per element exactly the
    subtract-multiply-add sequence of the ``F.aggregate(zip_with(...))``
    fold and of DuckDB's ``list_reduce``, so distances and therefore the
    argmin choice match the interpreted path bit-for-bit (ties → lowest
    cid: centroid rows sorted by cid, ``np.argmin`` takes the first
    minimum). Spark does not codegen HOF lambdas, so the fold path runs
    interpreted — ~100x slower on corpus-scale inputs; this kernel is what
    ``kmeans_centroids`` uses for its per-iteration assignments.
    vectors: (.., v array<double>) → same (id, v) + cid."""
    book = sorted((int(c), [float(x) for x in cv]) for c, cv in cents)
    cent_ids = [c for c, _ in book]
    cent_mat = [cv for _, cv in book]
    other = [c for c in vectors.columns if c != "v"]
    if len(other) != 1:
        raise ValueError(f"expected one id column besides v, got {other}")
    id_col = other[0]

    def kernel(batches):
        import numpy as np
        import pandas as pd

        from dask_lightgbm_spark.functions.blockfold import fold_sq_dists

        C = np.asarray(cent_mat, dtype=np.float64)  # k x d, rows sorted by cid
        cid = np.asarray(cent_ids, dtype=np.int64)
        d = C.shape[1]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf["v"].values).astype(np.float64)
            if V.shape[1] != d:
                raise ValueError(f"dim mismatch: vectors {V.shape[1]} vs centroids {d}")
            acc = fold_sq_dists(V, C)
            best = np.argmin(acc, axis=1)  # first min = lowest cid on exact ties
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64").values,
                    "v": list(V),
                    "cid": cid[best].astype("int32"),
                }
            )

    return vectors.select(
        F.col(id_col).cast("long").alias(id_col), "v"
    ).mapInPandas(kernel, f"{id_col} long, v array<double>, cid int")


def _update_centroids(assigned: DataFrame) -> DataFrame:
    """New centroid = per-dimension fixed-point mean of members.
    assigned: (.., v, cid) → (cid, cv array<double>)."""
    long = assigned.select("cid", F.posexplode("v").alias("pos", "val"))
    per_dim = long.groupBy("cid", "pos").agg(
        (
            F.sum(F.round(F.col("val") * FIXED_POINT).cast("long")).cast("double")
            / F.lit(float(FIXED_POINT))
            / F.count(F.lit(1))
        ).alias("m")
    )
    # rebuild the array ordered by dimension: sorts k×dim structs per cid
    return per_dim.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
        ).alias("cv")
    )


def kmeans_centroids(
    df: DataFrame,
    init_filter: Column,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_iters: int = 2,
) -> DataFrame:
    """Lloyd's k-means with a deterministic init (the rows matching
    ``init_filter``; cid = rank of id within that set) and a FIXED number
    of iterations. Output: (cid, cv array<double>) — lazy (the final
    update stage has not run when this returns)."""
    if n_iters < 1:
        raise ValueError(f"n_iters must be >= 1, got {n_iters}")
    e = df.select(F.col(id_col), to_double_array(vec_col).alias("v"))
    init = e.filter(init_filter)
    # the init set is k rows — a global window over it is k rows, not corpus
    init_df = init.select(
        (F.row_number().over(W.orderBy(F.asc(id_col))) - 1).alias("cid"),
        F.col("v").alias("cv"),
    )
    cents = [(r.cid, list(r.cv)) for r in init_df.collect()]
    if not cents:
        raise ValueError("init_filter matched no rows — k-means needs k >= 1 seeds")
    centroids = None
    for i in range(n_iters):
        # vectorized assignment — bit-identical to the interpreted fold
        # (pytest-proven in test_prefix_pq.py); the update stage is JVM-side
        assigned = assign_vectorized(e.select(id_col, "v"), cents)
        centroids = _update_centroids(assigned)
        if i < n_iters - 1:  # k×dim doubles — a few KB to the driver
            cents = [(r.cid, list(r.cv)) for r in centroids.collect()]
    return centroids


def kmeans_centroids_long(
    df: DataFrame,
    init_filter: Column,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_iters: int = 2,
) -> DataFrame:
    """Long-format view (cid, pos, val) of :func:`kmeans_centroids` —
    scalar columns only, hash-comparable against a SQL oracle."""
    cents = kmeans_centroids(df, init_filter, id_col, vec_col, n_iters)
    return cents.select("cid", F.posexplode("cv").alias("pos", "val"))
