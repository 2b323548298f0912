"""Product quantization (PQ) approximate nearest neighbor.

The fourth ANN family in the engine (alongside IVF, sign-LSH, and int8
scalar quantization): split each d-dim vector into M contiguous
sub-vectors, learn a small k-means codebook per subspace, store each corpus
vector as M single-byte codes, and answer queries with asymmetric distance
computation (ADC) — exact query sub-vector vs the code's centroid.

Scale story (100 TB): the codebooks are M×K×(d/M) doubles — kilobytes —
held on the driver and embedded as literals, so BOTH the corpus encoding
and the ADC scan are pure zero-shuffle projections over the corpus
(whole-stage-codegen'd distance folds; memory per vector drops from
d×4 bytes float to M bytes of codes — 64× here). The only shuffle in the
whole query is the per-query top-k window. Encoding cost is amortizable
exactly like the IVF cell assignment (build once, serve many — s15).

Determinism (oracle bit-parity): codebooks come from
operators/kmeans.py's fixed-point Lloyd's (order-independent means); ADC
distance is a fixed-order sum of M sequential sub-vector folds, evaluated
identically by DuckDB's list_reduce.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dask_lightgbm_spark.operators.kmeans import kmeans_centroids, sq_dist
from dask_lightgbm_spark.operators.similarity import to_double_array


def _lit_arr(vals: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in vals])


def train_codebooks(
    df: DataFrame,
    init_filter: Column,
    dim: int,
    n_subspaces: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_iters: int = 2,
) -> list[list[tuple[int, list[float]]]]:
    """One deterministic k-means codebook per contiguous subspace.
    Returns ``[subspace][code] -> centroid`` (driver-side: M×K×(dim/M)
    doubles, a few KB). K = the number of rows matching ``init_filter``."""
    if dim % n_subspaces != 0:
        raise ValueError(f"dim {dim} not divisible by n_subspaces {n_subspaces}")
    sub = dim // n_subspaces
    e = df.select(F.col(id_col), to_double_array(F.col(vec_col)).alias("v"))
    books: list[list[tuple[int, list[float]]]] = []
    for m in range(n_subspaces):
        sliced = e.select(id_col, F.slice("v", 1 + m * sub, sub).alias("sv"))
        cents = kmeans_centroids(
            sliced, init_filter, id_col=id_col, vec_col="sv", n_iters=n_iters
        )
        books.append(sorted((r.cid, list(r.cv)) for r in cents.collect()))
    return books


def encode_pq(
    df: DataFrame,
    codebooks: list[list[tuple[int, list[float]]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Corpus → (id, v, code_0..code_{M-1}): per subspace, the nearest
    codebook centroid by squared L2 (tie → lowest code). Literal centroids,
    zero shuffle — a pure projection."""
    sub = len(codebooks[0][0][1])
    out = df.select(F.col(id_col), to_double_array(F.col(vec_col)).alias("v"))
    for m, book in enumerate(codebooks):
        sv = F.slice("v", 1 + m * sub, sub)
        structs = F.array(
            *[
                F.struct(
                    sq_dist(sv, _lit_arr(cv)).alias("dist"),
                    F.lit(int(cid)).alias("cid"),
                )
                for cid, cv in book
            ]
        )
        out = out.withColumn(f"code_{m}", F.array_min(structs)["cid"])
    return out


def pq_knn(
    df: DataFrame,
    queries_filter: Column,
    k: int,
    codebooks: list[list[tuple[int, list[float]]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    encoded: DataFrame | None = None,
) -> DataFrame:
    """ADC top-k: approximate distance from each query (exact sub-vectors)
    to each corpus vector (codes only) = fixed-order sum over subspaces of
    sqdist(query sub-vector, code centroid). Per-code centroid lookup is an
    element_at into a literal array-of-arrays, so scoring is again a pure
    projection; the sole shuffle is the per-query top-k window.

    Output: (qid, nid, rank, adc_dist)."""
    sub = len(codebooks[0][0][1])
    enc = encoded if encoded is not None else encode_pq(df, codebooks, id_col, vec_col)
    queries = (
        df.filter(queries_filter)
        .select(
            F.col(id_col).alias("qid"),
            to_double_array(F.col(vec_col)).alias("qv"),
        )
    )
    scored = enc.select(
        F.col(id_col).alias("nid"), *[F.col(f"code_{m}") for m in range(len(codebooks))]
    ).join(F.broadcast(queries), F.col("nid") != F.col("qid"))
    # literal codebook per subspace: element_at(codes_m, code+1) -> centroid
    dist = None
    for m, book in enumerate(codebooks):
        table = F.array(*[_lit_arr(cv) for _, cv in book])
        d_m = sq_dist(
            F.slice("qv", 1 + m * sub, sub),
            F.element_at(table, F.col(f"code_{m}") + 1),
        )
        dist = d_m if dist is None else dist + d_m
    from pyspark.sql import Window as W

    w = W.partitionBy("qid").orderBy(F.asc("adc_dist"), F.asc("nid"))
    return (
        scored.withColumn("adc_dist", dist)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "rank", "adc_dist")
    )
