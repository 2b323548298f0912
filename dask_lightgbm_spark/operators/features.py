"""Feature-engineering operators bridging the text corpus to the ML
estimators: hashed bag-of-words (the HashingTF / fasttext / Vowpal feature
layout) built entirely JVM-side.

The bucket hash is the catalog's md5-prefix formula (t35's) rather than
murmur3 so the DuckDB oracle computes identical buckets; the layout and
collision semantics are exactly HashingTF's (index = hash(token) mod B,
value = term frequency).

Scale: :func:`hashed_bow` is one explode + one (doc, bucket) shuffle —
the relational form used for audits/oracles. :func:`hashed_bow_vectors`
never shuffles at all: the B-dim count vector is built row-locally with
array expressions and handed to MLlib via ``array_to_vector`` (JVM-side,
no Python UDF) — the feature matrix streams out at scan speed, which is
what a 100 TB featurize job has to do. At HashingTF-scale bucket counts
(2^18+), where dense rows are untenable, :func:`hashed_bow_sparse` emits
the sparse (indices, values) layout row-locally — still zero shuffle,
per-row work O(distinct_tokens × tokens) independent of B — in the
unwrapped-VectorUDT struct shape the training kernel's CSR assembler
(:func:`dask_lightgbm_spark.core._csr_from_unwrapped`) consumes directly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tokens(text_col: str) -> Column:
    return F.filter(
        F.split(F.trim(F.col(text_col)), r"[ \t\n\f\r]+"), lambda x: x != ""
    )


def bucket_of(tok: Column, n_buckets: int) -> Column:
    """md5-prefix hash bucket in [0, n_buckets) — identical in DuckDB as
    ('0x' || substr(md5(t), 1, 8))::BIGINT % B (the t35 formula)."""
    return F.pmod(
        F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long"),
        F.lit(n_buckets),
    ).cast("int")


def hashed_bow(
    df: DataFrame, id_col: str, text_col: str, n_buckets: int
) -> DataFrame:
    """Exploded hashed-BOW counts: (id, bucket, cnt) — the relational view
    of the feature matrix (sparse COO layout)."""
    toks = df.select(
        F.col(id_col), F.explode(_tokens(text_col)).alias("__tok")
    )
    return toks.groupBy(
        F.col(id_col), bucket_of(F.col("__tok"), n_buckets).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def hashed_bow_vectors(
    df: DataFrame, id_col: str, text_col: str, n_buckets: int
) -> DataFrame:
    """Dense B-dim count vectors as an MLlib ``features`` column, built
    with ZERO shuffle: per row, token buckets are computed once and the
    count vector is a row-local array fold; ``array_to_vector`` converts
    JVM-side. Identical counts to :func:`hashed_bow` by construction
    (same bucket expression).

    SMALL-B CONTRACT (r7 advisor): the row-local build does O(B × tokens)
    work and emits a DENSE B-dim vector per row — the right layout for
    model-sized bucket counts (B ≤ ~4k), where "featurize at scan speed"
    holds. At HashingTF-scale B (2^18+) dense rows blow memory regardless
    of how the counts are built; that regime belongs to
    :func:`hashed_bow_sparse` (zero-shuffle sparse rows for training) or
    :func:`hashed_bow` (the COO relational form for audits/oracles), so
    this function refuses rather than degrade."""
    from pyspark.ml.functions import array_to_vector

    if n_buckets > 4096:
        raise ValueError(
            f"hashed_bow_vectors: dense build is for small B (got "
            f"{n_buckets} > 4096); use hashed_bow_sparse (zero-shuffle "
            "sparse rows) or hashed_bow (COO)"
        )
    buckets = F.transform(_tokens(text_col), lambda t: bucket_of(t, n_buckets))
    counts = F.transform(
        F.sequence(F.lit(0), F.lit(n_buckets - 1)),
        lambda b: F.size(F.filter(buckets, lambda x: x == b)).cast("double"),
    )
    return df.select(
        F.col(id_col), array_to_vector(counts).alias("features")
    )


def hashed_bow_sparse(
    df: DataFrame, id_col: str, text_col: str, n_buckets: int
) -> DataFrame:
    """Sparse hashed-BOW rows for HashingTF-scale B (2^18+), built with
    ZERO shuffle and zero Python: per row, token buckets are hashed once,
    sorted, and reduced to (indices, values) with array expressions —
    per-row work is O(distinct_tokens × tokens), independent of B, and the
    row ships only its NON-ZERO entries (the r7 advisor's large-B path).

    Output column ``features`` is a struct<type tinyint, size int,
    indices array<int>, values array<double>> with type=0 — byte-for-byte
    the layout ``pyspark.ml.functions.unwrap_udt`` produces for a sparse
    VectorUDT, so the barrier training kernel's CSR assembler
    (``core._csr_from_unwrapped``) consumes it as-is: featurize → Arrow →
    csr_matrix with no dense materialization anywhere. (A native VectorUDT
    column cannot be built without a row-at-a-time Python UDF — Arrow
    rejects the UDT — which is exactly the hot-path cost this layout
    avoids; MLlib consumers at small B use :func:`hashed_bow_vectors`.)

    Identical counts to :func:`hashed_bow` by construction (same bucket
    expression); sorting before the fold keeps indices strictly
    increasing, as CSR requires.

    Construction note: counts come from a single run-length ``aggregate``
    pass over the SORTED bucket array — not a per-distinct-element
    ``filter`` count, which would embed the md5 bucket chain inside a
    lambda body where codegen subexpression elimination cannot reach it
    (re-hashing every token once per distinct bucket). The fold touches
    each token once; its accumulator-array copying is O(tokens ×
    distinct) cheap element moves, still independent of B."""
    sorted_b = F.array_sort(
        F.transform(_tokens(text_col), lambda t: bucket_of(t, n_buckets))
    )
    runs = F.aggregate(
        sorted_b,
        F.expr(
            "struct(CAST(array() AS array<int>) AS i,"
            " CAST(array() AS array<double>) AS v)"
        ),
        lambda acc, x: F.when(
            (F.size(acc["i"]) > 0) & (F.element_at(acc["i"], -1) == x),
            F.struct(
                acc["i"].alias("i"),
                F.concat(
                    F.slice(acc["v"], 1, F.size(acc["v"]) - 1),
                    F.array(F.element_at(acc["v"], -1) + F.lit(1.0)),
                ).alias("v"),
            ),
        ).otherwise(
            F.struct(
                F.concat(acc["i"], F.array(x)).alias("i"),
                F.concat(acc["v"], F.array(F.lit(1.0))).alias("v"),
            )
        ),
    )
    # two-step select: __runs is referenced twice below; CollapseProject
    # keeps multiply-referenced non-cheap aliases in their own projection,
    # and even if a future planner inlines it the cost is a bounded 2x
    base = df.select(F.col(id_col), runs.alias("__runs"))
    return base.select(
        F.col(id_col),
        F.struct(
            F.lit(0).cast("tinyint").alias("type"),
            F.lit(n_buckets).alias("size"),
            F.col("__runs.i").alias("indices"),
            F.col("__runs.v").alias("values"),
        ).alias("features"),
    )
