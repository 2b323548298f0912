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
what a 100 TB featurize job has to do.
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
    of how the counts are built; that regime belongs to :func:`hashed_bow`
    (the sparse COO relational form — one shuffle, output sized by
    NON-ZERO entries), so this function refuses rather than degrade."""
    from pyspark.ml.functions import array_to_vector

    if n_buckets > 4096:
        raise ValueError(
            f"hashed_bow_vectors: dense build is for small B (got "
            f"{n_buckets} > 4096); use hashed_bow's sparse COO layout"
        )
    buckets = F.transform(_tokens(text_col), lambda t: bucket_of(t, n_buckets))
    counts = F.transform(
        F.sequence(F.lit(0), F.lit(n_buckets - 1)),
        lambda b: F.size(F.filter(buckets, lambda x: x == b)).cast("double"),
    )
    return df.select(
        F.col(id_col), array_to_vector(counts).alias("features")
    )
