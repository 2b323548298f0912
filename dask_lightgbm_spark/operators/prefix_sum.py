"""Distributed global prefix sum (cumulative sum in a total order).

The naive Spark spelling — ``SUM(x) OVER (ORDER BY k)`` with no PARTITION
BY — collapses the whole table into ONE task (Catalyst plans a single
unbounded window partition), which is the canonical 100 TB scale-killer for
sequence packing / offset assignment. This operator computes the same
values with bounded parallelism via the classic two-level scan:

1. bucket each row by a coarse range of the (numeric, unique) order key —
   bucket bounds derive from a broadcast 1-row min/max aggregate, NOT from
   ``repartitionByRange`` sampling, so bucket membership is a pure function
   of the key (deterministic across retries/cluster sizes);
2. cumsum WITHIN each bucket (parallel windows, one per bucket);
3. one tiny window over the ``n_buckets`` bucket totals produces each
   bucket's global offset (n_buckets rows on one task — trivially small);
4. broadcast-join the offsets back: global cumsum = local cumsum + offset.

Shuffle cost: one hash shuffle on the bucket id + one broadcast — versus
the single-task sort of the naive plan. Values are bit-identical to the
naive spelling because int64 addition is associative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_cumsum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cumsum",
    n_buckets: int = 32,
    key_bounds: tuple[float, float] | None = None,
) -> DataFrame:
    """Exact inclusive prefix sum of ``value_col`` in ``order_col`` order.

    Requirements: ``order_col`` is numeric and unique (a row id); values are
    integral (int64 addition keeps the result order-independent — the
    catalog's fixed-point contract). Dense keys give even buckets; heavily
    clustered keys degrade gracefully (a bucket gets more rows but the plan
    shape is unchanged).

    ``key_bounds=(lo, hi)`` skips the min/max pre-scan when the key domain
    is already known (e.g. a dense row id 0..N-1) — at 100 TB that saves a
    full extra pass over the table; bucketing only needs bounds that COVER
    the keys, so a loose hi is fine.
    """
    for reserved in ("__b", "__local", "__lo", "__hi", "__offset"):
        if reserved in df.columns:
            raise ValueError(f"input already has a {reserved} column")
    if key_bounds is not None:
        lo, hi = key_bounds
        bounds = df.sparkSession.range(1).select(
            F.lit(float(lo)).alias("__lo"), F.lit(float(hi)).alias("__hi")
        )
    else:
        bounds = df.agg(
            F.min(order_col).cast("double").alias("__lo"),
            F.max(order_col).cast("double").alias("__hi"),
        )
    span = F.col("__hi") - F.col("__lo") + F.lit(1.0)
    bucket = F.least(
        F.floor((F.col(order_col) - F.col("__lo")) * n_buckets / span),
        F.lit(n_buckets - 1),
    ).cast("int")
    bucketed = df.crossJoin(F.broadcast(bounds)).withColumn("__b", bucket).drop(
        "__lo", "__hi"
    )

    w_local = (
        Window.partitionBy("__b")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = bucketed.withColumn("__local", F.sum(value_col).over(w_local))

    # n_buckets rows — the only single-task window, by construction tiny
    w_prefix = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        bucketed.groupBy("__b")
        .agg(F.sum(value_col).alias("__tot"))
        .withColumn("__offset", F.coalesce(F.sum("__tot").over(w_prefix), F.lit(0)))
        .select("__b", "__offset")
    )

    return (
        local.join(F.broadcast(offsets), "__b")
        .withColumn(out_col, (F.col("__local") + F.col("__offset")).cast("long"))
        .drop("__b", "__local", "__offset")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    seq_len: int,
) -> DataFrame:
    """Sequence-packing layout for LLM pretraining: concatenate all docs in
    ``id_col`` order into one virtual token stream and cut it into
    ``seq_len``-token training sequences. Emits, per doc, its [start, end)
    token offsets and the range of sequence chunks it lands in — the exact
    bookkeeping a packed-dataset writer needs (which docs straddle a chunk
    boundary, how many chunks the corpus packs into).
    """
    cum = global_cumsum(df, id_col, n_tokens_col, out_col="end_tok")
    start = F.col("end_tok") - F.col(n_tokens_col)
    base = cum.select(
        F.col(id_col),
        F.col(n_tokens_col).cast("long").alias("n_tok"),
        start.cast("long").alias("start_tok"),
        F.col("end_tok"),
    )
    # chunk indices in int64 end to end: SQL `div` is exact integral
    # division (offsets are nonnegative, so trunc == floor), where
    # floor(a / b) on doubles can flip a chunk boundary past 2^53 tokens —
    # at 100 TB-corpus scale the token stream does exceed that
    sl = int(seq_len)
    first = F.expr(f"start_tok div {sl}")
    last_nonempty = F.expr(f"(end_tok - 1) div {sl}")
    return base.select(
        F.col(id_col),
        F.col("n_tok"),
        F.col("start_tok"),
        F.col("end_tok"),
        first.cast("long").alias("first_chunk"),
        F.when(F.col("n_tok") > 0, last_nonempty)
        .otherwise(first)
        .cast("long")
        .alias("last_chunk"),
        F.when(F.col("n_tok") > 0, last_nonempty - first + 1)
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_chunks"),
    )
