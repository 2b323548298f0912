"""As-of join — an operator Spark lacks natively, composed from built-in
DataFrame ops (no UDFs, fully codegen'd, one shuffle).

Strategy (the scalable union + running-aggregate trick): tag right rows with
their carried value, union with left rows, then a running ``max`` window per
``by``-key ordered by the as-of key picks, for every left row, the latest
right value at-or-before it. Cost: one shuffle on ``by`` + one sort within
partitions — no range cross-product, no per-key collect, skew handled by AQE.
This scales to arbitrarily many right rows per key, unlike the
``pd.merge_asof``-per-group alternative which needs whole groups in memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_col: str,
    out_col: str,
    direction: str = "backward",
) -> DataFrame:
    """For each ``left`` row, attach the ``value_col`` of the ``right`` row
    with the greatest ``on`` ≤ left's ``on`` (direction='backward') or the
    smallest ``on`` ≥ left's ``on`` (direction='forward'); ties on ``on``
    count as matches, within the same ``by`` group.

    'forward' is the mirror image: the scan order flips and the running
    last() picks the nearest-following right value. If multiple right rows
    share the same ``on`` within a group, which one wins is tie-ambiguous
    (as in pd.merge_asof) — dedupe the right side on (by, on) for
    deterministic results.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")

    carried = "__asof_carry"
    # kind: right=0 sorts before left=1 at equal `on` → ties match
    r = right.select(
        F.col(by), F.col(on), F.lit(0).alias("__kind"), F.col(value_col).alias(carried)
    )
    left_cols = left.columns
    l = left.select(
        *left_cols,
        F.lit(1).alias("__kind"),
        F.lit(None).cast(right.schema[value_col].dataType).alias(carried),
    )
    # align schemas for union: right side gets nulls for left-only columns
    for c in left_cols:
        if c not in (by, on):
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = l.select(*left_cols, "__kind", carried).unionByName(
        r.select(*left_cols, "__kind", carried)
    )
    # last(ignorenulls) picks the value of the NEAREST right row in frame
    # order — correct for arbitrary carried values (a running max/min would
    # only coincide when the carried value is monotone in `on`).
    order = (
        [F.col(on).asc(), F.col("__kind").asc()]
        if direction == "backward"
        # descending scan: the last right seen is the earliest at-or-after
        # (right still sorts before left at equal `on` → ties match)
        else [F.col(on).desc(), F.col("__kind").asc()]
    )
    w = W.partitionBy(by).orderBy(*order).rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        u.withColumn(out_col, F.last(carried, ignorenulls=True).over(w))
        .filter(F.col("__kind") == 1)
        .drop("__kind", carried)
    )
