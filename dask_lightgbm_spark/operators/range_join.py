"""Binned interval range join — the scale pattern for joins whose only
predicate is a range containment (no equi key).

A naive ``left.join(right, right.t BETWEEN left.start AND left.end)`` plans
as BroadcastNestedLoopJoin (O(|L|·|R|) comparisons, one broadcast side) —
a scale-killer at 100 TB. The standard rewrite turns the range predicate
into an equi key: quantize time into fixed-width bins, explode each
interval into every bin it overlaps, map each point to its single bin,
hash-join on the bin id, then re-check the exact bounds. Each point lands
in exactly one bin, so every qualifying pair is produced exactly once — no
dedup pass needed. Cost: one shuffle on bin id + an explode whose factor is
``interval_width / bin_width + 1`` (pick bin_width ≈ the typical interval
length to keep it ~2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def binned_interval_join(
    intervals: DataFrame,
    points: DataFrame,
    start_col: str,
    end_col: str,
    t_col: str,
    bin_width_sec: int,
) -> DataFrame:
    """Inner-join ``points`` rows to every ``intervals`` row whose
    ``[start_col, end_col]`` (timestamps, inclusive) contains ``t_col``.
    Returns all columns of both inputs. Equi-join on the time bin, exact
    bounds re-checked after — semantically identical to the naive range
    join, physically a hash join."""
    # integer `div` on epoch-µs: exact (no double rounding at bin edges);
    # epochs are positive so truncation == floor
    width_us = int(bin_width_sec) * 1_000_000
    lo = F.expr(f"unix_micros({start_col}) div {width_us}L")
    hi = F.expr(f"unix_micros({end_col}) div {width_us}L")
    exploded = intervals.withColumn("__bin", F.explode(F.sequence(lo, hi)))
    binned_points = points.withColumn(
        "__bin", F.expr(f"unix_micros({t_col}) div {width_us}L")
    )
    return (
        exploded.join(binned_points, "__bin")
        .filter(
            (F.col(t_col) >= F.col(start_col)) & (F.col(t_col) <= F.col(end_col))
        )
        .drop("__bin")
    )
