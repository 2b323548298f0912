"""MERGE INTO emulation (CDC upsert) without a table format.

Delta/Iceberg own real MERGE; on plain parquet the scalable emulation is a
full-outer join on the key with COALESCE per column:

- matched rows take the update's values,
- unmatched-target rows pass through,
- unmatched-update rows are inserts.

One shuffle on the key for each side; at scale the win is bucketing both
target and updates on the key (sources/writers.write_parquet partitioning +
bucketBy) so the join co-locates without a shuffle. SCD2 (history-keeping)
falls out by unioning the superseded target rows with an end-date stamp
instead of dropping them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """Upsert ``updates`` into ``target`` on ``key``: update-else-insert,
    keep unmatched target rows. Columns must match.

    Contract (inherent to the COALESCE formulation; a table format's MERGE
    relaxes both): (1) a NULL in an update column means "keep the target's
    value", so an update cannot set a column TO NULL — use a sentinel and a
    post-pass if that's needed; (2) ``updates`` must be unique on ``key``
    (duplicate update keys would each pair with the target row and emit
    duplicates — dedupe upstream, e.g. keep the latest by version)."""
    assert set(target.columns) == set(updates.columns), "schemas must align"
    t = target.alias("t")
    u = updates.alias("u")
    cols = [
        F.coalesce(F.col(f"u.{c}"), F.col(f"t.{c}")).alias(c)
        for c in target.columns
    ]
    return t.join(u, F.col(f"t.{key}") == F.col(f"u.{key}"), "full_outer").select(*cols)


def merge_cdc(
    target: DataFrame, changes: DataFrame, key: str, op_col: str = "op"
) -> DataFrame:
    """Full CDC MERGE: apply a change feed with upserts AND deletes.
    ``changes`` carries ``op_col`` ∈ {'U' (update-or-insert), 'D' (delete,
    data columns ignored)}. Delete = left-anti join on the tombstone keys
    (one shuffle), then the upserts go through :func:`merge_upsert`'s
    full-outer COALESCE. Same inherited contracts as merge_upsert, plus:
    a key appearing with both 'D' and 'U' applies delete-then-upsert
    (i.e. the 'U' row inserts fresh), matching MERGE's matched-clause
    ordering WHEN MATCHED AND op='D' THEN DELETE before UPDATE."""
    dels = changes.filter(F.col(op_col) == "D").select(key)
    ups = changes.filter(F.col(op_col) != "D").drop(op_col)
    kept = target.join(dels, key, "left_anti")
    return merge_upsert(kept, ups, key)
