"""Sinks: parquet (partitioned — the layout that makes partition pruning
work at 100 TB), CSV (gzip), JSON. Thin, explicit wrappers over
``DataFrameWriter`` so callers state intent (partition columns, mode)
instead of re-deriving writer chains."""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Columnar sink. ``partition_by`` produces hive-style directories that
    Spark prunes on read (assert with plans.explain.scan_columns /
    PartitionFilters)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv_gzip(df: DataFrame, path: str, header: bool = True, mode: str = "overwrite") -> None:
    """Gzip CSV sink — the reference's interchange format (B1)."""
    (
        df.write.mode(mode)
        .option("header", str(header).lower())
        .option("compression", "gzip")
        .csv(path)
    )


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: joins/aggregations on ``bucket_cols`` between
    tables bucketed the same way run with ZERO exchanges — the co-location
    strategy that replaces per-query shuffles for 100 TB fact-fact joins.
    Requires a session with a warehouse dir (bucketing metadata lives in the
    catalog, not the parquet files)."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)
