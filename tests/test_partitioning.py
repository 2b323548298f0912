"""Unit tests for the partitioning/skew utilities the r8 scale guards are
built on (functions/partitioning.py)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dask_lightgbm_spark.functions.partitioning import (
    ensure_parallelism,
    grouped_topk,
    key_skew_stats,
    salted_sum_count,
    with_salt,
)


def test_ensure_parallelism_spreads_narrow_input(spark):
    # big plan stats (range = 8 bytes/row -> ~800 MB) + one partition ->
    # spread to every core
    one = spark.range(100_000_000).coalesce(1)
    assert one.rdd.getNumPartitions() == 1
    spread = ensure_parallelism(one)
    assert (
        spread.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
    # values survive the round-robin spread (small frame for the data check)
    small = ensure_parallelism(spark.range(1000).coalesce(1), min_parts=4)
    assert small.count() == 1000
    assert small.agg(F.sum("id")).first()[0] == 999 * 1000 // 2


def test_ensure_parallelism_is_size_adaptive(spark):
    # a tiny input stays unspread: exchanging 1k rows to 32 partitions
    # costs more than the work it would parallelize
    tiny = spark.range(1000).coalesce(1)
    assert ensure_parallelism(tiny) is tiny
    # mid-size input gets ceil(bytes / bytes_per_task) partitions:
    # range stats are 8 bytes/row -> 1M rows = 8 MB -> 8 tasks at the
    # 1 MiB default (deterministic: Range reports exact size)
    cap = spark.sparkContext.defaultParallelism
    mid = spark.range(1_000_000).coalesce(1)
    expect = min(cap, 8)
    assert ensure_parallelism(mid).rdd.getNumPartitions() == expect


def test_ensure_parallelism_bytes_per_task_env(spark, monkeypatch):
    # cluster knob: shrinking the per-task byte budget widens the spread
    monkeypatch.setenv("SPARK_GRAFT_SPREAD_TASK_BYTES", "1000")
    cap = spark.sparkContext.defaultParallelism
    out = ensure_parallelism(spark.range(1_000_000).coalesce(1))
    assert out.rdd.getNumPartitions() == cap


def test_ensure_parallelism_bytes_per_task_hint(spark):
    # caller cost hint: a smaller per-task byte budget widens the spread
    # for the same input (simhash's interpreted fold passes 16 KiB; pin
    # the mechanism at the same scale: 8 MB est / 1 MiB -> 8, / 256 KiB
    # -> 32-capped)
    cap = spark.sparkContext.defaultParallelism
    mid = spark.range(1_000_000).coalesce(1)
    dflt = ensure_parallelism(mid).rdd.getNumPartitions()
    hinted = ensure_parallelism(
        mid, bytes_per_task=256 << 10
    ).rdd.getNumPartitions()
    assert dflt == min(cap, 8)
    assert hinted == min(cap, 32)
    assert hinted >= dflt


def test_simhash_spread_uses_cost_hint(spark):
    # the simhash operator spreads ~20x wider than the default policy for
    # the same bytes: a one-partition ~1.6 MB text frame would get 2 tasks
    # at the 1 MiB default but simhash's 16 KiB hint asks for ~100 (capped
    # at defaultParallelism). Regression guard for the t06 sf1 serialization
    # (1.44 s at 3 tasks vs 0.77 s wide).
    from dask_lightgbm_spark.functions.partitioning import _plan_size_bytes
    from dask_lightgbm_spark.operators.dedup import simhash

    df = spark.createDataFrame(
        [(i, "tok%d alpha beta gamma delta" % i) for i in range(20_000)],
        "doc_id long, text string",
    ).coalesce(1)
    est = _plan_size_bytes(df)
    assert est is not None and est > (1 << 20)  # premise: > 1 default task
    cap = spark.sparkContext.defaultParallelism
    out = simhash(df, "doc_id", "text")
    expect = min(cap, -(-est // (16 << 10)))
    assert out.rdd.getNumPartitions() == expect
    # and wider than the un-hinted policy would give
    assert expect > -(-est // (1 << 20)) or expect == cap


def test_ensure_parallelism_noop_on_wide_input(spark):
    target = spark.sparkContext.defaultParallelism
    wide = spark.range(1000).repartition(target + 2)
    out = ensure_parallelism(wide)
    assert out is wide  # untouched, not just same partition count


def test_ensure_parallelism_respects_min_parts(spark):
    out = ensure_parallelism(spark.range(100).coalesce(1), min_parts=3)
    assert out.rdd.getNumPartitions() == 3


def test_with_salt_is_deterministic_and_bounded(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2, 3, 1], "v": ["a", "b", "c", "a"]})
    )
    s1 = with_salt(df, 4, ["k", "v"]).toPandas().sort_values(["k", "v"])
    s2 = with_salt(df, 4, ["k", "v"]).toPandas().sort_values(["k", "v"])
    assert list(s1["__salt"]) == list(s2["__salt"])  # retry-stable
    assert s1["__salt"].between(0, 3).all()
    # identical rows get identical salt (hash of the row's columns)
    dup = s1[(s1.k == 1) & (s1.v == "a")]["__salt"]
    assert dup.nunique() == 1


def test_salted_sum_count_equals_plain_groupby(spark):
    pdf = pd.DataFrame({"k": [1, 1, 2, 2, 2, 3], "x": [10, 20, 1, 2, 3, 7]})
    df = spark.createDataFrame(pdf)
    got = {
        r.k: (r.sum_x, r.n_rows)
        for r in salted_sum_count(df, ["k"], "x", n_salt=3).collect()
    }
    exp = {
        k: (int(sub.x.sum()), len(sub)) for k, sub in pdf.groupby("k")
    }
    assert got == exp


def test_grouped_topk_requires_nothing_beyond_k_rows_per_group(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"g": ["a"] * 50 + ["b"] * 3, "id": range(53)})
    )
    out = grouped_topk(
        df, ["g"], [F.asc("id")], 4, salt_on=["id"], n_salt=8
    ).toPandas()
    assert sorted(out[out.g == "a"]["id"]) == [0, 1, 2, 3]
    assert sorted(out[out.g == "b"]["id"]) == [50, 51, 52]  # fewer than k
    assert set(out["__rank"]) <= {1, 2, 3, 4}


def test_key_skew_stats_global_and_grouped(spark):
    pdf = pd.DataFrame(
        {"src": ["x"] * 6 + ["y"] * 4, "key": [1, 1, 1, 1, 2, 3, 7, 8, 9, 9]}
    )
    df = spark.createDataFrame(pdf)
    g = {r.src: r for r in key_skew_stats(df, ["key"], by=["src"]).collect()}
    assert (g["x"].n_keys, g["x"].n_rows, g["x"].max_n) == (3, 6, 4)
    assert g["x"].skew_ratio_permille == 4 * 1000 // (6 // 3)
    assert (g["y"].n_keys, g["y"].n_rows, g["y"].max_n) == (3, 4, 2)
    # divide-before-multiply: floor-mean denominator (4 // 3 == 1)
    assert g["y"].skew_ratio_permille == 2 * 1000 // (4 // 3)
    glob = key_skew_stats(df, ["key"]).collect()
    assert len(glob) == 1
    assert (glob[0].n_keys, glob[0].n_rows, glob[0].max_n) == (6, 10, 4)


def test_key_skew_no_int64_overflow_at_scale(spark):
    """The r8 formula (max(n)*1000*count(*) div sum(n)) overflowed int64 at
    ~1e9 keys × ~1e9 max-count under Spark 4's default ANSI mode. The
    divide-first formula must survive that regime with the exact
    floor-mean value. Counts this large can't come out of a test group-by,
    so drive the split-out aggregation over a synthetic count table."""
    from dask_lightgbm_spark.functions.partitioning import _skew_from_counts

    big = 4_000_000_000  # 4e9 docs behind the heaviest key
    counts = spark.range(big_keys := 4).select(
        F.when(F.col("id") == 0, F.lit(big))
        .otherwise(F.lit(big - 7))
        .cast("long")  # the real counts column is long (F.count)
        .alias("n")
    )
    # inflate key cardinality with 4e6 lighter keys
    counts = counts.unionByName(
        spark.range(4_000_000).select(F.lit(big // 2).cast("long").alias("n"))
    )
    row = _skew_from_counts(counts, []).collect()[0]
    n_keys = big_keys + 4_000_000
    n_rows = big + (big - 7) * 3 + (big // 2) * 4_000_000
    assert row.n_keys == n_keys and row.n_rows == n_rows and row.max_n == big
    assert row.skew_ratio_permille == big * 1000 // (n_rows // n_keys)
    # sanity: the OLD formula's intermediate would have overflowed here
    assert big * 1000 * n_keys > 2**63 - 1


def test_with_salt_rejects_nothing_but_produces_range(spark):
    with pytest.raises(Exception):
        # empty cols list hashes nothing — Spark rejects hash() with 0 args
        with_salt(spark.range(3), 4, []).collect()
