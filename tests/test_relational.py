"""Differential tests vs the DuckDB oracle at sf0.001 (fast spot-checks;
tools/check.py runs the full catalog at sf0.01 — the reference's
differential-testing pattern, SURVEY.md §5)."""

import duckdb
import pytest

from dask_lightgbm_spark.queries import all_oracles, all_queries
from dask_lightgbm_spark.sources.readers import TABLES
from tools.check import compare

SPOT = [
    "q01_pricing_summary",
    "q04_join_nation_revenue",
    "q06_window_topk_per_customer",
    "q10_rollup",
    "q15_sessionize",
    "q21_asof_join",
    "t05_minhash_lsh_neardup",
    "t06_simhash",
    "s01_knn_bruteforce",
    "s04_vector_stats",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


@pytest.mark.parametrize("name", SPOT)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    qs, oracles = all_queries(), all_oracles()
    spark_pdf = qs[name](spark, sf_dir).toPandas()
    duck_pdf = duck.sql(oracles[name]).df()
    problems = compare(name, spark_pdf, duck_pdf)
    assert not problems, problems


def test_catalog_contract():
    """Every oracle key has a query; every query is callable."""
    qs, oracles = all_queries(), all_oracles()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 40


def test_entry_smoke(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_gate_order_staleness_contract():
    """The external driver's correctness gate caps at ~50 queries per round
    and runs them in all_queries() order. The rotation contract: every
    query absent from the LATEST committed CORRECTNESS round gates first,
    ordered oldest-verification-first (ties by position in that round's
    file), so no query's driver verification ages past 2 rounds. This test
    recomputes the ordering from the CORRECTNESS_r*.json files — when a new
    round's results land, it fails until _GATE_FIRST is re-rotated."""
    import glob
    import json
    import os
    import re

    from dask_lightgbm_spark.queries import _GATE_FIRST, all_oracles, all_queries

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, int] = {}
    pos: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        for i, (q, rec) in enumerate(json.load(open(f)).items()):
            # only a hash-matched run counts as verification: a rows-only
            # record (err=no_oracle) is the weaker check, so a query that
            # since gained an oracle re-gates as if never verified
            if rec.get("hash_match"):
                latest[q] = rnd
                pos[q] = i
    newest = max(latest.values())
    stale = sorted(
        (q for q in latest if latest[q] < newest),
        key=lambda q: (latest[q], pos[q]),
    )
    names = list(all_queries())
    assert names[: len(_GATE_FIRST)] == _GATE_FIRST
    # brand-new queries with no verification at all lead, then every query
    # missing from the latest round, oldest verification first
    unverified = [n for n in names if n not in latest]
    assert set(unverified) <= set(_GATE_FIRST), (
        f"never-driver-verified queries must gate first: "
        f"{sorted(set(unverified) - set(_GATE_FIRST))}"
    )
    first_unver = [q for q in _GATE_FIRST if q not in latest]
    first_stale = [q for q in _GATE_FIRST if q in latest]
    assert _GATE_FIRST == first_unver + first_stale
    assert first_stale == [q for q in stale if q in names], (
        "gate rotation out of date vs committed CORRECTNESS_r*.json: "
        "re-rotate _GATE_FIRST oldest-verification-first"
    )
    # oracle map is ordered the same way
    ok = [n for n in all_oracles() if n in set(_GATE_FIRST)]
    assert ok == [n for n in _GATE_FIRST if n in all_oracles()]
    # freshness SLO (r12 verdict #8): with ~50 driver slots per round the
    # rotation clears the oldest block every round, so no query's latest
    # hash-matched verification may age past MAX_STALENESS rounds. A round
    # that samples fewer queries fails here instead of silently aging the
    # tail.
    from tools.gen_gate import MAX_STALENESS

    overdue = sorted(q for q in latest if latest[q] < newest - MAX_STALENESS)
    assert not overdue, (
        f"freshness SLO breach: {len(overdue)} queries last driver-verified "
        f"before r{newest - MAX_STALENESS}: {overdue[:10]}"
    )


def test_pagerank_int_hand_computed(spark):
    """2-node cycle is a fixed point (rank stays 1e6); 3-node star
    concentrates mass in the hub by hand-computable integer amounts."""
    from dask_lightgbm_spark.operators.pagerank import pagerank_int

    cycle = spark.createDataFrame([("a", "b"), ("b", "a")], ["src", "dst"])
    got = {r["node"]: r["rank"] for r in pagerank_int(cycle, 3).collect()}
    assert got == {"a": 1_000_000, "b": 1_000_000}

    # hub h <-> leaves x,y: deg(h)=2, deg(x)=deg(y)=1
    star = spark.createDataFrame(
        [("h", "x"), ("h", "y"), ("x", "h"), ("y", "h")], ["src", "dst"]
    )
    r1 = {r["node"]: r["rank"] for r in pagerank_int(star, 1).collect()}
    # h: 150000 + 85*(1e6 + 1e6)//100 ; x,y: 150000 + 85*(1e6//2)//100
    assert r1 == {"h": 1_850_000, "x": 575_000, "y": 575_000}
    r2 = {r["node"]: r["rank"] for r in pagerank_int(star, 2).collect()}
    assert r2 == {
        "h": 150_000 + (85 * (575_000 + 575_000)) // 100,
        "x": 150_000 + (85 * (1_850_000 // 2)) // 100,
        "y": 150_000 + (85 * (1_850_000 // 2)) // 100,
    }

    with pytest.raises(ValueError):
        pagerank_int(cycle, 0)


def test_q54_empty_orders_degrades_gracefully(spark, sf_dir, tmp_path):
    """Empty orders → MIN/MAX bounds are NULL. The literal-inlined spine
    must degrade exactly like the oracle's subquery form: one anchor row
    with a NULL month (recursion predicate m < NULL stops immediately),
    zero counts — not an AttributeError on None.strftime (r11 advisor)."""
    from dask_lightgbm_spark.queries.relational import q54_recursive_date_spine
    from dask_lightgbm_spark.sources.readers import load_table

    empty_dir = tmp_path / "sf_empty"
    empty_dir.mkdir()
    load_table(spark, sf_dir, "orders").limit(0).write.parquet(
        str(empty_dir / "orders.parquet")
    )
    rows = q54_recursive_date_spine(spark, str(empty_dir)).collect()
    assert len(rows) == 1
    assert rows[0]["month"] is None
    assert rows[0]["n_orders"] == 0 and rows[0]["rev_cents"] == 0
