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


def test_gate_order_puts_newest_queries_first():
    """The external driver's correctness gate caps at ~50 queries per round
    and runs them in all_queries() order — the rotation contract is that
    every never-driver-verified name in _GATE_FIRST leads, followed by the
    relational block (r01-only coverage), with r02-verified t/s/x last."""
    from dask_lightgbm_spark.queries import _GATE_FIRST, all_oracles, all_queries

    names = list(all_queries())
    assert names[: len(_GATE_FIRST)] == _GATE_FIRST
    rest = names[len(_GATE_FIRST):]
    kinds = [n[0] for n in rest]
    # q-block before t/s/x blocks
    assert kinds.index("t") > max(i for i, k in enumerate(kinds) if k == "q")
    # oracle map is ordered the same way
    ok = [n for n in all_oracles() if n in set(_GATE_FIRST)]
    assert ok == [n for n in _GATE_FIRST if n in all_oracles()]
