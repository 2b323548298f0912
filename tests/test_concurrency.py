"""Concurrent-query isolation: a shared SparkSession serving several
catalog queries AT ONCE (the service regime — notebooks, a query
endpoint, an orchestrator fanning out) must return exactly the results
of sequential execution. This exercises what single-threaded suites
never do: simultaneous job submission on one SparkContext, concurrent
first-touch of the session-level index/centroid caches (s02/t34), and
parallel temp-view/sink naming."""

from concurrent.futures import ThreadPoolExecutor

from dask_lightgbm_spark.queries import all_queries

# read-only representatives across families: relational (agg, broadcast
# join, TPC-H), window battery, text/LSH, ANN (session-cached IVF index),
# capped SemDeDup (session-cached centroids). Sink-writing queries are
# excluded on purpose — their output paths are per-sf_dir, so concurrent
# SAME-query runs would race the directory, which is not a claim the
# engine makes (each writes exactly-once per invocation).
NAMES = [
    "q01_pricing_summary",
    "q04_join_nation_revenue",
    "q33_percentiles",
    "q45_window_functions",
    "q58_tpch_q5_local_supplier",
    "t05_minhash_lsh_neardup",
    "t09_text_quality",
    "s01_knn_bruteforce",
    "s02_knn_ivf",
    "t34_semantic_dedup",
]


def _rows(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(str(r[c]) for c in cols) for r in df.collect()
    )


def test_concurrent_queries_match_sequential(spark, sf_dir):
    qs = all_queries()
    sequential = {n: _rows(qs[n](spark, sf_dir)) for n in NAMES}

    def run(name):
        return name, _rows(qs[name](spark, sf_dir))

    with ThreadPoolExecutor(max_workers=6) as pool:
        concurrent = dict(pool.map(run, NAMES))

    for n in NAMES:
        assert concurrent[n] == sequential[n], n


def test_concurrent_first_touch_of_session_caches(spark, sf_dir):
    """The nastier ordering: the session-level IVF/centroid caches are
    built on FIRST touch — hit the same cache-building query from several
    threads at once on a fresh cache and require identical results from
    every thread (a torn cache write or a half-built index would differ)."""
    from dask_lightgbm_spark.session import release_caches

    qs = all_queries()
    release_caches(spark)  # force every thread through the build path

    def run(i):
        return _rows(qs["s02_knn_ivf"](spark, sf_dir))

    with ThreadPoolExecutor(max_workers=4) as pool:
        results = list(pool.map(run, range(4)))
    assert all(r == results[0] for r in results[1:])
    # and the cache that emerged serves the same answer afterwards
    assert _rows(qs["s02_knn_ivf"](spark, sf_dir)) == results[0]
