"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Query set spans the engine's surface: columnar scan+agg, broadcast joins,
windows, sessionization, as-of join, MinHash-LSH dedup, SimHash, KNN.
Timings are end-to-end per query (plan build + execution to toPandas),
session warm.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dask_lightgbm_spark.queries import all_queries  # noqa: E402
from dask_lightgbm_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q01_pricing_summary",
    "q04_join_nation_revenue",
    "q06_window_topk_per_customer",
    "q14_events_hourly",
    "q15_sessionize",
    "q18_shipping_priority",
    "q21_asof_join",
    "q28_session_window",
    "q33_percentiles",
    "q36_merge_upsert",
    "t05_minhash_lsh_neardup",
    "t06_simhash",
    "s01_knn_bruteforce",
    "s02_knn_ivf",
]

# DuckDB single-node baseline at sf0.1 (tools/bench_oracle.py, min-of-2,
# recorded in BASELINE.md) — the reference publishes no timings, so this is
# what "within 2×" is measured against.
DUCKDB_BASELINE = {
    "q01_pricing_summary": 0.119,
    "q04_join_nation_revenue": 0.081,
    "q06_window_topk_per_customer": 0.035,
    "q14_events_hourly": 0.019,
    "q15_sessionize": 0.020,
    "q18_shipping_priority": 0.079,
    "q21_asof_join": 0.017,
    "q28_session_window": 0.035,
    "q33_percentiles": 0.052,
    "q36_merge_upsert": 0.087,
    "t05_minhash_lsh_neardup": 4.017,
    "t06_simhash": 0.294,
    "s01_knn_bruteforce": 0.085,
    "s02_knn_ivf": 0.725,
}

# previous round's Spark timings (BENCH_r01.json) — regression fence
PREV_ROUND = {
    "q01_pricing_summary": 0.80,
    "q04_join_nation_revenue": 0.89,
    "q06_window_topk_per_customer": 0.42,
    "q14_events_hourly": 0.38,
    "q15_sessionize": 0.35,
    "q18_shipping_priority": 0.66,
    "q21_asof_join": 0.43,
    "q28_session_window": 0.39,
    "q33_percentiles": 0.30,
    "q36_merge_upsert": 0.49,
    "t05_minhash_lsh_neardup": 2.68,
    "t06_simhash": 0.45,
    "s01_knn_bruteforce": 0.53,
    "s02_knn_ivf": 2.10,
}


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark("bench", cpus=cpus, shuffle_partitions=cpus)
    qs = all_queries()

    # warm the JVM, codegen, and parquet footers of every table touched
    from dask_lightgbm_spark.sources.readers import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).count()
    qs["q05_top_orders"](spark, sf_dir).collect()

    # min of 3 runs per query: first run pays plan-compile + page-cache
    # warmup; min reflects steady-state throughput. Three (not two) because
    # this host's available CPU fluctuates between rounds by up to ~1.7×
    # (identical code measured 10.7 s and 15.6 s an hour apart) — min-of-3
    # rejects most of that noise.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        best, n = None, 0
        for _ in range(3):
            t0 = time.time()
            n = len(qs[name](spark, sf_dir).toPandas())
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]:.2f}s ({n} rows)", file=sys.stderr)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    total = round(sum(timings.values()), 3)
    at_sf01 = abs(float(sf) - 0.1) < 1e-9 if sf.replace(".", "").isdigit() else False
    vs_duckdb = (
        {n: round(timings[n] / DUCKDB_BASELINE[n], 2) for n in timings if n in DUCKDB_BASELINE}
        if at_sf01
        else {}
    )
    regressions = (
        [n for n in timings if n in PREV_ROUND and timings[n] > 2 * PREV_ROUND[n]]
        if at_sf01
        else []
    )
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if at_sf01:
        out["vs_duckdb_total"] = round(total / sum(DUCKDB_BASELINE.values()), 2)
        out["vs_duckdb"] = vs_duckdb
        out["vs_prev_round_total"] = round(total / sum(PREV_ROUND.values()), 2)
        out["regressions_vs_prev"] = regressions
    print(json.dumps(out))
    if "--enforce" in sys.argv and at_sf01:
        if total > 2 * sum(PREV_ROUND.values()) or regressions:
            print(f"REGRESSION: total={total}s regressions={regressions}", file=sys.stderr)
            sys.exit(1)


if __name__ == "__main__":
    main()
