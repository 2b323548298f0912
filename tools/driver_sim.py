"""Full driver simulation: import __spark_entry__ the way the external
driver does (repo on sys.path, arbitrary cwd, UNTUNED default SparkSession),
run every query at sf0.01 against its oracle, and report. Catches anything
that silently depends on our session factory, cwd, or config.

Usage: python tools/driver_sim.py [sf_dir] [--passes N]

``--passes 2`` is the SOAK/service-regime gate (r11 verdict task 5): the
full catalog runs N times in ONE JVM with ``release_caches`` between
passes — the long-lived-session shape where the r11 t39 investigation
showed lingering cached blocks starving successor queries. The gate
asserts (a) every pass is oracle-green, (b) pass-N total wall time is
<= 1.2x pass-1 (no cross-pass state accumulation tax; warm passes are
usually FASTER), and (c) at end, after release, the JVM holds ZERO
persistent RDDs and an EMPTY CacheManager — nothing any query persisted
outlives its pass."""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

os.chdir("/tmp")  # deliberately NOT the repo

import __spark_entry__ as E  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

from dask_lightgbm_spark.sources.readers import TABLES  # noqa: E402
from tools.check import compare  # noqa: E402


def run_pass(spark, con, qs, oracles, sf_dir):
    """One full-catalog pass; returns (n_pass, n_fail, timings, total_s)."""
    n_pass = n_fail = 0
    timings: dict[str, float] = {}
    t_total = time.time()
    for name in sorted(qs):
        t0 = time.time()
        try:
            sp = qs[name](spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark raised {type(exc).__name__}: {exc}")
            n_fail += 1
            continue
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        if name not in oracles:
            print(f"PASS {name} (rows-only: {len(sp)}, {dt:.1f}s)")
            n_pass += 1
            continue
        du = con.sql(oracles[name]).df()
        problems = compare(name, sp, du)
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sp)} rows, {dt:.1f}s)")
            n_pass += 1
    return n_pass, n_fail, timings, time.time() - t_total


def _leak_counts(spark) -> tuple[int, bool]:
    """(persistent RDD count, CacheManager empty?) straight from the JVM —
    the ground truth the soak gate asserts on, not our registry's view."""
    jsc = spark.sparkContext._jsc.sc()
    n_rdds = jsc.getPersistentRDDs().size()
    cache_empty = bool(
        spark._jsparkSession.sharedState().cacheManager().isEmpty()
    )
    return int(n_rdds), cache_empty


def main():
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--passes", type=int, default=1)
    cli = ap.parse_args()
    passes, sf_dir = cli.passes, cli.sf_dir
    # deliberately default config — the driver owns its session.
    # SPARK_GRAFT_SIM_MASTER overrides the master for the multi-process
    # variant of the simulation (e.g. local-cluster[2,2,1024] runs the full
    # catalog across two real executor JVMs; the extra confs are the
    # executor plumbing local-cluster needs and local[8] ignores).
    master = os.environ.get("SPARK_GRAFT_SIM_MASTER", "local[8]")
    builder = SparkSession.builder.master(master).appName("driver-sim")
    if master.startswith("local-cluster"):
        builder = (
            builder.config("spark.executor.memory", "1500m")
            .config("spark.driver.memory", "2g")
            .config(
                "spark.executorEnv.PYTHONPATH",
                REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
            )
        )
    spark = builder.getOrCreate()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    entry_rows = E.entry(spark).collect()
    print(f"entry: {len(entry_rows)} rows")

    qs, oracles = E.queries(), E.oracle_sql()
    from dask_lightgbm_spark.session import release_caches

    n_pass = n_fail = 0
    timings: dict[str, float] = {}
    totals: list[float] = []
    soak_fail: list[str] = []
    for p in range(passes):
        if p:
            rel = release_caches(spark)
            print(f"\n--- pass {p + 1}/{passes} (released: {rel}) ---")
        n_pass, n_fail, pass_timings, total_s = run_pass(
            spark, con, qs, oracles, sf_dir
        )
        if p == 0:
            timings = pass_timings  # census always records the COLD pass
        totals.append(total_s)
        print(f"\n{n_pass} passed, {n_fail} failed in {total_s:.0f}s total")
        if n_fail:
            soak_fail.append(f"pass {p + 1}: {n_fail} query failures")
    if passes > 1:
        ratio = totals[-1] / totals[0]
        print(f"soak: pass totals {[round(t, 1) for t in totals]}, "
              f"pass-{passes}/pass-1 = {ratio:.2f}")
        if ratio > 1.2:
            soak_fail.append(f"pass-{passes} total {ratio:.2f}x pass-1 (> 1.2x)")
        rel = release_caches(spark)
        n_rdds, cache_empty = _leak_counts(spark)
        print(f"soak: final release {rel}; persistent RDDs {n_rdds}, "
              f"cacheManager empty {cache_empty}")
        if n_rdds or not cache_empty:
            soak_fail.append(
                f"leaked state after release: {n_rdds} persistent RDDs, "
                f"cacheManager empty={cache_empty}"
            )
        if soak_fail:
            print("SOAK FAIL: " + "; ".join(soak_fail))
        else:
            print(f"SOAK PASS ({passes} passes)")
        n_fail = n_fail or len(soak_fail)
    census = os.environ.get("SPARK_GRAFT_CENSUS")
    if census:
        # per-query wall times for tools/census.py — the full-catalog
        # timing census (r10 verdict task 5: only the benched ~25 queries
        # were ever wall-timed; this captures the other 163 from the run
        # the certification does anyway)
        import json

        with open(census, "w") as fh:
            json.dump({"sf_dir": sf_dir, "master": master, "timings": timings}, fh)
        print(f"census written: {census} ({len(timings)} queries)")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
