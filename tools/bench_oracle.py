"""Time the DuckDB oracle SQL for bench.py's headline queries — this is the
single-node baseline BASELINE.md's "within 2×" gate is measured against
(the reference repo publishes no numbers of its own, so DuckDB running the
semantically-identical SQL on the same parquet is the honest stand-in).

Usage: python tools/bench_oracle.py [sf_dir]   # default /root/testdata/sf0.1
Prints one JSON line {"queries": {name: sec}, "total": sec, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from dask_lightgbm_spark.queries import all_oracles  # noqa: E402
from dask_lightgbm_spark.sources.readers import TABLES  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = all_oracles()

    timings = {}
    for name in HEADLINE:
        sql = oracles.get(name)
        if sql is None:
            timings[name] = None
            continue
        best = None
        for _ in range(2):  # min-of-2, mirroring bench.py
            t0 = time.time()
            con.sql(sql).df()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        print(f"# {name}: {best:.2f}s", file=sys.stderr)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "queries": timings,
                "total": round(sum(v for v in timings.values() if v), 3),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
