"""Time the DuckDB oracle SQL for bench.py's headline queries — this is the
single-node baseline BASELINE.md's "within 2x" gate is measured against
(the reference repo publishes no numbers of its own, so DuckDB running the
semantically-identical SQL on the same parquet is the honest stand-in).

bench.py now times DuckDB itself in the same invocation (``duckdb_live``)
so the recorded ratio is window-normalized; this standalone entry point
remains for ad-hoc baseline capture and shares bench.time_duckdb
(min-of-3, same as the Spark side — a min-of-2/min-of-3 asymmetry would
systematically flatter Spark on a host with ~1.7x CPU jitter).

Usage: python tools/bench_oracle.py [sf_dir]   # default /root/testdata/sf0.1
Prints one JSON line {"queries": {name: sec}, "total": sec, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, time_duckdb  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    timings = time_duckdb(sf_dir, HEADLINE)
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
