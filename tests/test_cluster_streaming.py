"""Two-JVM MICRO-BATCHED streaming slice: cross-batch stateful folds on
``local-cluster[2,2,1024]`` — two real executor JVMs, state stores living
on executors, real serialized exchanges between triggers.

tests/test_differential.py proves the cross-batch state folds in ONE JVM,
and the catalog cluster sim drains every x-query as a SINGLE batch across
processes — this file closes the remaining corner: per-trigger state
reload/re-fold (built-in windowed agg AND the custom
``applyInPandasWithState`` operator, the latter under the RocksDB state
store provider) where each micro-batch's state round-trips real executor
processes. Inputs are fixed deterministic literals; values are exact in
cents so the pure-Python fold is bit-equal.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (user_id, minutes_offset, value) per micro-batch; repeated users/hours
# across batches force cross-trigger state re-folds
BATCHES = [
    [(1, 0, 1.0), (2, 1, 2.5)],
    [(1, 2, 0.5), (3, 70, 1.0)],
    [(2, 75, 2.0), (1, 5, 1.0)],
]
BASE_US = 1_700_000_000_000_000

SCRIPT = f"""
import json, os, sys
sys.path.insert(0, {REPO!r})
os.chdir("/tmp")  # not the repo — mirrors the external driver

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import SparkSession

from dask_lightgbm_spark.streaming.events import stream_hourly_aggregate
from dask_lightgbm_spark.streaming.sessions import stream_user_totals

spark = (
    SparkSession.builder.master("local-cluster[2,2,1024]")
    .appName("cluster-streaming")
    .config("spark.executor.memory", "1g")
    .config("spark.driver.memory", "2g")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.executorEnv.PYTHONPATH", os.environ["PYTHONPATH"])
    .getOrCreate()
)

src = "/tmp/cluster_stream_src_" + str(os.getpid())
os.makedirs(src)
eid = 0
for bi, batch in enumerate({BATCHES!r}):
    rows = [
        (eid + i, {BASE_US} + m * 60_000_000, u, "view", v, "{{}}")
        for i, (u, m, v) in enumerate(batch)
    ]
    eid += len(rows)
    pq.write_table(
        pa.table({{
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }}),
        src + "/events_" + str(bi) + ".parquet",
    )

hourly = {{
    str(int(r.hour.timestamp() * 1_000_000)) + "|" + r.event_type:
        [r.n, r.sum_value]
    for r in stream_hourly_aggregate(
        spark, src, glob="events_*.parquet", max_files_per_trigger=1
    ).collect()
}}

spark.conf.set(
    "spark.sql.streaming.stateStore.providerClass",
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider",
)
rows = stream_user_totals(
    spark, src, glob="events_*.parquet", max_files_per_trigger=1
).collect()
finals = {{}}
for r in rows:
    if r.user_id not in finals or r.n_events > finals[r.user_id][0]:
        finals[r.user_id] = [r.n_events, r.sum_value]
totals = {{str(u): v for u, v in finals.items()}}

# both executor JVMs really participated
pids = sorted(set(
    spark.range(0, 64, 1, 8).rdd.map(lambda r: os.getpid()).distinct().collect()
))
assert len(pids) >= 2, pids

print("RESULT " + json.dumps({{"hourly": hourly, "totals": totals}}))
print("CLUSTER_STREAMING_OK")
"""


def test_microbatched_state_folds_across_executor_processes():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        env=env,
        capture_output=True,
        text=True,
        timeout=540,
    )
    assert proc.returncode == 0, (
        f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-4000:]}"
    )
    assert "CLUSTER_STREAMING_OK" in proc.stdout
    got = json.loads(
        next(l for l in proc.stdout.splitlines() if l.startswith("RESULT "))[7:]
    )

    hourly: dict[str, list] = {}
    totals: dict[str, list] = {}
    for batch in BATCHES:
        for uid, minutes, value in batch:
            ts_us = BASE_US + minutes * 60_000_000
            hour_us = ts_us - ts_us % 3_600_000_000
            hk = f"{hour_us}|view"
            n, cents = hourly.get(hk, (0, 0))
            hourly[hk] = (n + 1, cents + round(value * 100))
            n, cents = totals.get(str(uid), (0, 0))
            totals[str(uid)] = (n + 1, cents + round(value * 100))

    assert got["hourly"] == {
        k: [n, cents / 100.0] for k, (n, cents) in hourly.items()
    }
    assert got["totals"] == {
        u: [n, cents / 100.0] for u, (n, cents) in totals.items()
    }
