"""Multi-process CATALOG smoke: every other correctness signal in the repo
(pytest local[4], the driver's local[8] gate, tools/driver_sim.py) runs the
catalog inside ONE JVM, where a plan that accidentally depends on
single-address-space locality (a cache both "executors" share, a partition
layout that never really shuffles, a driver-side path executors can't see)
would still pass. This runs a representative plan-family slice on
``local-cluster[2,2,1024]`` — two real executor JVMs in separate processes,
real serialized exchanges — and compares each query to its DuckDB oracle.

Slice covers: shuffle agg (q01), broadcast join (q04), the persisted
minhash dedup pipeline (t05), the iterative connected components whose
per-round labels are eagerly checkpointed — localCheckpoint blocks living
on two separate executor JVMs (t14), the digest-keyed shuffled-hash chunk
dedup (t39), the session-cached IVF serve path (s02), the two-level
prefix-sum packer whose result must be partition-layout invariant (t30),
and the zero-shuffle featurizer (ml04)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

QUERIES = [
    "q01_pricing_summary",
    "q04_join_nation_revenue",
    "t05_minhash_lsh_neardup",
    "t14_dedup_components",
    "t39_chunk_dedup",
    "s02_knn_ivf",
    "t30_sequence_packing",
    "ml04_hashed_bow_features",
]

SCRIPT = f"""
import os, sys
sys.path.insert(0, {REPO!r})
os.chdir("/tmp")  # not the repo — mirrors the external driver

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as E
from dask_lightgbm_spark.sources.readers import TABLES
from tools.check import compare

sf_dir = "/root/testdata/sf0.001"
spark = (
    SparkSession.builder.master("local-cluster[2,2,1024]")
    .appName("cluster-catalog-smoke")
    .config("spark.executor.memory", "1g")
    .config("spark.driver.memory", "2g")
    .config("spark.executorEnv.PYTHONPATH", os.environ["PYTHONPATH"])
    .getOrCreate()
)
con = duckdb.connect()
for t in TABLES:
    con.sql(
        f"CREATE VIEW {{t}} AS SELECT * FROM read_parquet('{{sf_dir}}/{{t}}.parquet')"
    )

qs, oracles = E.queries(), E.oracle_sql()
failed = []
for name in {QUERIES!r}:
    sp = qs[name](spark, sf_dir).toPandas()
    problems = compare(name, sp, con.sql(oracles[name]).df())
    if problems:
        failed.append((name, problems))
        print(f"CLUSTER FAIL {{name}}: {{problems}}")
    else:
        print(f"CLUSTER PASS {{name}} ({{len(sp)}} rows)")

# both executor JVMs really participated (separate python worker processes)
pids = sorted(set(
    spark.range(0, 64, 1, 8).rdd.map(lambda r: os.getpid()).distinct().collect()
))
assert len(pids) >= 2, pids

assert not failed, failed
print("CLUSTER_CATALOG_OK")
"""


def test_catalog_queries_across_executor_processes():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        env=env,
        capture_output=True,
        text=True,
        timeout=560,
    )
    assert proc.returncode == 0, (
        f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-4000:]}"
    )
    assert "CLUSTER_CATALOG_OK" in proc.stdout
