"""Bucketed-table co-located join: zero exchanges (subprocess — the
warehouse dir is a static conf, so this needs its own session; the derby
metastore is isolated in a temp dir)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = """
import sys, tempfile, os
sys.path.insert(0, %(repo)r)
d = tempfile.mkdtemp()
os.chdir(d)  # derby metastore_db lands here
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.warehouse.dir", d + "/wh")
         .config("spark.sql.autoBroadcastJoinThreshold", "-1")
         .config("spark.sql.adaptive.enabled", "false")
         .getOrCreate())
from dask_lightgbm_spark.sources.writers import write_bucketed_table
from dask_lightgbm_spark.plans.explain import formatted_plan

o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet").withColumnRenamed("c_custkey", "o_custkey")
write_bucketed_table(o, "orders_b", ["o_custkey"], 4, sort_cols=["o_custkey"])
write_bucketed_table(c, "cust_b", ["o_custkey"], 4)
j = spark.table("orders_b").join(spark.table("cust_b"), "o_custkey")
plan = formatted_plan(j)
assert "Exchange" not in plan, plan
assert j.count() == 1500
print("BUCKETED_OK")
""" % {"repo": REPO}


def test_bucketed_join_no_shuffle():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT], env=env, capture_output=True, text=True, timeout=280
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "BUCKETED_OK" in proc.stdout
