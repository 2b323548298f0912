"""Executor-JVM loss mid-shuffle (round 9, session 4).

tests/test_fault_tolerance.py injects PYTHON-level task failures; this
module injects the failure mode that actually dominates a 1000-executor
deployment: a whole executor dying (spot reclaim, OOM-kill, hardware).
Losing an executor loses both its RUNNING tasks and its already-written
SHUFFLE MAP OUTPUT — recovery needs task re-scheduling on the survivor,
FetchFailed handling, and map-stage resubmission to regenerate the lost
shuffle blocks. Spark owns all of that; what this engine must guarantee
(and this test pins) is that its Arrow kernels recompute DETERMINISTICALLY
under that machinery, so the post-recovery result is bit-exact.

Subprocess on ``local-cluster[2,1,1200]``: two real executor JVMs, one
core each. A 16-partition map stage (slow Arrow kernel, ~0.4 s/task)
feeds a groupBy; a driver-side thread SIGKILLs one executor JVM while the
map stage is in flight, so some finished map outputs die with it. The job
must still complete and match the precomputed expected result.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = """
import os
import signal
import subprocess
import threading
import time

import pandas as pd

from pyspark.sql import SparkSession, functions as F

spark = (
    SparkSession.builder.master("local-cluster[2,1,1200]")
    .appName("executor-loss")
    .config("spark.executor.memory", "1g")
    .config("spark.driver.memory", "2g")
    .config("spark.sql.shuffle.partitions", "8")
    # AQE off: keep a plain 2-stage shuffle so the map stage is long
    # enough to kill into, and the resubmission path is the classic one
    .config("spark.sql.adaptive.enabled", "false")
    .config("spark.executorEnv.PYTHONPATH", os.environ["PYTHONPATH"])
    .getOrCreate()
)
sc = spark.sparkContext

N, PARTS = 1600, 16
df = spark.range(0, N, 1, PARTS)


def slow_kernel(it):
    # deterministic per-row work; the sleep stretches the map stage so the
    # executor kill lands while map tasks (and their outputs) are in flight
    time.sleep(0.4)
    for pdf in it:
        yield pd.DataFrame({
            "grp": (pdf["id"] % 7).astype("int64"),
            "val": (pdf["id"] * 3 + 1).astype("int64"),
        })


mapped = df.mapInPandas(slow_kernel, "grp long, val long")
agg = mapped.groupBy("grp").agg(
    F.sum("val").alias("total"), F.count(F.lit(1)).alias("n")
)

expected = sorted(
    (g, sum(i * 3 + 1 for i in range(N) if i % 7 == g),
     sum(1 for i in range(N) if i % 7 == g))
    for g in range(7)
)


def executor_pids():
    out = subprocess.run(
        ["ps", "-eo", "pid,args"], capture_output=True, text=True
    ).stdout
    pids = []
    for line in out.splitlines():
        pid, _, args = line.strip().partition(" ")
        # match only executor JVMs — this very driver's command line also
        # contains the class-name literal (it is in this script's source)
        if "CoarseGrainedExecutorBackend" in args and "java" in args.split()[0]:
            pids.append(int(pid))
    return [p for p in pids if p != os.getpid()]


# wait for both executor JVMs to register before arming the killer
deadline = time.time() + 60
while len(executor_pids()) < 2 and time.time() < deadline:
    time.sleep(0.5)
pids = executor_pids()
assert len(pids) >= 2, f"executors never came up: {pids}"

killed = {}


def kill_one_executor():
    time.sleep(2.0)  # map stage ~3.2 s on 2 cores: land mid-stage
    victim = executor_pids()[0]
    os.kill(victim, signal.SIGKILL)
    killed["pid"] = victim


t = threading.Thread(target=kill_one_executor, daemon=True)
t.start()
got = sorted((r.grp, r.total, r.n) for r in agg.collect())
t.join()

assert "pid" in killed, "the killer thread never fired"
# the victim must really be gone (SIGKILL is not catchable)
assert killed["pid"] not in executor_pids()
assert got == expected, (got[:3], expected[:3])
print("EXECUTOR_LOSS_RECOVERY_OK", killed["pid"])
"""


def test_job_survives_executor_jvm_loss_mid_shuffle():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, (
        f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-4000:]}"
    )
    assert "EXECUTOR_LOSS_RECOVERY_OK" in proc.stdout
