"""Multi-process barrier training smoke: the reference's system test runs a
real scheduler + worker cluster (``/root/reference/docker-compose.yml:4-24``,
``system_tests/test_fit_predict.py:26-59``); the Spark analogue is
``local-cluster[2,2,1024]`` — two REAL executor JVMs in separate processes,
so the barrier rendezvous, allGather ring exclusion, and network-param
exchange cross process boundaries instead of threads of one JVM."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STUBS = os.path.join(REPO, "tests", "stubs")

SCRIPT = """
import os
import numpy as np
import pandas as pd
import lightgbm  # stub via PYTHONPATH
from dask_lightgbm_spark.session import get_spark
from dask_lightgbm_spark.estimators import SparkLGBMClassifier

pypath = os.environ["PYTHONPATH"]
spark = get_spark(
    "barrier-cluster-test",
    cpus=4,
    shuffle_partitions=4,
    master="local-cluster[2,2,1024]",
    extra_conf={
        "spark.executor.memory": "1g",
        "spark.executorEnv.PYTHONPATH": pypath,
        "spark.driver.memory": "2g",
    },
)

rng = np.random.default_rng(42)
pdf = pd.DataFrame({
    "f0": rng.normal(size=200), "f1": rng.normal(size=200),
    "target": (rng.random(200) > 0.3).astype(float),
})
df = spark.createDataFrame(pdf)

# two workers = one barrier task per executor JVM: the allGather that builds
# the machines list crosses real process boundaries
clf = SparkLGBMClassifier(n_estimators=3, backend="lightgbm", num_workers=2)
clf.fit(df, feature_cols=["f0", "f1"], label_col="target")
m = clf.to_local()
assert m.params["num_machines"] == 2, m.params
assert m.params["machines"].count(":") == 2, m.params
assert m.fitted_rows_ > 0

# the two barrier tasks really ran in different python worker processes
pids = sorted(set(
    df.rdd.map(lambda r: os.getpid()).distinct().collect()
))
assert len(pids) >= 2, pids

out = clf.transform(df)
assert out.select("prediction").count() == 200
print("CLUSTER_BARRIER_OK")
"""


def test_barrier_training_across_executor_processes():
    env = dict(os.environ)
    env["PYTHONPATH"] = STUBS + os.pathsep + REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        env=env,
        capture_output=True,
        text=True,
        timeout=280,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-3000:]}"
    assert "CLUSTER_BARRIER_OK" in proc.stdout
