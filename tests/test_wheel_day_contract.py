"""Wheel-day contract (r13 verdict #6): the one unverifiable reference
claim is the native LightGBM distributed fit (no wheel in this image).
This suite pins the EXACT fit→predict orchestration sequence the engine
drives against ANY lightgbm-API-compatible object — today the stub,
tomorrow the real wheel — so installing the wheel is a zero-code event:

1. network params reach the worker-side estimator constructor with the
   reference's exact shape (reference core.py:65-77): ``machines`` =
   comma-joined host:port over the DATA-HOLDING tasks only,
   ``local_listen_port`` = this rank's own entry, ``num_machines`` =
   ring size, ``time_out`` present;
2. ``LGBM_NetworkFree`` runs EXACTLY ONCE between fit returning and the
   model leaving the worker (reference core.py:81's finally);
3. NetworkFree fires even when fit RAISES (the finally contract — a
   leaked socket ring would poison the app-level retry's fresh ring);
4. the returned model serves predict/predict_proba through the engine's
   Arrow inference path with kwargs passthrough (core.py:144-173).

The same assertions run unchanged against the real library:
tests/test_lightgbm_system.py skips-if-absent and covers learning
quality; THIS file covers the orchestration sequence that cannot
otherwise be observed from the driver."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STUBS = os.path.join(REPO, "tests", "stubs")

CONTRACT_SCRIPT = """
import os
import tempfile

import lightgbm  # the stub here; the real wheel runs this script unchanged
import numpy as np
import pandas as pd

from dask_lightgbm_spark.session import get_spark
from dask_lightgbm_spark.estimators import SparkLGBMClassifier

nf_log = os.environ["LIGHTGBM_STUB_NF_LOG"]
spark = get_spark("wheel-day-contract", cpus=4, shuffle_partitions=4)

rng = np.random.default_rng(7)
pdf = pd.DataFrame({
    "f0": rng.normal(size=120), "f1": rng.normal(size=120),
    "target": (rng.random(120) > 0.4).astype(float),
})
df = spark.createDataFrame(pdf)

clf = SparkLGBMClassifier(n_estimators=3, backend="lightgbm", num_workers=3)
clf.fit(df, feature_cols=["f0", "f1"], label_col="target")
m = clf.to_local()

# --- 1. network-param shape (reference core.py:65-77) ---
machines = m.params["machines"].split(",")
assert len(machines) == m.params["num_machines"] == 3, m.params
hosts_ports = [e.rsplit(":", 1) for e in machines]
ports = [int(p) for _, p in hosts_ports]
assert len(set(machines)) == 3, machines            # distinct ring entries
assert ports == sorted(ports), ports                # rank-ordered port scheme
assert m.params["local_listen_port"] == ports[0], m.params  # rank-0 model
assert "time_out" in m.params, m.params
assert m.params["tree_learner"] == "data", m.params

# --- 2. exactly one NetworkFree between fit and model return ---
assert m.nf_calls_at_pickle_ == m.nf_calls_at_fit_ + 1, (
    m.nf_calls_at_fit_, m.nf_calls_at_pickle_)
# and one per data-holding worker overall (3 ranks)
with open(nf_log) as fh:
    after_fit = len(fh.read().splitlines())
assert after_fit == 3, after_fit

# --- 4. predict path over the returned model, kwargs passthrough ---
out = clf.transform(df)
assert out.count() == 120
raw = clf.transform(df, raw_score=True)
assert raw.filter("prediction = -1.5").count() == 120  # stub raw marker

# --- 3. NetworkFree STILL fires when worker-side fit raises ---
open(nf_log, "w").close()
bad = SparkLGBMClassifier(
    n_estimators=3, backend="lightgbm", num_workers=2,
    fail_marker=True, barrier_retries=0,
)
propagated_msg = None
try:
    bad.fit(df, feature_cols=["f0", "f1"], label_col="target")
except Exception as exc:
    propagated_msg = str(exc)
assert propagated_msg is not None, "injected fit failure did not propagate"
# Spark wraps worker exceptions in Py4J/barrier job-abort text; the injected
# marker must survive the wrapping so users can see the root cause.
assert "injected worker failure" in propagated_msg, propagated_msg[-500:]
with open(nf_log) as fh:
    after_fail = len(fh.read().splitlines())
# the log was truncated above, after the successful fit — every line here is
# a failure-path NetworkFree (success-path calls were counted in check #2)
assert after_fail >= 1, (
    "LGBM_NetworkFree did not run on the fit-failure path — the finally "
    "contract (reference core.py:81) is broken")

print("WHEEL_DAY_CONTRACT_OK")
"""


def test_wheel_day_orchestration_sequence(tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = STUBS + os.pathsep + REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["LIGHTGBM_STUB_NF_LOG"] = str(tmp_path / "nf_calls.log")
    (tmp_path / "nf_calls.log").touch()
    proc = subprocess.run(
        [sys.executable, "-c", CONTRACT_SCRIPT],
        env=env,
        capture_output=True,
        text=True,
        timeout=280,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-3000:]}"
    assert "WHEEL_DAY_CONTRACT_OK" in proc.stdout
