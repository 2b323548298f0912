"""Task-failure / retry fault injection (round 9).

At the 100 TB design point (1000 executors) task failures are routine:
Spark re-runs failed tasks (narrow stages), re-fetches or regenerates
shuffle blocks (wide stages), resubmits whole barrier stages, and replays
streaming micro-batches from the checkpoint. Every custom kernel in this
engine must therefore be RETRY-DETERMINISTIC: a re-executed task must
produce byte-identical output, and a replayed micro-batch must not
double-apply. The rest of the suite proves correctness on the happy path;
this module injects real task failures and proves the recovery path.

Runs in a subprocess because retries need ``local[4,2]`` (local masters
default to maxFailures=1, where the first injected failure would kill the
job) and the session-scoped pytest fixture owns the in-process JVM.

Injection mechanics:
- narrow / post-shuffle stages fail via ``TaskContext.attemptNumber()``
  (attempt 0 raises, the retry proceeds) — pure, no cross-process state;
- the barrier stage and the streaming batch fail ONCE via a marker file
  (a barrier failure resubmits the whole stage, so attempt-keyed logic
  would re-fail forever on tasks whose own attempt counter reset).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STUBS = os.path.join(REPO, "tests", "stubs")

SCRIPT = """
import glob
import os
import shutil
import tempfile

import pandas as pd

from pyspark import TaskContext
from pyspark.sql import functions as F

from dask_lightgbm_spark.session import get_spark
from dask_lightgbm_spark.operators.dedup import exact_dedup_groups

WORK = tempfile.mkdtemp(prefix="dls_fault_")

# local[4,2]: 4 task threads, each task may fail once and retry
spark = get_spark("fault-injection", cpus=4, shuffle_partitions=4,
                  master="local[4,2]")
docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
DOC_SCHEMA = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in docs.schema.fields)


def chaos_identity(it):
    # fail EVERY partition's first attempt; the retry passes rows through
    if TaskContext.get().attemptNumber() == 0:
        raise RuntimeError("injected task failure (attempt 0)")
    for batch in it:
        yield batch


# ---- 1. narrow-stage retry: every scan task fails once, then the real
# Arrow kernel pipeline (digest -> groupBy) must produce the clean answer
clean = sorted(
    (r.content_hash, r.keep_id, r.n_copies)
    for r in exact_dedup_groups(docs, "doc_id", "text").collect()
)
chaotic = sorted(
    (r.content_hash, r.keep_id, r.n_copies)
    for r in exact_dedup_groups(
        docs.mapInPandas(chaos_identity, DOC_SCHEMA), "doc_id", "text"
    ).collect()
)
assert chaotic == clean and len(clean) > 0, (len(chaotic), len(clean))
print("NARROW_RETRY_OK", len(clean))


# ---- 2. post-shuffle retry: the grouped kernel itself fails on attempt 0,
# so the retry must re-read its SHUFFLED input and refold identically
def grouped_stats(key, pdf):
    if TaskContext.get().attemptNumber() == 0:
        raise RuntimeError("injected reduce-side failure (attempt 0)")
    return pd.DataFrame({
        "grp": [int(key[0])],
        "n_docs": [len(pdf)],
        "total_chars": [int(pdf["text"].str.len().sum())],
    })


grouped = docs.withColumn("grp", F.col("doc_id") % 8)
got = sorted(
    (r.grp, r.n_docs, r.total_chars)
    for r in grouped.groupBy("grp")
    .applyInPandas(grouped_stats, "grp long, n_docs long, total_chars long")
    .collect()
)
want = sorted(
    (r.grp, r.n_docs, r.total_chars)
    for r in grouped.groupBy("grp")
    .agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).alias("total_chars"),
    )
    .collect()
)
assert got == want and len(want) == 8, (got, want)
print("SHUFFLE_RETRY_OK", len(want))


# ---- 3. barrier-failure recovery through the REAL trainer. Spark NEVER
# stage-retries a failed barrier ResultStage (the scheduler aborts the job:
# partial results may already sit driver-side) — so the trainer must supply
# its own app-level retry. Pin BOTH halves: max_retries=0 reproduces the
# scheduler abort; the default transparently re-runs the side-effect-free
# training job, which must rebuild its socket ring and fit.
import numpy as np
import lightgbm  # stub via PYTHONPATH

from dask_lightgbm_spark import core

assert core.have_lightgbm()
BARRIER_MARKER = os.path.join(WORK, "barrier_failed_once")


def chaos_factory(**params):
    model = lightgbm.LGBMClassifier(**params)

    def fit_once(*a, **kw):
        if (params.get("local_listen_port") == 12400
                and not os.path.exists(BARRIER_MARKER)):
            with open(BARRIER_MARKER, "w") as f:
                f.write("rank0 attempt failed")
            raise RuntimeError("injected barrier-task failure")
        del model.fit  # restore the class method so the model pickles
        return model.fit(*a, **kw)

    model.fit = fit_once
    return model


rng = np.random.default_rng(7)
train_pdf = pd.DataFrame({
    "f0": rng.normal(size=96), "f1": rng.normal(size=96),
    "target": (rng.random(96) > 0.4).astype(float),
})
train_df = spark.createDataFrame(train_pdf)

# 3a. without app-level retry: the injected failure aborts the whole job
aborted = False
try:
    core.train_lightgbm_barrier(
        train_df, feature_cols=["f0", "f1"], label_col="target",
        model_factory=chaos_factory, params={"n_estimators": 2},
        num_workers=2, max_retries=0,
    )
except Exception as exc:
    aborted = "barrier" in str(exc).lower()
assert aborted, "barrier ResultStage abort semantics changed"
assert os.path.exists(BARRIER_MARKER)  # the failure really fired
os.remove(BARRIER_MARKER)  # arm the chaos again for the retry run

# 3b. default max_retries=1: same failure, training completes transparently
model = core.train_lightgbm_barrier(
    train_df, feature_cols=["f0", "f1"], label_col="target",
    model_factory=chaos_factory, params={"n_estimators": 2}, num_workers=2,
)
assert os.path.exists(BARRIER_MARKER)  # the failure fired on attempt 1
assert model.fitted_rows_ > 0
assert model.params["num_machines"] == 2, model.params
assert model.params["machines"].count(":") == 2, model.params
print("BARRIER_RETRY_OK", model.fitted_rows_)


# ---- 4. streaming micro-batch failure + replay: batch 0 fails BEFORE its
# write (marker file), the query dies, the restart re-delivers THE SAME
# batch id with the same rows, and the batch-id-keyed sink stays exactly-once
src = os.path.join(WORK, "stream_src")
os.makedirs(src)
ckpt = os.path.join(WORK, "ckpt")
sink = os.path.join(WORK, "sink")
STREAM_MARKER = os.path.join(WORK, "batch0_failed_once")

ev = (
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    .select("event_id", "user_id")
    .limit(400)
)
n_src = ev.count()
ev.coalesce(1).write.parquet(os.path.join(src, "f0"))


def fragile_sink(batch_df, batch_id):
    if not os.path.exists(STREAM_MARKER):
        with open(STREAM_MARKER, "w") as f:
            f.write(str(batch_id))
        raise RuntimeError("injected micro-batch failure")
    # idempotent by construction: replays of a batch id overwrite its dir
    batch_df.write.mode("overwrite").parquet(
        os.path.join(sink, f"batch={batch_id}")
    )


def run_stream():
    return (
        spark.readStream.schema(ev.schema)
        .parquet(os.path.join(src, "*"))
        .writeStream.foreachBatch(fragile_sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )


q = run_stream()
failed = False
try:
    q.awaitTermination()
except Exception:
    failed = True
assert failed and os.path.exists(STREAM_MARKER)
assert not glob.glob(os.path.join(sink, "batch=*")), "failed batch wrote"

q2 = run_stream()  # same checkpoint: batch 0 is REPLAYED, not skipped
q2.awaitTermination()
out = spark.read.option("basePath", sink).parquet(
    os.path.join(sink, "batch=*")
)
assert out.count() == n_src == out.select("event_id").distinct().count()
assert open(STREAM_MARKER).read() == "0"  # the failed delivery WAS batch 0
print("STREAM_REPLAY_OK", n_src)

shutil.rmtree(WORK, ignore_errors=True)
print("FAULT_TOLERANCE_OK")
"""


def test_estimator_exposes_barrier_retry_knob():
    from dask_lightgbm_spark.estimators import SparkLGBMClassifier

    assert SparkLGBMClassifier().max_retries == 1  # resilient by default
    assert SparkLGBMClassifier(max_retries=3).max_retries == 3


def test_retry_classifier_matches_only_scheduler_abort_text():
    """The retry budget is a multi-hour re-fit: only the DAGScheduler's
    barrier-abort signatures may spend it, not any exception that happens
    to contain the word 'barrier' (a param name, a path, a log line)."""
    from dask_lightgbm_spark.core import _is_barrier_stage_abort

    assert _is_barrier_stage_abort(
        Exception(
            "org.apache.spark.SparkException: Job aborted due to stage "
            "failure: Could not recover from a failed barrier ResultStage. "
            "Most recent failure reason: Stage failed because barrier task "
            "ResultTask(3, 0) finished unsuccessfully."
        )
    )
    assert _is_barrier_stage_abort(
        Exception(
            "[SPARK-24819]: Barrier execution mode does not allow run a "
            "barrier stage that requires more slots than the total number "
            "of slots in the cluster currently."
        )
    )
    assert not _is_barrier_stage_abort(
        ValueError("invalid value for parameter barrier_listen_port")
    )
    assert not _is_barrier_stage_abort(
        FileNotFoundError("/data/barrier/part-0001.parquet not found")
    )
    assert not _is_barrier_stage_abort(
        Exception("AnalysisException: column 'label' not found")
    )


def test_retry_determinism_under_injected_task_failures():
    env = dict(os.environ)
    env["PYTHONPATH"] = (
        STUBS + os.pathsep + REPO + os.pathsep + env.get("PYTHONPATH", "")
    )
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
    for stamp in (
        "NARROW_RETRY_OK",
        "SHUFFLE_RETRY_OK",
        "BARRIER_RETRY_OK",
        "STREAM_REPLAY_OK",
        "FAULT_TOLERANCE_OK",
    ):
        assert stamp in proc.stdout, f"missing {stamp}\n{proc.stdout}"
