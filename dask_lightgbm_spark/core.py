"""Distributed training/inference core.

Re-expresses the reference's orchestration (``/root/reference/dask_lightgbm/
core.py``) on Spark's execution model:

- Dask's explicit part-zipping + ``who_has`` locality grouping
  (``core.py:94-117``) is subsumed by a single DataFrame (all columns of a
  row are co-located) and a **barrier stage**: ``df.repartition(n).rdd
  .barrier().mapPartitions(...)`` gives gang scheduling — every trainer task
  is up before LightGBM opens its socket ring, which Dask could only
  approximate with ``wait()`` (``core.py:106``).
- Worker discovery (``parse_host_port``/``build_network_params``,
  ``core.py:35-48``) becomes ``BarrierTaskContext.getTaskInfos()``; ports are
  offset by *task index*, not address, so same-host tasks (local mode, or
  multiple executors per node) never collide — fixes a latent reference
  assumption (distinct IPs) noted in SURVEY.md §7 M3.
- ``_train_part`` (``core.py:65-83``) maps nearly 1:1: concat local batches,
  local ``fit`` with ``machines``/``num_machines``/``local_listen_port``,
  ``LGBM_NetworkFree()`` in ``finally``; partition 0 returns the model.
- Prediction (``_predict_part``/``predict``, ``core.py:144-173``) becomes an
  Arrow-vectorized pandas UDF with the empty-batch guard kept.

The ``lightgbm`` native library is an optional dependency (not present in
this image): :func:`have_lightgbm` gates the barrier path; the MLlib backend
(GBT/RandomForest — the approach named in BASELINE.json) provides the same
estimator surface with zero native deps.
"""

from __future__ import annotations

import pickle

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # optional native dep — gate, don't require (image has no lightgbm)
    import lightgbm  # noqa: F401

    _HAVE_LGBM = True
except ImportError:
    _HAVE_LGBM = False


def have_lightgbm() -> bool:
    return _HAVE_LGBM


DEFAULT_LISTEN_PORT = 12400  # reference default, core.py:66
DEFAULT_TIME_OUT = 120  # reference default, core.py:66


def build_network_params(
    host_addresses: list[str],
    task_index: int,
    local_listen_port: int = DEFAULT_LISTEN_PORT,
    time_out: int = DEFAULT_TIME_OUT,
) -> dict:
    """LightGBM network params for one barrier task (reference
    ``build_network_params``, core.py:40-48, with the port scheme keyed on
    task index instead of worker address so shared hosts work)."""
    ports = [local_listen_port + i for i in range(len(host_addresses))]
    machines = ",".join(f"{h}:{p}" for h, p in zip(host_addresses, ports))
    return {
        "machines": machines,
        "local_listen_port": ports[task_index],
        "num_machines": len(host_addresses),
        "time_out": time_out,
    }


def concat(seq):
    """Concatenate a task's local batches (reference ``concat``,
    core.py:51-62). Spark's Arrow boundary yields pandas objects, so only
    the pandas/numpy branches are needed; sparse inputs arrive as MLlib
    vectors and are densified upstream."""
    seq = [s for s in seq if len(s)]
    if not seq:
        return None
    if isinstance(seq[0], np.ndarray):
        return np.concatenate(seq)
    if isinstance(seq[0], (pd.DataFrame, pd.Series)):
        return pd.concat(seq, axis=0)
    raise TypeError(f"Data must be either numpy arrays or pandas dataframes. Got {type(seq[0])}")


def train_lightgbm_barrier(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    model_factory,
    params: dict,
    weight_col: str | None = None,
    num_workers: int | None = None,
    local_listen_port: int = DEFAULT_LISTEN_PORT,
    time_out: int = DEFAULT_TIME_OUT,
):
    """Train a LightGBM estimator across a barrier stage (reference
    ``train`` + ``_train_part``, core.py:65-141).

    One task per partition; LightGBM's own socket AllReduce
    (``tree_learner='data'`` → distributed histogram merge) runs between
    tasks exactly as it ran between Dask workers. Partition 0 returns the
    pickled fitted model.
    """
    if not _HAVE_LGBM:
        raise RuntimeError(
            "lightgbm is not importable on the executors; use backend='mllib'"
        )
    sc = df.sparkSession.sparkContext
    num_workers = num_workers or max(sc.defaultParallelism // 4, 2)
    cols = [*feature_cols, label_col] + ([weight_col] if weight_col else [])
    part = df.select(*cols).repartition(num_workers)

    n_feat = len(feature_cols)
    params = dict(params)
    params.setdefault("tree_learner", "data")  # reference default, core.py:122-125
    # per-task thread budget (reference sets num_threads=worker ncores,
    # core.py:120,130); spark.task.cpus is the per-task analog — defaulting
    # to 0 (all cores) would oversubscribe executors running multiple tasks.
    # Respect any LightGBM alias the caller may have used (the canonical
    # name would win alias resolution and silently override their setting).
    if not any(k in params for k in ("num_threads", "nthread", "nthreads", "n_jobs")):
        params["num_threads"] = int(sc.getConf().get("spark.task.cpus", "1"))

    def _train_task(iterator):
        from pyspark import BarrierTaskContext

        ctx = BarrierTaskContext.get()
        infos = ctx.getTaskInfos()
        hosts = [i.address.split(":")[0] for i in infos]
        idx = ctx.partitionId()
        # inlined build_network_params: the task closure must stay
        # self-contained — referencing a module-level helper would make
        # cloudpickle serialize it by reference and require this package on
        # the executors' import path
        ports = [local_listen_port + i for i in range(len(hosts))]
        net = {
            "machines": ",".join(f"{h}:{p}" for h, p in zip(hosts, ports)),
            "local_listen_port": ports[idx],
            "num_machines": len(hosts),
            "time_out": time_out,
        }

        rows = list(iterator)
        # all peers must reach the rendezvous before any socket opens
        ctx.barrier()
        import lightgbm as lgb
        from lightgbm.basic import _LIB, _safe_call

        local_params = {**params, **net}
        try:
            if rows:
                data = np.array([[r[i] for i in range(n_feat)] for r in rows], dtype=np.float64)
                label = np.array([r[n_feat] for r in rows])
                weight = (
                    np.array([r[n_feat + 1] for r in rows]) if weight_col else None
                )
            else:  # a worker with no data still must join the network ring
                data = np.empty((0, n_feat))
                label = np.empty((0,))
                weight = None
            model = model_factory(**local_params)
            model.fit(data, label, sample_weight=weight)
        finally:
            _safe_call(_LIB.LGBM_NetworkFree())  # reference core.py:81
        if idx == 0:  # only the designated task returns the model (core.py:77-80)
            yield pickle.dumps(model)

    [payload] = part.rdd.barrier().mapPartitions(_train_task).collect()
    return pickle.loads(payload)


def predict_udf_for(
    model, feature_cols: list[str], proba: bool, n_classes: int = 2, spark=None
):
    """Arrow-vectorized inference UDF (reference ``_predict_part``,
    core.py:144-160). By default the model rides along by closure capture,
    exactly the reference's broadcast-by-closure (core.py:165,171); Spark
    pickles it once per task. Pass ``spark`` to ship it as an explicit
    broadcast variable instead — one copy per executor rather than one per
    task closure, the right choice for multi-hundred-MB boosters
    (SURVEY.md §4 broadcast row)."""
    ret_type = T.ArrayType(T.DoubleType()) if proba else T.DoubleType()
    bc = spark.sparkContext.broadcast(model) if spark is not None else None
    if bc is not None:
        # drop the direct reference so ONLY the broadcast handle rides in the
        # UDF closure — otherwise cloudpickle ships the model per task anyway
        model = None

    @F.pandas_udf(ret_type)
    def _predict(*cols: pd.Series) -> pd.Series:
        m = bc.value if bc is not None else model
        X = pd.concat(cols, axis=1).to_numpy(dtype=np.float64)
        if X.shape[0] == 0:  # empty-partition guard, reference core.py:147-148
            return pd.Series([], dtype=object if proba else np.float64)
        if proba:
            out = m.predict_proba(X)
            return pd.Series(list(out))
        return pd.Series(m.predict(X).astype(np.float64))

    return _predict
