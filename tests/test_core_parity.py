"""Reference-parity unit tests for core helpers (SURVEY.md Table A) and
the task-failure semantics the reference implemented by hand (A14)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dask_lightgbm_spark import core


def test_concat_dispatch():
    """A3 (reference concat, core.py:51-62): ndarray + pandas branches,
    empty-part filtering, type error on junk."""
    out = core.concat([np.array([1, 2]), np.array([]), np.array([3])])
    assert list(out) == [1, 2, 3]
    out = core.concat([pd.DataFrame({"a": [1]}), pd.DataFrame({"a": [2]})])
    assert list(out["a"]) == [1, 2]
    assert core.concat([np.array([])]) is None
    with pytest.raises(TypeError, match="numpy arrays or pandas"):
        core.concat([{1, 2}])


def test_error_propagation_to_driver(spark):
    """A14 (reference core.py:108-110 + tests/test_core.py:202-210): a
    failing task surfaces the original exception on the driver — Spark
    gives this for free; pin it so the behavior is contractual."""
    df = spark.range(4)

    @F.udf(T.LongType())
    def boom(x):
        raise ValueError("worker exploded on purpose")

    with pytest.raises(Exception, match="worker exploded on purpose"):
        df.select(boom("id")).collect()


def test_udf_registration_sql_surface(spark):
    """UDF registration for the SQL API (a template category Spark provides
    natively; none existed in the reference)."""
    spark.udf.register("plus_one_test", lambda x: x + 1, T.LongType())
    out = spark.sql("SELECT plus_one_test(41) AS v").first().v
    assert out == 42


def test_predict_udf_empty_batch(spark):
    """A7 empty-partition guard through the real pandas-UDF path."""

    class ConstModel:
        def predict(self, X):
            return np.full(len(X), 7.0)

    udf = core.predict_udf_for(ConstModel(), ["a", "b"], proba=False)
    df = spark.createDataFrame(pd.DataFrame({"a": [1.0, 2.0], "b": [3.0, 4.0]}))
    got = df.withColumn("p", udf(F.col("a"), F.col("b"))).select("p").collect()
    assert [r.p for r in got] == [7.0, 7.0]
    empty = df.filter("a > 100")
    assert empty.withColumn("p", udf(F.col("a"), F.col("b"))).count() == 0


def test_metrics_helpers(spark):
    """accuracy/R²/rmse dataflow expressions (the reference's score
    formulas, system_tests/test_fit_predict.py:35,53-56)."""
    import pandas as pd

    from dask_lightgbm_spark.functions import metrics

    pdf = pd.DataFrame(
        {"y": [1.0, 2.0, 3.0, 4.0], "prediction": [1.0, 2.0, 3.0, 5.0]}
    )
    df = spark.createDataFrame(pdf)
    assert metrics.accuracy(df, "y") == 0.75
    import numpy as np

    y, p = pdf["y"], pdf["prediction"]
    exp_r2 = 1 - ((y - p) ** 2).sum() / ((y - y.mean()) ** 2).sum()
    assert abs(metrics.r2(df, "y") - exp_r2) < 1e-12
    assert abs(metrics.rmse(df, "y") - np.sqrt(((y - p) ** 2).mean())) < 1e-12


def test_predict_udf_broadcast_variant():
    """Explicit sc.broadcast model shipping. Runs in a subprocess with the
    stub lightgbm on PYTHONPATH: plain pickle (which sc.broadcast uses)
    serializes classes BY REFERENCE, so the model's class must be importable
    on the Python workers — true for real lightgbm/mllib models installed on
    executors, not for test-local classes."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = """
import sys
import numpy as np, pandas as pd
import lightgbm  # stub via PYTHONPATH — importable on workers too
from dask_lightgbm_spark.session import get_spark
from dask_lightgbm_spark import core

spark = get_spark("bcast-test", cpus=2)
model = lightgbm.LGBMRegressor().fit(np.array([[0.0], [1.0]]), np.array([3.0, 3.0]))
udf = core.predict_udf_for(model, ["a"], proba=False, spark=spark)
import pyspark.sql.functions as F
df = spark.createDataFrame(pd.DataFrame({"a": [1.0, 2.0]}))
vals = [r.p for r in df.withColumn("p", udf(F.col("a"))).select("p").collect()]
assert vals == [3.0, 3.0], vals
print("BCAST_OK")
"""
    env = dict(os.environ)
    env["PYTHONPATH"] = (
        os.path.join(repo, "tests", "stubs") + os.pathsep + repo
        + os.pathsep + env.get("PYTHONPATH", "")
    )
    proc = subprocess.run(
        [sys.executable, "-c", script], env=env, capture_output=True, text=True, timeout=280
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "BCAST_OK" in proc.stdout


def test_pydata_sparse_absence_canary():
    """Always-on canary (same pattern as the lightgbm/PIL four): in THIS
    image the pydata/sparse wheel is absent, so concat's SparseArray branch
    (core.py:97-108) runs only via tests/stubs/sparse. If this starts
    failing, the real wheel has appeared — the stub-pinned test below then
    exercises the genuine library and this canary should be retired."""
    import importlib.util

    spec = importlib.util.find_spec("sparse")
    if spec is not None and "tests/stubs" not in (spec.origin or ""):
        pytest.skip("real pydata/sparse wheel present — COO branch runs live")
    # absent: concat must refuse unknown containers loudly, not half-work
    class NotSparse:
        shape = (1, 2)

    with pytest.raises(TypeError, match="numpy arrays or pandas"):
        core.concat([NotSparse()])


def test_concat_pydata_coo_branch(monkeypatch):
    """A3's fourth branch (reference core.py:16-19,58-59): pydata/sparse
    COO parts concatenate along axis 0 when the lib is importable. The
    wheel is absent from this image, so the stub in tests/stubs/sparse
    stands in — same names, same semantics; the real wheel runs this
    test unchanged."""
    import os
    import sys

    stubs = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "tests", "stubs")
    monkeypatch.syspath_prepend(stubs)
    sys.modules.pop("sparse", None)
    try:
        import sparse

        a = sparse.COO.from_numpy(np.array([[1.0, 0.0], [0.0, 2.0]]))
        b = sparse.COO.from_numpy(np.array([[3.0, 0.0]]))
        out = core.concat([a, b])
        assert isinstance(out, sparse.COO)
        assert out.shape == (3, 2)
        assert np.array_equal(
            out.todense(), np.array([[1.0, 0.0], [0.0, 2.0], [3.0, 0.0]])
        )
        # empty-part filtering applies to COO parts too
        empty = sparse.COO.from_numpy(np.empty((0, 2)))
        out2 = core.concat([empty, a])
        assert out2.shape == (2, 2)
        # the branch tests the SparseArray BASE (reference core.py:58
        # `isinstance(seq[0], sparse.SparseArray)`), so non-COO formats
        # the reference concatenates (GCXS, DOK) must not hit TypeError
        g = sparse.GCXS.from_numpy(np.array([[5.0, 0.0]]))
        out3 = core.concat([g, sparse.GCXS.from_numpy(np.array([[0.0, 6.0]]))])
        assert isinstance(out3, sparse.SparseArray)
        assert np.array_equal(out3.todense(), np.array([[5.0, 0.0], [0.0, 6.0]]))
    finally:
        sys.modules.pop("sparse", None)
