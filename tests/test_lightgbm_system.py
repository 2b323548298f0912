"""System test against the REAL native lightgbm library, mirroring the
reference's end-to-end fit/predict run (system_tests/test_fit_predict.py:26-59:
train on a real dataset, assert accuracy > 0.8 / R^2 > 0.8 over distributed
predict). The library is not in this image, so the whole module skips here —
but the first environment that has the wheel exercises the true socket
rendezvous path (build_network_params -> barrier allGather -> native
LGBM_Network over TCP) that the recording stub cannot.

Detection is strict: `import lightgbm` must succeed AND resolve outside
tests/stubs (the stub is only ever injected via PYTHONPATH by the barrier
tests' subprocesses, but belt-and-braces)."""

import os

import numpy as np
import pytest


def _real_lightgbm() -> bool:
    try:
        import lightgbm  # noqa: F401
    except Exception:
        return False
    src = getattr(lightgbm, "__file__", "") or ""
    return os.sep + "stubs" + os.sep not in src


requires_native = pytest.mark.skipif(
    not _real_lightgbm(), reason="native lightgbm wheel not installed in this image"
)


def _covtype_like(n=4000, d=12, seed=31):
    """Separable-but-noisy synthetic in the covtype shape: numeric features,
    integer class from a linear rule + noise (so >0.8 accuracy requires real
    learning — the stub's prior predictor would score ~0.5)."""
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, d))
    margin = X[:, 0] * 1.5 - X[:, 1] + 0.5 * X[:, 2] + rng.normal(scale=0.3, size=n)
    y = (margin > 0).astype(float)
    return X, y


@requires_native
def test_classify_distributed_native(spark):
    """Reference system_tests/test_fit_predict.py:25-39 — distributed fit over
    2 workers (real TCP ring), distributed predict, accuracy > 0.8."""
    import pandas as pd

    from dask_lightgbm_spark.estimators import SparkLGBMClassifier

    X, y = _covtype_like()
    pdf = pd.DataFrame(X, columns=[f"f{i}" for i in range(X.shape[1])])
    pdf["target"] = y
    df = spark.createDataFrame(pdf).repartition(2)

    clf = SparkLGBMClassifier(n_estimators=50, backend="lightgbm", num_workers=2)
    clf.fit(df, feature_cols=[c for c in pdf.columns if c != "target"], label_col="target")

    out = clf.transform(df).select("target", "prediction").toPandas()
    acc = float((out.target == out.prediction).mean())
    assert acc > 0.8, acc

    # distributed == local predictions (reference test_core.py differential)
    local = clf.to_local()
    p_local = local.predict(X)
    p_dist = (
        clf.transform(df.orderBy("f0")).select("prediction").toPandas()["prediction"].to_numpy()
    )
    # order-insensitive compare (barrier output order is partition-dependent)
    assert sorted(p_local.tolist()) == sorted(p_dist.tolist())


@requires_native
def test_regress_distributed_native(spark):
    """Reference system_tests/test_fit_predict.py:42-59 — distributed fit,
    R^2 > 0.8 on a learnable linear target."""
    import pandas as pd

    from dask_lightgbm_spark.estimators import SparkLGBMRegressor

    rng = np.random.default_rng(7)
    X = rng.normal(size=(4000, 8))
    yv = 3.0 * X[:, 0] - 2.0 * X[:, 1] + 0.5 * X[:, 2] + rng.normal(scale=0.1, size=4000)
    pdf = pd.DataFrame(X, columns=[f"f{i}" for i in range(8)])
    pdf["target"] = yv
    df = spark.createDataFrame(pdf).repartition(2)

    reg = SparkLGBMRegressor(n_estimators=50, backend="lightgbm", num_workers=2)
    reg.fit(df, feature_cols=[f"f{i}" for i in range(8)], label_col="target")

    out = reg.transform(df).select("target", "prediction").toPandas()
    resid = ((out.target - out.prediction) ** 2).sum()
    denom = ((out.target - out.target.mean()) ** 2).sum()
    r2 = 1.0 - resid / denom
    assert r2 > 0.8, r2


@requires_native
def test_sequence_ingest_native(spark):
    """ingest='sequence' against the real binner: lightgbm.Dataset pulls rows
    through the Sequence protocol; training must still clear 0.8 accuracy."""
    import pandas as pd

    from dask_lightgbm_spark.estimators import SparkLGBMClassifier

    X, y = _covtype_like(n=2000, seed=13)
    pdf = pd.DataFrame(X, columns=[f"f{i}" for i in range(X.shape[1])])
    pdf["target"] = y
    df = spark.createDataFrame(pdf)

    clf = SparkLGBMClassifier(
        n_estimators=50, backend="lightgbm", num_workers=1, ingest="sequence"
    )
    clf.fit(df, feature_cols=[c for c in pdf.columns if c != "target"], label_col="target")
    out = clf.transform(df).select("target", "prediction").toPandas()
    assert float((out.target == out.prediction).mean()) > 0.8


def test_native_marker_skips_cleanly():
    """Always-on canary: in THIS image the native wheel is absent, so the
    three tests above must be skipping for the documented reason (and not,
    say, because the stub leaked onto sys.path and half-imported)."""
    if _real_lightgbm():
        pytest.skip("native lightgbm present — system tests above ran for real")
    with pytest.raises(ImportError):
        import lightgbm  # noqa: F401
