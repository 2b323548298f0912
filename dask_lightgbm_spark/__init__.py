"""spark-lightgbm-engine: a PySpark-native analytics + distributed-ML engine
with the capabilities of dask/dask-lightgbm (reference: /root/reference,
surveyed in SURVEY.md).

Public surface (mirrors the reference's two-estimator API,
``/root/reference/dask_lightgbm/__init__.py:1``, re-expressed Spark-first):

- :class:`SparkLGBMClassifier` / :class:`SparkLGBMRegressor` — sklearn-style
  estimators that train gradient-boosted trees on a Spark DataFrame
  (barrier-mode LightGBM when the native lib is importable, MLlib GBT/RF
  otherwise) and run Arrow-vectorized distributed inference.
- ``session.get_spark`` — tuned local/cluster SparkSession factory.
- ``session.release_caches`` — scoped release of every DataFrame this
  package persisted (index caches + lazy operator persists); the
  between-corpora hygiene call for long-running services.
- ``queries`` — the registered query catalog (relational + text/dedup +
  similarity surface) used by the driver correctness gate.
"""

from dask_lightgbm_spark.session import get_spark, release_caches
from dask_lightgbm_spark.estimators import SparkLGBMClassifier, SparkLGBMRegressor

__all__ = ["get_spark", "release_caches", "SparkLGBMClassifier", "SparkLGBMRegressor"]
__version__ = "0.1.0"
