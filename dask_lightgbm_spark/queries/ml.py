"""ML train/predict query surface.

Model training is not SQL-expressible → no DuckDB oracle (driver records the
weaker rows-only check, as the contract allows). Differential correctness
for the estimators is covered by tests/test_ml.py instead (the reference's
own test strategy: distributed-vs-local agreement + quality thresholds,
SURVEY.md §5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dask_lightgbm_spark.queries import query
from dask_lightgbm_spark.sources.readers import load_table


@query("ml01_classifier_embeddings")  # rows-only: training isn't SQL
def ml01_classifier_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a multiclass classifier on the embeddings fixture
    (array<float> features → MLlib vector), predict in-sample, and return
    per-label accuracy counts — the reference's fit→predict→score pipeline
    shape (system_tests/test_fit_predict.py:26-39) on Spark."""
    from dask_lightgbm_spark.estimators import SparkLGBMClassifier

    e = load_table(spark, sf_dir, "embeddings").withColumn(
        "label_d", F.col("label").cast("double")
    )
    clf = SparkLGBMClassifier(n_estimators=10, backend="mllib", max_depth=5)
    clf.fit(e, features_col="embedding", label_col="label_d")
    pred = clf.transform(e, features_col="embedding")
    return (
        pred.groupBy(F.col("label_d").cast("int").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("prediction") == F.col("label_d")).cast("long")).alias("n_correct"),
        )
        .orderBy("label")
    )


@query("ml02_regressor_lineitem")  # rows-only: training isn't SQL
def ml02_regressor_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GBT regression of extended price from quantity/discount/tax on
    lineitem; returns one row of fit-quality stats."""
    from dask_lightgbm_spark.estimators import SparkLGBMRegressor

    l = load_table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_discount", "l_tax", F.col("l_extendedprice").alias("target")
    )
    reg = SparkLGBMRegressor(n_estimators=10, backend="mllib", max_depth=5)
    reg.fit(l, feature_cols=["l_quantity", "l_discount", "l_tax"], label_col="target")
    pred = reg.transform(l)
    return pred.agg(
        F.count(F.lit(1)).alias("n"),
        F.sqrt(F.avg(F.pow(F.col("target") - F.col("prediction"), 2))).alias("rmse"),
        F.avg("target").alias("mean_target"),
    )
