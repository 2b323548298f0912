"""MLlib Pipeline-conformant wrappers (SURVEY.md §7 M4: "MLlib Pipeline
compatibility").

``SparkLGBMClassifier/Regressor`` keep the reference's sklearn-ish surface
(core.py:187-246); these adapters make the same training core usable as
stages in a ``pyspark.ml.Pipeline`` — Params-based, ``fit`` returning a
``Model`` whose ``transform`` appends prediction columns, composable with
``VectorAssembler`` et al.
"""

from __future__ import annotations

from pyspark import keyword_only
from pyspark.ml import Estimator, Model
from pyspark.ml.param import Param, Params, TypeConverters
from pyspark.ml.param.shared import HasFeaturesCol, HasLabelCol, HasPredictionCol
from pyspark.sql import DataFrame


class _LGBMParams(HasFeaturesCol, HasLabelCol, HasPredictionCol):
    nEstimators = Param(
        Params._dummy(), "nEstimators", "number of boosting rounds / trees",
        typeConverter=TypeConverters.toInt,
    )
    learningRate = Param(
        Params._dummy(), "learningRate", "shrinkage rate",
        typeConverter=TypeConverters.toFloat,
    )
    maxDepth = Param(
        Params._dummy(), "maxDepth", "max tree depth (-1 = backend default)",
        typeConverter=TypeConverters.toInt,
    )
    backend = Param(
        Params._dummy(), "backend", "auto | lightgbm | mllib",
        typeConverter=TypeConverters.toString,
    )

    def getNEstimators(self) -> int:
        return self.getOrDefault(self.nEstimators)

    def getLearningRate(self) -> float:
        return self.getOrDefault(self.learningRate)

    def getMaxDepth(self) -> int:
        return self.getOrDefault(self.maxDepth)

    def getBackend(self) -> str:
        return self.getOrDefault(self.backend)


class _LGBMEstimatorBase(Estimator, _LGBMParams):
    _inner_cls = None  # set by subclasses

    @keyword_only
    def __init__(self, featuresCol="features", labelCol="label",
                 predictionCol="prediction", nEstimators=100,
                 learningRate=0.1, maxDepth=-1, backend="auto"):
        super().__init__()
        self._setDefault(
            featuresCol="features", labelCol="label", predictionCol="prediction",
            nEstimators=100, learningRate=0.1, maxDepth=-1, backend="auto",
        )
        self._set(**self._input_kwargs)

    @keyword_only
    def setParams(self, **kwargs):
        return self._set(**kwargs)

    def _fit(self, dataset: DataFrame):
        inner = self._inner_cls(
            n_estimators=self.getNEstimators(),
            learning_rate=self.getLearningRate(),
            max_depth=self.getMaxDepth(),
            backend=self.getBackend(),
        )
        inner.fit(
            dataset,
            features_col=self.getFeaturesCol(),
            label_col=self.getLabelCol(),
        )
        model = _LGBMModel(inner=inner, featuresCol=self.getFeaturesCol())
        model._set(predictionCol=self.getPredictionCol())
        return model


class _LGBMModel(Model, _LGBMParams):
    def __init__(self, inner=None, featuresCol="features"):
        super().__init__()
        self._setDefault(featuresCol="features", predictionCol="prediction")
        self._set(featuresCol=featuresCol)
        self._inner = inner

    def _transform(self, dataset: DataFrame) -> DataFrame:
        pred_col = self.getPredictionCol()
        if pred_col != "prediction" and pred_col in dataset.columns:
            # withColumnRenamed would silently create a duplicate name
            raise ValueError(
                f"predictionCol {pred_col!r} already exists in the input"
            )
        out = self._inner.transform(dataset, features_col=self.getFeaturesCol())
        if pred_col != "prediction":  # honor the declared Param
            out = out.withColumnRenamed("prediction", pred_col)
        # NB: classifier side-outputs (probability) keep their fixed name —
        # chain-two-classifiers pipelines should rename/drop it between
        # stages (probabilityCol param is a known gap, docs/NOTES_r1.md)
        return out

    def to_local(self):
        return self._inner.to_local()


class LGBMClassifierEstimator(_LGBMEstimatorBase):
    """Pipeline-stage twin of :class:`SparkLGBMClassifier`."""

    @property
    def _inner_cls(self):
        from dask_lightgbm_spark.estimators import SparkLGBMClassifier

        return SparkLGBMClassifier


class LGBMRegressorEstimator(_LGBMEstimatorBase):
    """Pipeline-stage twin of :class:`SparkLGBMRegressor`."""

    @property
    def _inner_cls(self):
        from dask_lightgbm_spark.estimators import SparkLGBMRegressor

        return SparkLGBMRegressor
