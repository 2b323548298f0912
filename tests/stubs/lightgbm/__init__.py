"""Minimal lightgbm stand-in for exercising the barrier training path in
tests (the real native library is not in this image). Mimics the sklearn
estimator surface the engine touches: fit/predict/predict_proba/classes_,
plus basic._LIB.LGBM_NetworkFree. The 'model' is a class-prior/mean
predictor — enough to assert orchestration, not learning quality."""

import numpy as np


class _Base:
    def __init__(self, **params):
        self.params = dict(params)

    def get_params(self, deep=True):
        return dict(self.params)


class LGBMClassifier(_Base):
    def fit(self, X, y, sample_weight=None):
        X = np.asarray(X)
        y = np.asarray(y)
        self.n_features_in_ = X.shape[1] if X.ndim == 2 else 0
        self.classes_ = np.unique(y) if len(y) else np.array([0.0])
        vals, counts = (
            np.unique(y, return_counts=True) if len(y) else (np.array([0.0]), np.array([1]))
        )
        self._majority = float(vals[np.argmax(counts)])
        self.fitted_rows_ = int(len(y))
        return self

    def predict(self, X):
        return np.full(len(np.asarray(X)), self._majority)

    def predict_proba(self, X):
        n = len(np.asarray(X))
        k = max(len(self.classes_), 1)
        return np.full((n, k), 1.0 / k)


class LGBMRegressor(_Base):
    def fit(self, X, y, sample_weight=None):
        X = np.asarray(X)
        y = np.asarray(y)
        self.n_features_in_ = X.shape[1] if X.ndim == 2 else 0
        self._mean = float(np.mean(y)) if len(y) else 0.0
        self.fitted_rows_ = int(len(y))
        return self

    def predict(self, X):
        return np.full(len(np.asarray(X)), self._mean)
