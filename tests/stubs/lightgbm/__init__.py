"""Minimal lightgbm stand-in for exercising the barrier training path in
tests (the real native library is not in this image). Mimics the sklearn
estimator surface the engine touches: fit/predict/predict_proba/classes_,
plus basic._LIB.LGBM_NetworkFree. Like the real library it accepts dense
ndarrays and scipy-style CSR matrices (anything with .toarray()), and its
predict accepts the reference's passthrough kwargs (raw_score,
num_iteration, ...), recording them so tests can assert the plumbing.
The 'model' is a class-prior/mean predictor — enough to assert
orchestration, not learning quality."""

import numpy as np


def _densify(X):
    if hasattr(X, "toarray"):
        return np.asarray(X.toarray())
    return np.asarray(X)


class _Base:
    def __init__(self, **params):
        self.params = dict(params)

    def get_params(self, deep=True):
        return dict(self.params)


class LGBMClassifier(_Base):
    def fit(self, X, y, sample_weight=None, **kwargs):
        self.last_fit_kwargs_ = dict(kwargs)
        if self.params.get("fail_marker"):
            # test hook: lets the suite assert worker-side fit errors
            # propagate to the driver (reference error path, core.py:108-110)
            raise RuntimeError("injected worker failure")
        X = _densify(X)
        if len(np.asarray(y)) == 0:
            # real lightgbm (sklearn check_X_y) rejects 0-sample fit
            raise ValueError("Found array with 0 sample(s) while a minimum of 1 is required")
        y = np.asarray(y)
        self.n_features_in_ = X.shape[1] if X.ndim == 2 else 0
        self.fitted_X_sum_ = float(X.sum())
        self.classes_ = np.unique(y)
        vals, counts = np.unique(y, return_counts=True)
        self._majority = float(vals[np.argmax(counts)])
        self.fitted_rows_ = int(len(y))
        return self

    def predict(self, X, **kwargs):
        self.last_predict_kwargs_ = dict(kwargs)
        n = len(_densify(X))
        if kwargs.get("raw_score"):
            return np.full(n, -1.5)  # distinguishable raw-margin output
        return np.full(n, self._majority)

    def predict_proba(self, X, **kwargs):
        self.last_predict_kwargs_ = dict(kwargs)
        n = len(_densify(X))
        k = max(len(self.classes_), 1)
        return np.full((n, k), 1.0 / k)


class LGBMRegressor(_Base):
    def fit(self, X, y, sample_weight=None, **kwargs):
        self.last_fit_kwargs_ = dict(kwargs)
        X = _densify(X)
        if len(np.asarray(y)) == 0:
            raise ValueError("Found array with 0 sample(s) while a minimum of 1 is required")
        y = np.asarray(y)
        self.n_features_in_ = X.shape[1] if X.ndim == 2 else 0
        self.fitted_X_sum_ = float(X.sum())
        self._mean = float(np.mean(y))
        self.fitted_rows_ = int(len(y))
        return self

    def predict(self, X, **kwargs):
        self.last_predict_kwargs_ = dict(kwargs)
        n = len(_densify(X))
        if kwargs.get("raw_score"):
            return np.full(n, -1.5)
        return np.full(n, self._mean)
