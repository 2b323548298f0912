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

    def _record_nf_at_fit(self):
        # sequence probe (wheel-day contract): how many NetworkFree calls
        # this process had seen when fit started ...
        from lightgbm.basic import _LIB

        self.nf_calls_at_fit_ = _LIB.network_free_calls

    def __getstate__(self):
        # ... and when the model was pickled for return to the driver —
        # the engine contract (reference core.py:81) is exactly one
        # NetworkFree between the two, from the finally around fit
        from lightgbm.basic import _LIB

        d = dict(self.__dict__)
        d["nf_calls_at_pickle_"] = _LIB.network_free_calls
        return d


class LGBMClassifier(_Base):
    def fit(self, X, y, sample_weight=None, **kwargs):
        self.last_fit_kwargs_ = dict(kwargs)
        self._record_nf_at_fit()
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
        self._record_nf_at_fit()
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


# ---------------------------------------------------------------------------
# Native-API surface for the sequence-ingest path (real library: Sequence /
# Dataset / train / Booster). The stub Dataset pulls data through the
# Sequence protocol EXACTLY the way the real binner does — batch_size-row
# slices — and records the pull pattern so tests can assert the engine
# never materialized a full matrix copy.
# ---------------------------------------------------------------------------


class Sequence:
    """Abstract base (mirrors lightgbm.Sequence): subclasses provide
    __len__, __getitem__ (int or slice → numpy rows) and batch_size."""

    batch_size = 4096


class Dataset:
    def __init__(self, data, label=None, weight=None, params=None):
        self.label = None if label is None else np.asarray(label)
        self.weight = None if weight is None else np.asarray(weight)
        self.params = dict(params or {})
        self.received_sequences = isinstance(data, (list, tuple)) and all(
            isinstance(s, Sequence) for s in data
        )
        self.pull_sizes = []  # rows per __getitem__ pull, in order
        if self.received_sequences:
            chunks = []
            for seq in data:
                bs = int(getattr(seq, "batch_size", Sequence.batch_size)) or 1
                for start in range(0, len(seq), bs):
                    c = np.asarray(seq[start : start + bs])
                    self.pull_sizes.append(len(c))
                    chunks.append(c)
            self._X = np.concatenate(chunks) if chunks else np.empty((0, 0))
        else:
            self._X = _densify(data)

    def num_data(self):
        return len(self._X)


class Booster:
    """Prior predictor over the Dataset labels — same spirit as the sklearn
    stubs: asserts orchestration, not learning quality."""

    def __init__(self, params, train_set, num_boost_round):
        self.params = dict(params)
        self.num_boost_round = int(num_boost_round)
        self.trained_rows_ = int(train_set.num_data())
        self.fitted_X_sum_ = float(np.asarray(train_set._X).sum())
        # ingest-pattern evidence for peak-RAM assertions (stays on the
        # booster because the Dataset never leaves the worker)
        self.received_sequences_ = train_set.received_sequences
        self.pull_sizes_ = list(train_set.pull_sizes)
        y = train_set.label if train_set.label is not None else np.zeros(1)
        obj = self.params.get("objective", "regression")
        self._n_class = int(self.params.get("num_class", 2))
        self._objective = obj
        if obj == "binary":
            self._prior = float(np.mean(y))
        elif obj == "multiclass":
            self._prior = np.bincount(
                y.astype(np.int64), minlength=self._n_class
            ) / max(len(y), 1)
        else:
            self._prior = float(np.mean(y))

    def predict(self, X, **kwargs):
        n = len(_densify(X))
        if self._objective == "binary":
            return np.full(n, self._prior)
        if self._objective == "multiclass":
            return np.tile(self._prior, (n, 1))
        return np.full(n, self._prior)


def train(params, train_set, num_boost_round=100):
    if train_set.num_data() == 0:
        raise ValueError("Found array with 0 sample(s) while a minimum of 1 is required")
    return Booster(params, train_set, num_boost_round)
