"""Stub of pydata/sparse: just enough surface for core.concat's COO
branch (reference dask_lightgbm core.py:16-19,58-59) — COO wraps a dense
ndarray; concatenate stacks along axis 0. The real wheel replaces this
transparently (same names, same semantics)."""

import numpy as np


class COO:
    def __init__(self, dense):
        self._dense = np.asarray(dense)
        self.shape = self._dense.shape

    @classmethod
    def from_numpy(cls, arr):
        return cls(arr)

    def todense(self):
        return self._dense


def concatenate(arrays, axis=0):
    return COO(np.concatenate([a.todense() for a in arrays], axis=axis))
