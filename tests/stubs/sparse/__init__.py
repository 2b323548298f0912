"""Stub of pydata/sparse: just enough surface for core.concat's
pydata/sparse branch (reference dask_lightgbm core.py:16-19,58-59).
The reference tests ``isinstance(x, sparse.SparseArray)`` — the package's
abstract base that COO, GCXS and DOK all subclass — so the stub mirrors
that hierarchy: SparseArray is the base, COO/GCXS wrap a dense ndarray,
concatenate stacks along axis 0. The real wheel replaces this
transparently (same names, same semantics)."""

import numpy as np


class SparseArray:
    def __init__(self, dense):
        self._dense = np.asarray(dense)
        self.shape = self._dense.shape

    @classmethod
    def from_numpy(cls, arr):
        return cls(arr)

    def todense(self):
        return self._dense


class COO(SparseArray):
    pass


class GCXS(SparseArray):
    pass


def concatenate(arrays, axis=0):
    # real pydata/sparse returns the format of its inputs; the stub keeps
    # the first part's class so format is preserved through concat
    cls = type(arrays[0]) if arrays else COO
    return cls(np.concatenate([a.todense() for a in arrays], axis=axis))
