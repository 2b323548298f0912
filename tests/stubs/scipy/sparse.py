import numpy as np


class spmatrix:
    pass


class csr_matrix(spmatrix):
    """CSR triple (data, indices, indptr) + shape — constructor-compatible
    with scipy.sparse.csr_matrix((data, indices, indptr), shape=...)."""

    def __init__(self, arg, shape=None):
        data, indices, indptr = arg
        self.data = np.asarray(data, dtype=np.float64)
        self.indices = np.asarray(indices, dtype=np.int32)
        self.indptr = np.asarray(indptr, dtype=np.int64)
        self.shape = (
            shape
            if shape is not None
            else (len(self.indptr) - 1, int(self.indices.max()) + 1)
        )

    def toarray(self):
        out = np.zeros(self.shape, dtype=np.float64)
        for i in range(self.shape[0]):
            lo, hi = self.indptr[i], self.indptr[i + 1]
            out[i, self.indices[lo:hi]] = self.data[lo:hi]
        return out


def vstack(blocks, format="csr"):
    data = np.concatenate([b.data for b in blocks])
    indices = np.concatenate([b.indices for b in blocks])
    indptr = [np.asarray([0], dtype=np.int64)]
    off = 0
    for b in blocks:
        indptr.append(b.indptr[1:] + off)
        off += b.indptr[-1]
    n_rows = sum(b.shape[0] for b in blocks)
    n_cols = max(b.shape[1] for b in blocks)
    return csr_matrix((data, indices, np.concatenate(indptr)), shape=(n_rows, n_cols))
