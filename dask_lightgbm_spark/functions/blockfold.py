"""Dimension-ordered block accumulation — THE bit-exactness kernel.

Every vectorized Arrow kernel in this engine (k-means assignment, IVF cell
assignment, brute-force KNN, PQ encode, PQ ADC LUTs) must produce doubles
bit-identical to the interpreted ``F.aggregate(zip_with(...))`` folds and
to DuckDB's ``list_reduce`` — that is the entire oracle-parity argument.
The invariant: accumulate DIMENSION-BY-DIMENSION across the row block, so
per element the op sequence is exactly the fold's multiply(-subtract)-add
chain. NumPy's own reductions (``(V*C).sum(axis=...)``, ``einsum``,
``np.linalg.norm``) use pairwise/SIMD summation and produce DIFFERENT
doubles — never substitute them here. This module is the single audited
home of the invariant (r6 review finding: it was previously copy-pasted
across five kernels, where one "optimization" could silently break parity
for one kernel while the other four's parity tests stayed green).

All helpers are pure NumPy and safe to import inside executor-side kernels
(the package ships to workers via addPyFile — see queries._ship_package).
"""

from __future__ import annotations


def fold_sq_dists(V, C):
    """(n, d) x (k, d) -> (n, k) squared L2 distances, dim-ordered:
    ``acc += (V[:,i] - C[:,i])**2`` per dimension — the exact op sequence of
    the sq_dist fold evaluated for every (row, centroid) pair."""
    import numpy as np

    acc = np.zeros((V.shape[0], C.shape[0]))
    for i in range(V.shape[1]):
        diff = V[:, i : i + 1] - C[:, i][None, :]
        acc += diff * diff
    return acc


def fold_dots(V, C):
    """(n, d) x (k, d) -> (n, k) dot products, dim-ordered:
    ``acc += V[:,i] * C[:,i]`` per dimension — the dot() fold's sequence."""
    import numpy as np

    acc = np.zeros((V.shape[0], C.shape[0]))
    for i in range(V.shape[1]):
        acc += V[:, i : i + 1] * C[:, i][None, :]
    return acc


def fold_sq_norms(X):
    """(n, d) -> (n,) SUM of squares (caller applies sqrt), dim-ordered:
    ``acc += X[:,i] * X[:,i]`` — the norm() fold's pre-sqrt sequence."""
    import numpy as np

    acc = np.zeros(X.shape[0])
    for i in range(X.shape[1]):
        acc += X[:, i] * X[:, i]
    return acc
