"""Minimal scipy stand-in (image has no scipy): just enough of
scipy.sparse for the engine's CSR assembly path — csr_matrix holding
(data, indices, indptr) with toarray(), which is all real lightgbm needs
from a CSR input. The Spark-side plumbing (unwrap_udt struct batches →
contiguous index/value buffers → csr_matrix constructor) is real; only the
container class is stubbed, mirroring the lightgbm stub approach."""
