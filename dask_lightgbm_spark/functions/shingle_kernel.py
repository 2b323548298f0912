"""Vectorized Arrow kernels for the shingle rolling hash and minhash —
bit-identical twins of the interpreted expression paths in operators/dedup.

Why this exists (r15 optimization round): Catalyst does not codegen
higher-order-function lambdas, so ``transform(sequence(...), g ->
poly_shingle_hash(...))`` evaluates an interpreted expression tree per
shingle POSITION (~15 nodes x 5 fold steps) and ``array_min(transform(hs,
h -> (a*h+b) % P))`` re-walks every hash per permutation. Measured at
sf0.1: the shingle projection alone is ~22 core-seconds; the same values
from a NumPy segmented kernel cost ~2 single-core seconds (guide §4.2:
hand whole Arrow batches to vectorized native code).

Exactness argument (the oracle-parity contract):

- codes: text is decoded to UTF-32-LE and read as uint32 — the per-char
  codepoint, exactly ``F.ascii``/DuckDB ``ascii`` on any input, not just
  ASCII (pinned bit-equal incl. array order by tests).
- rolling hash: h = (h*65599 + c) mod 2^32 per window position over a
  zero-padded code array (positions past the end contribute 0, matching
  try_element_at->coalesce(0) and DuckDB's ascii('')=0). Computed in
  uint64: intermediates < 2^49, the mask IS the mod — integer-exact.
- distinct: first-occurrence order, reproducing ``array_distinct``
  (single int64-key argsort on (row << 32 | hash); hashes < 2^32).
- minhash: (h*a + b) mod P in int64 (h < 2^32, a < 2^31 -> product < 2^63,
  no overflow on any engine) then a segmented min — order-free, identical
  to ``array_min(transform(...))``.

Streaming inputs keep the expression path (operators/dedup dispatches);
these kernels are batch-only by construction of mapInArrow callers.
"""

from __future__ import annotations

POLY_MULT = 65599
_MASK32 = 0xFFFFFFFF


def shingle_hashes_flat(texts, k: int):
    """Rolling-hash shingles for a batch of texts (list of str).

    Returns ``(values, offsets)``: int64 hash values of the distinct
    shingles of every text, concatenated in first-occurrence order, with
    ``offsets`` of length len(texts)+1 delimiting each text's slice.
    """
    import numpy as np

    n = len(texts)
    if n == 0:
        return (
            np.empty(0, dtype=np.int64),
            np.zeros(1, dtype=np.int64),
        )
    # NULL text encodes as '' — zero codes pad to k zeros, so hs = [0],
    # bit-identical to the expression path's NULL output (try_element_at
    # over a NULL array coalesces to 0 per window slot). Without this the
    # arrow fallback route (nulls force it) crashed on None.encode.
    bufs = [(t if t is not None else "").encode("utf-32-le") for t in texts]
    lens = np.fromiter((len(b) >> 2 for b in bufs), dtype=np.int64, count=n)
    codes = np.frombuffer(b"".join(bufs), dtype=np.uint32).astype(np.uint64)
    return _shingles_from_codes(codes, lens, k)


def shingle_hashes_flat_arrow(arr, k: int):
    """:func:`shingle_hashes_flat` taking the Arrow string array itself.

    Fast path: when the column is a plain ``string`` array with no nulls
    and no byte >= 0x80, the UTF-8 data buffer IS the codepoint sequence —
    the codes come straight from the Arrow buffers (one vectorized check +
    one uint8->uint64 widen; no per-row Python string, no re-encode).
    Anything else (non-ASCII, nulls, large_string) falls back to the
    ``to_pylist`` route, whose UTF-32 decode is exact on any input. Both
    routes produce identical values/offsets (same downstream kernel;
    pinned by the fuzz tests)."""
    import numpy as np
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return (
            np.empty(0, dtype=np.int64),
            np.zeros(1, dtype=np.int64),
        )
    if arr.null_count == 0 and pa.types.is_string(arr.type):
        bufs = arr.buffers()
        offs = np.frombuffer(bufs[1], dtype=np.int32)[
            arr.offset : arr.offset + n + 1
        ].astype(np.int64)
        if bufs[2] is None:
            seg = np.empty(0, dtype=np.uint8)
        else:
            seg = np.frombuffer(bufs[2], dtype=np.uint8)[offs[0] : offs[-1]]
        if not (seg & 0x80).any():
            lens = np.diff(offs)
            return _shingles_from_codes(seg.astype(np.uint64), lens, k)
    return shingle_hashes_flat(arr.to_pylist(), k)


def _shingles_from_codes(codes, lens, k: int):
    """Shared kernel body over flat per-char codepoints + per-doc lengths."""
    import numpy as np

    n = len(lens)
    n_pos = np.maximum(lens - (k - 1), 1)
    char_starts = np.concatenate(([0], np.cumsum(lens)[:-1]))

    # zero-padded flat code array so windows of short docs read 0 past the
    # end (the try_element_at->0 semantics). A doc's windows span
    # n_pos + k - 1 = max(len, k) slots: docs >= k need no padding at all —
    # and that is the common case, where the "padded" array is exactly the
    # code array (skip the 35 MB/batch scatter entirely); only a batch
    # containing a doc shorter than k builds the padded copy.
    if bool((lens >= k).all()):
        pad = codes
        pad_starts = char_starts
    else:
        padlens = np.maximum(lens, k)
        pad = np.zeros(int(padlens.sum()), dtype=np.uint64)
        doc_of_char = np.repeat(np.arange(n, dtype=np.int64), lens)
        pad_starts = np.concatenate(([0], np.cumsum(padlens)[:-1]))
        pad[
            pad_starts[doc_of_char]
            + (np.arange(len(codes), dtype=np.int64) - char_starts[doc_of_char])
        ] = codes

    # rolling hash of EVERY flat window start via contiguous slices (5
    # sequential passes, no gather), then ONE gather at the valid per-doc
    # window starts. Windows crossing doc boundaries are computed and
    # discarded — they are never gathered, so they cannot leak into
    # results; the fold itself is the identical uint64 mask-as-mod
    # sequence per window.
    m = len(pad) - (k - 1)
    h = np.zeros(m, dtype=np.uint64)
    for i in range(k):
        h = (h * POLY_MULT + pad[i : i + m]) & _MASK32

    # window start index (into pad) for every shingle position of every doc
    total_pos = int(n_pos.sum())
    pos_doc = np.repeat(np.arange(n, dtype=np.int64), n_pos)
    pos_starts = np.concatenate(([0], np.cumsum(n_pos)[:-1]))
    base = pad_starts[pos_doc] + (
        np.arange(total_pos, dtype=np.int64) - pos_starts[pos_doc]
    )
    hs = h[base].astype(np.int64)

    # first-occurrence distinct per doc: one stable argsort on the combined
    # key (doc << 32 | hash) — both fit, so the key is collision-free
    key = (pos_doc << np.int64(32)) | hs
    order = np.argsort(key, kind="stable")
    sk = key[order]
    first = np.ones(total_pos, dtype=bool)
    first[1:] = sk[1:] != sk[:-1]
    keep = order[first]
    keep.sort()  # docs are contiguous -> restores first-occurrence order
    values = hs[keep]
    counts = np.bincount(pos_doc[keep], minlength=n)
    offsets = np.concatenate(([0], np.cumsum(counts)))
    return values, offsets


def minhash_from_flat(values, offsets, coef, prime):
    """Segmented minhash over flat distinct-hash values: for each segment
    and each (a, b) in ``coef``, min((v*a + b) % prime). Returns an
    (n_segments, len(coef)) int64 matrix; empty segments yield -1 in the
    matrix and must be masked to NULL by the caller (array_min of an empty
    array is NULL on the expression path)."""
    import numpy as np

    n = len(offsets) - 1
    out = np.full((n, len(coef)), -1, dtype=np.int64)
    if len(values) == 0:
        return out
    starts = offsets[:-1]
    nonempty = offsets[1:] > starts
    for j, (a, b) in enumerate(coef):
        perm = (values * np.int64(a) + np.int64(b)) % np.int64(prime)
        mins = np.minimum.reduceat(perm, starts[nonempty])
        out[nonempty, j] = mins
    return out
