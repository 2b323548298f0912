"""Differential tests against INDEPENDENT pure-Python / pandas references.

The DuckDB oracle gate proves the Spark plan and the registered SQL agree —
but both were authored together, so a shared semantic misunderstanding would
pass it. Each test here re-derives the operator's contract from scratch
(hashlib/math/dict loops, or pandas), over hypothesis-generated inputs, and
requires exact agreement. Companion to tests/test_properties.py (which holds
the earlier t39/t44/grouped_topk/key_skew references).
"""

import hashlib
import math
import re

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st


@pytest.fixture(autouse=True)
def _clear_session_cache(request):
    """Drop every cached plan after each test. Several operators exercised
    here persist internally (minhash shingle arrays, components labels, the
    session-cached IVF index/graph), and hypothesis runs each test body 6-8
    times — without this, entries pile up in the shared session and every
    later ``unpersist()`` pays a CacheManager ``sameResult`` scan over ALL
    of them: O(entries) deep plan comparisons per call.
    ``release_caches`` (not bare ``clearCache``) so the ``_dls_*`` dicts are
    dropped too — a bare clear leaves them holding now-unpersisted
    DataFrames that later tests would keep serving uncached; the residual
    ``clearCache`` then drops plans cached outside the package's registry
    (per-round component labels). Both are plain list drops."""
    yield
    spark = request.node.funcargs.get("spark")
    if spark is not None:
        from dask_lightgbm_spark.session import release_caches

        release_caches(spark)
        spark.catalog.clearCache()

# Java regex \s is ASCII-only ([ \t\n\x0B\f\r]); Python's \s also matches
# unicode whitespace. The references below mirror the JVM class explicitly,
# and the text alphabets exclude unicode whitespace so the distinction can
# never blur what the test measures.
_JAVA_WS = r"[ \t\n\x0b\f\r]+"

_TOKEN_ALPHABET = st.characters(
    whitelist_categories=("Lu", "Ll", "Nd", "Po"),
    whitelist_characters=" \t\n",
)


def _py_simhash(text: str) -> int:
    """From-scratch 60-bit SimHash: distinct ASCII-whitespace tokens,
    md5→15-hex-char token hash, per-bit ±1 vote, pack bits with sum>0."""
    toks = {t for t in re.split(_JAVA_WS, text) if t}
    sums = [0] * 60
    for t in toks:
        h = int(hashlib.md5(t.encode("utf-8")).hexdigest()[:15], 16)
        for j in range(60):
            sums[j] += 1 if h & (1 << j) else -1
    return sum(1 << j for j in range(60) if sums[j] > 0)


@settings(max_examples=6, deadline=None)
@given(st.lists(st.text(_TOKEN_ALPHABET, max_size=60), min_size=1, max_size=15))
def test_simhash_matches_python_reference(spark, texts):
    from dask_lightgbm_spark.operators.dedup import simhash

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {r.doc_id: r.simhash for r in simhash(df, "doc_id", "text").collect()}
    assert got == {i: _py_simhash(t) for i, t in enumerate(texts)}


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.text(st.sampled_from("ab "), max_size=12), min_size=2, max_size=10
    ),
    st.integers(0, 4),
)
def test_simhash_neardup_pairs_matches_bruteforce(spark, texts, max_hamming):
    """The pigeonhole blocking must find EXACTLY the pairs a brute-force
    O(n²) hamming scan finds — completeness is the theorem (distance ≤ d
    forces agreement on ≥1 of d+1 blocks), exactness comes from the final
    filter. Tiny alphabet forces signature collisions and near-misses."""
    from dask_lightgbm_spark.operators.dedup import simhash_neardup_pairs

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_neardup_pairs(
            df, "doc_id", "text", max_hamming=max_hamming
        ).collect()
    }
    sigs = [_py_simhash(t) for t in texts]
    expected = {
        (i, j, bin(sigs[i] ^ sigs[j]).count("1"))
        for i in range(len(sigs))
        for j in range(i + 1, len(sigs))
        if bin(sigs[i] ^ sigs[j]).count("1") <= max_hamming
    }
    assert got == expected


@st.composite
def symmetric_edges(draw):
    raw = draw(
        st.lists(
            st.tuples(st.integers(0, 5), st.integers(0, 5)),
            min_size=1,
            max_size=20,
        )
    )
    # symmetrize so every node has an out-edge (the operator's contract)
    return sorted({(s, d) for s, d in raw} | {(d, s) for s, d in raw})


@settings(max_examples=6, deadline=None)
@given(symmetric_edges(), st.integers(1, 3))
def test_pagerank_int_matches_python(spark, edges, n_iters):
    """Integer-exact PageRank vs a dict-based power iteration: identical
    int64 micro-unit ranks (the determinism contract is that every engine
    computes the same integers — floor division and all)."""
    from dask_lightgbm_spark.operators.pagerank import pagerank_int

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank for r in pagerank_int(df, n_iters=n_iters).collect()}

    nodes = sorted({s for s, _ in edges})
    out_deg = {n: sum(1 for s, _ in edges if s == n) for n in nodes}
    rank = {n: 1_000_000 for n in nodes}
    for _ in range(n_iters):
        contrib: dict[int, int] = {}
        for s, d in edges:
            contrib[d] = contrib.get(d, 0) + rank[s] // out_deg[s]
        rank = {n: 150_000 + (85 * contrib.get(n, 0)) // 100 for n in nodes}
    assert got == rank


@st.composite
def upsert_frames(draw):
    keys = st.integers(0, 6)
    val = st.one_of(st.none(), st.integers(0, 99))
    tag = st.one_of(st.none(), st.sampled_from(["x", "y", "z"]))
    n_t = draw(st.integers(0, 6))
    n_u = draw(st.integers(0, 6))
    t_keys = draw(st.lists(keys, min_size=n_t, max_size=n_t, unique=True))
    u_keys = draw(st.lists(keys, min_size=n_u, max_size=n_u, unique=True))
    target = [(k, draw(val), draw(tag)) for k in t_keys]
    updates = [(k, draw(val), draw(tag)) for k in u_keys]
    return target, updates


def _py_upsert(target, updates):
    t = {r[0]: r for r in target}
    u = {r[0]: r for r in updates}
    out = set()
    for k in set(t) | set(u):
        if k in t and k in u:
            # per-column COALESCE: NULL in the update keeps the target value
            out.add(
                tuple(
                    uv if uv is not None else tv
                    for uv, tv in zip(u[k], t[k])
                )
            )
        else:
            out.add(t.get(k) or u[k])
    return out


@settings(max_examples=8, deadline=None)
@given(upsert_frames())
def test_merge_upsert_matches_python(spark, frames):
    from dask_lightgbm_spark.operators.merge import merge_upsert

    target, updates = frames
    schema = "k long, v long, tag string"
    got = {
        (r.k, r.v, r.tag)
        for r in merge_upsert(
            spark.createDataFrame(target, schema),
            spark.createDataFrame(updates, schema),
            "k",
        ).collect()
    }
    assert got == _py_upsert(target, updates)


@st.composite
def cdc_frames(draw):
    target, updates = draw(upsert_frames())
    ops = [(k, v, tag, "U") for k, v, tag in updates]
    del_keys = draw(st.lists(st.integers(0, 6), max_size=4, unique=True))
    # a delete may target a key that also has a 'U' row (delete-then-upsert)
    ops += [(k, None, None, "D") for k in del_keys]
    return target, ops


@settings(max_examples=8, deadline=None)
@given(cdc_frames())
def test_merge_cdc_matches_python(spark, frames):
    """Delete-then-upsert ordering: a key with both 'D' and 'U' rows drops
    the target row and inserts the update fresh."""
    from dask_lightgbm_spark.operators.merge import merge_cdc

    target, changes = frames
    got = {
        (r.k, r.v, r.tag)
        for r in merge_cdc(
            spark.createDataFrame(target, "k long, v long, tag string"),
            spark.createDataFrame(changes, "k long, v long, tag string, op string"),
            "k",
        ).collect()
    }
    del_keys = {k for k, _, _, op in changes if op == "D"}
    kept = [r for r in target if r[0] not in del_keys]
    ups = [(k, v, tag) for k, v, tag, op in changes if op != "D"]
    assert got == _py_upsert(kept, ups)


@st.composite
def mmr_inputs(draw):
    n = draw(st.integers(1, 6))
    # exact binary fractions: selection ties resolve identically everywhere
    frac = st.integers(0, 8).map(lambda i: i / 8.0)
    rel = [(0, nid, draw(frac)) for nid in range(n)]
    sims = {}
    for a in range(n):
        for b in range(a + 1, n):
            sims[(a, b)] = draw(frac)
    pair_rows = [(0, a, b, s) for (a, b), s in sims.items()]
    pair_rows += [(0, b, a, s) for (a, b), s in sims.items()]
    k = draw(st.integers(1, 5))
    return rel, pair_rows, sims, k


@settings(max_examples=8, deadline=None)
@given(mmr_inputs())
def test_mmr_rerank_matches_python_greedy(spark, inp):
    from dask_lightgbm_spark.operators.similarity import mmr_rerank

    rel, pair_rows, sims, k = inp
    lam = 0.7
    got = [
        (r.nid, r.mmr_rank)
        for r in mmr_rerank(
            spark.createDataFrame(rel, "qid long, nid long, rel double"),
            spark.createDataFrame(
                pair_rows, "qid long, a long, b long, sim double"
            ),
            k=k,
            lam=lam,
        )
        .orderBy("mmr_rank")
        .collect()
    ]

    relm = {nid: r for _, nid, r in rel}
    simm = {(a, b): s for (a, b), s in sims.items()}
    simm.update({(b, a): s for (a, b), s in sims.items()})
    picked: list[int] = []
    while len(picked) < k and len(picked) < len(relm):
        best = None
        for n_, r_ in relm.items():
            if n_ in picked:
                continue
            if picked:
                score = lam * r_ - (1.0 - lam) * max(
                    simm[(n_, p)] for p in picked
                )
            else:
                score = r_
            key = (-score, n_)
            if best is None or key < best:
                best = key
        picked.append(best[1])
    assert got == [(n_, i + 1) for i, n_ in enumerate(picked)]


@st.composite
def knn_vectors(draw):
    dim = draw(st.integers(2, 4))
    coord = st.integers(-3, 3)
    vec = st.lists(coord, min_size=dim, max_size=dim)
    n_c = draw(st.integers(1, 10))
    n_q = draw(st.integers(1, 4))
    corpus = [(i, [float(x) for x in draw(vec)]) for i in range(n_c)]
    queries = [(100 + i, [float(x) for x in draw(vec)]) for i in range(n_q)]
    return corpus, queries, draw(st.integers(1, 4))


@settings(max_examples=6, deadline=None)
@given(knn_vectors())
def test_brute_force_knn_matches_python(spark, inp):
    """Exact cosine top-k vs a math.sqrt/dict reference — including the
    zero-norm contract (NULL cosine, ranked last, nid ascending) and the
    (desc cos, asc nid) tie order. Integer-valued coords keep every dot
    product exact so float equality is bit-for-bit."""
    from dask_lightgbm_spark.operators.similarity import brute_force_knn

    corpus, queries, k = inp
    schema = "vec_id long, embedding array<double>"
    got = [
        (r.qid, r.nid, r.rank, r.cos)
        for r in brute_force_knn(
            spark.createDataFrame(corpus, schema),
            spark.createDataFrame(queries, schema),
            k=k,
        )
        .orderBy("qid", "rank")
        .collect()
    ]

    expected = []
    for qid, qv in sorted(queries):
        nq = math.sqrt(sum(x * x for x in qv))
        scored = []
        for nid, cv in corpus:
            nv = math.sqrt(sum(x * x for x in cv))
            denom = nq * nv
            cos = (
                sum(a * b for a, b in zip(cv, qv)) / denom if denom else None
            )
            scored.append((nid, cos))
        # desc cos, nulls last, nid asc
        scored.sort(key=lambda t: (t[1] is None, -(t[1] or 0.0), t[0]))
        expected += [
            (qid, nid, rank + 1, cos)
            for rank, (nid, cos) in enumerate(scored[:k])
        ]
    assert got == expected


@st.composite
def event_frames(draw):
    n = draw(st.integers(1, 40))
    users = st.integers(0, 3)
    # microsecond epochs spanning several 30-min gaps
    ts = st.integers(0, 4 * 1800 * 1_000_000)
    etype = st.sampled_from(["view", "purchase", "error"])
    val = st.integers(0, 500)
    rows = [
        (
            i,
            draw(ts),
            draw(users),
            draw(etype),
            draw(val) / 100.0,
            "{}",
        )
        for i in range(n)
    ]
    return rows


def _write_events(tmp_path_factory, rows, name):
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = tmp_path_factory.mktemp(name)
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, out / "events.parquet")
    return str(out)


@settings(max_examples=6, deadline=None)
@given(event_frames())
def test_q15_sessionize_matches_pandas(spark, tmp_path_factory, rows):
    """30-min-gap sessionization vs a pandas groupby scan: session starts
    where the gap from the previous event (ordered ts, event_id) exceeds
    exactly 1800s — boundary inclusive/exclusive pinned by the reference."""
    from dask_lightgbm_spark.queries import all_queries

    sf = _write_events(tmp_path_factory, rows, "q15prop")
    got = {
        r.user_id: (r.n_sessions, r.n_events)
        for r in all_queries()["q15_sessionize"](spark, sf).collect()
    }

    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    expected = {}
    for uid, g in pdf.sort_values(["ts", "event_id"]).groupby("user_id"):
        t = list(g["ts"])
        n_sessions = sum(
            1
            for i in range(len(t))
            if i == 0 or t[i] - t[i - 1] > 1800 * 1_000_000
        )
        expected[uid] = (n_sessions, len(t))
    assert got == expected


@settings(max_examples=6, deadline=None)
@given(event_frames())
def test_q57_forward_fill_matches_pandas(spark, tmp_path_factory, rows):
    """last_value IGNORE NULLS forward fill vs pandas groupby-ffill over
    the same (ts, event_id) total order."""
    from dask_lightgbm_spark.queries import all_queries

    sf = _write_events(tmp_path_factory, rows, "q57prop")
    got = {
        r.event_id: r.last_purchase_value
        for r in all_queries()["q57_forward_fill"](spark, sf).collect()
    }

    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf = pdf.sort_values(["ts", "event_id"])
    pdf["marked"] = pdf["value"].where(pdf["event_type"] == "purchase")
    pdf["ffill"] = pdf.groupby("user_id")["marked"].ffill()
    expected = {
        int(r.event_id): (None if pd.isna(r.ffill) else float(r.ffill))
        for r in pdf.itertuples()
    }
    assert got == expected


def _py_cos(a, b):
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    denom = na * nb
    return sum(x * y for x, y in zip(a, b)) / denom if denom else None


def _cos_order(pairs):
    """(id, cos) list → sorted by desc cos NULLS LAST, id asc — the rank
    order every ANN operator in the package uses."""
    return sorted(pairs, key=lambda t: (t[1] is None, -(t[1] or 0.0), t[0]))


@st.composite
def ivf_inputs(draw):
    dim = draw(st.integers(2, 3))
    coord = st.integers(-2, 2)
    vec = st.lists(coord, min_size=dim, max_size=dim)
    n = draw(st.integers(3, 12))
    corpus = [(i, [float(x) for x in draw(vec)]) for i in range(n)]
    return corpus, draw(st.integers(1, 2)), draw(st.integers(1, 3))


@settings(max_examples=6, deadline=None)
@given(ivf_inputs())
def test_ivf_knn_matches_python(spark, inp):
    """End-to-end IVF (storage assignment → probe assignment → in-cell
    scoring) vs a from-scratch reference: nearest-centroid cells with the
    (cos desc NULLS LAST, centroid-id asc) tie order — including zero-norm
    vectors, whose NULL cosines must fall to the lowest-id centroid — then
    exact per-cell top-k. Checks BOTH the struct-max argmax (nprobe=1
    storage) and the rank-window path (nprobe=2 probes) agree with the
    declared semantics."""
    from pyspark.sql import functions as F

    from dask_lightgbm_spark.operators.similarity import ivf_knn

    corpus, nprobe, k = inp
    df = spark.createDataFrame(corpus, "vec_id long, embedding array<double>")
    got = [
        (r.qid, r.nid, r.rank, r.cos)
        for r in ivf_knn(
            df,
            queries_filter=F.col("vec_id") < 2,
            centroid_filter=F.col("vec_id") % 3 == 0,
            k=k,
            nprobe=nprobe,
        )
        .orderBy("qid", "rank")
        .collect()
    ]

    cents = [(i, v) for i, v in corpus if i % 3 == 0]
    cell = {
        i: _cos_order([(cid, _py_cos(v, cv)) for cid, cv in cents])[0][0]
        for i, v in corpus
    }
    expected = []
    for qid, qv in corpus:
        if qid >= 2:
            continue
        probed = [
            cid
            for cid, _ in _cos_order(
                [(cid, _py_cos(qv, cv)) for cid, cv in cents]
            )[:nprobe]
        ]
        cands = [
            (nid, _py_cos(qv, nv))
            for nid, nv in corpus
            if nid != qid and cell[nid] in probed
        ]
        expected += [
            (qid, nid, rank + 1, cos)
            for rank, (nid, cos) in enumerate(_cos_order(cands)[:k])
        ]
    assert got == expected


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(-2, 2), min_size=64, max_size=64),
        min_size=2,
        max_size=8,
    ),
    st.sampled_from([0, 1]),
)
def test_lsh_knn_matches_python(spark, vecs, hamming_probe):
    """Sign-LSH bucketing vs a reference that re-derives the bucket ids
    from the module's own PLANES constants (projection > 0 → bit set),
    including the Hamming-1 multiprobe expansion."""
    from pyspark.sql import functions as F

    from dask_lightgbm_spark.operators.similarity import (
        N_PLANES,
        PLANES,
        lsh_knn,
    )

    corpus = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(corpus, "vec_id long, embedding array<double>")
    k = 3
    got = [
        (r.qid, r.nid, r.rank, r.cos)
        for r in lsh_knn(
            df,
            queries_filter=F.col("vec_id") < 2,
            k=k,
            hamming_probe=hamming_probe,
        )
        .orderBy("qid", "rank")
        .collect()
    ]

    def bucket(v):
        return sum(
            1 << p
            for p, plane in enumerate(PLANES)
            if sum(x * y for x, y in zip(v, plane)) > 0
        )

    bkt = {i: bucket(v) for i, v in corpus}
    expected = []
    for qid, qv in corpus:
        if qid >= 2:
            continue
        probes = {bkt[qid]}
        if hamming_probe == 1:
            probes |= {bkt[qid] ^ (1 << p) for p in range(N_PLANES)}
        cands = [
            (nid, _py_cos(qv, nv))
            for nid, nv in corpus
            if nid != qid and bkt[nid] in probes
        ]
        expected += [
            (qid, nid, rank + 1, cos)
            for rank, (nid, cos) in enumerate(_cos_order(cands)[:k])
        ]
    assert got == expected


@settings(max_examples=6, deadline=None)
@given(knn_vectors())
def test_quantized_knn_matches_python(spark, inp):
    """int8 symmetric quantization (floor, per-vector 127/max|x| scale,
    zero vector → zero code) + exact int64 dot scoring vs a math.floor
    reference — floor of an IEEE double product is bit-identical, which is
    the operator's stated reason for floor over round."""
    from dask_lightgbm_spark.operators.similarity import quantized_knn

    corpus, queries, k = inp
    schema = "vec_id long, embedding array<double>"
    got = [
        (r.qid, r.nid, r.rank, r.qscore)
        for r in quantized_knn(
            spark.createDataFrame(corpus, schema),
            spark.createDataFrame(queries, schema),
            k=k,
        )
        .orderBy("qid", "rank")
        .collect()
    ]

    def quant(v):
        m = max(abs(x) for x in v)
        if m == 0.0:
            return [0] * len(v)
        scale = 127.0 / m
        return [math.floor(x * scale) for x in v]

    expected = []
    for qid, qv in sorted(queries):
        qq = quant(qv)
        scored = [
            (nid, sum(a * b for a, b in zip(quant(nv), qq)))
            for nid, nv in corpus
            if nid != qid
        ]
        scored.sort(key=lambda t: (-t[1], t[0]))
        expected += [
            (qid, nid, rank + 1, s)
            for rank, (nid, s) in enumerate(scored[:k])
        ]
    assert got == expected


def _py_shingle_hashes(text: str, k: int) -> list[int]:
    """Rolling-hash distinct shingle set, mirroring poly_shingle_hash:
    h = fold(h*65599 + code) mod 2^32 over k 1-based positions, with
    positions past the end contributing code 0."""
    codes = [ord(c) for c in text]
    n_pos = max(len(text) - (k - 1), 1)
    out = []
    for g in range(1, n_pos + 1):
        h = 0
        for i in range(k):
            c = codes[g + i - 1] if g + i - 1 < len(codes) else 0
            h = (h * 65599 + c) % 2**32
        out.append(h)
    return sorted(set(out))


def _py_minhash_pairs(docs, k, num_perm, band_size, threshold):
    from dask_lightgbm_spark.functions.hashing import (
        MINHASH_COEF,
        MINHASH_PRIME,
    )

    hs = {i: _py_shingle_hashes(t, k) for i, t in docs}
    sig = {
        i: [
            min((h * MINHASH_COEF[p][0] + MINHASH_COEF[p][1]) % MINHASH_PRIME for h in v)
            for p in range(num_perm)
        ]
        for i, v in hs.items()
    }
    ids = sorted(sig)
    est_min = num_perm // 2
    out = set()
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            banded = any(
                sig[a][j * band_size : (j + 1) * band_size]
                == sig[b][j * band_size : (j + 1) * band_size]
                for j in range(num_perm // band_size)
            )
            if not banded:
                continue
            if sum(x == y for x, y in zip(sig[a], sig[b])) < est_min:
                continue
            sa, sb = set(hs[a]), set(hs[b])
            inter = len(sa & sb)
            jac = inter / (len(sa) + len(sb) - inter)
            if jac >= threshold:
                out.add((a, b, jac))
    return out


@st.composite
def minhash_corpora(draw):
    n = draw(st.integers(2, 8))
    base = draw(st.text(st.sampled_from("abc "), min_size=0, max_size=20))
    docs = []
    for i in range(n):
        # mix of near-copies of a base string (forced candidate pairs) and
        # independent texts (banding must reject them)
        if draw(st.booleans()):
            t = base + draw(st.text(st.sampled_from("abc "), max_size=4))
        else:
            t = draw(st.text(st.sampled_from("xyz "), max_size=20))
        docs.append((i, t))
    return docs


@settings(max_examples=6, deadline=None)
@given(minhash_corpora(), st.sampled_from([None, 2]))
def test_minhash_lsh_neardup_matches_python(spark, docs, bucket_cap):
    """The flagship dedup pipeline end to end — rolling-hash shingles →
    fixed-permutation minhash → banded candidates → signature-estimate
    prefilter → exact-Jaccard verify — vs a from-scratch reference, with
    and without the hot-bucket salting (bucket_cap must not change the
    result set, only the shuffle shape)."""
    from dask_lightgbm_spark.operators.dedup import minhash_lsh_neardup

    k, num_perm, band_size, threshold = 3, 8, 2, 0.3
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b, r.jaccard)
        for r in minhash_lsh_neardup(
            df,
            "doc_id",
            "text",
            k_shingle=k,
            num_perm=num_perm,
            band_size=band_size,
            threshold=threshold,
            bucket_cap=bucket_cap,
        ).collect()
    }
    assert got == _py_minhash_pairs(docs, k, num_perm, band_size, threshold)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.integers(0, 20), min_size=1, max_size=60),
    st.sampled_from([1, 3, 8]),
    st.sampled_from([1, 4]),
)
def test_prefix_sum_partition_layout_invariant(spark, counts, n_parts, n_buckets):
    """The two-level prefix sum (and the sequence packer on top of it) must
    produce identical results for ANY input partition layout — the property
    that makes it safe on a cluster where the scan's split count is an
    execution detail. Verifies against a plain Python running total."""
    from dask_lightgbm_spark.operators.prefix_sum import (
        global_cumsum,
        pack_sequences,
    )

    rows = list(enumerate(counts))
    df = spark.createDataFrame(rows, "doc_id long, n long").repartition(n_parts)

    got = {
        r.doc_id: r.cumsum
        for r in global_cumsum(
            df, "doc_id", "n", n_buckets=n_buckets
        ).collect()
    }
    acc, expected = 0, {}
    for i, c in rows:
        acc += c
        expected[i] = acc
    assert got == expected

    seq_len = 7
    packed = {
        r.doc_id: (r.start_tok, r.end_tok, r.first_chunk, r.last_chunk, r.n_chunks)
        for r in pack_sequences(df, "doc_id", "n", seq_len=seq_len).collect()
    }
    for i, c in rows:
        start = expected[i] - c
        end = expected[i]
        first = start // seq_len
        last = (end - 1) // seq_len if c > 0 else first
        n_chunks = last - first + 1 if c > 0 else 0
        assert packed[i] == (start, end, first, last, n_chunks), (i, packed[i])


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 3),
            st.integers(0, 1000),
            st.sampled_from(["view", "click", "purchase"]),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_q40_funnel_matches_python(spark, tmp_path_factory, evs):
    """Ordered-funnel counting vs a dict reference: per-user MIN timestamp
    per stage, then STRICT t_view < t_click < t_purchase — equal timestamps
    must not advance the funnel, and a user with clicks but no view counts
    only as a user."""
    from dask_lightgbm_spark.queries import all_queries

    rows = [
        (i, ts * 1_000_000, uid, et, 0.0, "{}")
        for i, (uid, ts, et) in enumerate(evs)
    ]
    sf = _write_events(tmp_path_factory, rows, "q40prop")
    r = all_queries()["q40_funnel"](spark, sf).collect()[0]

    stages: dict[int, dict[str, int]] = {}
    for uid, ts, et in evs:
        s = stages.setdefault(uid, {})
        s[et] = min(s.get(et, ts * 1_000_000), ts * 1_000_000)
    n_users = len(stages)
    n_viewed = sum(1 for s in stages.values() if "view" in s)
    n_clicked = sum(
        1
        for s in stages.values()
        if "view" in s and "click" in s and s["click"] > s["view"]
    )
    n_full = sum(
        1
        for s in stages.values()
        if "view" in s
        and "click" in s
        and "purchase" in s
        and s["click"] > s["view"]
        and s["purchase"] > s["click"]
    )
    assert (r.n_users, r.n_viewed, r.n_clicked_after, r.n_full_funnel) == (
        n_users,
        n_viewed,
        n_clicked,
        n_full,
    )


@settings(max_examples=4, deadline=None)
@given(
    st.lists(
        st.lists(
            st.tuples(st.integers(0, 3), st.integers(0, 50000)),
            min_size=1,
            max_size=12,
        ),
        min_size=2,
        max_size=4,
    )
)
def test_stateful_stream_totals_across_microbatches(
    spark, tmp_path_factory, batches
):
    """The applyInPandasWithState user-totals operator folded across
    SEVERAL real micro-batches (one file per trigger) vs a Python running
    fold. The catalog's oracle drains the single fixture file in ONE batch,
    so the cross-batch state path — state.exists, reload, re-fold — is
    exactly what this exercises: per-user emitted totals must step
    monotonically, one update row per batch containing the user, ending at
    the whole-input total."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dask_lightgbm_spark.streaming.sessions import stream_user_totals

    out = tmp_path_factory.mktemp("xstate")
    eid = 0
    for bi, batch in enumerate(batches):
        rows = []
        for uid, cents in batch:
            rows.append((eid, eid * 1_000_000, uid, "view", cents / 100.0, "{}"))
            eid += 1
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array([r[5] for r in rows], pa.string()),
            }
        )
        pq.write_table(tbl, out / f"events_{bi}.parquet")

    got = stream_user_totals(
        spark, str(out), glob="events_*.parquet", max_files_per_trigger=1
    ).collect()

    # final totals: the row with the largest n_events per user
    final = {}
    per_user_rows = {}
    for r in got:
        per_user_rows.setdefault(r.user_id, []).append(r.n_events)
        if r.user_id not in final or r.n_events > final[r.user_id][0]:
            final[r.user_id] = (r.n_events, r.sum_value)

    expected = {}
    for batch in batches:
        for uid, cents in batch:
            n, s = expected.get(uid, (0, 0))
            expected[uid] = (n + 1, s + cents)
    assert final == {
        uid: (n, s / 100.0) for uid, (n, s) in expected.items()
    }
    for uid, ns in per_user_rows.items():
        # one update row per micro-batch containing the user, counts
        # strictly increasing — the state really crossed batches
        assert sorted(ns) == ns and len(set(ns)) == len(ns)
        assert len(ns) == sum(
            1 for batch in batches if any(u == uid for u, _ in batch)
        )


def test_dedup_within_watermark_suppresses_across_microbatches(
    spark, tmp_path_factory
):
    """Cross-batch dedup state: a duplicate (user, event_type) arriving in
    a LATER micro-batch (inside the watermark window) must be suppressed,
    while a new key in that batch counts — the state really persists
    between triggers. The catalog's single-file drain can't distinguish
    cross-batch suppression from plain in-batch dedup; this can."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dask_lightgbm_spark.streaming.events import (
        stream_dedup_within_watermark,
    )

    out = tmp_path_factory.mktemp("xdedupwm")
    base_us = 1_700_000_000_000_000
    batches = [
        # (user_id, event_type, minutes-offset)
        [(1, "view", 0), (2, "view", 1), (1, "click", 2)],
        # u1 view again 5 min later (dup, within the 1 h watermark window)
        # + a brand-new u3 view
        [(1, "view", 5), (3, "view", 6)],
        # u2 view dup again, + first purchase
        [(2, "view", 10), (4, "purchase", 11)],
    ]
    eid = 0
    for bi, batch in enumerate(batches):
        rows = [
            (eid + i, base_us + mins * 60_000_000, uid, et, 0.0, "{}")
            for i, (uid, et, mins) in enumerate(batch)
        ]
        eid += len(rows)
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array([r[5] for r in rows], pa.string()),
            }
        )
        pq.write_table(tbl, out / f"events_{bi}.parquet")

    got = {
        r.event_type: r.n_users
        for r in stream_dedup_within_watermark(
            spark, str(out), glob="events_*.parquet", max_files_per_trigger=1
        ).collect()
    }
    # distinct (user, type) pairs across ALL batches: view {1,2,3},
    # click {1}, purchase {4} — the batch-2/3 dups must not recount
    assert got == {"view": 3, "click": 1, "purchase": 1}


def _write_event_batches(tmp_path_factory, name, batches):
    """batches: list of [(user_id, minutes_offset, value)] or
    [(user_id, minutes_offset, value, event_type)] → one parquet file per
    batch (events_<i>.parquet), full events schema."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = tmp_path_factory.mktemp(name)
    base_us = 1_700_000_000_000_000
    eid = 0
    for bi, batch in enumerate(batches):
        rows = [
            (
                eid + i,
                base_us + t[1] * 60_000_000,
                t[0],
                t[3] if len(t) > 3 else "view",
                t[2],
                "{}",
            )
            for i, t in enumerate(batch)
        ]
        eid += len(rows)
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array([r[5] for r in rows], pa.string()),
            }
        )
        pq.write_table(tbl, out / f"events_{bi}.parquet")
    return str(out), base_us


def test_session_window_merges_across_microbatches(spark, tmp_path_factory):
    """A session must EXTEND when a later micro-batch delivers an event
    within the gap of its current end — cross-trigger session-state merge,
    invisible on the catalog's single-file drain. The extended session
    emits once the watermark (advanced by a far-future batch) passes its
    end; the far-future session stays open and is withheld."""
    from dask_lightgbm_spark.streaming.events import stream_session_window

    sf, base_us = _write_event_batches(
        tmp_path_factory,
        "xsesswin",
        [
            [(1, 0, 1.0), (1, 10, 1.0)],
            [(1, 25, 1.0)],  # 15 min after last event: inside the 30-min gap
            [(1, 300, 1.0)],  # advances the watermark; starts a new session
        ],
    )
    got = stream_session_window(
        spark, sf, glob="events_*.parquet", max_files_per_trigger=1
    ).collect()
    assert len(got) == 1, got
    r = got[0]
    assert (
        r.user_id,
        r.n_events,
        r.sum_value,
        int(r.session_start.timestamp() * 1_000_000),
    ) == (1, 3, 3.0, base_us)


def test_interval_join_matches_across_microbatches(spark, tmp_path_factory):
    """Stream-stream inner join state: a view buffered in trigger 1 must
    match a purchase arriving in trigger 2 (within the horizon) — the
    cross-batch buffering the single-file drain never exercises; a
    purchase with no view must not emit."""
    from dask_lightgbm_spark.streaming.events import (
        stream_stream_interval_join,
    )

    sf, _ = _write_event_batches(
        tmp_path_factory,
        "xssjoin",
        [
            [(1, 0, 1.0, "view")],
            [(1, 5, 2.0, "purchase"), (2, 6, 3.0, "purchase")],
        ],
    )
    got = [
        (r.user_id, r.view_id, r.purchase_id)
        for r in stream_stream_interval_join(
            spark, sf, glob="events_*.parquet", max_files_per_trigger=1
        ).collect()
    ]
    assert got == [(1, 0, 1)]


def test_event_time_timeout_evicts_state(spark, tmp_path_factory):
    """Watermark-bounded state: EventTimeTimeout must EVICT a user's state
    once the watermark passes last-event + ttl — the kernel emits a final
    closed=true row and a reappearing user restarts from ZERO (state
    really removed, not merely hidden). This is the claim the scale story
    makes for applyInPandasWithState's 100 TB footprint (resident state ~
    keys active in the ttl horizon, not all keys ever seen)."""
    from dask_lightgbm_spark.streaming.sessions import stream_user_totals_ttl

    # watermark advances at END of each batch, so: user 1's timeout
    # (minute 1 + 30 min ttl = 31) is passed once batch 2 (minute 120)
    # commits; batch 3's processing then fires the timeout.
    batches = [
        [(1, 0, 1.0), (1, 1, 1.0)],  # user 1: n=2
        [(2, 120, 1.0)],  # advances watermark to 120 min
        [(3, 121, 1.0)],  # processing fires user 1's timeout
        [(1, 122, 1.0)],  # user 1 reappears — must restart from zero
    ]
    sf, _ = _write_event_batches(tmp_path_factory, "xttl", batches)
    got = stream_user_totals_ttl(
        spark,
        sf,
        ttl_ms=30 * 60_000,
        glob="events_*.parquet",
        max_files_per_trigger=1,
    ).collect()
    by_user: dict[int, list[tuple[int, float, bool]]] = {}
    for r in got:
        by_user.setdefault(int(r.user_id), []).append(
            (int(r.n_events), r.sum_value, bool(r.closed))
        )
    # user 1: running total, evicted-closed row, then restart from zero
    assert by_user[1] == [(2, 2.0, False), (2, 2.0, True), (1, 1.0, False)]
    # users 2/3: still inside their ttl horizon at drain end — open only
    assert by_user[2] == [(1, 1.0, False)]
    assert by_user[3] == [(1, 1.0, False)]


def test_ttl_late_batch_cannot_shrink_eviction_horizon(
    spark, tmp_path_factory
):
    """Out-of-order regime (nonzero watermark delay, small ttl): a LATE but
    in-watermark batch must not move a key's timeout BACKWARD. The eviction
    horizon is last-event-ever + ttl, not last-batch-max + ttl — a kernel
    that recomputes the timeout from only the current batch evicts user 1
    after the minute-171 straggler (171+5 < the minute-200 watermark) and
    the minute-202 event then restarts the count from zero. With last_ms
    carried in state, user 1 stays open through the whole drain."""
    from dask_lightgbm_spark.streaming.sessions import stream_user_totals_ttl

    # delay 60 min, ttl 5 min; watermark advances at END of each batch:
    # 140 / 170 / 170 / 200 / 201 after batches 1-5
    batches = [
        [(1, 200, 1.0)],  # u1 horizon = 205
        [(2, 230, 1.0)],  # wm -> 170
        [(1, 171, 1.0)],  # late straggler: batch-local horizon would be 176
        [(3, 260, 1.0)],  # wm -> 200: 176 < 200 would evict u1 here
        [(9, 261, 1.0)],  # timeout check vs wm=200 happens this batch
        [(1, 202, 1.0)],  # in-watermark (wm=201): must fold into n=3
    ]
    sf, _ = _write_event_batches(tmp_path_factory, "xttl_late", batches)
    got = stream_user_totals_ttl(
        spark,
        sf,
        ttl_ms=5 * 60_000,
        delay="60 minutes",
        glob="events_*.parquet",
        max_files_per_trigger=1,
    ).collect()
    u1 = [
        (int(r.n_events), bool(r.closed))
        for r in got
        if int(r.user_id) == 1
    ]
    assert u1 == [(1, False), (2, False), (3, False)], u1


def test_ttl_zero_with_delay_survives(spark, tmp_path_factory):
    """ttl_ms=0 + nonzero delay puts the naive timeout (last_ms + 0) AT the
    watermark whenever an event arrives exactly on it — setTimeoutTimestamp
    throws on that, killing the whole query. The watermark+1 clamp keeps
    the query alive; the key is simply evicted at the next advance."""
    from dask_lightgbm_spark.streaming.sessions import stream_user_totals_ttl

    batches = [
        [(1, 100, 1.0)],  # wm -> 40
        [(2, 160, 1.0)],  # wm -> 100
        [(1, 100, 1.0)],  # event exactly AT the watermark, timeout = wm
        [(3, 220, 1.0)],  # advances wm past the clamped timeout -> evict
        [(4, 221, 1.0)],  # timeout check fires this batch
    ]
    sf, _ = _write_event_batches(tmp_path_factory, "xttl_zero", batches)
    got = stream_user_totals_ttl(
        spark,
        sf,
        ttl_ms=0,
        delay="60 minutes",
        glob="events_*.parquet",
        max_files_per_trigger=1,
    ).collect()
    u1 = [
        (int(r.n_events), bool(r.closed))
        for r in got
        if int(r.user_id) == 1
    ]
    # both open rows arrive, then the clamped timeout evicts with n=2
    assert u1[:2] == [(1, False), (2, False)], u1
    assert (2, True) in u1[2:], u1


def test_hourly_agg_folds_across_microbatches(spark, tmp_path_factory):
    """Complete-mode windowed agg folded across 3 real micro-batches (the
    bench's streaming-stanza drain shape): the final snapshot must equal a
    pure-Python fold over all batches — repeated (hour, type) groups across
    triggers exercise the running-agg state the single-file drain never
    touches."""
    from dask_lightgbm_spark.streaming.events import stream_hourly_aggregate

    batches = [
        [(1, 0, 1.0, "view"), (2, 10, 2.5, "click")],
        [(1, 20, 0.5, "view"), (3, 70, 1.0, "view")],
        [(2, 75, 2.0, "click")],
    ]
    sf, base_us = _write_event_batches(tmp_path_factory, "xhourly", batches)
    got = {
        (int(r.hour.timestamp() * 1_000_000), r.event_type): (r.n, r.sum_value)
        for r in stream_hourly_aggregate(
            spark, sf, glob="events_*.parquet", max_files_per_trigger=1
        ).collect()
    }
    expected: dict[tuple[int, str], tuple[int, float]] = {}
    for batch in batches:
        for uid, minutes, value, etype in batch:
            ts = pd.Timestamp(base_us + minutes * 60_000_000, unit="us")
            key = (int(ts.floor("h").timestamp() * 1_000_000), etype)
            n, cents = expected.get(key, (0, 0))
            expected[key] = (n + 1, cents + round(value * 100))
    assert got == {k: (n, cents / 100.0) for k, (n, cents) in expected.items()}


def test_static_join_agg_across_microbatches(spark, tmp_path_factory):
    """Stream-static broadcast join + complete-mode agg across 3 real
    micro-batches (the dim is re-planned/re-broadcast per trigger): the
    final snapshot must equal a pure-Python join-then-fold over all rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dask_lightgbm_spark.streaming.events import (
        stream_static_segment_totals,
    )

    batches = [
        [(1, 0, 1.0, "view"), (2, 10, 2.5, "click")],
        [(1, 20, 0.5, "view"), (3, 70, 1.0, "view")],
        [(2, 75, 2.0, "click")],
    ]
    sf, _ = _write_event_batches(tmp_path_factory, "xstatjoin", batches)
    seg = {1: "AUTOMOBILE", 2: "AUTOMOBILE", 3: "BUILDING"}
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(sorted(seg), pa.int64()),
                "c_mktsegment": pa.array([seg[k] for k in sorted(seg)], pa.string()),
            }
        ),
        f"{sf}/customer.parquet",
    )
    got = {
        r.c_mktsegment: (r.n_events, r.sum_value)
        for r in stream_static_segment_totals(
            spark, sf, glob="events_*.parquet", max_files_per_trigger=1
        ).collect()
    }
    expected: dict[str, tuple[int, int]] = {}
    for batch in batches:
        for uid, _minutes, value, _etype in batch:
            n, cents = expected.get(seg[uid], (0, 0))
            expected[seg[uid]] = (n + 1, cents + round(value * 100))
    assert got == {k: (n, cents / 100.0) for k, (n, cents) in expected.items()}


def test_left_outer_join_null_extends_across_microbatches(
    spark, tmp_path_factory
):
    """Stream-stream LEFT OUTER eviction: an unmatched view emits its
    null-extended row only once the global (min-of-both-sides) watermark
    proves no future match is possible — driven here by a far-future
    trigger advancing both sides; the far pair itself matches normally."""
    from dask_lightgbm_spark.streaming.events import (
        stream_stream_left_outer_join,
    )

    sf, _ = _write_event_batches(
        tmp_path_factory,
        "xssleft",
        [
            [(1, 0, 1.0, "view")],
            # far future on BOTH sides: min watermark → 600-60 = 540 min,
            # well past view-1's match window [0, 60]
            [(9, 600, 1.0, "view"), (9, 600, 2.0, "purchase")],
        ],
    )
    got = sorted(
        (r.user_id, r.view_id, r.purchase_id)
        for r in stream_stream_left_outer_join(
            spark, sf, glob="events_*.parquet", max_files_per_trigger=1
        ).collect()
    )
    assert got == [(1, 0, None), (9, 1, 2)]


def test_stream_ivf_insert_multibatch_equals_batch_build(
    spark, tmp_path_factory
):
    """Online IVF ingest across several real micro-batches: the delta
    vectors (vec_id % 10 == 7) arrive split over two triggers, each
    assigned against the frozen centroids and appended as its own
    batch=<id> dir; the served result must equal a from-scratch batch
    build over the full corpus — streaming the index in pieces is
    invisible to queries."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from dask_lightgbm_spark.operators.similarity import ivf_knn
    from dask_lightgbm_spark.session import scratch_dir
    from dask_lightgbm_spark.streaming.vectors import stream_ivf_insert

    rng = __import__("numpy").random.default_rng(11)
    n, dim = 30, 4
    vecs = rng.integers(-3, 4, size=(n, dim)).astype("float32")

    def table(ids):
        return pa.table(
            {
                "vec_id": pa.array([int(i) for i in ids], pa.int64()),
                "embedding": pa.array(
                    [[float(x) for x in vecs[i]] for i in ids],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([int(i % 5) for i in ids], pa.int32()),
            }
        )

    out = tmp_path_factory.mktemp("xivfinsert")
    pq.write_table(table(range(n)), out / "embeddings.parquet")
    delta = [i for i in range(n) if i % 10 == 7]  # 7, 17, 27
    pq.write_table(table(delta[:1]), out / "embeddings_delta_0.parquet")
    pq.write_table(table(delta[1:]), out / "embeddings_delta_1.parquet")

    got = sorted(
        (r.qid, r.nid, r.rank, r.cos)
        for r in stream_ivf_insert(
            spark,
            str(out),
            glob="embeddings_delta_*.parquet",
            max_files_per_trigger=1,
        ).collect()
    )
    # the ingest really ran as two micro-batches
    delta_root = (
        scratch_dir("x15_ivf_delta")
        + "/"
        + str(out).strip("/").replace("/", "_")
    )
    assert (
        sum(1 for d in os.listdir(delta_root) if d.startswith("batch=")) == 2
    )

    e = spark.read.parquet(str(out / "embeddings.parquet"))
    expected = sorted(
        (r.qid, r.nid, r.rank, r.cos)
        for r in ivf_knn(
            e,
            queries_filter=F.col("vec_id") < 10,
            centroid_filter=F.col("vec_id") % 25 == 0,
            k=3,
        ).collect()
    )
    assert got == expected


def test_upsert_state_sink_latest_wins_across_microbatches(
    spark, tmp_path_factory
):
    """CDC-apply sink across triggers: a LATER micro-batch carrying an
    OLDER event for a key must not override the state (latest-wins by
    (ts, event_id), not by arrival order), while a genuinely newer event
    does — the out-of-order-delivery contract a single-batch drain cannot
    test."""
    from dask_lightgbm_spark.streaming.events import stream_upsert_state_sink

    sf, base_us = _write_event_batches(
        tmp_path_factory,
        "xupsert",
        [
            [(1, 10, 1.0, "purchase"), (2, 0, 5.0, "purchase")],
            # out-of-order: older u1 event arrives a trigger later
            [(1, 5, 99.0, "purchase")],
            # genuinely newer u2 event
            [(2, 20, 7.25, "purchase")],
        ],
    )
    got = {
        r.user_id: (
            int(r.last_ts.timestamp() * 1_000_000) - base_us,
            r.last_value,
        )
        for r in stream_upsert_state_sink(
            spark, sf, glob="events_*.parquet", max_files_per_trigger=1
        ).collect()
    }
    assert got == {1: (10 * 60_000_000, 1.0), 2: (20 * 60_000_000, 7.25)}


def test_upsert_state_sink_recovers_sole_copy_from_old_dir(
    spark, tmp_path_factory
):
    """Crash-window recovery (r8 advisor, medium): if a previous run died
    between the swap's two renames — os.rename(out, old) done,
    os.rename(tmp, out) not — the ONLY state copy sits in out+'.old' with
    the primary missing. The next run must rename it back before merging;
    a run that starts from empty silently loses every key absent from its
    own batches (and its cleanup deletes the surviving copy)."""
    import os
    import shutil

    from dask_lightgbm_spark.session import scratch_dir
    from dask_lightgbm_spark.streaming.events import stream_upsert_state_sink

    sf, _ = _write_event_batches(
        tmp_path_factory,
        "xupsert3",
        [
            [(1, 10, 1.0, "purchase")],
            [(2, 20, 7.25, "purchase")],
        ],
    )
    # run 1 sees only user 1's file → state = {1}
    first = stream_upsert_state_sink(spark, sf, glob="events_0.parquet").collect()
    assert {r.user_id for r in first} == {1}
    out = scratch_dir("x16_state") + "/" + sf.strip("/").replace("/", "_")
    # simulate the crash: primary renamed away, not yet replaced
    shutil.rmtree(out + ".old", ignore_errors=True)
    os.rename(out, out + ".old")
    # run 2 sees only user 2's file; user 1 can ONLY come from .old recovery
    got = {
        r.user_id: r.last_value
        for r in stream_upsert_state_sink(
            spark, sf, glob="events_1.parquet"
        ).collect()
    }
    assert got == {1: 1.0, 2: 7.25}
    assert not os.path.exists(out + ".old")


def test_upsert_state_sink_reapply_is_idempotent(spark, tmp_path_factory):
    """The sink's retry contract: re-applying rows the state already
    absorbed changes nothing. Run the WHOLE stream twice over the same
    files (the state dir persists per source path within the process) —
    the second pass re-merges every event into the final state and must
    emit the identical table."""
    from dask_lightgbm_spark.streaming.events import stream_upsert_state_sink

    sf, _ = _write_event_batches(
        tmp_path_factory,
        "xupsert2",
        [
            [(1, 10, 1.0, "purchase"), (2, 0, 5.0, "purchase")],
            [(1, 5, 99.0, "purchase"), (3, 7, 2.5, "purchase")],
        ],
    )

    def run():
        return sorted(
            (r.user_id, r.last_ts, r.last_event_id, r.last_value)
            for r in stream_upsert_state_sink(
                spark, sf, glob="events_*.parquet", max_files_per_trigger=1
            ).collect()
        )

    first = run()
    assert run() == first


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(-3, 3), min_size=2, max_size=2),
        min_size=3,
        max_size=12,
    ),
    st.integers(1, 2),
    st.integers(2, 3),
)
def test_kmeans_centroids_match_python_lloyds(spark, vec_rows, n_iters, k):
    """Driver-iterated Lloyd's vs a from-scratch reference replicating the
    determinism contract exactly: sequential-fold squared L2 (ties to the
    lowest centroid id) and the fixed-point per-dimension mean — including
    Spark's HALF_UP double rounding, reproduced via decimal so a
    second-iteration mean landing on a .5 µ-unit boundary cannot diverge."""
    from decimal import ROUND_HALF_UP, Decimal

    from pyspark.sql import functions as F

    from dask_lightgbm_spark.operators.kmeans import kmeans_centroids

    vecs = [[float(x) for x in v] for v in vec_rows]
    k = min(k, len(vecs))
    df = spark.createDataFrame(
        list(enumerate(vecs)), "vec_id long, embedding array<double>"
    )
    got = {
        r.cid: list(r.cv)
        for r in kmeans_centroids(
            df, F.col("vec_id") < k, n_iters=n_iters
        ).collect()
    }

    def spark_round(x: float) -> int:
        return int(
            Decimal(x).to_integral_value(rounding=ROUND_HALF_UP)
        )

    cents = {i: vecs[i] for i in range(k)}
    for _ in range(n_iters):
        members: dict[int, list[list[float]]] = {}
        for v in vecs:
            best = None
            for cid in sorted(cents):
                d = 0.0
                for x, y in zip(v, cents[cid]):
                    d += (x - y) * (x - y)
                if best is None or (d, cid) < best:
                    best = (d, cid)
            members.setdefault(best[1], []).append(v)
        cents = {
            cid: [
                (
                    float(sum(spark_round(x[pos] * 1_000_000) for x in mem))
                    / 1_000_000.0
                )
                / len(mem)
                for pos in range(2)
            ]
            for cid, mem in members.items()
        }
    assert got == cents


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(-3, 3), min_size=4, max_size=4),
        min_size=3,
        max_size=12,
    ),
    st.integers(1, 3),
)
def test_pq_pipeline_matches_python(spark, vec_rows, k):
    """The whole PQ family end to end — per-subspace codebook training
    (1-iter fixed-point Lloyd's), nearest-code encoding, ADC top-k with
    self-exclusion and the (dist asc, nid asc) tie order — vs a
    from-scratch reference sharing only the published determinism contract
    (sequential folds, fixed-point means, lowest-id ties)."""
    from pyspark.sql import functions as F

    from dask_lightgbm_spark.operators.pq import pq_knn, train_codebooks

    vecs = [[float(x) for x in v] for v in vec_rows]
    n_seeds, sub, n_sub = 2, 2, 2
    df = spark.createDataFrame(
        list(enumerate(vecs)), "vec_id long, embedding array<double>"
    )
    books = train_codebooks(
        df, F.col("vec_id") < n_seeds, dim=4, n_subspaces=n_sub, n_iters=1
    )
    got = [
        (r.qid, r.nid, r.rank, r.adc_dist)
        for r in pq_knn(df, F.col("vec_id") < 2, k=k, codebooks=books)
        .orderBy("qid", "rank")
        .collect()
    ]

    def sqd(a, b):
        d = 0.0
        for x, y in zip(a, b):
            d += (x - y) * (x - y)
        return d

    # reference codebooks: per subspace, one Lloyd's iteration from the
    # first n_seeds sub-vectors with the fixed-point mean
    ref_books = []
    for m in range(n_sub):
        svs = [v[m * sub : (m + 1) * sub] for v in vecs]
        cents = {i: svs[i] for i in range(n_seeds)}
        members = {}
        for v in svs:
            best = min((sqd(v, cents[c]), c) for c in sorted(cents))
            members.setdefault(best[1], []).append(v)
        ref_books.append(
            {
                cid: [
                    float(sum(round(x[p] * 1_000_000) for x in mem))
                    / 1_000_000.0
                    / len(mem)
                    for p in range(sub)
                ]
                for cid, mem in members.items()
            }
        )
    assert [sorted(b) for b in ref_books] == [
        [c for c, _ in b] for b in books
    ] and all(
        list(cv) == ref_books[m][c]
        for m, b in enumerate(books)
        for c, cv in b
    )

    codes = [
        [
            min(
                (sqd(v[m * sub : (m + 1) * sub], cv), cid)
                for cid, cv in sorted(ref_books[m].items())
            )[1]
            for m in range(n_sub)
        ]
        for v in vecs
    ]
    expected = []
    for qid in range(min(2, len(vecs))):
        scored = []
        for nid, v in enumerate(vecs):
            if nid == qid:
                continue
            d = 0.0
            for m in range(n_sub):
                d += sqd(
                    vecs[qid][m * sub : (m + 1) * sub],
                    ref_books[m][codes[nid][m]],
                )
            scored.append((nid, d))
        scored.sort(key=lambda t: (t[1], t[0]))
        expected += [
            (qid, nid, rank + 1, d)
            for rank, (nid, d) in enumerate(scored[:k])
        ]
    assert got == expected


@settings(max_examples=4, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(-2, 2), min_size=3, max_size=3).filter(
            lambda v: any(x != 0 for x in v)  # index build refuses zero-norm
        ),
        min_size=6,
        max_size=26,
    )
)
def test_knn_graph_and_label_propagation_match_python(
    spark, tmp_path_factory, vec_rows
):
    """s22 (per-cell kNN graph) and s25 (two-round majority-vote label
    propagation over it) vs a from-scratch reference: IVF cell assignment
    with lowest-cid NULL-cosine ties, within-cell top-3 by (cos desc NULLS
    LAST, dst asc), then per-round votes broken by (count desc, label asc)
    with seeds never overwritten — the full iterative semi-supervised
    pipeline re-derived independently."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dask_lightgbm_spark.queries import all_queries

    vecs = [[float(x) for x in v] for v in vec_rows]
    n = len(vecs)
    out = tmp_path_factory.mktemp("s25prop")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array([i % 5 for i in range(n)], pa.int32()),
            }
        ),
        out / "embeddings.parquet",
    )
    # float32 storage: recompute the doubles the engine actually sees
    vecs = [[float(__import__("numpy").float32(x)) for x in v] for v in vecs]

    # --- reference: IVF cells (centroids vec_id % 25 == 0 → id 0 only
    # for n <= 25, ids {0, 25} at 26) → within-cell top-3 graph
    cents = [(i, vecs[i]) for i in range(n) if i % 25 == 0]
    cell = {
        i: _cos_order([(cid, _py_cos(v, cv)) for cid, cv in cents])[0][0]
        for i, v in enumerate(vecs)
    }
    graph = {}
    for src in range(n):
        cands = [
            (dst, _py_cos(vecs[src], vecs[dst]))
            for dst in range(n)
            if dst != src and cell[dst] == cell[src]
        ]
        graph[src] = [d for d, _ in _cos_order(cands)[:3]]

    got_edges = [
        (r.src, r.dst, r.rank)
        for r in all_queries()["s22_knn_graph"](spark, str(out)).collect()
    ]
    expected_edges = sorted(
        (src, dst, rank + 1)
        for src in range(n)
        for rank, dst in enumerate(graph[src])
    )
    assert sorted(got_edges) == expected_edges

    # --- reference: 2 rounds of majority-vote propagation
    seeds = {i: i % 5 for i in range(n) if i % 5 == 0}
    labels = dict(seeds)
    for _ in range(2):
        votes = {}
        for src in range(n):
            counts = {}
            for dst in graph[src]:
                if dst in labels:
                    counts[labels[dst]] = counts.get(labels[dst], 0) + 1
            if counts:
                votes[src] = min(counts, key=lambda lab: (-counts[lab], lab))
        labels = dict(seeds)
        for src, lab in votes.items():
            labels.setdefault(src, lab)

    got = {
        r.vec_id: (r.label_out, r.is_seed)
        for r in all_queries()["s25_label_propagation"](
            spark, str(out)
        ).collect()
    }
    assert got == {
        i: (labels.get(i), i % 5 == 0) for i in range(n)
    }


@settings(max_examples=4, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(-2, 2), min_size=64, max_size=64).filter(
            lambda v: any(x != 0 for x in v)
        ),
        min_size=9,
        max_size=16,
    )
)
def test_t34_semantic_dedup_matches_python(spark, tmp_path_factory, vec_rows):
    """SemDeDup end to end vs a from-scratch reference: 2-iter fixed-point
    Lloyd's cells (8 seeds, HALF_UP double rounding via decimal),
    squared-L2 assignment with lowest-cid ties, cosine-to-own-centroid
    centrality, and the keep-least-central dominance rule — a is dropped
    iff some same-cell b with cos(a,b) >= tau is strictly more peripheral
    under (cs_cent, vec_id). Completes the independent-reference coverage
    of every dedup family (exact, minhash, simhash, chunk, boilerplate,
    semantic)."""
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dask_lightgbm_spark.queries import all_queries

    vecs = [[float(np.float32(x)) for x in v] for v in vec_rows]
    n, dim, k_seeds, tau = len(vecs), 64, 8, 0.42
    out = tmp_path_factory.mktemp("t34prop")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array([i % 5 for i in range(n)], pa.int32()),
            }
        ),
        out / "embeddings.parquet",
    )

    def sqd(a, b):
        d = 0.0
        for x, y in zip(a, b):
            d += (x - y) * (x - y)
        return d

    def spark_round(x):
        return int(Decimal(x).to_integral_value(rounding=ROUND_HALF_UP))

    # 2-iteration Lloyd's, exactly the engine's op sequence
    cents = {i: vecs[i] for i in range(k_seeds)}
    for _ in range(2):
        members = {}
        for v in vecs:
            best = min((sqd(v, cents[c]), c) for c in sorted(cents))
            members.setdefault(best[1], []).append(v)
        cents = {
            cid: [
                float(sum(spark_round(x[p] * 1_000_000) for x in mem))
                / 1_000_000.0
                / len(mem)
                for p in range(dim)
            ]
            for cid, mem in members.items()
        }

    cell = {
        i: min((sqd(v, cents[c]), c) for c in sorted(cents))[1]
        for i, v in enumerate(vecs)
    }
    cs = {i: _py_cos(vecs[i], cents[cell[i]]) for i in range(n)}
    kept = {}
    for a in range(n):
        dominated = any(
            b != a
            and cell[b] == cell[a]
            and _py_cos(vecs[a], vecs[b]) >= tau
            and (cs[b], b) < (cs[a], a)
            for b in range(n)
        )
        kept[a] = not dominated

    got = {
        r.vec_id: (r.cell, r.cs_cent, r.kept)
        for r in all_queries()["t34_semantic_dedup"](
            spark, str(out)
        ).collect()
    }
    assert got == {i: (cell[i], cs[i], kept[i]) for i in range(n)}


@st.composite
def ingest_corpora(draw):
    base = draw(st.text(st.sampled_from("abc "), min_size=0, max_size=20))

    def doc():
        if draw(st.booleans()):
            return base + draw(st.text(st.sampled_from("abc "), max_size=4))
        return draw(st.text(st.sampled_from("xyz "), max_size=20))

    corpus = [(i, doc()) for i in range(draw(st.integers(2, 8)))]
    new = [(100 + i, doc()) for i in range(draw(st.integers(1, 4)))]
    return new, corpus


@settings(max_examples=6, deadline=None)
@given(ingest_corpora(), st.sampled_from([None, 2]))
def test_minhash_match_against_matches_python(spark, inp, bucket_cap):
    """The two-sided incremental ingest dedup (t40's core) vs the same
    from-scratch reference as the self-join: a (new, corpus) pair matches
    iff it shares a band, survives the signature-estimate prefilter, and
    verifies at exact Jaccard ≥ threshold — with the corpus-side
    hot-bucket split (bucket_cap) required not to change the match set."""
    from dask_lightgbm_spark.functions.hashing import (
        MINHASH_COEF,
        MINHASH_PRIME,
    )
    from dask_lightgbm_spark.operators.dedup import minhash_lsh_match_against

    new, corpus = inp
    k, num_perm, band_size, threshold = 3, 8, 2, 0.3
    schema = "doc_id long, text string"
    got = {
        (r.new_id, r.corpus_id, r.jaccard)
        for r in minhash_lsh_match_against(
            spark.createDataFrame(new, schema),
            spark.createDataFrame(corpus, schema),
            "doc_id",
            "text",
            k_shingle=k,
            num_perm=num_perm,
            band_size=band_size,
            threshold=threshold,
            bucket_cap=bucket_cap,
        ).collect()
    }

    hs = {i: _py_shingle_hashes(t, k) for i, t in new + corpus}
    sig = {
        i: [
            min(
                (h * MINHASH_COEF[p][0] + MINHASH_COEF[p][1]) % MINHASH_PRIME
                for h in v
            )
            for p in range(num_perm)
        ]
        for i, v in hs.items()
    }
    expected = set()
    for a, _ in new:
        for b, _ in corpus:
            banded = any(
                sig[a][j * band_size : (j + 1) * band_size]
                == sig[b][j * band_size : (j + 1) * band_size]
                for j in range(num_perm // band_size)
            )
            if not banded:
                continue
            if sum(x == y for x, y in zip(sig[a], sig[b])) < num_perm // 2:
                continue
            sa, sb = set(hs[a]), set(hs[b])
            inter = len(sa & sb)
            jac = inter / (len(sa) + len(sb) - inter)
            if jac >= threshold:
                expected.add((a, b, jac))
    assert got == expected


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.text(st.sampled_from("abc "), max_size=24), min_size=2, max_size=25
    )
)
def test_t19_decontamination_matches_python(spark, tmp_path_factory, texts):
    """Broadcast decontamination vs a set-intersection reference: per
    train doc, distinct 5-gram shingle hashes hitting ANY eval-split
    shingle, with the integer-exact >=20% flag (n_overlap*5 >= n_shingles
    — no float ratio)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dask_lightgbm_spark.queries import all_queries

    out = tmp_path_factory.mktemp("t19prop")
    n = len(texts)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
                "source": pa.array(["s"] * n, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        out / "documents.parquet",
    )

    got = [
        (r.doc_id, r.n_shingles, r.n_overlap, r.contaminated)
        for r in all_queries()["t19_decontamination"](
            spark, str(out)
        ).collect()
    ]

    hs = {i: set(_py_shingle_hashes(t, 5)) for i, t in enumerate(texts)}
    ev = set().union(*(hs[i] for i in range(n) if i % 20 == 0)) if any(
        i % 20 == 0 for i in range(n)
    ) else set()
    expected = [
        (
            i,
            len(hs[i]),
            len(hs[i] & ev),
            len(hs[i] & ev) * 5 >= len(hs[i]),
        )
        for i in range(n)
        if i % 20 != 0
    ]
    assert got == expected
