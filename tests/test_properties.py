"""Property-based tests (hypothesis) — beyond the reference's test strategy
(SURVEY.md §5 notes it had none): randomized inputs exercise operator
invariants that fixed fixtures can't."""

import pandas as pd
from hypothesis import given, settings, strategies as st


@st.composite
def asof_frames(draw):
    n_left = draw(st.integers(1, 40))
    n_right = draw(st.integers(1, 40))
    keys = st.integers(0, 3)
    ts = st.integers(0, 1000)
    left = pd.DataFrame(
        {
            "k": [draw(keys) for _ in range(n_left)],
            "t": [draw(ts) for _ in range(n_left)],
        }
    )
    right = pd.DataFrame(
        {
            "k": [draw(keys) for _ in range(n_right)],
            "t": [draw(ts) for _ in range(n_right)],
        }
    ).drop_duplicates(["k", "t"])
    return left, right


@settings(max_examples=6, deadline=None)
@given(asof_frames())
def test_asof_join_matches_pandas(spark, frames):
    from dask_lightgbm_spark.operators.asof import asof_join

    left, right = frames
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right.assign(val=right["t"])),
            on="t",
            by="k",
            value_col="val",
            out_col="last_t",
        )
        .toPandas()
        .sort_values(["k", "t"])
        .reset_index(drop=True)
    )
    exp = (
        pd.merge_asof(
            left.sort_values("t"),
            right.sort_values("t").assign(last_t=right.sort_values("t")["t"]),
            on="t",
            by="k",
            direction="backward",
        )
        .sort_values(["k", "t"])
        .reset_index(drop=True)
    )
    assert list(got["last_t"].fillna(-1)) == list(exp["last_t"].fillna(-1))


@settings(max_examples=4, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 15), st.integers(0, 15)), min_size=0, max_size=20))
def test_connected_components_vs_union_find(spark, edge_list):
    from dask_lightgbm_spark.operators.components import connected_components

    nodes = sorted(set(range(6)) | {x for e in edge_list for x in e})
    # reference union-find
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {n: find(n) for n in nodes}

    edges_df = spark.createDataFrame(
        pd.DataFrame(edge_list or [(0, 0)], columns=["id_a", "id_b"])
    )
    nodes_df = spark.createDataFrame(pd.DataFrame({"doc_id": nodes}))
    got = {
        r.doc_id: r.component
        for r in connected_components(edges_df, nodes_df).collect()
    }
    assert got == expected


@settings(max_examples=6, deadline=None)
@given(
    st.text(alphabet="abcdef ", min_size=0, max_size=60),
    st.text(alphabet="abcdef ", min_size=0, max_size=60),
)
def test_fingerprint_normalization_property(spark, a, pad):
    """fingerprint is invariant under case and whitespace-run changes."""
    from dask_lightgbm_spark.operators.text_ops import fingerprint

    messy = "  " + a.upper().replace(" ", "\t ") + "  "
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": [a, messy]})
    )
    fps = {r.doc_id: r.fp for r in fingerprint(df, "doc_id", "text").collect()}
    assert fps[0] == fps[1]


def test_shingle_hash_unicode_cross_engine_parity(spark):
    """The shingle rolling hash is defined on codepoints; both engines must
    produce identical values for multibyte text (incl. astral-plane emoji)
    and for control characters — pins the docstring claim."""
    import duckdb

    from dask_lightgbm_spark.functions.hashing import sql_poly_shingle_hash
    from dask_lightgbm_spark.operators import dedup

    docs = ["héllo wörld", "日本語のテキスト", "emoji 🙂 test", "mixed Ω≈ç√", "tab\tand\nnewline"]
    pdf = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    k = 3
    s = dedup.shingle_hash_array(
        spark.createDataFrame(pdf), "doc_id", "text", k
    ).orderBy("doc_id").toPandas()
    o = duckdb.sql(
        f"""
        SELECT doc_id, list_distinct(list_transform(
          generate_series(1, greatest(length(text) - {k - 1}, 1)),
          g -> {sql_poly_shingle_hash('text', 'g', k)})) AS hs
        FROM pdf ORDER BY doc_id"""
    ).df()
    for i in range(len(docs)):
        assert sorted(s.hs[i]) == sorted(o.hs[i]), docs[i]


@settings(max_examples=5, deadline=None)
@given(st.text(min_size=0, max_size=40), st.integers(min_value=0, max_value=5))
def test_lsh_always_finds_exact_duplicates(spark, text, n_extra):
    """Identical documents have identical signatures, land in every band
    bucket together, and pass Jaccard=1 verification — for ANY content,
    including empty, short, and unicode text (post-ANSI-fix invariant)."""
    from dask_lightgbm_spark.operators.dedup import minhash_lsh_neardup

    rows = [(0, text), (1, text)] + [
        (2 + i, f"unrelated filler document number {i} {'y' * (i + 7)}")
        for i in range(n_extra)
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_lsh_neardup(df, "doc_id", "text", threshold=0.99).collect()
    }
    assert pairs.get((0, 1)) == 1.0


@given(
    st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=12),
    st.integers(min_value=1, max_value=1_000_000),
)
@settings(max_examples=12, deadline=None)
def test_largest_remainder_allocation_invariants(weights, budget):
    """Property: allocations are non-negative, each key gets >= its floor
    share, and the total hands out EXACTLY the budget — for any weights
    (including zero-weight keys) with positive total."""
    import pandas as pd

    from dask_lightgbm_spark.functions.partitioning import (
        largest_remainder_allocation,
    )
    from dask_lightgbm_spark.session import get_spark

    spark = get_spark("tests", cpus=4, shuffle_partitions=4)
    total = sum(weights)
    df = spark.createDataFrame(
        pd.DataFrame({"k": [f"s{i}" for i in range(len(weights))], "w": weights})
    )
    if total == 0:
        import pytest

        with pytest.raises(ValueError, match="total weight is 0"):
            largest_remainder_allocation(df, "k", "w", budget)
        return
    out = largest_remainder_allocation(df, "k", "w", budget).toPandas()
    assert int(out.allocation.sum()) == budget
    for _, r in out.iterrows():
        assert r.allocation >= (budget * int(r.w)) // total
        assert r.allocation >= 0


@st.composite
def interval_point_frames(draw):
    n_i = draw(st.integers(1, 25))
    n_p = draw(st.integers(1, 40))
    # epoch-second offsets; widths chosen so intervals span 0..several bins
    base = 1_700_000_000
    start = st.integers(0, 5000)
    width = st.integers(0, 2000)
    intervals = pd.DataFrame(
        {
            "iid": range(n_i),
            "s": [base + draw(start) for _ in range(n_i)],
        }
    )
    intervals["e"] = [s + draw(width) for s in intervals["s"]]
    points = pd.DataFrame(
        {
            "pid": range(n_p),
            "t": [base + draw(st.integers(0, 7000)) for _ in range(n_p)],
        }
    )
    bin_width = draw(st.sampled_from([1, 7, 60, 300, 1800]))
    return intervals, points, bin_width


@settings(max_examples=6, deadline=None)
@given(interval_point_frames())
def test_binned_interval_join_matches_naive(spark, frames):
    """binned_interval_join must equal the naive O(n*m) range join for any
    bin width — including bin edges exactly on interval bounds and
    intervals spanning 0, 1, or many bins — and emit each pair once."""
    from pyspark.sql import functions as F

    from dask_lightgbm_spark.operators.range_join import binned_interval_join

    intervals, points, bin_width = frames
    idf = spark.createDataFrame(intervals).select(
        "iid",
        F.timestamp_seconds("s").alias("start_ts"),
        F.timestamp_seconds("e").alias("end_ts"),
    )
    pdf = spark.createDataFrame(points).select(
        "pid", F.timestamp_seconds("t").alias("t_ts")
    )
    got = (
        binned_interval_join(idf, pdf, "start_ts", "end_ts", "t_ts", bin_width)
        .select("iid", "pid")
        .toPandas()
        .sort_values(["iid", "pid"])
        .reset_index(drop=True)
    )
    naive = (
        intervals.merge(points, how="cross")
        .query("s <= t <= e")[["iid", "pid"]]
        .sort_values(["iid", "pid"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype("int64"), naive.astype("int64"))


@st.composite
def cumsum_frames(draw):
    n = draw(st.integers(1, 60))
    keys = draw(
        st.lists(st.integers(-10_000, 10_000), min_size=n, max_size=n, unique=True)
    )
    vals = [draw(st.integers(-1000, 1000)) for _ in range(n)]
    return pd.DataFrame({"k": keys, "x": vals})


@settings(max_examples=6, deadline=None)
@given(cumsum_frames(), st.integers(1, 9))
def test_global_cumsum_matches_pandas(spark, pdf, n_buckets):
    """Two-level distributed scan == pandas cumsum for arbitrary unique
    (possibly negative, non-dense) keys and any bucket count."""
    from dask_lightgbm_spark.operators.prefix_sum import global_cumsum

    got = (
        global_cumsum(
            spark.createDataFrame(pdf), "k", "x", out_col="cs", n_buckets=n_buckets
        )
        .orderBy("k")
        .toPandas()
    )
    expect = pdf.sort_values("k").x.cumsum().to_numpy()
    assert (got.cs.to_numpy() == expect).all()


@settings(max_examples=5, deadline=None)
@given(
    st.lists(st.integers(0, 500), min_size=1, max_size=40),
    st.integers(16, 300),
)
def test_pack_sequences_invariants(spark, counts, seq_len):
    """Packing invariants for arbitrary token counts: offsets are contiguous
    (each doc starts where the previous ended), end offsets are monotone,
    and chunk spans cover exactly ceil(total/seq_len) chunks."""
    from dask_lightgbm_spark.operators.prefix_sum import pack_sequences

    pdf = pd.DataFrame({"doc_id": range(len(counts)), "n": counts})
    got = (
        pack_sequences(spark.createDataFrame(pdf), "doc_id", "n", seq_len)
        .orderBy("doc_id")
        .toPandas()
    )
    assert got.start_tok.iloc[0] == 0
    assert (got.start_tok.iloc[1:].to_numpy() == got.end_tok.iloc[:-1].to_numpy()).all()
    assert (got.end_tok.to_numpy() == pdf.n.cumsum().to_numpy()).all()
    total = int(pdf.n.sum())
    if total > 0:
        n_chunks_used = int(got[got.n_tok > 0].last_chunk.max()) + 1
        assert n_chunks_used == -(-total // seq_len)  # ceil
    for _, r in got[got.n_tok > 0].iterrows():
        assert r.first_chunk == r.start_tok // seq_len
        assert r.last_chunk == (r.end_tok - 1) // seq_len
        assert r.n_chunks == r.last_chunk - r.first_chunk + 1


@st.composite
def keyed_frames(draw):
    n = draw(st.integers(1, 60))
    return pd.DataFrame(
        {
            "grp": [draw(st.sampled_from(["a", "b"])) for _ in range(n)],
            "key": [draw(st.integers(0, 5)) for _ in range(n)],
        }
    )


@settings(max_examples=6, deadline=None)
@given(keyed_frames())
def test_key_skew_stats_matches_pandas(spark, pdf):
    from dask_lightgbm_spark.functions.partitioning import key_skew_stats

    got = (
        key_skew_stats(spark.createDataFrame(pdf), ["key"], by=["grp"])
        .toPandas()
        .set_index("grp")
        .sort_index()
    )
    for grp, sub in pdf.groupby("grp"):
        counts = sub.groupby("key").size()
        row = got.loc[grp]
        assert row["n_keys"] == len(counts)
        assert row["n_rows"] == len(sub)
        assert row["max_n"] == counts.max()
        assert row["skew_ratio_permille"] == (
            counts.max() * 1000
        ) // (len(sub) // len(counts))


@st.composite
def tiny_corpora(draw):
    """Docs over a 4-word vocab with mixed whitespace — small enough that
    8-token chunks genuinely collide across docs."""
    n_docs = draw(st.integers(1, 8))
    docs = []
    for i in range(n_docs):
        n_tok = draw(st.integers(0, 30))
        toks = [draw(st.sampled_from(["ab", "cd", "ef", "gh"])) for _ in range(n_tok)]
        sep = draw(st.sampled_from([" ", "  ", "\t", "\n"]))
        docs.append((i, sep.join(toks)))
    return docs


@settings(max_examples=6, deadline=None)
@given(tiny_corpora())
def test_t39_chunk_dedup_matches_python_reference(spark, tmp_path_factory, docs):
    """Differential test INDEPENDENT of DuckDB: t39's keep-first chunk
    dedup against a from-scratch pure-Python reference (same 8-token
    chunking, first occurrence in (doc_id, chunk_idx) order, md5 of the
    surviving text)."""
    import hashlib
    import re

    import pyarrow as pa
    import pyarrow.parquet as pq

    from dask_lightgbm_spark.queries import all_queries
    from dask_lightgbm_spark.queries.text import _T39_W

    out = tmp_path_factory.mktemp("t39prop")
    tbl = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], pa.int64()),
            "text": pa.array([t for _, t in docs], pa.string()),
            "lang": pa.array(["en"] * len(docs), pa.string()),
            "source": pa.array(["s"] * len(docs), pa.string()),
            "n_chars": pa.array([len(t) for _, t in docs], pa.int64()),
        }
    )
    pq.write_table(tbl, out / "documents.parquet")

    seen: set[str] = set()
    expected = {}
    for doc_id, text in sorted(docs):
        ts = [t for t in re.split(r"[ \t\n\f\r]+", text.strip()) if t]
        chunks = [
            " ".join(ts[i * _T39_W : (i + 1) * _T39_W])
            for i in range((len(ts) + _T39_W - 1) // _T39_W)
        ]
        kept = []
        for c in chunks:
            if c not in seen:
                seen.add(c)
                kept.append(c)
        expected[doc_id] = (
            len(chunks),
            len(kept),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )

    got = all_queries()["t39_chunk_dedup"](spark, str(out)).collect()
    assert len(got) == len(docs)
    for r in got:
        assert (r.n_chunks, r.n_kept, r.kept_digest) == expected[r.doc_id], (
            r.doc_id,
            expected[r.doc_id],
            (r.n_chunks, r.n_kept, r.kept_digest),
        )


@st.composite
def grouped_frames(draw):
    n = draw(st.integers(1, 80))
    return pd.DataFrame(
        {
            "g": [draw(st.sampled_from(["a", "b", "c"])) for _ in range(n)],
            "v": [draw(st.integers(0, 9)) for _ in range(n)],
            "id": range(n),  # tie-break to a total order
        }
    )


@settings(max_examples=6, deadline=None)
@given(grouped_frames(), st.integers(1, 6))
def test_grouped_topk_matches_single_window(spark, pdf, k):
    """grouped_topk (salted two-level rank) must select exactly the rows —
    and assign exactly the ranks — of a plain per-group rank window, for
    any data and k. Ground truth computed in pandas."""
    from pyspark.sql import functions as F

    from dask_lightgbm_spark.functions.partitioning import grouped_topk

    got = (
        grouped_topk(
            spark.createDataFrame(pdf),
            ["g"],
            [F.desc("v"), F.asc("id")],
            k,
            salt_on=["id"],
            n_salt=4,
        )
        .toPandas()
        .sort_values(["g", "__rank"])
        .reset_index(drop=True)
    )
    exp_rows = []
    for g, sub in pdf.groupby("g"):
        top = sub.sort_values(["v", "id"], ascending=[False, True]).head(k)
        for rank, (_, r) in enumerate(top.iterrows(), 1):
            exp_rows.append((g, int(r["v"]), int(r["id"]), rank))
    exp = pd.DataFrame(exp_rows, columns=["g", "v", "id", "__rank"]).sort_values(
        ["g", "__rank"]
    ).reset_index(drop=True)
    assert list(map(tuple, got[["g", "v", "id", "__rank"]].values)) == list(
        map(tuple, exp.values)
    )


@settings(max_examples=6, deadline=None)
@given(tiny_corpora())
def test_t44_boilerplate_matches_python_reference(spark, tmp_path_factory, docs):
    """t44's document-frequency boilerplate removal against a from-scratch
    pure-Python reference (same chunking; a chunk in >= DF_MIN distinct
    docs is removed everywhere; md5 of the cleaned text)."""
    import hashlib
    import re
    from collections import defaultdict

    import pyarrow as pa
    import pyarrow.parquet as pq

    from dask_lightgbm_spark.queries import all_queries
    from dask_lightgbm_spark.queries.text import _T39_W, _T44_DF_MIN

    out = tmp_path_factory.mktemp("t44prop")
    tbl = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], pa.int64()),
            "text": pa.array([t for _, t in docs], pa.string()),
            "lang": pa.array(["en"] * len(docs), pa.string()),
            "source": pa.array(["s"] * len(docs), pa.string()),
            "n_chars": pa.array([len(t) for _, t in docs], pa.int64()),
        }
    )
    pq.write_table(tbl, out / "documents.parquet")

    chunks_of = {}
    for doc_id, text in docs:
        ts = [t for t in re.split(r"[ \t\n\f\r]+", text.strip()) if t]
        chunks_of[doc_id] = [
            " ".join(ts[i * _T39_W : (i + 1) * _T39_W])
            for i in range((len(ts) + _T39_W - 1) // _T39_W)
        ]
    df_count: dict[str, set] = defaultdict(set)
    for doc_id, chunks in chunks_of.items():
        for c in chunks:
            df_count[c].add(doc_id)
    expected = {}
    for doc_id, chunks in chunks_of.items():
        if not chunks:
            continue  # the oracle's GROUP BY drops chunkless docs
        kept = [c for c in chunks if len(df_count[c]) < _T44_DF_MIN]
        expected[doc_id] = (
            len(chunks),
            len(chunks) - len(kept),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )

    got = all_queries()["t44_boilerplate_chunk_removal"](spark, str(out)).collect()
    assert len(got) == len(expected)
    for r in got:
        assert (r.n_chunks, r.n_removed, r.cleaned_digest) == expected[r.doc_id]
