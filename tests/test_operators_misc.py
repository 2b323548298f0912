"""As-of join, sources, streaming, multimodal plumbing."""

import gzip
import os
import tempfile

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_asof_join_matches_merge_asof(spark):
    from dask_lightgbm_spark.operators.asof import asof_join

    rng = np.random.default_rng(42)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 200),
            "t": rng.integers(0, 10_000, 200),
            "x": rng.normal(size=200),
        }
    ).sort_values("t").reset_index(drop=True)
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 300),
            "t": rng.integers(0, 10_000, 300),
            "val": rng.integers(0, 1000, 300),
        }
    ).sort_values("t").reset_index(drop=True)
    # dedupe right on (k, t): merge_asof keeps the LAST at equal keys while a
    # running max keeps the max — identical once (k, t) is unique
    right = right.drop_duplicates(["k", "t"], keep="last")

    expected = pd.merge_asof(
        left, right.rename(columns={"val": "r_val"})[["k", "t", "r_val"]],
        on="t", by="k", direction="backward",
    )
    # our operator carries the right's t as the carried value for determinism
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="t", by="k", value_col="t", out_col="last_t",
        )
        .toPandas()
        .sort_values(["k", "t", "x"])
        .reset_index(drop=True)
    )
    exp_t = pd.merge_asof(
        left, right[["k", "t"]].assign(last_t=right["t"]),
        on="t", by="k", direction="backward",
    ).sort_values(["k", "t", "x"]).reset_index(drop=True)
    pd.testing.assert_series_equal(
        got["last_t"].astype("float64"), exp_t["last_t"].astype("float64"), check_names=False
    )


def test_read_csv_gzip_glob(spark):
    """Reference B1: gzip CSV glob scan with unsplit blocks
    (system_tests/test_fit_predict.py:26)."""
    from dask_lightgbm_spark.sources.readers import read_csv_glob

    with tempfile.TemporaryDirectory() as d:
        for shard in range(3):
            with gzip.open(os.path.join(d, f"data_{shard}.csv.gz"), "wt") as f:
                for i in range(10):
                    f.write(f"{shard},{i},{i * 2}\n")
        df = read_csv_glob(spark, f"{d}/*.csv.gz")
        assert df.count() == 30
        assert df.rdd.getNumPartitions() == 3  # one gzip file = one partition
        total = df.select(F.sum(F.col("_c2").cast("long"))).first()[0]
        assert total == 3 * sum(i * 2 for i in range(10))


def test_events_ts_normalized(spark, sf_dir):
    from dask_lightgbm_spark.sources.readers import load_table

    e = load_table(spark, sf_dir, "events")
    assert dict(e.dtypes)["ts"] == "timestamp"
    lo, hi = e.agg(F.min("ts"), F.max("ts")).first()
    assert lo.year == 2024 and hi.year == 2024


@pytest.mark.parametrize("shape", ["nanos", "ntz_micros", "utc_micros"])
def test_events_ts_shapes(spark, shape):
    """Fixture drift canary: every parquet timestamp encoding the fixture
    generator has produced (TIMESTAMP(NANOS), TIMESTAMP(µs) naive → NTZ,
    TIMESTAMP(µs) UTC) must normalize to TimestampType with identical
    wall-clock values through load_table."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dask_lightgbm_spark.sources.readers import load_table

    micros = [1_704_067_200_000_000, 1_704_070_800_500_000]  # 2024-01-01 UTC
    unit, tz = {
        "nanos": ("ns", None),
        "ntz_micros": ("us", None),
        "utc_micros": ("us", "UTC"),
    }[shape]
    vals = [m * 1000 for m in micros] if unit == "ns" else micros
    tbl = pa.table({"ts": pa.array(vals, type=pa.timestamp(unit, tz=tz))})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(tbl, os.path.join(d, "events.parquet"))
        e = load_table(spark, d, "events")
        assert dict(e.dtypes)["ts"] == "timestamp"
        got = sorted(r[0] for r in e.select("ts").collect())
        assert [t.replace(tzinfo=None).isoformat() for t in got] == [
            "2024-01-01T00:00:00",
            "2024-01-01T01:00:00.500000",
        ]


def test_streaming_equals_batch(spark, sf_dir):
    from dask_lightgbm_spark.queries import all_queries
    from dask_lightgbm_spark.streaming.events import stream_hourly_aggregate

    stream = (
        stream_hourly_aggregate(spark, sf_dir)
        .toPandas()
        .sort_values(["hour", "event_type"])
        .reset_index(drop=True)
    )
    batch = (
        all_queries()["q14_events_hourly"](spark, sf_dir)
        .toPandas()
        .sort_values(["hour", "event_type"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        stream[["hour", "event_type", "n", "sum_value"]],
        batch[["hour", "event_type", "n", "sum_value"]],
    )


def test_multimodal_plumbing(spark):
    from dask_lightgbm_spark.operators.multimodal import (
        attach_binary_payload,
        extract_features,
    )

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": ["hello world", "spark engine"]})
    )
    with_bin = attach_binary_payload(df, "text")
    assert dict(with_bin.dtypes)["payload"] == "binary"
    meta = with_bin.select("meta.byte_len").collect()
    assert meta[0][0] == 11

    feats = extract_features(with_bin, dim=8).collect()
    assert len(feats) == 2
    f0 = feats[0]
    assert f0.n_bytes == 11 and len(f0.feature) == 8
    assert abs(sum(f0.feature) - 1.0) < 1e-6  # normalized histogram

    try:
        import PIL  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False
    if have_pil:
        # real-path value tests live in test_multimodal_codec.py; here the
        # payload is not an image, so the real decoder must reject it
        with pytest.raises(Exception, match="UnidentifiedImageError|cannot identify"):
            extract_features(with_bin, decode_stub=False).collect()
    else:
        # absence canary: the guard must name the missing library
        with pytest.raises(Exception, match="NotImplementedError|requires PIL"):
            extract_features(with_bin, decode_stub=False).collect()


def test_approx_stats_error_bounds(spark, sf_dir):
    """q35 embeds the sketch error contract as data (wide-margin booleans):
    every group must report parts_ok/median_ok TRUE, exact ints must equal
    an independently computed exact aggregate, and the raw HLL distinct must
    sit within the tighter 5% band the booleans' 15% margin is derived from."""
    from dask_lightgbm_spark.queries import all_queries
    from dask_lightgbm_spark.sources.readers import load_table

    got = {
        r.l_returnflag: r
        for r in all_queries()["q35_approx_stats"](spark, sf_dir).collect()
    }
    l = load_table(spark, sf_dir, "lineitem")
    exact = {
        r.l_returnflag: r
        for r in l.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("parts"),
            F.approx_count_distinct("l_partkey").alias("ap"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for flag, a in got.items():
        e = exact[flag]
        assert a.parts_ok and a.median_ok
        assert a.exact_parts == e.parts and a.n_rows == e.n
        assert abs(e.ap - e.parts) / e.parts < 0.05


def test_merge_upsert_semantics(spark):
    from dask_lightgbm_spark.operators.merge import merge_upsert

    t = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2, 3], "v": ["a", "b", "c"]})
    )
    u = spark.createDataFrame(
        pd.DataFrame({"k": [2, 9], "v": ["B", "new"]})
    )
    out = {r.k: r.v for r in merge_upsert(t, u, "k").collect()}
    assert out == {1: "a", 2: "B", 3: "c", 9: "new"}


def test_multimodal_resize_and_frames(spark):
    from dask_lightgbm_spark.operators.multimodal import (
        attach_binary_payload,
        resize_images,
        sample_frames,
    )

    df = attach_binary_payload(
        spark.createDataFrame(
            pd.DataFrame({"doc_id": [0, 1], "text": ["x" * 100, "y" * 10]})
        ),
        "text",
    )
    resized = resize_images(df, width=4, height=8).collect()
    assert all(len(r.payload) == 32 and r.width == 4 for r in resized)

    frames = sample_frames(df, n_frames=3, frame_bytes=8).collect()
    assert len(frames) == 6
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r.frame_idx)
        assert len(r.frame) == 8
    assert by_doc[0] == [0, 1, 2] and by_doc[1] == [0, 1, 2]


def test_asof_join_forward_and_nonmonotone_value(spark):
    """forward direction + a carried value NOT monotone in the key (a
    running max/min would get this wrong; last() must not)."""
    from dask_lightgbm_spark.operators.asof import asof_join

    left = pd.DataFrame({"k": [1, 1, 1], "t": [5, 15, 25]})
    right = pd.DataFrame({"k": [1, 1, 1], "t": [10, 20, 30], "val": [90.0, 10.0, 50.0]})
    got = {
        r.t: r.nxt
        for r in asof_join(
            spark.createDataFrame(left), spark.createDataFrame(right),
            on="t", by="k", value_col="val", out_col="nxt", direction="forward",
        ).collect()
    }
    exp = pd.merge_asof(left, right, on="t", by="k", direction="forward")
    assert got == dict(zip(exp["t"], exp["val"]))

    # backward with the same non-monotone values
    got_b = {
        r.t: r.prev
        for r in asof_join(
            spark.createDataFrame(left), spark.createDataFrame(right),
            on="t", by="k", value_col="val", out_col="prev", direction="backward",
        ).collect()
    }
    exp_b = pd.merge_asof(left, right, on="t", by="k", direction="backward")
    assert got_b == {
        t: (v if pd.notna(v) else None) for t, v in zip(exp_b["t"], exp_b["val"])
    }


def test_jsonl_roundtrip(spark, tmp_path):
    """write_json → read_jsonl round-trip preserves rows and schema."""
    import pandas as pd

    from dask_lightgbm_spark.sources.readers import read_jsonl
    from dask_lightgbm_spark.sources.writers import write_json

    pdf = pd.DataFrame(
        {"id": [1, 2, 3], "text": ["a", "b", None], "score": [0.5, 1.5, -2.0]}
    )
    df = spark.createDataFrame(pdf)
    path = str(tmp_path / "jl")
    write_json(df, path)
    back = read_jsonl(spark, path, schema="id bigint, text string, score double")
    got = back.orderBy("id").toPandas()
    pd.testing.assert_frame_equal(got, pdf)


def test_multimodal_features_feed_knn(spark):
    """End-to-end multimodal composition: binary payload → stubbed
    feature-extract kernel → embedding column → brute-force kNN. Proves the
    mapInPandas plumbing emits a schema the similarity operators accept."""
    import pandas as pd
    from pyspark.sql import functions as F

    from dask_lightgbm_spark.operators import similarity as sim
    from dask_lightgbm_spark.operators.multimodal import (
        attach_binary_payload,
        extract_features,
    )

    pdf = pd.DataFrame(
        {"doc_id": range(8), "text": [f"payload {i} " + "x" * i for i in range(8)]}
    )
    df = attach_binary_payload(spark.createDataFrame(pdf), "text")
    feats = extract_features(df, "doc_id", "payload", dim=8)
    emb = feats.select("doc_id", F.col("feature").alias("embedding"))
    out = sim.brute_force_knn(
        emb, emb.filter(F.col("doc_id") == 0), id_col="doc_id", k=3
    ).collect()
    assert len(out) == 3 and all(r.qid == 0 for r in out)
    assert all(-1.0 <= r.cos <= 1.0 for r in out)


def test_concat_scipy_csr_branch():
    """concat must vstack scipy-style CSR parts (reference concat,
    core.py:56-57) — exercised via the constructor-compatible scipy stub."""
    import os
    import sys

    stubs = os.path.join(os.path.dirname(__file__), "stubs")
    sys.path.insert(0, stubs)
    try:
        for m in [m for m in list(sys.modules) if m.startswith("scipy")]:
            del sys.modules[m]
        import numpy as np
        import scipy.sparse as ss

        from dask_lightgbm_spark.core import concat

        a = ss.csr_matrix(
            (np.array([1.0, 2.0]), np.array([0, 2]), np.array([0, 1, 2])), shape=(2, 3)
        )
        b = ss.csr_matrix(
            (np.array([3.0]), np.array([1]), np.array([0, 1])), shape=(1, 3)
        )
        out = concat([a, b])
        assert out.shape == (3, 3)
        assert out.toarray().tolist() == [
            [1.0, 0.0, 0.0],
            [0.0, 0.0, 2.0],
            [0.0, 3.0, 0.0],
        ]
        assert concat([]) is None
    finally:
        sys.path.remove(stubs)
        for m in [m for m in list(sys.modules) if m.startswith("scipy")]:
            del sys.modules[m]


def test_restore_confs_round_trip(spark, sf_dir):
    """Catalog queries pin session confs (timezone/AQE/shuffle partitions)
    but must remember originals so a library caller can undo the
    reconfiguration (r2 advisor)."""
    from dask_lightgbm_spark.queries import all_queries, restore_confs

    orig_tz = spark.conf.get("spark.sql.session.timeZone")
    orig_parts = spark.conf.get("spark.sql.shuffle.partitions")
    restore_confs(spark)  # clear any snapshot a previous test's query took
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        all_queries()["q03_global_agg"](spark, sf_dir).collect()
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"  # pinned
        restore_confs(spark)
        assert spark.conf.get("spark.sql.session.timeZone") == "America/New_York"
        # calling again is a no-op (originals consumed)
        restore_confs(spark)
    finally:
        spark.conf.set("spark.sql.session.timeZone", orig_tz)
        spark.conf.set("spark.sql.shuffle.partitions", orig_parts)


def test_mixture_allocation_sums_to_budget(spark, sf_dir):
    """t22's largest-remainder allocation must hand out EXACTLY the budget
    (the defining property of the method) with every source getting at
    least its floor share."""
    from dask_lightgbm_spark.queries import all_queries

    df = all_queries()["t22_mixture_allocation"](spark, sf_dir).toPandas()
    assert int(df.alloc_tokens.sum()) == 100_000
    total = int(df.n_tokens.sum())
    for _, r in df.iterrows():
        assert int(r.alloc_tokens) >= (100_000 * int(r.n_tokens)) // total


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
def test_fixture_schema_matches_golden(sf):
    """r5 verdict task 8: the committed golden schema
    (tests/golden/testdata_schema.json) is the drift tripwire — a fixture
    regeneration that changes any column's parquet type outside the accepted
    variants (the three known ts encodings) fails HERE, not as a cryptic
    query failure mid-gate."""
    from dask_lightgbm_spark.sources.schema_canary import diff_against_golden

    sf_dir = f"/root/testdata/{sf}"
    if not os.path.isdir(sf_dir):
        pytest.skip(f"{sf_dir} absent")
    assert diff_against_golden(sf_dir) == []


def test_schema_canary_detects_drift(tmp_path):
    """The canary itself must have teeth: a synthetic fixture with a renamed
    column, a novel ts encoding, and an extra column yields one finding
    each."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from dask_lightgbm_spark.sources import schema_canary
    from dask_lightgbm_spark.sources.readers import TABLES

    with open(schema_canary.GOLDEN_PATH) as fh:
        golden = json.load(fh)["tables"]

    # materialize a minimal fixture matching golden, then corrupt three ways
    for t in TABLES:
        fields = []
        for col, accepted in golden[t].items():
            typ = accepted[0]
            if typ == "timestamp[us]":
                patype = pa.timestamp("us")
            elif typ.startswith("list"):
                patype = pa.list_(pa.float32())
            else:
                patype = {
                    "int32": pa.int32(), "int64": pa.int64(),
                    "double": pa.float64(), "string": pa.string(),
                }[typ]
            fields.append(pa.field(col, patype))
        if t == "events":
            # novel ts encoding (millis — parquet has no seconds unit) + extra col
            fields = [
                pa.field("ts", pa.timestamp("ms")) if f.name == "ts" else f
                for f in fields
            ] + [pa.field("surprise", pa.int8())]
        if t == "region":
            fields = [
                pa.field("r_regionkey_RENAMED", pa.int32())
                if f.name == "r_regionkey" else f
                for f in fields
            ]
        pq.write_table(pa.table({f.name: pa.array([], f.type) for f in fields}),
                       tmp_path / f"{t}.parquet")

    findings = schema_canary.diff_against_golden(str(tmp_path))
    text = "\n".join(findings)
    assert "events.ts: type 'timestamp[ms]'" in text
    assert "events.surprise: unexpected extra column" in text
    assert "region.r_regionkey: column missing" in text
    assert "region.r_regionkey_RENAMED: unexpected extra column" in text
