"""Writers, salted aggregation, model persistence, stateful streaming."""

import os
import tempfile

import pandas as pd
from pyspark.sql import functions as F

from dask_lightgbm_spark.functions.partitioning import salted_sum_count
from dask_lightgbm_spark.sources.readers import load_table
from dask_lightgbm_spark.sources.writers import write_csv_gzip, write_parquet


def test_partitioned_parquet_roundtrip_and_pruning(spark, sf_dir):
    from dask_lightgbm_spark.plans.explain import formatted_plan

    orders = load_table(spark, sf_dir, "orders")
    with tempfile.TemporaryDirectory() as d:
        out = os.path.join(d, "orders_part")
        write_parquet(orders, out, partition_by=["o_orderstatus"])
        back = spark.read.parquet(out)
        assert back.count() == orders.count()
        pruned = back.filter(F.col("o_orderstatus") == "O")
        plan = formatted_plan(pruned)
        assert "PartitionFilters" in plan and "o_orderstatus" in plan
        assert pruned.count() == orders.filter("o_orderstatus = 'O'").count()


def test_csv_gzip_roundtrip(spark, sf_dir):
    from dask_lightgbm_spark.sources.readers import read_csv_glob

    nation = load_table(spark, sf_dir, "nation")
    with tempfile.TemporaryDirectory() as d:
        out = os.path.join(d, "nation_csv")
        write_csv_gzip(nation, out)
        back = read_csv_glob(spark, out + "/*.csv.gz", header=True, infer=True)
        assert back.count() == 25
        assert sorted(back.columns) == sorted(nation.columns)


def test_salted_agg_equals_direct(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.round(F.col("l_quantity") * 100).cast("long").alias("qc")
    )
    direct = {
        r.l_returnflag: (r.s, r.n)
        for r in l.groupBy("l_returnflag")
        .agg(F.sum("qc").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    salted = {
        r.l_returnflag: (r.sum_qc, r.n_rows)
        for r in salted_sum_count(l, ["l_returnflag"], "qc", n_salt=8).collect()
    }
    assert direct == salted


def test_salted_join_edge_cases(spark):
    """Key-only skewed frame falls back to hashing the key (no F.hash()
    zero-arg error); a pre-existing __salt column is rejected loudly
    instead of silently colliding."""
    import pytest

    from dask_lightgbm_spark.functions.partitioning import salted_join

    skewed = spark.createDataFrame([(1,), (1,), (2,)], ["k"])
    dim = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    got = sorted((r.k, r.v) for r in salted_join(skewed, dim, "k", n_salt=4).collect())
    assert got == [(1, "a"), (1, "a"), (2, "b")]

    with pytest.raises(ValueError, match="__salt"):
        salted_join(skewed.withColumn("__salt", F.lit(0)), dim, "k")
    with pytest.raises(ValueError, match="__salt"):
        salted_join(skewed, dim.withColumn("__salt", F.lit(0)), "k")


def test_mmr_rerank_rejects_malformed_inputs(spark):
    """Missing pair similarity and NaN inputs raise instead of silently
    mis-ranking (advisor r5)."""
    import pytest

    from dask_lightgbm_spark.operators.similarity import mmr_rerank

    cands = spark.createDataFrame(
        [(1, 10, 0.9), (1, 11, 0.8), (1, 12, 0.7)], ["qid", "nid", "rel"]
    )
    # complete pair set → works
    pairs = spark.createDataFrame(
        [(1, a, b, 0.5) for a in (10, 11, 12) for b in (10, 11, 12) if a != b],
        ["qid", "a", "b", "sim"],
    )
    got = {(r.nid, r.mmr_rank) for r in mmr_rerank(cands, pairs, k=2).collect()}
    assert got == {(10, 1), (11, 2)}

    # missing (12, 10) orientation → loud failure when 12 is scored
    incomplete = pairs.filter(~((F.col("a") == 12) & (F.col("b") == 10)))
    with pytest.raises(Exception, match="missing pair similarity"):
        mmr_rerank(cands, incomplete, k=3).collect()

    nan_pairs = pairs.withColumn(
        "sim", F.when((F.col("a") == 11) & (F.col("b") == 10), float("nan")).otherwise(F.col("sim"))
    )
    with pytest.raises(Exception, match="NaN similarity"):
        mmr_rerank(cands, nan_pairs, k=2).collect()


def test_model_save_load_roundtrip(spark, tmp_path):
    import numpy as np

    from dask_lightgbm_spark import SparkLGBMClassifier

    rng = np.random.default_rng(42)
    pdf = pd.DataFrame(
        {
            "f0": np.concatenate([rng.normal(-4, 1, 50), rng.normal(4, 1, 50)]),
            "f1": np.concatenate([rng.normal(-4, 1, 50), rng.normal(4, 1, 50)]),
            "target": [0.0] * 50 + [1.0] * 50,
        }
    )
    df = spark.createDataFrame(pdf)
    clf = SparkLGBMClassifier(n_estimators=5, backend="mllib")
    clf.fit(df, feature_cols=["f0", "f1"], label_col="target")
    p1 = clf.transform(df).select("prediction").toPandas()

    path = str(tmp_path / "model")
    clf.save(path)
    clf2 = SparkLGBMClassifier.load(spark, path)
    assert clf2._feature_cols == ["f0", "f1"]
    p2 = clf2.transform(df).select("prediction").toPandas()
    pd.testing.assert_frame_equal(p1, p2)


def test_stateful_stream_totals(spark, sf_dir):
    from dask_lightgbm_spark.streaming.sessions import stream_user_totals

    got = (
        stream_user_totals(spark, sf_dir)
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    want = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.round(F.col("value") * 100).cast("long")).cast("double") / F.lit(100.0)).alias(
                "sum_value"
            ),
        )
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["user_id", "n_events", "sum_value"]], want)


def test_watermark_drops_late_events(spark, tmp_path):
    """Append-mode windowed agg with a watermark: an event arriving after
    the watermark passed its window is dropped — the late-data contract
    Structured Streaming adds over batch."""
    import pyspark.sql.functions as F

    d = str(tmp_path / "stream_src")
    on_time = pd.DataFrame(
        {
            "ts": pd.to_datetime(["2024-01-01 00:01:00", "2024-01-01 00:02:00",
                                   "2024-01-01 02:00:00"]),
            "v": [1.0, 2.0, 3.0],
        }
    )
    late = pd.DataFrame(
        {"ts": pd.to_datetime(["2024-01-01 00:03:00"]), "v": [100.0]}  # 2h late
    )
    spark.createDataFrame(on_time).coalesce(1).write.parquet(d + "/b=1")

    schema = spark.read.parquet(d + "/b=1").schema
    src = spark.readStream.schema(schema).parquet(d + "/b=*")
    agg = (
        src.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    name = "wm_test_out"
    q = agg.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()  # batch 1: watermark advances to 01:50
        spark.createDataFrame(late).coalesce(1).write.parquet(d + "/b=2")
        q.processAllAvailable()  # batch 2: 00:03 event is below the watermark
    finally:
        q.stop()
    rows = {r.w.start.hour: (r.s, r.n) for r in spark.table(name).collect()}
    # hour-0 window closed when the watermark passed 01:00 → emitted WITHOUT
    # the late 00:03 event (it would have made s=103.0, n=3)
    assert rows.get(0) == (3.0, 2), rows


def test_append_watermark_boundary_window_end_on_watermark(spark, tmp_path):
    """x05 oracle edge case (r2 advisor): when max(ts) puts the final
    watermark EXACTLY on a window end (max_ts - 30min == window.end), the
    window must emit — Spark's eviction predicate is window.end <= watermark,
    which is what the batch oracle's `end <= max_ts - delay` assumes. A
    strict-< eviction would silently break bit-parity on such fixtures."""
    from dask_lightgbm_spark.streaming.events import stream_windowed_append

    d = str(tmp_path / "fix")
    os.makedirs(d)
    pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "ts": pd.to_datetime(
                ["2024-01-01 10:15:00", "2024-01-01 10:45:00",
                 "2024-01-01 11:30:00"]  # max ts → watermark = 11:00:00 exactly
            ),
            "user_id": [1, 2, 3],
            "event_type": ["a", "a", "b"],
            "value": [1.0, 2.0, 4.0],
            "props": ["{}", "{}", "{}"],
        }
    ).to_parquet(d + "/events.parquet", index=False)
    got = stream_windowed_append(spark, d).toPandas()
    # window [10:00,11:00) has end == watermark → emitted; [11:00,12:00) is
    # still open (end 12:00 > 11:00) → withheld
    assert len(got) == 1, got
    r = got.iloc[0]
    assert r["hour"] == pd.Timestamp("2024-01-01 10:00:00")
    assert r["event_type"] == "a" and r["n"] == 2 and r["sum_value"] == 3.0


def test_merge_cdc_delete_update_insert(spark):
    """merge_cdc contract: D removes, U updates matched / inserts new, and
    a key carrying both D and U applies delete-then-upsert (fresh insert)."""
    from dask_lightgbm_spark.operators.merge import merge_cdc

    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["k", "name", "v"]
    )
    changes = spark.createDataFrame(
        [
            (2, None, None, "D"),          # delete
            (3, None, 99.0, "U"),          # update one column, keep name
            (4, "d", 40.0, "U"),           # insert
            (1, None, None, "D"),          # delete ...
            (1, "a2", 11.0, "U"),          # ... then re-insert fresh
        ],
        "k long, name string, v double, op string",
    )
    got = {
        r["k"]: (r["name"], r["v"])
        for r in merge_cdc(target, changes, "k").collect()
    }
    assert got == {1: ("a2", 11.0), 3: ("c", 99.0), 4: ("d", 40.0)}


def test_streaming_checkpoint_resume_exactly_once(spark, tmp_path):
    """Checkpointed streaming resume: a file-source query processes two
    files, stops, a third file arrives, and a RESTARTED query with the
    same checkpoint processes ONLY the new file — every event lands in the
    sink exactly once (offsets from the checkpoint, idempotent file sink)."""
    import pandas as pd

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def write_batch(name: str, ids: range) -> None:
        pd.DataFrame({"event_id": list(ids), "v": [i * 2 for i in ids]}).to_parquet(
            f"{src}/{name}.parquet", index=False
        )

    schema = "event_id long, v long"

    def run_stream() -> None:
        q = (
            spark.readStream.schema(schema)
            .parquet(src)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    write_batch("a", range(0, 50))
    write_batch("b", range(50, 80))
    run_stream()
    first = spark.read.parquet(sink)
    assert first.count() == 80

    write_batch("c", range(80, 100))
    run_stream()  # resume from checkpoint — must pick up ONLY file c
    final = spark.read.parquet(sink).toPandas().sort_values("event_id")
    assert len(final) == 100  # no re-processing of a/b (exactly once)
    assert final["event_id"].tolist() == list(range(100))
    assert (final["v"] == final["event_id"] * 2).all()


def test_stateful_restart_recovers_state_store(spark, tmp_path):
    """STATEFUL restart: a keyed running aggregation stops mid-stream and a
    restarted query (same checkpoint) folds a new file into RECOVERED state
    — the update emitted for a key after restart must carry the pre-restart
    counts (state-store replay from the checkpoint), not a from-zero
    recount of the new file. This is the recovery half of the streaming
    stanza's state story; the stateless half is the offsets test above."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def write_batch(name: str, users: list[int]) -> None:
        pd.DataFrame(
            {"user_id": users, "v": [1] * len(users)}
        ).to_parquet(f"{src}/{name}.parquet", index=False)

    emitted: list[tuple[int, int, int]] = []  # (batch_id, user_id, n)

    def run_stream() -> None:
        agg = (
            spark.readStream.schema("user_id long, v long")
            .parquet(src)
            .groupBy("user_id")
            .agg(F.sum("v").alias("n"))
        )

        def sink(batch_df, batch_id):
            for r in batch_df.collect():
                emitted.append((batch_id, r.user_id, r.n))

        q = (
            agg.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    write_batch("a", [1, 1, 1, 2])
    run_stream()  # user 1 -> 3, user 2 -> 1
    write_batch("b", [1, 1, 3])
    run_stream()  # restart: folds b into state recovered from the checkpoint
    final = {u: n for _, u, n in sorted(emitted)}
    # user 1's post-restart update must be 3 (recovered) + 2 (new) = 5;
    # a state loss would emit 2, a replay-from-zero would emit 5 twice
    assert final == {1: 5, 2: 1, 3: 1}
    post_restart = [(u, n) for b, u, n in emitted if b > 0]
    assert sorted(post_restart) == [(1, 5), (3, 1)]  # only keys file b touched


def test_rocksdb_state_store_parity(spark, tmp_path_factory):
    """The RocksDB state-store provider (the backend a 100 TB deployment
    runs — state spills off-heap/disk instead of living in executor JVM
    heap) must produce the same final totals as the default HDFS-backed
    provider for the custom applyInPandasWithState operator, folded across
    real micro-batches."""
    from dask_lightgbm_spark.streaming.sessions import stream_user_totals
    from tests.test_differential import _write_event_batches

    batches = [
        [(1, 0, 1.0), (2, 1, 2.5)],
        [(1, 2, 0.5), (3, 3, 1.0)],
        [(2, 4, 2.0), (1, 5, 1.0)],
    ]
    sf, _ = _write_event_batches(tmp_path_factory, "xrocks", batches)
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        got = stream_user_totals(
            spark, sf, glob="events_*.parquet", max_files_per_trigger=1
        ).toPandas()
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    final = {
        int(r.user_id): (int(r.n_events), r.sum_value)
        for _, r in got.sort_values("n_events").groupby("user_id").tail(1).iterrows()
    }
    expected: dict[int, tuple[int, int]] = {}
    for batch in batches:
        for uid, _m, value in batch:
            n, cents = expected.get(uid, (0, 0))
            expected[uid] = (n + 1, cents + round(value * 100))
    assert final == {u: (n, c / 100.0) for u, (n, c) in expected.items()}


def test_stream_bench_fixture_contract():
    """The streaming stanza's replay-order parity silently depends on the
    fixture layout: files must be DISJOINT contiguous event-time ranges
    whose union is exactly the 10x-replicated source, with strictly
    increasing mtimes (the file source orders micro-batches by mtime).
    Pin those properties so a fixture-builder change cannot quietly turn
    the ordered replay into an out-of-order one."""
    import duckdb

    from bench import STREAM_FILES, STREAM_SCALE, ensure_stream_events

    src_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    d = ensure_stream_events(src_dir)
    files = sorted(
        f for f in os.listdir(d) if f.startswith("events_") and f.endswith(".parquet")
    )
    assert len(files) == STREAM_FILES
    mtimes = [os.path.getmtime(os.path.join(d, f)) for f in files]
    assert all(a < b for a, b in zip(mtimes, mtimes[1:]))
    assert os.path.exists(os.path.join(d, "customer.parquet"))

    con = duckdb.connect()
    n_src = con.execute(
        f"SELECT count(*) FROM read_parquet('{src_dir}/events.parquet')"
    ).fetchone()[0]
    total, distinct = con.execute(
        f"SELECT count(*), count(DISTINCT event_id) "
        f"FROM read_parquet('{d}/events_*.parquet')"
    ).fetchone()
    assert total == n_src * STREAM_SCALE
    assert distinct == total  # replicas got fresh ids; files are disjoint
    spans = [
        con.execute(
            f"SELECT min(ts), max(ts) FROM read_parquet('{d}/{f}')"
        ).fetchone()
        for f in files
    ]
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi <= lo  # contiguous: replay order == event-time order
    con.close()


def test_s15_lazy_result_survives_other_sf_invocation(spark):
    """r6 review finding: the persisted-index scratch path is keyed by
    sf_dir, so building the index for ANOTHER sf must not clobber the files
    a still-lazy earlier result reads. The earlier result must materialize
    identically before and after the second build."""
    from dask_lightgbm_spark.queries import all_queries

    q = all_queries()["s15_ivf_persisted_index"]
    first = q(spark, "/root/testdata/sf0.001")
    expect = first.toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    # second invocation at a different sf overwrites ITS OWN path only
    q(spark, "/root/testdata/sf0.01").toPandas()
    again = first.toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(expect, again)


def test_stream_match_against_stored_index_parity(spark, tmp_path):
    """r14 verdict #5: the production ingest-dedup loop — a document
    stream LSH-matched against the STORED band index — must emit exactly
    the batch ``minhash_lsh_match_against_index`` pairs on a drained
    bounded source, including under a file-per-trigger micro-batched
    drain (the bench ingest_dedup_10x leg's protocol). Also pins that the
    streamed plan's only stateful op survives multi-trigger dedup of
    band-collision pairs (the same pair proposed in two triggers must not
    emit twice)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from dask_lightgbm_spark.operators.dedup import (
        minhash_lsh_match_against_index,
        write_band_index,
    )
    from dask_lightgbm_spark.streaming.ingest import stream_match_against_index

    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    corpus = d.filter(F.col("source") != "src0")
    new = d.filter(F.col("source") == "src0")
    idx = str(tmp_path / "idx")
    write_band_index(corpus, idx, "doc_id", "text")
    new_dir = str(tmp_path / "new")
    new.repartition(3).write.parquet(new_dir)

    batch = minhash_lsh_match_against_index(
        spark.read.parquet(new_dir),
        spark.read.parquet(f"{idx}/bands.parquet"),
        spark.read.parquet(f"{idx}/verify.parquet"),
        "doc_id",
        "text",
    ).toPandas()
    assert len(batch) > 0, "fixture must plant at least one near-dup pair"
    key = ["new_id", "corpus_id"]
    cols = key + ["jaccard"]
    for mft in (None, 1):  # one-shot AND file-per-trigger drains
        streamed = stream_match_against_index(
            spark, new_dir, idx, max_files_per_trigger=mft
        ).toPandas()
        pd.testing.assert_frame_equal(
            batch[cols].sort_values(key).reset_index(drop=True),
            streamed[cols].sort_values(key).reset_index(drop=True),
        )
        assert not streamed.duplicated(key).any()
