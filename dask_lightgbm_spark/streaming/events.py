"""Structured Streaming over the events table.

The batch fixture doubles as a bounded stream (file source + pathGlobFilter);
``processAllAvailable`` drains it synchronously so streaming results are
deterministic and oracle-comparable against the batch SQL twin (q14).

At scale the same code points at a Kafka source + real watermarks; the
aggregation plan (stateful hash agg keyed on (hour, event_type)) is
identical.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from dask_lightgbm_spark.streaming.diag import drain_and_capture, state_partitions


def read_events_stream(
    spark: SparkSession,
    sf_dir: str,
    glob: str = "events.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """readStream over the events parquet. All fixture timestamp shapes
    (int64 nanos, NTZ-µs, UTC-µs) normalize to ``TimestampType`` before any
    watermark — ``withWatermark`` rejects ``TIMESTAMP_NTZ``.

    ``glob``/``max_files_per_trigger`` let a caller feed MULTIPLE event
    files one micro-batch at a time (e.g. ``glob="events_*.parquet"``,
    ``max_files_per_trigger=1``) — how the multi-batch state-fold tests
    drive the stateful operators; the defaults keep the catalog queries'
    single-file single-batch shape."""
    from dask_lightgbm_spark.sources.readers import (
        normalize_event_time,
        raw_parquet_schema,
    )

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = raw_parquet_schema(spark, sf_dir, glob)
    reader = spark.readStream.schema(schema).option("pathGlobFilter", glob)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.parquet(sf_dir)
    return normalize_event_time(src)


def stream_hourly_aggregate(
    spark: SparkSession,
    sf_dir: str,
    glob: str = "events.parquet",
    max_files_per_trigger: int | None = None,
    shuffle_partitions: int | str | None = "auto",
) -> DataFrame:
    """Run the hourly event aggregation as a real streaming query (complete
    mode → memory sink), drain it, and return the final result table.
    ``glob``/``max_files_per_trigger`` pass through to the source so the
    bench/tests can fold the windowed state across several micro-batches.
    ``shuffle_partitions`` sizes the state store to the trigger volume
    ("auto" = derive from source bytes — see
    :func:`~dask_lightgbm_spark.streaming.diag.adaptive_state_partitions`;
    explicit ints, e.g. the bench's protocol value, pass through)."""
    from dask_lightgbm_spark.streaming.diag import adaptive_state_partitions

    if shuffle_partitions == "auto":
        shuffle_partitions = adaptive_state_partitions(spark, sf_dir, glob)
    with state_partitions(spark, shuffle_partitions):
        src = read_events_stream(
            spark, sf_dir, glob=glob, max_files_per_trigger=max_files_per_trigger
        )
        agg = src.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.round(F.col("value") * 100).cast("long")).cast("double") / F.lit(100.0)).alias(
                "sum_value"
            ),
        )
        name = f"stream_out_{uuid.uuid4().hex[:8]}"
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .start()
        )
    drain_and_capture(q)
    return spark.table(name)


def stream_distinct_user_counts(
    spark: SparkSession,
    sf_dir: str,
    shuffle_partitions: int | str | None = "auto",
) -> DataFrame:
    """Streaming DEDUPLICATION: dropDuplicates over a stream is Spark's
    stateful distinct (state keyed on the dedup columns; at scale bounded
    with a watermark). Distinct (user, event_type) pairs then count per
    type — exact COUNT(DISTINCT) is not allowed in streaming aggs, and this
    is the standard rewrite. ``shuffle_partitions``: trigger-volume state
    sizing, as :func:`stream_hourly_aggregate`."""
    import uuid as _uuid

    from dask_lightgbm_spark.streaming.diag import adaptive_state_partitions

    if shuffle_partitions == "auto":
        shuffle_partitions = adaptive_state_partitions(
            spark, sf_dir, "events.parquet"
        )
    with state_partitions(spark, shuffle_partitions):
        src = read_events_stream(spark, sf_dir).select("user_id", "event_type")
        counts = (
            src.dropDuplicates(["user_id", "event_type"])
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_users"))
        )
        name = f"stream_dedup_{_uuid.uuid4().hex[:8]}"
        q = (
            counts.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .start()
        )
    drain_and_capture(q)
    return spark.table(name)


def stream_static_segment_totals(
    spark: SparkSession,
    sf_dir: str,
    glob: str = "events.parquet",
    max_files_per_trigger: int | None = None,
    shuffle_partitions: int | str | None = "auto",
) -> DataFrame:
    """Stream-static join: enrich the event stream with the static customer
    dimension (user_id = c_custkey), then aggregate per market segment.

    The static side is a plain batch DataFrame — Spark re-plans it per
    micro-batch and broadcasts it into the stream (the standard enrichment
    topology: dims in a warehouse table, facts on a bus). Complete-mode
    memory sink, drained synchronously. ``glob``/``max_files_per_trigger``
    pass through to the source (the micro-batched path re-broadcasts the
    dim per batch — exactly the cost the bench's streaming stanza measures).

    Scale note: the hint is right while the dim fits the broadcast
    threshold (every fixture SF; per-batch re-broadcast then amortizes
    into the trigger). At the SF where customer outgrows it, drop the hint
    — Spark shuffle-joins each micro-batch against the static side — or
    pre-aggregate the dim to the segment columns actually joined."""
    from dask_lightgbm_spark.sources.readers import load_table
    from dask_lightgbm_spark.streaming.diag import adaptive_state_partitions

    if shuffle_partitions == "auto":
        shuffle_partitions = adaptive_state_partitions(spark, sf_dir, glob)
    with state_partitions(spark, shuffle_partitions):
        src = read_events_stream(
            spark, sf_dir, glob=glob, max_files_per_trigger=max_files_per_trigger
        )
        dim = load_table(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("user_id"), "c_mktsegment"
        )
        agg = (
            src.join(F.broadcast(dim), "user_id")
            .groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                (
                    F.sum(F.round(F.col("value") * 100).cast("long")).cast("double")
                    / F.lit(100.0)
                ).alias("sum_value"),
            )
        )
        name = f"stream_out_{uuid.uuid4().hex[:8]}"
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .start()
        )
    drain_and_capture(q)
    return spark.table(name)


def stream_windowed_append(
    spark: SparkSession,
    sf_dir: str,
    delay: str = "30 minutes",
    shuffle_partitions: int | str | None = "auto",
) -> DataFrame:
    """APPEND-mode hourly windowed aggregation with a watermark — the
    production streaming mode (complete mode can't scale unbounded key
    domains; append emits each window exactly once when the watermark
    passes its end).

    On a bounded drain the final watermark is max(ts) - delay (no-data
    micro-batches flush every closed window), so the emitted set is exactly
    the windows with end <= max(ts) - delay — which is what the batch
    oracle computes. Windows still open at drain time are withheld by
    design; at scale they'd emit when later data advances the watermark.
    ``shuffle_partitions``: trigger-volume state sizing, as
    :func:`stream_hourly_aggregate`."""
    from dask_lightgbm_spark.streaming.diag import adaptive_state_partitions

    if shuffle_partitions == "auto":
        shuffle_partitions = adaptive_state_partitions(
            spark, sf_dir, "events.parquet"
        )
    with state_partitions(spark, shuffle_partitions):
        src = read_events_stream(spark, sf_dir)
        agg = (
            src.withWatermark("ts", delay)
            .groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                (
                    F.sum(F.round(F.col("value") * 100).cast("long")).cast("double")
                    / F.lit(100.0)
                ).alias("sum_value"),
            )
            .select(
                F.col("window.start").alias("hour"), "event_type", "n", "sum_value"
            )
        )
        name = f"stream_out_{uuid.uuid4().hex[:8]}"
        q = (
            agg.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .start()
        )
    drain_and_capture(q)
    return spark.table(name)


def stream_session_window(
    spark: SparkSession,
    sf_dir: str,
    gap: str = "30 minutes",
    delay: str = "30 minutes",
    glob: str = "events.parquet",
    max_files_per_trigger: int | None = None,
    shuffle_partitions: int | str | None = "auto",
) -> DataFrame:
    """APPEND-mode per-user SESSION-window aggregation with a watermark —
    dynamic-gap sessionization as a native streaming operator (batch twin:
    q28's gaps-and-islands). A session closes when the watermark passes its
    end (last event + gap); on a bounded drain the final watermark is
    max(ts) - delay, so the emitted set is exactly the sessions with
    last_ts + gap <= max(ts) - delay — what the batch oracle computes.
    Sessions still open at drain time are withheld by design.
    ``glob``/``max_files_per_trigger`` pass through to the source so tests
    can extend a session across several real micro-batches.
    ``shuffle_partitions``: trigger-volume state sizing, as
    :func:`stream_hourly_aggregate`."""
    from dask_lightgbm_spark.streaming.diag import adaptive_state_partitions

    if shuffle_partitions == "auto":
        shuffle_partitions = adaptive_state_partitions(spark, sf_dir, glob)
    with state_partitions(spark, shuffle_partitions):
        src = read_events_stream(
            spark, sf_dir, glob=glob, max_files_per_trigger=max_files_per_trigger
        )
        agg = (
            src.withWatermark("ts", delay)
            .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                (
                    F.sum(F.round(F.col("value") * 100).cast("long")).cast("double")
                    / F.lit(100.0)
                ).alias("sum_value"),
            )
            .select(
                F.col("w.start").alias("session_start"),
                "user_id",
                "n_events",
                "sum_value",
            )
        )
        name = f"stream_out_{uuid.uuid4().hex[:8]}"
        q = (
            agg.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .start()
        )
    drain_and_capture(q)
    return spark.table(name)


def stream_dedup_within_watermark(
    spark: SparkSession,
    sf_dir: str,
    glob: str = "events.parquet",
    max_files_per_trigger: int | None = None,
    shuffle_partitions: int | str | None = "auto",
) -> DataFrame:
    """Streaming dedup with BOUNDED state: ``dropDuplicatesWithinWatermark``
    evicts dedup state once the watermark passes an event's time — the
    production form of x03's unbounded dropDuplicates (whose state grows
    with key cardinality forever). On a bounded single-batch drain the
    watermark is still at its initial value while the batch processes, so
    every row is inside the window and the result equals exact global
    dedup — which is what the oracle checks. ``glob``/
    ``max_files_per_trigger`` pass through to the source so tests can
    replay duplicates across several real micro-batches.
    ``shuffle_partitions``: trigger-volume state sizing, as
    :func:`stream_hourly_aggregate`."""
    from dask_lightgbm_spark.streaming.diag import adaptive_state_partitions

    if shuffle_partitions == "auto":
        shuffle_partitions = adaptive_state_partitions(spark, sf_dir, glob)
    with state_partitions(spark, shuffle_partitions):
        src = read_events_stream(
            spark, sf_dir, glob=glob, max_files_per_trigger=max_files_per_trigger
        ).select("ts", "user_id", "event_type")
        counts = (
            src.withWatermark("ts", "1 hour")
            .dropDuplicatesWithinWatermark(["user_id", "event_type"])
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_users"))
        )
        name = f"stream_out_{uuid.uuid4().hex[:8]}"
        q = (
            counts.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .start()
        )
    drain_and_capture(q)
    return spark.table(name)


def stream_stream_interval_join(
    spark: SparkSession,
    sf_dir: str,
    horizon: str = "1 hour",
    glob: str = "events.parquet",
    max_files_per_trigger: int | None = None,
    shuffle_partitions: int | str | None = "auto",
) -> DataFrame:
    """STREAM-STREAM inner join with an event-time interval condition:
    view events joined to purchase events by the same user within
    ``horizon`` after the view — the attribution-join topology (two
    unbounded sources, watermark-bounded state on both sides).

    Watermarks bound how long each side's rows are retained for late
    matches; the interval condition lets Spark derive state-eviction
    thresholds on both sides. On the bounded fixture drain the file source
    delivers everything in one micro-batch, so no state is evicted before
    matching and the emitted pairs equal the batch interval join — which is
    what the oracle computes. ``glob``/``max_files_per_trigger`` pass
    through to both sources so tests can land the two sides of a match in
    DIFFERENT micro-batches.

    ``shuffle_partitions`` sizes the join's FOUR state stores per
    partition to the trigger volume ("auto" = one partition per ~8 MiB of
    source input, capped at the session setting — see
    :func:`~dask_lightgbm_spark.streaming.diag.adaptive_state_partitions`);
    results are partition-count invariant."""
    from dask_lightgbm_spark.streaming.diag import adaptive_state_partitions

    if shuffle_partitions == "auto":
        shuffle_partitions = adaptive_state_partitions(spark, sf_dir, glob)
    with state_partitions(spark, shuffle_partitions):
        views = (
            read_events_stream(
                spark, sf_dir, glob=glob, max_files_per_trigger=max_files_per_trigger
            )
            .filter(F.col("event_type") == "view")
            .select(
                F.col("user_id"),
                F.col("event_id").alias("view_id"),
                F.col("ts").alias("view_ts"),
            )
            .withWatermark("view_ts", horizon)
        )
        purchases = (
            read_events_stream(
                spark, sf_dir, glob=glob, max_files_per_trigger=max_files_per_trigger
            )
            .filter(F.col("event_type") == "purchase")
            .select(
                F.col("user_id").alias("p_user_id"),
                F.col("event_id").alias("purchase_id"),
                F.col("ts").alias("purchase_ts"),
            )
            .withWatermark("purchase_ts", horizon)
        )
        joined = views.join(
            purchases,
            F.expr(
                f"""
                user_id = p_user_id
                AND purchase_ts >= view_ts
                AND purchase_ts <= view_ts + INTERVAL {horizon}
                """
            ),
        ).select("user_id", "view_id", "purchase_id", "view_ts", "purchase_ts")
        name = f"stream_out_{uuid.uuid4().hex[:8]}"
        q = (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .start()
        )
    drain_and_capture(q)
    return spark.table(name)


def stream_foreachbatch_parquet_sink(
    spark: SparkSession,
    sf_dir: str,
    shuffle_partitions: int | str | None = "auto",
) -> DataFrame:
    """``foreachBatch`` parquet sink: the production topology for landing a
    streaming aggregation in a warehouse table without a streaming-native
    sink. Each micro-batch receives the updated complete-mode aggregate and
    idempotently overwrites the target (same batch re-delivered after a
    failure rewrites identical files — exactly-once by idempotence, the
    standard foreachBatch contract). The drained table is read back as a
    batch DataFrame, so the result equals the batch oracle.
    ``shuffle_partitions``: trigger-volume state sizing, as
    :func:`stream_hourly_aggregate` (also keeps the per-batch overwrite
    from fanning a few output rows across dozens of tiny files)."""
    from dask_lightgbm_spark.session import scratch_dir
    from dask_lightgbm_spark.streaming.diag import adaptive_state_partitions

    if shuffle_partitions == "auto":
        shuffle_partitions = adaptive_state_partitions(
            spark, sf_dir, "events.parquet"
        )
    with state_partitions(spark, shuffle_partitions):
        src = read_events_stream(spark, sf_dir)
        agg = src.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.round(F.col("value") * 100).cast("long")).cast("double")
                / F.lit(100.0)
            ).alias("sum_value"),
        )
        # process-wide scratch root (cleaned at exit), keyed by sf_dir so a
        # later run at another sf cannot clobber a still-lazy earlier result
        out_dir = (
            scratch_dir("stream_sink") + "/" + sf_dir.strip("/").replace("/", "_")
        )

        def write_batch(batch_df: DataFrame, batch_id: int) -> None:
            batch_df.write.mode("overwrite").parquet(out_dir + "/agg")

        q = (
            agg.writeStream.outputMode("complete")
            .foreachBatch(write_batch)
            .start()
        )
    drain_and_capture(q)
    return spark.read.parquet(out_dir + "/agg")


def stream_stream_left_outer_join(
    spark: SparkSession,
    sf_dir: str,
    horizon: str = "1 hour",
    glob: str = "events.parquet",
    max_files_per_trigger: int | None = None,
    shuffle_partitions: int | str | None = "auto",
) -> DataFrame:
    """LEFT OUTER stream-stream join: every view, with its attributed
    purchases within ``horizon`` — or NULLs if none arrived. The outer
    side's null rows can only emit when the watermark proves no future
    match is possible (left state eviction), which is the semantic knife
    edge of streaming outer joins.

    On the bounded drain the final global watermark is
    min(max view_ts, max purchase_ts) - delay (multiple-watermark policy
    'min'); a view emits null-extended iff it is unmatched AND its match
    window [view_ts, view_ts + horizon] is fully below that watermark.
    Unmatched views younger than that are withheld by design (at scale
    they'd emit as the watermark advances). The oracle reproduces exactly
    this: matched pairs plus unmatched views with
    view_ts + horizon < min(max view_ts, max purchase_ts) - delay.

    ``shuffle_partitions``: trigger-volume state sizing, as
    :func:`stream_stream_interval_join`."""
    from dask_lightgbm_spark.streaming.diag import adaptive_state_partitions

    if shuffle_partitions == "auto":
        shuffle_partitions = adaptive_state_partitions(spark, sf_dir, glob)
    with state_partitions(spark, shuffle_partitions):
        views = (
            read_events_stream(
                spark, sf_dir, glob=glob, max_files_per_trigger=max_files_per_trigger
            )
            .filter(F.col("event_type") == "view")
            .select(
                F.col("user_id"),
                F.col("event_id").alias("view_id"),
                F.col("ts").alias("view_ts"),
            )
            .withWatermark("view_ts", horizon)
        )
        purchases = (
            read_events_stream(
                spark, sf_dir, glob=glob, max_files_per_trigger=max_files_per_trigger
            )
            .filter(F.col("event_type") == "purchase")
            .select(
                F.col("user_id").alias("p_user_id"),
                F.col("event_id").alias("purchase_id"),
                F.col("ts").alias("purchase_ts"),
            )
            .withWatermark("purchase_ts", horizon)
        )
        joined = views.join(
            purchases,
            F.expr(
                f"""
                user_id = p_user_id
                AND purchase_ts >= view_ts
                AND purchase_ts <= view_ts + INTERVAL {horizon}
                """
            ),
            "left_outer",
        ).select("user_id", "view_id", "purchase_id", "view_ts", "purchase_ts")
        name = f"stream_out_{uuid.uuid4().hex[:8]}"
        q = (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .start()
        )
    drain_and_capture(q)
    return spark.table(name)


def stream_upsert_state_sink(
    spark: SparkSession,
    sf_dir: str,
    glob: str = "events.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming UPSERT into a keyed state table (the CDC-apply sink — the
    streaming twin of batch q61): each micro-batch folds its events into a
    latest-value-per-user parquet state via read-merge-overwrite in
    ``foreachBatch``. Latest-wins is decided by (ts, event_id) — a total
    order — so the merge is IDEMPOTENT: re-applying a batch whose rows the
    state already absorbed changes nothing (micro-batch retry safe), and
    the final state equals the batch argmax regardless of batch
    boundaries. At scale the state table is keyed and small relative to
    the event stream (one row per user); production swaps the overwrite
    for a storage-layer MERGE, same semantics. ``glob``/
    ``max_files_per_trigger`` pass through to the source so tests can
    apply out-of-order updates across several real micro-batches."""
    import os

    from dask_lightgbm_spark.session import scratch_dir

    out = (
        scratch_dir("x16_state") + "/" + sf_dir.strip("/").replace("/", "_")
    )
    src = read_events_stream(
        spark, sf_dir, glob=glob, max_files_per_trigger=max_files_per_trigger
    )

    def latest(df: DataFrame) -> DataFrame:
        w = W.partitionBy("user_id").orderBy(
            F.desc("ts"), F.desc("event_id")
        )
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(
                "user_id",
                F.col("ts").alias("last_ts"),
                F.col("event_id").alias("last_event_id"),
                F.col("value").alias("last_value"),
            )
        )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        import shutil

        # an aborted previous run may have left a stale .next — never let
        # it masquerade as (or collide with) this run's side dir
        shutil.rmtree(out + ".next", ignore_errors=True)
        # crash between the two swap renames below leaves the ONLY state
        # copy in .old with the primary missing — restore it before the
        # exists(out) check, or the merge would silently start from empty
        # and the later rmtree(.old) would destroy the surviving copy
        if not os.path.exists(out) and os.path.exists(out + ".old"):
            os.rename(out + ".old", out)
        upserts = latest(batch_df.select("user_id", "ts", "event_id", "value"))
        if os.path.exists(out):
            state = spark.read.parquet(out).select(
                "user_id",
                F.col("last_ts").alias("ts"),
                F.col("last_event_id").alias("event_id"),
                F.col("last_value").alias("value"),
            )
            merged = latest(
                state.unionByName(
                    upserts.select(
                        "user_id",
                        F.col("last_ts").alias("ts"),
                        F.col("last_event_id").alias("event_id"),
                        F.col("last_value").alias("value"),
                    )
                )
            )
        else:
            merged = upserts
        # the merge plan READS the state dir it replaces — write to a side
        # dir first, then swap via TWO RENAMES (r7 advisor: rmtree-then-
        # rename had a window where a crash loses the state entirely; a
        # rename pair leaves either old or new state present at all times,
        # and the displaced old dir is deleted only after the new one is
        # in place)
        tmp = out + ".next"
        merged.write.mode("overwrite").parquet(tmp)
        old = out + ".old"
        # .old here can only be a stale leftover from a crash AFTER a
        # successful swap (out exists — the sole-copy case was recovered
        # at entry), so deleting it before the swap is safe
        shutil.rmtree(old, ignore_errors=True)
        if os.path.exists(out):
            os.rename(out, old)
        os.rename(tmp, out)
        shutil.rmtree(old, ignore_errors=True)

    q = src.writeStream.foreachBatch(handle).start()
    drain_and_capture(q)
    return (
        spark.read.parquet(out)
        .select("user_id", "last_ts", "last_event_id", "last_value")
        .orderBy("user_id")
    )
