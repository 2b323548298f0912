"""Structured-Streaming query surface.

x01 runs a REAL streaming query (file source → complete-mode memory sink,
drained synchronously) whose final state must equal the batch SQL oracle —
the strongest correctness statement available for a bounded stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dask_lightgbm_spark.queries import query

_X01_SQL = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_value
FROM events
GROUP BY 1, 2
"""


@query("x01_stream_events_hourly", _X01_SQL)
def x01_stream_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dask_lightgbm_spark.streaming.events import stream_hourly_aggregate

    return stream_hourly_aggregate(spark, sf_dir)


_X02_SQL = """
SELECT user_id, COUNT(*) AS n_events,
       CAST(SUM(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_value
FROM events GROUP BY user_id
"""


@query("x02_stream_stateful_user_totals", _X02_SQL)
def x02_stream_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): per-user
    running totals; drained final state must equal the batch groupBy."""
    from dask_lightgbm_spark.streaming.sessions import stream_user_totals

    return stream_user_totals(spark, sf_dir)


_X03_SQL = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
"""


@query("x03_stream_dedup_counts", _X03_SQL)
def x03_stream_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup (stateful dropDuplicates) + count, equal to the batch
    COUNT(DISTINCT) oracle once the bounded stream drains."""
    from dask_lightgbm_spark.streaming.events import stream_distinct_user_counts

    return stream_distinct_user_counts(spark, sf_dir)


_X04_SQL = """
SELECT c.c_mktsegment,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(round(e.value*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1
"""


@query("x04_stream_static_join", _X04_SQL)
def x04_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast join (event stream enriched with the customer
    dim) + streaming agg; drained final state equals the batch join oracle."""
    from dask_lightgbm_spark.streaming.events import stream_static_segment_totals

    return stream_static_segment_totals(spark, sf_dir)


_X05_SQL = """
WITH mx AS (SELECT MAX(ts) AS max_ts FROM events),
w AS (
  SELECT date_trunc('hour', ts) AS hour, event_type,
         COUNT(*) AS n,
         CAST(SUM(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_value
  FROM events GROUP BY 1, 2
)
SELECT w.hour, w.event_type, w.n, w.sum_value
FROM w, mx
WHERE w.hour + INTERVAL 1 HOUR <= mx.max_ts - INTERVAL 30 MINUTE
"""


@query("x05_stream_append_watermark", _X05_SQL)
def x05_stream_append_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append-mode watermarked windowed agg (each closed window emitted
    exactly once); the bounded drain pins the final watermark at
    max(ts) - 30 min, so emitted windows = the batch oracle's set."""
    from dask_lightgbm_spark.streaming.events import stream_windowed_append

    return stream_windowed_append(spark, sf_dir)


_X06_SQL = """
WITH mx AS (SELECT MAX(ts) AS max_ts FROM events),
flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
), sess AS (
  SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS last_ts,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_value
  FROM numbered GROUP BY user_id, session_id
)
SELECT s.session_start, s.user_id, s.n_events, s.sum_value
FROM sess s, mx
WHERE s.last_ts + INTERVAL 30 MINUTE <= mx.max_ts - INTERVAL 30 MINUTE
"""


@query("x06_stream_session_window", _X06_SQL)
def x06_stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-user session windows (30-min gap) in append mode with
    a 30-min watermark; emitted sessions equal the batch gaps-and-islands
    oracle restricted to sessions closed by the final watermark."""
    from dask_lightgbm_spark.streaming.events import stream_session_window

    return stream_session_window(spark, sf_dir)


_X07_SQL = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
"""


@query("x07_stream_dedup_within_watermark", _X07_SQL)
def x07_stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State-bounded streaming dedup (dropDuplicatesWithinWatermark) +
    count per type; equals the batch COUNT(DISTINCT) on a bounded drain."""
    from dask_lightgbm_spark.streaming.events import stream_dedup_within_watermark

    return stream_dedup_within_watermark(spark, sf_dir)


_X08_SQL = """
SELECT v.user_id, v.view_id, p.purchase_id, v.view_ts, p.purchase_ts
FROM (SELECT user_id, event_id AS view_id, ts AS view_ts
      FROM events WHERE event_type = 'view') v
JOIN (SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
      FROM events WHERE event_type = 'purchase') p
  ON v.user_id = p.user_id
 AND p.purchase_ts >= v.view_ts
 AND p.purchase_ts <= v.view_ts + INTERVAL 1 HOUR
"""


@query("x08_stream_stream_interval_join", _X08_SQL)
def x08_stream_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (view -> purchase attribution within 1h):
    two watermarked unbounded sources, state bounded by the interval
    condition; drained pairs equal the batch interval-join oracle."""
    from dask_lightgbm_spark.streaming.events import stream_stream_interval_join

    return stream_stream_interval_join(spark, sf_dir)


# same aggregate as x01 — the point of x09 is the sink topology
_X09_SQL = _X01_SQL


@query("x09_stream_foreachbatch_sink", _X09_SQL)
def x09_stream_foreachbatch_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch parquet sink (idempotent overwrite per micro-batch);
    the landed table read back must equal the batch oracle."""
    from dask_lightgbm_spark.streaming.events import (
        stream_foreachbatch_parquet_sink,
    )

    return stream_foreachbatch_parquet_sink(spark, sf_dir)


_X10_SQL = """
WITH v AS (SELECT user_id, event_id AS view_id, ts AS view_ts
           FROM events WHERE event_type = 'view'),
p AS (SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
      FROM events WHERE event_type = 'purchase'),
wm AS (SELECT LEAST((SELECT MAX(view_ts) FROM v),
                    (SELECT MAX(purchase_ts) FROM p))
              - INTERVAL 1 HOUR AS w),
matched AS (
  SELECT v.user_id, v.view_id, p.purchase_id, v.view_ts, p.purchase_ts
  FROM v JOIN p
    ON v.user_id = p.user_id
   AND p.purchase_ts >= v.view_ts
   AND p.purchase_ts <= v.view_ts + INTERVAL 1 HOUR
),
unmatched AS (
  SELECT v.user_id, v.view_id, NULL::BIGINT AS purchase_id,
         v.view_ts, NULL::TIMESTAMP AS purchase_ts
  FROM v, wm
  WHERE NOT EXISTS (
    SELECT 1 FROM p
    WHERE p.user_id = v.user_id
      AND p.purchase_ts >= v.view_ts
      AND p.purchase_ts <= v.view_ts + INTERVAL 1 HOUR)
    AND v.view_ts + INTERVAL 1 HOUR < wm.w
)
SELECT * FROM matched UNION ALL SELECT * FROM unmatched
"""


@query("x10_stream_stream_left_outer", _X10_SQL)
def x10_stream_stream_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream join: null rows emit only on left-state
    eviction (match window fully below the final min-watermark) — the
    oracle reproduces the eviction predicate exactly."""
    from dask_lightgbm_spark.streaming.events import stream_stream_left_outer_join

    return stream_stream_left_outer_join(spark, sf_dir)


# x11 reuses s02's oracle: each streamed query's top-3 against the static
# index is exactly the batch IVF result for vec_id < 10
from dask_lightgbm_spark.queries.similarity import _S02_SQL as _X11_SQL  # noqa: E402


@query("x11_stream_ann_serving", _X11_SQL)
def x11_stream_ann_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ANN serving: query-vector stream -> foreachBatch IVF
    search against the static session-cached index; drained union equals
    the batch s02 result bit-for-bit (same cell decision, same norm folds)."""
    from dask_lightgbm_spark.queries.similarity import _ivf_index
    from dask_lightgbm_spark.streaming.vectors import stream_ann_serving

    return stream_ann_serving(spark, sf_dir, _ivf_index(spark, sf_dir), k=3)


# x12 reuses t35's oracle: the scorer is a stateless projection, so the
# drained stream equals the batch scoring run row-for-row
from dask_lightgbm_spark.queries.text import _T35_SQL as _X12_SQL  # noqa: E402


@query("x12_stream_quality_scoring", _X12_SQL)
def x12_stream_quality_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming corpus-quality scoring: documents arrive as a bounded file
    stream and flow through the t35 hashed-bigram linear scorer — the
    stream side of the backfill-batch/serve-streaming pattern. The scorer
    is shared code (queries.text.quality_score_projection), so batch and
    stream are identical by construction: zero state, zero watermark,
    append mode, constant memory on an unbounded stream."""
    import uuid

    from pyspark.sql import functions as F

    from dask_lightgbm_spark.queries.text import quality_score_projection

    from dask_lightgbm_spark.sources.readers import raw_parquet_schema

    schema = raw_parquet_schema(spark, sf_dir, "documents.parquet")
    src = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    scored = quality_score_projection(src)
    name = f"stream_q_{uuid.uuid4().hex[:8]}"
    q = (
        scored.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).orderBy("doc_id")


# x13 reuses t19's oracle verbatim: the streaming decontamination filter is
# a stateless projection (row-local shingle set ∩ broadcast eval set), so
# the drained stream equals the batch t19 report row-for-row
from dask_lightgbm_spark.queries.text import _T19_SQL as _X13_SQL  # noqa: E402


@query("x13_stream_decontamination", _X13_SQL)
def x13_stream_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming train-corpus decontamination: train documents arrive as a
    bounded file stream and each row is checked against the STATIC eval
    shingle set — the online-ingest twin of batch t19 (contamination
    screening at ingest time, before a doc ever lands in the corpus).

    Shape: the eval split's distinct shingle hashes are collapsed into a
    ONE-ROW static aggregate and broadcast into the stream via a keyed
    stream-static join (the "broadcast a 1-row aggregate" pattern the
    batch catalog already uses); overlap is then size(array_intersect(...))
    inside a stateless projection — zero streaming state, no watermark,
    append mode, constant memory on an unbounded ingest stream. The
    shingle extractor is SHARED code (operators/dedup.shingle_hash_array),
    so batch and stream shingle identically by construction. Eval sets are
    small by nature (t19's scale argument); the broadcast is their distinct
    hash set."""
    import uuid

    from pyspark.sql import functions as F

    from dask_lightgbm_spark.operators import dedup
    from dask_lightgbm_spark.queries.text import K_SHINGLE

    from dask_lightgbm_spark.sources.readers import load_table, raw_parquet_schema

    schema = raw_parquet_schema(spark, sf_dir, "documents.parquet")
    # static side: the eval split's distinct shingle hashes as one row
    ev = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 20 == 0)
    ev_row = (
        dedup.shingle_hash_array(ev, "doc_id", "text", K_SHINGLE)
        .select(F.explode("hs").alias("h"))
        .agg(F.array_sort(F.collect_set("h")).alias("ev"))
        .withColumn("__k", F.lit(1))
    )
    src = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
        .filter(F.col("doc_id") % 20 != 0)
    )
    tr = dedup.shingle_hash_array(src, "doc_id", "text", K_SHINGLE).withColumn(
        "__k", F.lit(1)
    )
    joined = tr.join(F.broadcast(ev_row), "__k")
    n_sh = F.size("hs").cast("long")
    n_ov = F.size(F.array_intersect("hs", "ev")).cast("long")
    scored = joined.select(
        "doc_id",
        n_sh.alias("n_shingles"),
        n_ov.alias("n_overlap"),
        (n_ov * F.lit(5) >= n_sh).alias("contaminated"),
    )
    name = f"stream_decon_{uuid.uuid4().hex[:8]}"
    q = (
        scored.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).orderBy("doc_id")


# x14's oracle is t40's verified-pairs CTE chain: the stream emits exactly
# the batch pipeline's hits
from dask_lightgbm_spark.queries.text import _T40_HITS_SQL  # noqa: E402

_X14_SQL = (
    _T40_HITS_SQL
    + "\nSELECT new_id, corpus_id, jaccard FROM hits ORDER BY new_id, corpus_id"
)


@query("x14_stream_ingest_dedup", _X14_SQL)
def x14_stream_ingest_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest dedup: arriving documents are LSH-checked against
    the STATIC corpus signature index *as they stream in* — the online twin
    of batch t40 and the shape of a production admission gate (a doc is
    admitted/rejected before it lands in the corpus).

    Plan per micro-batch: row-local shingle array → row-local minhash →
    band explode (all stateless projections, shared operator code), then a
    STREAM-STATIC equi-join against the corpus band table (static side
    computed once from the session-cached batch plan), a stateful
    dropDuplicates on the candidate pair (multiple bands can propose the
    same pair — in production bounded by a watermark on ingest time; the
    pair stream is band-collision-sized, not corpus-sized), and a second
    stream-static join to the corpus shingle arrays for the exact-Jaccard
    verify. Zero corpus scans per batch beyond the verified candidates'
    arrays; the emitted append stream is bit-identical to the batch
    pipeline's verified pairs, which IS the oracle."""
    import uuid

    from pyspark.sql import functions as F

    from dask_lightgbm_spark.operators import dedup
    from dask_lightgbm_spark.operators.dedup import (
        _band_views,
        signatures_from_array,
    )
    from dask_lightgbm_spark.queries.text import BAND_SIZE, K_SHINGLE, NUM_PERM

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = d.filter(F.col("source") != "src0")
    arr_cor = dedup.shingle_hash_array(corpus, "doc_id", "text", K_SHINGLE)
    sig_arr = F.array(*[F.col(f"mh{i}") for i in range(NUM_PERM)])
    bands_cor = _band_views(
        signatures_from_array(arr_cor, "doc_id", NUM_PERM),
        "doc_id", NUM_PERM, BAND_SIZE, extra_cols=[sig_arr.alias("sigarr")],
    ).select(
        F.col("doc_id").alias("corpus_id"), "band",
        *[F.col(f"bv{j}") for j in range(BAND_SIZE)],
        F.col("sigarr").alias("sig_cor"),
    )
    src = (
        spark.readStream.schema(d.schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
        .filter(F.col("source") == "src0")
    )
    arr_new = dedup.shingle_hash_array(src, "doc_id", "text", K_SHINGLE)
    # the new doc's shingle array rides the band rows (keep_cols): the
    # verify stage must NOT re-join the stream to itself — a second
    # stream-side join would be a stream-stream join
    bands_new = _band_views(
        signatures_from_array(arr_new, "doc_id", NUM_PERM, keep_cols=("hs",)),
        "doc_id", NUM_PERM, BAND_SIZE,
        extra_cols=[sig_arr.alias("sigarr"), F.col("hs").alias("ha")],
    ).select(
        F.col("doc_id").alias("new_id"), "band",
        *[F.col(f"bv{j}") for j in range(BAND_SIZE)],
        F.col("sigarr").alias("sig_new"), "ha",
    )
    matches = dedup.sig_match_count("sig_new", "sig_cor", NUM_PERM)
    # no broadcast hint: the corpus band table is data-sized at scale —
    # let the planner pick (it broadcasts at fixture size anyway); the
    # stream-static join is an equi-join either way
    cand = (
        bands_new.join(
            bands_cor,
            ["band"] + [f"bv{j}" for j in range(BAND_SIZE)],
        )
        .filter(matches >= NUM_PERM // 2)
        # the ONE stateful op: multiple bands propose the same pair; the
        # duplicate-pair state is band-collision-sized (watermarked on
        # ingest time in production). ha is functionally determined by
        # new_id, so keeping the first row keeps the right array.
        .dropDuplicates(["new_id", "corpus_id"])
        .select("new_id", "corpus_id", "ha")
    )
    bc = arr_cor.select(
        F.col("doc_id").alias("corpus_id"), F.col("hs").alias("hb")
    )
    inter = F.size(F.array_intersect(F.col("ha"), F.col("hb")))
    verified = (
        cand.join(bc, "corpus_id")
        .select(
            "new_id",
            "corpus_id",
            (
                inter / (F.size(F.col("ha")) + F.size(F.col("hb")) - inter)
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.7)
    )
    name = f"stream_ingest_{uuid.uuid4().hex[:8]}"
    q = (
        verified.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).orderBy("new_id", "corpus_id")


# x15 reuses s02's oracle (same argument as s23: the streamed-in delta
# joins an index that is provably identical to the from-scratch build)
from dask_lightgbm_spark.queries.similarity import _S02_SQL as _X15_SQL  # noqa: E402


@query("x15_stream_ivf_insert", _X15_SQL)
def x15_stream_ivf_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming IVF index insert: arriving vectors are assigned to frozen
    centroids per micro-batch and appended to the index's parquet layout
    (batch=<id> overwrite — retry-idempotent); serve against base ∪ delta
    equals the batch s02 result exactly."""
    from dask_lightgbm_spark.streaming.vectors import stream_ivf_insert

    return stream_ivf_insert(spark, sf_dir, k=3)


_X16_SQL = """
SELECT user_id, ts AS last_ts, event_id AS last_event_id,
       value AS last_value
FROM (
  SELECT user_id, ts, event_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
ORDER BY user_id
"""


@query("x16_stream_upsert_state", _X16_SQL)
def x16_stream_upsert_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming upsert into a keyed state table (CDC-apply): per
    micro-batch read-merge-swap of a latest-value-per-user parquet state;
    latest-wins on the (ts, event_id) total order makes the merge
    idempotent, and the drained state equals the batch argmax oracle."""
    from dask_lightgbm_spark.streaming.events import stream_upsert_state_sink

    return stream_upsert_state_sink(spark, sf_dir)
