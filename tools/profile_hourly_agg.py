"""Decompose hourly_agg's ``stream_tax`` (bench streaming stanza:
one_shot/batch, 6.83x in BENCH_r12 — reported, not gated, but the r12
verdict asked for the floor to be QUANTIFIED before the number is leaned
on). The ratio prices one streaming micro-batch (complete-mode windowed
agg -> memory sink) against the identical stateless batch agg, so the tax
is pure streaming machinery — there is only ONE trigger on the one_shot
side. Three measurements attribute it:

  1. one-shot drain with the query handle kept: wall time split into
     start() (stream init: WAL dir, offset log, sink registration),
     processAllAvailable (the trigger itself), and stop(); per-trigger
     durationMs (addBatch vs latestOffset/planning/walCommit/commitOffsets)
     and stateOperators metrics (allUpdatesTimeMs vs commitTimeMs) from
     StreamingQueryProgress
  2. one-shot at 1x vs 10x rows (fixed-vs-marginal split: near-flat wall
     at 10x rows = the tax is per-QUERY fixed cost, not per-row)
  3. shuffle.partitions sweep on the state commit term (the HDFS state
     store commits one delta file per partition per trigger)

Usage: python tools/profile_hourly_agg.py
(fixtures come from bench.ensure_stream_events — run bench once, or this
tool materializes them itself.)

Measured r13 (local[32], warm JVM, quiet host) — the numbers behind
SCALE.md's hourly_agg stream-tax row:

    measurement                              value
    batch agg (stateless scan, min-of-2)     0.66 s
    one_shot wall                            1.85 s  -> tax x2.8 QUIET
      of which start() (stream init)         0.09 s
      of which the single trigger            1.75 s
        of which addBatch                    1.33 s
        of which WAL+offsets+planning        0.37 s
      of which stop()                        0.01 s
    state allUpdatesTimeMs (sum, 32 parts)   2.6 s   (parallel)
    state commitTimeMs (sum, 32 parts)       8.4 s   (~0.26 s/partition
                                              delta+fsync, overlapped)
    one_shot @ 10x rows (10M)                2.30 s  -> x1.25 for 10x rows
    shuffle.partitions 32 -> 8               2.88 -> 1.24 s (commit count
                                              IS a lever at this scale)

Conclusion: the QUIET tax is x2.8, not the x6.83 BENCH_r12 recorded in
its contended window (host load 3.4 -> 11.4 during that run) — the r12
number was window noise on a 1.9 s measurement, not drift. The floor
decomposes into one state-store delta commit + fsync per shuffle
partition (~0.26 s each, run in parallel; 32 -> 8 partitions halves the
wall at fixture scale) plus the complete-mode sink materialization, and
it is per-QUERY fixed cost: 10x the rows costs x1.25 the wall, so at
production trigger sizes the same machinery amortizes toward 1x.
stream_tax stays reported-not-gated; the gated number (micro/one_shot
<= 8x) sat at 2.78-4.37x with both sides sharing the same floor.
Analogue of tools/profile_user_totals.py's known-inherent proof for the
Python-stateful pipeline.
"""

import json
import os
import sys
import time
import uuid

sys.path.insert(0, "/root/repo")

from dask_lightgbm_spark.session import get_spark  # noqa: E402


def one_shot_with_progress(spark, d, glob):
    """stream_hourly_aggregate's exact plan, query handle kept, wall time
    split into start / drain / stop segments."""
    from pyspark.sql import functions as F

    from dask_lightgbm_spark.streaming.events import read_events_stream

    src = read_events_stream(spark, d, glob=glob, max_files_per_trigger=None)
    agg = src.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(F.round(F.col("value") * 100).cast("long")).cast("double")
            / F.lit(100.0)
        ).alias("sum_value"),
    )
    name = f"prof_{uuid.uuid4().hex[:8]}"
    t0 = time.time()
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    t_start = time.time() - t0
    try:
        t0 = time.time()
        q.processAllAvailable()
        t_drain = time.time() - t0
    finally:
        t0 = time.time()
        q.stop()
        t_stop = time.time() - t0
    return t_start, t_drain, t_stop, q.recentProgress


def tmin(fn, runs=2):
    best = None
    for _ in range(runs):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


def main() -> None:
    import bench
    from pyspark.sql import functions as F

    from dask_lightgbm_spark.sources.readers import normalize_event_time
    from dask_lightgbm_spark.streaming.events import stream_hourly_aggregate

    spark = get_spark("profile-hourly-agg", cpus=32)
    src_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    d1 = bench.ensure_stream_events(src_dir)
    d10 = bench.ensure_stream_events(src_dir, scale=bench.STREAM_SCALE * 10)
    glob = "events_*.parquet"

    def batch_hourly(from_dir):
        return (
            normalize_event_time(
                spark.read.option("pathGlobFilter", glob).parquet(from_dir)
            )
            .groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                (
                    F.sum(F.round(F.col("value") * 100).cast("long")).cast(
                        "double"
                    )
                    / F.lit(100.0)
                ).alias("sum_value"),
            )
            .toPandas()
        )

    # warm (file index, codegen, memory sink)
    stream_hourly_aggregate(spark, d1, glob=glob).toPandas()

    t_batch = tmin(lambda: batch_hourly(d1))
    print(f"== batch agg: {t_batch:.2f}s ==")

    # 1. one-shot decomposition
    t_start, t_drain, t_stop, progress = one_shot_with_progress(spark, d1, glob)
    total = t_start + t_drain + t_stop
    print(
        f"\n== one-shot decomposition (total {total:.2f}s, "
        f"tax x{total / t_batch:.2f}): start {t_start:.2f}s "
        f"drain {t_drain:.2f}s stop {t_stop:.2f}s =="
    )
    for p in progress:
        dur = p["durationMs"]
        so = p["stateOperators"][0] if p["stateOperators"] else {}
        print(
            json.dumps(
                {
                    "batch": p["batchId"],
                    "rows": p["numInputRows"],
                    "trigger_ms": dur.get("triggerExecution"),
                    "addBatch_ms": dur.get("addBatch"),
                    "overhead_ms": sum(
                        dur.get(k, 0)
                        for k in (
                            "latestOffset",
                            "queryPlanning",
                            "walCommit",
                            "commitOffsets",
                        )
                    ),
                    "state_update_ms_sum": so.get("allUpdatesTimeMs"),
                    "state_commit_ms_sum": so.get("commitTimeMs"),
                    "state_rows": so.get("numRowsTotal"),
                }
            )
        )

    # 2. fixed-vs-marginal: the same single trigger, 10x the rows
    t1 = tmin(
        lambda: stream_hourly_aggregate(
            spark, d1, glob=glob, max_files_per_trigger=None
        ).toPandas()
    )
    t10 = tmin(
        lambda: stream_hourly_aggregate(
            spark, d10, glob=glob, max_files_per_trigger=None
        ).toPandas()
    )
    print(
        f"\n== fixed-vs-marginal: one_shot 1x {t1:.2f}s (tax "
        f"x{t1 / t_batch:.2f}), 10x rows {t10:.2f}s -> x{t10 / t1:.2f} "
        f"for 10x rows =="
    )

    # 3. shuffle.partitions sweep: state commit is one delta per partition
    before = spark.conf.get("spark.sql.shuffle.partitions")
    for n in (32, 8):
        spark.conf.set("spark.sql.shuffle.partitions", str(n))
        t = tmin(
            lambda: stream_hourly_aggregate(
                spark, d1, glob=glob, max_files_per_trigger=None
            ).toPandas()
        )
        print(f"== shuffle.partitions {n}: one_shot {t:.2f}s ==")
    spark.conf.set("spark.sql.shuffle.partitions", before)

    print(
        f"\nconclusion: tax x{t1 / t_batch:.2f} on the 1M-row fixture is a "
        f"per-QUERY fixed floor (10x rows -> x{t10 / t1:.2f} wall); at "
        f"production trigger sizes it amortizes toward 1x."
    )


if __name__ == "__main__":
    main()
