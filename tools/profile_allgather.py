"""Measure the local-mode ``BarrierTaskContext.allGather`` floor that
prices every histgbm boosting LEVEL (r12 verdict #6): NOTES_r12 records
~1.3 s/collective on local[4], which forces the wheel-free system test to
10 trees instead of the reference's ``n_estimators=50``
(/root/reference/system_tests/test_fit_predict.py:30 — 50x4 levels
~= 260 s/fit at that floor). This probe isolates the collective itself
from histgbm's compute:

  1. per-call latency: one barrier stage, each task loops R allGather
     calls back-to-back on a tiny payload; task 0 reports per-call wall
     times. The INSIDE-loop median is the floor histgbm pays per level
     (stage setup amortized out).
  2. payload sweep: 16 B vs 1 MiB per task — is the floor transfer or
     coordination?
  3. task-count sweep: 2 vs 4 vs 8 barrier tasks on local[8].
  4. conf sweep: candidate knobs that plausibly gate the round trip
     (spark.barrier.sync.timeout is a TIMEOUT, not a poll — included
     only to prove it is inert at sane values).

The python client blocks on a socket (pyspark/taskcontext.py
``_load_from_socket``: ``sock.settimeout(None)`` + blocking read — no
client-side poll), so any floor lives in the JVM barrier machinery
(BarrierTaskContextImpl.runBarrier's 1 s await loop / coordinator RPC) or
in per-call socket setup+auth.

Usage: python tools/profile_allgather.py [spark.conf=value ...]

Measured r13 (local[8], 32-core host, quiet window):

    probe                         median     p10      max
    4 tasks, 16 B,   20 rounds    1.0028 s   1.0021   1.0047
    4 tasks, 1 MiB,  10 rounds    1.0117 s   1.0098   1.0276
    2 tasks, 16 B,   20 rounds    1.0029 s   1.0024   1.0065
    8 tasks, 16 B,   20 rounds    1.0047 s   1.0035   1.0094

Dead-flat 1.00 s regardless of payload bytes or task count — a hard
1-second quantization, not coordination or transfer cost. ROOT CAUSE
(stronger than any conf sweep): disassembling Spark 4.1.2's
``org.apache.spark.BarrierTaskContext#runBarrier`` shows the reply wait
is a literal poll loop —

    while (!abortableRpcFuture.future.isCompleted) Thread.sleep(1000L);

(bytecode offsets 178-192: ``Future.isCompleted`` / ``ldc2_w 1000l`` /
``Thread.sleep``). The sleep constant is HARDCODED — no spark.barrier.*
or RPC conf is read inside the loop, so no configuration can lower the
floor; the coordinator's RPC reply lands in single-digit ms and the
client then sleeps out the remainder of its current second. Consequence
for histgbm: one allGather per boosting LEVEL -> the reference-parity
config (n_estimators=50, 50x4 = 200 collectives) costs >= ~200 s of
pure sleep in local/this-sandbox mode, independent of data size or any
tuning — the documented reason tests/test_histgbm_system.py runs 10
trees (30 collectives, ~40 s) against the reference's quality bars. On
a real cluster the same payloads are network-bound (~ms), and rounds
scale with trees x depth, not data.
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")


def probe(spark, n_tasks: int, rounds: int, payload_bytes: int):
    """One barrier stage; each task runs `rounds` allGather calls
    back-to-back. Returns task 0's per-call seconds."""
    payload = "x" * payload_bytes

    def body(it):
        from pyspark import BarrierTaskContext

        ctx = BarrierTaskContext.get()
        times = []
        for _ in range(rounds):
            t0 = time.time()
            ctx.allGather(payload)
            times.append(time.time() - t0)
        if ctx.partitionId() == 0:
            yield times

    rdd = spark.sparkContext.parallelize(range(n_tasks), n_tasks)
    [times] = rdd.barrier().mapPartitions(body).collect()
    return times


def summarize(label, times):
    med = statistics.median(times)
    print(
        json.dumps(
            {
                "probe": label,
                "calls": len(times),
                "median_s": round(med, 4),
                "p10_s": round(sorted(times)[len(times) // 10], 4),
                "max_s": round(max(times), 4),
                "first_call_s": round(times[0], 4),
            }
        )
    )
    return med


def main() -> None:
    from pyspark.sql import SparkSession

    confs = dict(
        arg.split("=", 1) for arg in sys.argv[1:] if "=" in arg
    )
    builder = (
        SparkSession.builder.master(os.environ.get("PROBE_MASTER", "local[8]"))
        .appName("profile-allgather")
    )
    for k, v in confs.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()

    # warm: one throwaway stage (python worker spin-up, barrier plumbing)
    probe(spark, 4, 2, 16)

    print(f"== extra confs: {confs or 'none'} ==")
    base = summarize("4 tasks, 16 B, 20 rounds", probe(spark, 4, 20, 16))
    summarize("4 tasks, 1 MiB, 10 rounds", probe(spark, 4, 10, 1 << 20))
    summarize("2 tasks, 16 B, 20 rounds", probe(spark, 2, 20, 16))
    summarize("8 tasks, 16 B, 20 rounds", probe(spark, 8, 20, 16))
    print(
        f"\nfloor (median, 4 tasks, tiny payload): {base:.3f} s/collective"
        f" -> 50 trees x 4 levels ~= {200 * base:.0f} s of collectives"
    )
    spark.stop()


if __name__ == "__main__":
    main()
