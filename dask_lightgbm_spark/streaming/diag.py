"""Streaming-plan capture: the batch catalog's physical plans are audited
via ``executed_formatted_plan`` (docs/PLANS.md), but a drained streaming
query's plan dies with the query handle — the x-family operators start,
drain, and stop internally, so nothing outside could ever assert that the
micro-batch plan actually contains the stateful operator / watermark /
state-store nodes the scale story claims. ``drain_and_capture`` replaces
the bare ``processAllAvailable``/``stop`` pattern at the drain sites and
stashes the final explain text; ``last_drain_explain()`` hands it to
tests (tests/test_stream_plans.py).

Captures are keyed per thread: concurrent drains (the service regime
runs queries from a thread pool) each see their own thread's last plan,
so one drain can never return another query's explain text."""

from __future__ import annotations

import threading
from contextlib import contextmanager

_LAST = threading.local()

#: bytes of source input one state partition should own. The HDFS state
#: store commits one delta file (+fsync) per partition per trigger — and a
#: stream-stream join keeps FOUR stores per partition — so partitions far
#: in excess of the trigger volume are pure commit overhead. 8 MiB of
#: parquet input per partition keeps per-partition state in the tens of MB
#: at production trigger sizes; cluster deployments tune via env. The cap
#: is always the session's shuffle-partition setting, so a real deployment
#: sized for its stream volume is never clamped DOWN by this heuristic.
_STATE_PARTITION_BYTES_ENV = "SPARK_GRAFT_STATE_PARTITION_BYTES"
_STATE_PARTITION_BYTES_DEFAULT = 8 << 20


def adaptive_state_partitions(spark, sf_dir: str, glob: str) -> int | None:
    """Scale-adaptive state-store sizing: one state partition per
    ~``SPARK_GRAFT_STATE_PARTITION_BYTES`` of source input, capped at the
    session's ``spark.sql.shuffle.partitions`` (same shape as the batch
    ``ensure_parallelism`` policy — derive from input size, never exceed
    what the deployment configured). Returns ``None`` (leave the session
    value alone) when the source cannot be stat'ed locally (e.g. object
    storage), so the heuristic can only ever act on evidence."""
    import glob as globmod
    import os

    try:
        files = globmod.glob(os.path.join(sf_dir, glob))
        if not files:
            return None
        total = sum(os.path.getsize(f) for f in files)
        cap = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except Exception:  # noqa: BLE001 — sizing is best-effort, never fail a query
        return None
    bpp = int(
        os.environ.get(_STATE_PARTITION_BYTES_ENV, _STATE_PARTITION_BYTES_DEFAULT)
    )
    return max(1, min(cap, -(-total // max(bpp, 1))))


@contextmanager
def state_partitions(spark, n: int | None):
    """Scope ``spark.sql.shuffle.partitions`` around a streaming query's
    definition + start. The HDFS state store commits one delta file
    (+fsync) per shuffle partition per trigger, so for SMALL triggers the
    commit count — not the data — is the wall clock
    (tools/profile_hourly_agg.py: 32 -> 8 partitions halves the one-shot
    drain at the 1M-row fixture). Production jobs size this to the
    trigger volume; ``None`` means leave the session value alone.

    The setting only matters at ``.start()`` (the state store fixes its
    partition count from the conf then), so restoring it in ``finally``
    cannot affect the running query. Results are partition-count
    invariant — parity gates stay exact."""
    if n is None:
        yield
        return
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    spark.conf.set(key, str(n))
    try:
        yield
    finally:
        spark.conf.set(key, prev)


def drain_and_capture(q) -> None:
    """processAllAvailable + stop, capturing the executed micro-batch
    plan in between. Capture is best-effort (py4j internal API) and can
    never fail the drain itself."""
    try:
        q.processAllAvailable()
        try:
            _LAST.text = q._jsq.explainInternal(True)
        except Exception:  # noqa: BLE001 — diagnostics must never break a drain
            pass
    finally:
        q.stop()


def last_drain_explain() -> str:
    """Explain text (extended) of the most recently drained query on the
    CALLING thread — drain and read from the same thread. Empty string
    if this thread has not completed a capture yet."""
    return getattr(_LAST, "text", "")
