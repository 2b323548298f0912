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
