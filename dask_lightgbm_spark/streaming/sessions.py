"""Custom stateful streaming operator: per-user running totals via
``applyInPandasWithState`` (the arbitrary-stateful-op surface named in
SURVEY.md §2's template categories).

State = (n_events, sum_value_cents) per user; each micro-batch folds its
rows into state and emits the updated totals. On a bounded file stream
drained in one batch the emitted rows equal the batch groupBy — which is
what the oracle checks. At scale the same operator runs over Kafka with
watermark-driven state eviction: :func:`stream_user_totals_ttl` is that
production form (``GroupStateTimeout.EventTimeTimeout``, closed-row emit
on eviction, state bounded by the keys active in the ttl horizon)."""

from __future__ import annotations

import uuid
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from dask_lightgbm_spark.streaming.events import read_events_stream
from dask_lightgbm_spark.streaming.diag import drain_and_capture, state_partitions

_OUT_SCHEMA = "user_id bigint, n_events bigint, sum_value double"
_STATE_SCHEMA = "n bigint, sum_cents bigint"


def stream_user_totals(
    spark: SparkSession,
    sf_dir: str,
    glob: str = "events.parquet",
    max_files_per_trigger: int | None = None,
    shuffle_partitions: int | str | None = "auto",
) -> DataFrame:
    """Run the stateful per-user totals as a real streaming query and
    return the drained result (update mode: one row per user PER
    micro-batch that touched the user — the last row is the final total;
    on the catalog's single-file source that is also the only row).
    ``glob``/``max_files_per_trigger`` pass through to the source so tests
    can drive the state fold across several real micro-batches;
    ``shuffle_partitions`` sizes the state store to the trigger volume
    (see :func:`~dask_lightgbm_spark.streaming.diag.state_partitions` —
    at small triggers the per-partition state-store commit, one delta
    file + fsync each, dominates the wall clock).

    The update kernel is a NESTED function on purpose: cloudpickle ships
    nested functions by value, while a module-level function would be
    pickled by reference and require this package on the Python workers'
    import path (not guaranteed when the driver embeds us)."""

    def update(
        key, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, sum_cents = state.get if state.exists else (0, 0)
        for pdf in batches:
            # numpy fold, not a pandas method chain: the kernel runs once
            # per key per batch, so per-call overhead IS the CPU bill at
            # high key cardinality (2.5x cheaper than the chained form)
            v = pdf["value"].to_numpy()
            n += v.shape[0]
            sum_cents += int(np.rint(v * 100).sum())
        state.update((n, sum_cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [sum_cents / 100.0]}
        )

    from dask_lightgbm_spark.streaming.diag import adaptive_state_partitions

    if shuffle_partitions == "auto":
        shuffle_partitions = adaptive_state_partitions(spark, sf_dir, glob)
    with state_partitions(spark, shuffle_partitions):
        src = read_events_stream(
            spark, sf_dir, glob=glob, max_files_per_trigger=max_files_per_trigger
        ).select("user_id", "value")
        out = src.groupBy("user_id").applyInPandasWithState(
            update,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        name = f"stream_state_{uuid.uuid4().hex[:8]}"
        q = out.writeStream.outputMode("update").format("memory").queryName(name).start()
    drain_and_capture(q)
    return spark.table(name)


_TTL_OUT_SCHEMA = (
    "user_id bigint, n_events bigint, sum_value double, closed boolean"
)
# carries last_ms so a LATE (but in-watermark) batch can never move the
# timeout backward: the eviction horizon is keyed to the max event time
# ever seen for the key, not to whatever the current batch happens to hold
_TTL_STATE_SCHEMA = "n bigint, sum_cents bigint, last_ms bigint"


def stream_user_totals_ttl(
    spark: SparkSession,
    sf_dir: str,
    ttl_ms: int = 3_600_000,
    delay: str = "0 seconds",
    glob: str = "events.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Per-user totals with WATERMARK-BOUNDED state — the production form
    of :func:`stream_user_totals`, whose ``NoTimeout`` state grows with
    total key cardinality forever. ``GroupStateTimeout.EventTimeTimeout``
    evicts a user once the watermark passes (last event + ``ttl_ms``): the
    kernel is invoked with ``hasTimedOut`` set, emits a final
    ``closed=true`` row, and removes the state, so resident state is
    bounded by the keys ACTIVE inside the ttl horizon. A user reappearing
    after eviction restarts from zero — running rows emit ``closed=false``.

    Same nested-kernel/cloudpickle rationale as :func:`stream_user_totals`."""

    def update(
        key, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n, sum_cents, _ = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "sum_value": [sum_cents / 100.0],
                    "closed": [True],
                }
            )
            return
        n, sum_cents, last_ms = state.get if state.exists else (0, 0, 0)
        for pdf in batches:
            v = pdf["value"].to_numpy()
            n += v.shape[0]
            sum_cents += int(np.rint(v * 100).sum())
            # pandas Timestamp.value is ns since epoch; max() with the
            # stored last_ms means a late batch never shrinks the horizon
            last_ms = max(last_ms, int(pdf["ts"].max().value // 1_000_000))
        state.update((n, sum_cents, last_ms))
        # setTimeoutTimestamp throws (killing the whole query) if the
        # target is at/behind the current watermark — reachable whenever
        # delay > 0 or ttl_ms is small and a late-but-in-watermark batch
        # arrives. Clamp to watermark+1: the key is then evicted at the
        # next watermark advance, the earliest legal moment.
        state.setTimeoutTimestamp(
            max(last_ms + ttl_ms, state.getCurrentWatermarkMs() + 1)
        )
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value": [sum_cents / 100.0],
                "closed": [False],
            }
        )

    src = read_events_stream(
        spark, sf_dir, glob=glob, max_files_per_trigger=max_files_per_trigger
    ).select("ts", "user_id", "value").withWatermark("ts", delay)
    out = src.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_TTL_OUT_SCHEMA,
        stateStructType=_TTL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    name = f"stream_state_{uuid.uuid4().hex[:8]}"
    q = out.writeStream.outputMode("update").format("memory").queryName(name).start()
    drain_and_capture(q)
    return spark.table(name)
