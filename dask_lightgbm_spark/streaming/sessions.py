"""Custom stateful streaming operator: per-user running totals via
``applyInPandasWithState`` (the arbitrary-stateful-op surface named in
SURVEY.md §2's template categories).

State = (n_events, sum_value_cents) per user; each micro-batch folds its
rows into state and emits the updated totals. On a bounded file stream
drained in one batch the emitted rows equal the batch groupBy — which is
what the oracle checks. At scale the same operator runs over Kafka with
watermark-driven state eviction (add GroupStateTimeout.EventTimeTimeout)."""

from __future__ import annotations

import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from dask_lightgbm_spark.streaming.events import read_events_stream

_OUT_SCHEMA = "user_id bigint, n_events bigint, sum_value double"
_STATE_SCHEMA = "n bigint, sum_cents bigint"


def stream_user_totals(
    spark: SparkSession,
    sf_dir: str,
    glob: str = "events.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Run the stateful per-user totals as a real streaming query and
    return the drained result (update mode: one row per user PER
    micro-batch that touched the user — the last row is the final total;
    on the catalog's single-file source that is also the only row).
    ``glob``/``max_files_per_trigger`` pass through to the source so tests
    can drive the state fold across several real micro-batches.

    The update kernel is a NESTED function on purpose: cloudpickle ships
    nested functions by value, while a module-level function would be
    pickled by reference and require this package on the Python workers'
    import path (not guaranteed when the driver embeds us)."""

    def update(
        key, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, sum_cents = state.get if state.exists else (0, 0)
        for pdf in batches:
            n += len(pdf)
            sum_cents += int(pdf["value"].mul(100).round().astype("int64").sum())
        state.update((n, sum_cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [sum_cents / 100.0]}
        )

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
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)
