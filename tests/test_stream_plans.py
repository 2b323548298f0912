"""Physical-plan pins for the STREAMING family — the batch catalog's
plans are audited in docs/PLANS.md, but a drained streaming query's plan
dies with its handle, so until r10 nothing asserted that the micro-batch
plans actually contain the stateful-operator / watermark / state-store /
broadcast nodes the scale story claims. ``streaming.diag`` captures the
executed explain at every drain site; these tests pin the load-bearing
nodes per pipeline shape."""

from dask_lightgbm_spark.streaming.diag import last_drain_explain


def test_stateful_totals_plan_has_pandas_state_operator(spark, sf_dir):
    from dask_lightgbm_spark.streaming.sessions import stream_user_totals

    stream_user_totals(spark, sf_dir).count()
    plan = last_drain_explain()
    # the custom fold runs as the arbitrary-stateful exec node, not as a
    # re-planned batch agg; update-mode keyed state lives in its operator
    assert "FlatMapGroupsInPandasWithState" in plan, plan[:1500]


def test_ttl_plan_carries_watermark_for_eviction(spark, sf_dir):
    from dask_lightgbm_spark.streaming.sessions import stream_user_totals_ttl

    stream_user_totals_ttl(spark, sf_dir).count()
    plan = last_drain_explain()
    # EventTimeTimeout eviction is driven by the watermark node — if the
    # watermark disappears from the plan, state never expires at scale
    assert "FlatMapGroupsInPandasWithState" in plan, plan[:1500]
    assert "EventTimeWatermark" in plan, plan[:1500]


def test_windowed_agg_plan_uses_state_store(spark, sf_dir):
    from dask_lightgbm_spark.streaming.events import stream_hourly_aggregate

    stream_hourly_aggregate(spark, sf_dir).count()
    plan = last_drain_explain()
    # complete-mode windowed agg must fold through the state store
    # (StateStoreSave/Restore), not recompute prefixes per trigger
    assert "StateStoreSave" in plan, plan[:1500]
    assert "HashAggregate" in plan, plan[:1500]


def test_stream_static_join_is_broadcast(spark, sf_dir):
    from dask_lightgbm_spark.streaming.events import (
        stream_static_segment_totals,
    )

    stream_static_segment_totals(spark, sf_dir).count()
    plan = last_drain_explain()
    # the static dim side must broadcast into each micro-batch — a
    # shuffle join here would re-exchange the stream every trigger
    assert "BroadcastHashJoin" in plan, plan[:1500]
    assert "StateStoreSave" in plan, plan[:1500]


def test_watermarked_dedup_plan_bounds_its_state(spark, sf_dir):
    from dask_lightgbm_spark.streaming.events import (
        stream_dedup_within_watermark,
    )

    stream_dedup_within_watermark(spark, sf_dir).count()
    plan = last_drain_explain()
    # StreamingDeduplicate WITH a watermark = seen-keys state is evicted
    # as event time advances; without the watermark node the dedup state
    # grows with every key ever seen — unusable on an unbounded bus
    assert "StreamingDeduplicate" in plan, plan[:1500]
    assert "EventTimeWatermark" in plan, plan[:1500]


def test_stream_stream_join_is_symmetric_hash_with_watermark(spark, sf_dir):
    from dask_lightgbm_spark.streaming.events import (
        stream_stream_interval_join,
    )

    stream_stream_interval_join(spark, sf_dir).count()
    plan = last_drain_explain()
    # both sides buffer in the symmetric-hash operator; the watermark +
    # interval condition is what lets either side's buffer be trimmed —
    # losing it means unbounded join state at scale
    assert "StreamingSymmetricHashJoin" in plan, plan[:1500]
    assert "EventTimeWatermark" in plan, plan[:1500]


def test_drain_capture_is_thread_keyed():
    """Concurrent drains (the service regime pools queries across
    threads) must not cross-contaminate: a capture written on one
    thread is invisible to another thread's last_drain_explain()."""
    import threading

    from dask_lightgbm_spark.streaming import diag

    diag._LAST.text = "main-thread-plan"
    seen = {}

    def other():
        seen["before"] = diag.last_drain_explain()
        diag._LAST.text = "other-thread-plan"
        seen["after"] = diag.last_drain_explain()

    t = threading.Thread(target=other)
    t.start()
    t.join()
    assert seen["before"] == ""  # fresh thread sees no capture
    assert seen["after"] == "other-thread-plan"
    assert diag.last_drain_explain() == "main-thread-plan"
