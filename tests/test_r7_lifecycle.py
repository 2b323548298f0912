"""Lifecycle equivalences for the round-7 index/state operators — the
semantic claims the oracle verifies indirectly, asserted directly."""


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_compaction_equals_tombstone_mask(spark, sf_dir):
    """s28 (physical rewrite) must serve EXACTLY what s27 (logical mask)
    serves — compaction has zero semantic content."""
    from dask_lightgbm_spark.queries.similarity import (
        s27_ivf_tombstone_delete,
        s28_ivf_compaction,
    )

    assert _rows(s27_ivf_tombstone_delete(spark, sf_dir)) == _rows(
        s28_ivf_compaction(spark, sf_dir)
    )


def test_incremental_insert_equals_full_build(spark, sf_dir):
    """s23's base ∪ delta index must serve exactly the from-scratch s02
    result (no centroid has vec_id % 10 == 7, so assignments agree)."""
    from dask_lightgbm_spark.queries.similarity import (
        s02_knn_ivf,
        s23_ivf_incremental_insert,
    )

    assert _rows(s02_knn_ivf(spark, sf_dir)) == _rows(
        s23_ivf_incremental_insert(spark, sf_dir)
    )


def test_stream_upsert_state_is_rerun_stable(spark, sf_dir):
    """x16 run twice in one session: the second run re-drains the same
    bounded stream into an EXISTING state dir — latest-wins merge must be
    idempotent, leaving the state identical."""
    from dask_lightgbm_spark.queries.streaming_q import x16_stream_upsert_state

    first = _rows(x16_stream_upsert_state(spark, sf_dir))
    second = _rows(x16_stream_upsert_state(spark, sf_dir))
    assert first == second and len(first) > 0


def test_bucketed_join_second_invocation_serves_from_cache(spark, sf_dir):
    """q73's bucketed tables are a session-cached layout: a second
    invocation must reuse them (no rewrite) and return identical rows."""
    from dask_lightgbm_spark.queries.relational import q73_bucketed_join

    first = _rows(q73_bucketed_join(spark, sf_dir))
    cache = getattr(spark, "_dls_bucketed_tables", set())
    n_before = len(cache)
    second = _rows(q73_bucketed_join(spark, sf_dir))
    assert first == second
    assert len(getattr(spark, "_dls_bucketed_tables", set())) == n_before


def test_thresholded_topk_is_subset_of_plain_topk_candidates(spark, sf_dir):
    """s29's results are exactly the s02-serve pairs that clear τ, ranked:
    every returned cosine ≥ τ, and per-query counts never exceed k."""
    from dask_lightgbm_spark.queries.similarity import (
        _S29_K,
        _S29_TAU,
        s29_knn_thresholded,
    )

    rows = s29_knn_thresholded(spark, sf_dir).collect()
    assert rows, "threshold must not empty the fixture result"
    per_q = {}
    for r in rows:
        assert r["cos"] >= _S29_TAU
        per_q[r["qid"]] = per_q.get(r["qid"], 0) + 1
    assert max(per_q.values()) <= _S29_K


def test_stream_upsert_state_recovers_from_stale_next_dir(spark, sf_dir):
    """r8 swap hardening: an aborted run's leftover .next dir (possibly
    garbage) must not masquerade as state or corrupt the swap — the next
    run clears it at entry and produces the same state as a clean run."""
    import os

    from dask_lightgbm_spark.queries.streaming_q import x16_stream_upsert_state
    from dask_lightgbm_spark.session import scratch_dir

    clean = _rows(x16_stream_upsert_state(spark, sf_dir))
    state = (
        scratch_dir("x16_state") + "/" + sf_dir.strip("/").replace("/", "_")
    )
    stale = state + ".next"
    os.makedirs(stale, exist_ok=True)
    with open(os.path.join(stale, "garbage.bin"), "wb") as f:
        f.write(b"\x00not parquet")
    after = _rows(x16_stream_upsert_state(spark, sf_dir))
    assert after == clean
    assert not os.path.exists(stale + "/garbage.bin")
