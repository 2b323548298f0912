"""session.release_caches: the scoped between-corpora hygiene API.

Two executor-memory leak shapes it must close (both documented
session-lifetime contracts before this API existed):

1. Per-invocation lazy persists an operator cannot unpersist in-function —
   minhash_lsh_neardup's shingle-hash arrays, s25's kNN graph — registered
   via track_lazy_persist.
2. Session-keyed build-once index caches (_dls_* attrs: IVF assignment,
   PQ codes, s23's incremental index) plus their driver-side memoized
   state (nprobe counts, codebooks, centroids).

The release must be scoped (a caller's own cached DataFrame survives,
unlike spark.catalog.clearCache()) and content-neutral (everything it
drops is deterministic derived state, so re-running after release gives
identical results).
"""

import pytest

from dask_lightgbm_spark import session as S
from dask_lightgbm_spark.operators import dedup


@pytest.fixture()
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox leaps over the lazy dog again and again"),
        (3, "completely different text about spark query engines at scale"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _is_cached(df) -> bool:
    lvl = df.storageLevel
    return lvl.useMemory or lvl.useDisk


def test_release_drains_lazy_persists(spark, docs):
    S.release_caches(spark)  # clean slate from other tests
    assert getattr(spark, S._LAZY_PERSIST_ATTR, []) == []
    before = sorted(
        (r.id_a, r.id_b)
        for r in dedup.minhash_lsh_neardup(docs, "doc_id", "text").collect()
    )
    registry = getattr(spark, S._LAZY_PERSIST_ATTR)
    assert len(registry) == 1
    arr = registry[0]
    assert _is_cached(arr)
    counts = S.release_caches(spark)
    assert counts["unpersisted"] >= 1
    assert not hasattr(spark, S._LAZY_PERSIST_ATTR)
    assert not _is_cached(arr)
    # content-neutral: rebuilt pipeline gives the identical pair set
    after = sorted(
        (r.id_a, r.id_b)
        for r in dedup.minhash_lsh_neardup(docs, "doc_id", "text").collect()
    )
    S.release_caches(spark)
    assert after == before


def test_release_drops_session_index_caches(spark, sf_dir):
    from dask_lightgbm_spark.queries import similarity as qsim

    S.release_caches(spark)
    before = qsim.s02_knn_ivf(spark, sf_dir).collect()
    assert sf_dir in spark._dls_ivf_index_cache
    assert _is_cached(spark._dls_ivf_index_cache[sf_dir])
    idx = spark._dls_ivf_index_cache[sf_dir]
    counts = S.release_caches(spark)
    assert counts["unpersisted"] >= 1
    assert not hasattr(spark, "_dls_ivf_index_cache")
    assert not _is_cached(idx)
    # deterministic rebuild: the serve path returns identical neighbors
    after = qsim.s02_knn_ivf(spark, sf_dir).collect()
    S.release_caches(spark)
    assert after == before


def test_release_is_scoped_to_package_state(spark, sf_dir):
    """A caller's own cached DataFrame must survive release_caches — the
    whole point of not reaching for spark.catalog.clearCache()."""
    mine = spark.range(100).persist()
    try:
        mine.count()
        assert _is_cached(mine)
        S.release_caches(spark)
        assert _is_cached(mine)
    finally:
        mine.unpersist()


def test_release_drops_driver_side_memoized_state(spark, sf_dir):
    from dask_lightgbm_spark.queries import similarity as qsim

    S.release_caches(spark)
    qsim.s11_knn_ivf_learned_nprobe(spark, sf_dir).collect()
    assert sf_dir in spark._dls_ivf_nprobe_cache
    counts = S.release_caches(spark)
    assert counts["dropped_state"] >= 1
    assert not hasattr(spark, "_dls_ivf_nprobe_cache")


def test_release_is_scoped_per_session(spark, docs):
    """release_caches(sessionA) must not unpersist DataFrames registered
    under sessionB — the registry is keyed by owning session, not
    process-global (r8 advisor finding)."""
    other = spark.newSession()
    S.release_caches(spark)
    S.release_caches(other)
    other_docs = other.createDataFrame(
        docs.collect(), schema=docs.schema
    )
    dedup.minhash_lsh_neardup(other_docs, "doc_id", "text").collect()
    registry = getattr(other, S._LAZY_PERSIST_ATTR)
    assert len(registry) == 1
    arr = registry[0]
    assert _is_cached(arr)
    # releasing the ORIGINAL session must leave other's persist intact
    assert S.release_caches(spark)["unpersisted"] == 0
    assert _is_cached(arr)
    counts = S.release_caches(other)
    assert counts["unpersisted"] >= 1
    assert not _is_cached(arr)


def test_release_on_empty_session_is_noop(spark):
    S.release_caches(spark)
    assert S.release_caches(spark) == {"unpersisted": 0, "dropped_state": 0}


def test_t39_leaves_no_blocks_behind(spark, sf_dir):
    """r11 regression pin: t39 used to localCheckpoint the tokenized
    corpus (~3-5x text bytes of executor blocks). On the sf100 ladder
    the blocks bent the decade from 9.9x (linear) to 17.9-32x and
    starved the next query's heap. t39 must leave the block store and
    CacheManager exactly as it found them — corpus-sized derived state
    never materializes on the hot path."""
    from dask_lightgbm_spark.queries import all_queries

    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    all_queries()["t39_chunk_dedup"](spark, sf_dir).toPandas()
    assert jsc.getPersistentRDDs().size() == before, (
        "t39 registered persistent RDD blocks"
    )
