"""Similarity-search operators."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from dask_lightgbm_spark.operators import similarity as sim


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(42)
    vecs = [rng.normal(0, 1, 8).astype(np.float32) for _ in range(50)]
    vecs[1] = vecs[0] + rng.normal(0, 1e-3, 8).astype(np.float32)  # planted twin of 0
    pdf = pd.DataFrame({"vec_id": range(50), "embedding": [list(map(float, v)) for v in vecs]})
    return spark.createDataFrame(pdf)


def test_knn_finds_planted_twin(vectors):
    out = sim.brute_force_knn(vectors, vectors.filter(F.col("vec_id") == 0), k=3).collect()
    assert out[0].rank == 1 and out[0].nid == 1 and out[0].cos > 0.999


def test_knn_rank_ordering(vectors):
    out = sim.brute_force_knn(vectors, vectors.filter(F.col("vec_id") < 3), k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.qid, []).append(r)
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert len(rows) == 5
        assert all(rows[i].cos >= rows[i + 1].cos for i in range(4))
        assert all(r.nid != qid for r in rows)


def test_ivf_subset_of_bruteforce_candidates(vectors):
    """IVF results are genuine cosine scores and exclude self; recall may be
    < 1 (documented tradeoff) but the planted twin shares a cell."""
    out = sim.ivf_knn(
        vectors,
        queries_filter=F.col("vec_id") == 0,
        centroid_filter=F.col("vec_id") % 10 == 0,
        k=3,
    ).collect()
    assert out and out[0].nid == 1  # twin lands in the same cell


def test_neardup_pairs_threshold(vectors):
    out = sim.cosine_neardup_pairs(vectors, threshold=0.999).collect()
    assert {(r.id_a, r.id_b) for r in out} == {(0, 1)}


def test_cosine_exact_value(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": [0, 1], "embedding": [[1.0, 0.0], [0.0, 1.0]]}
        )
    )
    out = sim.brute_force_knn(df, df.filter(F.col("vec_id") == 0), k=1).collect()
    assert out[0].cos == 0.0  # orthogonal
