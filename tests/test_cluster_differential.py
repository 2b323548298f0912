"""Two-JVM DIFFERENTIAL slice (r8 verdict task 7): the k-means / PQ /
connected-components families vs their from-scratch pure-Python references,
executed on ``local-cluster[2,2,1024]`` — two real executor JVMs, real
serialized exchanges.

tests/test_differential.py proves these operators against independent
references in ONE JVM, and tests/test_cluster_queries.py proves a catalog
slice against the DuckDB oracle across processes — this file closes the
remaining corner: the iterative/driver-collected families (Lloyd's rounds,
codebook training, label-convergence loops) re-checked against the
independent reference where caches, localCheckpoint blocks, and broadcast
centroids live on two separate executor JVMs. Inputs are fixed
deterministic literals (no hypothesis — the subprocess runs once); every
float is integer-valued so the fixed-point HALF_UP mean contract is exact
on both sides.
"""

import json
import os
import subprocess
import sys
from decimal import ROUND_HALF_UP, Decimal

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# ---- fixed inputs (shared literals between reference and subprocess) ----

KM_VECS = [
    [0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [5.0, 5.0], [6.0, 5.0],
    [5.0, 6.0], [-4.0, -4.0], [-5.0, -4.0], [-4.0, -5.0], [1.0, 1.0],
    [6.0, 6.0], [-5.0, -5.0],
]
KM_K = 3
KM_ITERS = 2

PQ_VECS = [
    [0.0, 0.0, 1.0, 1.0], [2.0, 2.0, 0.0, 0.0], [1.0, 0.0, 2.0, 1.0],
    [0.0, 2.0, 1.0, 0.0], [2.0, 1.0, 0.0, 2.0], [1.0, 1.0, 1.0, 1.0],
    [0.0, 1.0, 2.0, 2.0], [2.0, 0.0, 0.0, 1.0], [1.0, 2.0, 2.0, 0.0],
    [0.0, 0.0, 0.0, 2.0],
]
PQ_SEEDS = 2
PQ_SUB = 2
PQ_NSUB = 2
PQ_K = 3

CC_EDGES = [
    (0, 1), (1, 2), (3, 4), (5, 6), (6, 7), (7, 3),
    (10, 11), (12, 12), (13, 14), (14, 15), (15, 13), (2, 8),
]
CC_NODES = sorted(set(range(10)) | {x for e in CC_EDGES for x in e})


def _half_up(x: float) -> int:
    return int(Decimal(x).to_integral_value(rounding=ROUND_HALF_UP))


def _sqd(a, b):
    d = 0.0
    for x, y in zip(a, b):
        d += (x - y) * (x - y)
    return d


def _fixed_point_mean(members, dim):
    return [
        float(sum(_half_up(v[p] * 1_000_000) for v in members))
        / 1_000_000.0
        / len(members)
        for p in range(dim)
    ]


def _py_lloyds(vecs, k, n_iters, dim):
    """Reference Lloyd's with the published determinism contract:
    sequential-fold squared L2, ties to the lowest centroid id,
    fixed-point HALF_UP per-dimension mean."""
    cents = {i: vecs[i] for i in range(k)}
    for _ in range(n_iters):
        members = {}
        for v in vecs:
            best = min((_sqd(v, cents[c]), c) for c in sorted(cents))
            members.setdefault(best[1], []).append(v)
        cents = {c: _fixed_point_mean(mem, dim) for c, mem in members.items()}
    return cents


def _py_pq(vecs, n_seeds, sub, n_sub, k):
    """Reference PQ pipeline: per-subspace 1-iter Lloyd's codebooks,
    nearest-code encode, ADC top-k with self-exclusion, (dist, nid) ties."""
    books = [
        _py_lloyds([v[m * sub:(m + 1) * sub] for v in vecs], n_seeds, 1, sub)
        for m in range(n_sub)
    ]
    codes = [
        [
            min((_sqd(v[m * sub:(m + 1) * sub], cv), cid)
                for cid, cv in sorted(books[m].items()))[1]
            for m in range(n_sub)
        ]
        for v in vecs
    ]
    out = []
    for qid in range(2):
        scored = []
        for nid, v in enumerate(vecs):
            if nid == qid:
                continue
            d = 0.0
            for m in range(n_sub):
                d += _sqd(vecs[qid][m * sub:(m + 1) * sub], books[m][codes[nid][m]])
            scored.append((nid, d))
        scored.sort(key=lambda t: (t[1], t[0]))
        out += [[qid, nid, rank + 1, d] for rank, (nid, d) in enumerate(scored[:k])]
    return out


def _py_components(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


SCRIPT = f"""
import json, os, sys
sys.path.insert(0, {REPO!r})
os.chdir("/tmp")  # not the repo — mirrors the external driver

from pyspark.sql import SparkSession, functions as F

from dask_lightgbm_spark.operators.components import connected_components
from dask_lightgbm_spark.operators.kmeans import kmeans_centroids
from dask_lightgbm_spark.operators.pq import pq_knn, train_codebooks

spark = (
    SparkSession.builder.master("local-cluster[2,2,1024]")
    .appName("cluster-differential")
    .config("spark.executor.memory", "1g")
    .config("spark.driver.memory", "2g")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.executorEnv.PYTHONPATH", os.environ["PYTHONPATH"])
    .getOrCreate()
)

km = spark.createDataFrame(
    list(enumerate({KM_VECS!r})), "vec_id long, embedding array<double>"
)
kmeans_out = {{
    str(r.cid): list(r.cv)
    for r in kmeans_centroids(km, F.col("vec_id") < {KM_K}, n_iters={KM_ITERS}).collect()
}}

pqdf = spark.createDataFrame(
    list(enumerate({PQ_VECS!r})), "vec_id long, embedding array<double>"
)
books = train_codebooks(
    pqdf, F.col("vec_id") < {PQ_SEEDS}, dim={PQ_SUB * PQ_NSUB},
    n_subspaces={PQ_NSUB}, n_iters=1,
)
books_out = [sorted((int(c), list(cv)) for c, cv in b) for b in books]
pq_out = [
    [r.qid, r.nid, r.rank, r.adc_dist]
    for r in pq_knn(pqdf, F.col("vec_id") < 2, k={PQ_K}, codebooks=books)
    .orderBy("qid", "rank").collect()
]

edges = spark.createDataFrame({CC_EDGES!r}, "id_a long, id_b long")
nodes = spark.createDataFrame([(n,) for n in {CC_NODES!r}], "doc_id long")
cc_out = {{
    str(r.doc_id): r.component
    for r in connected_components(edges, nodes).collect()
}}

# both executor JVMs really participated (separate python worker processes)
pids = sorted(set(
    spark.range(0, 64, 1, 8).rdd.map(lambda r: os.getpid()).distinct().collect()
))
assert len(pids) >= 2, pids

print("RESULT " + json.dumps(
    {{"kmeans": kmeans_out, "books": books_out, "pq": pq_out, "cc": cc_out}}
))
print("CLUSTER_DIFFERENTIAL_OK")
"""


def test_differential_families_across_executor_processes():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        env=env,
        capture_output=True,
        text=True,
        timeout=540,
    )
    assert proc.returncode == 0, (
        f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-4000:]}"
    )
    assert "CLUSTER_DIFFERENTIAL_OK" in proc.stdout
    got = json.loads(
        next(l for l in proc.stdout.splitlines() if l.startswith("RESULT "))[7:]
    )

    expected_km = _py_lloyds(KM_VECS, KM_K, KM_ITERS, 2)
    assert got["kmeans"] == {str(c): cv for c, cv in expected_km.items()}

    ref_books = [
        _py_lloyds([v[m * PQ_SUB:(m + 1) * PQ_SUB] for v in PQ_VECS],
                   PQ_SEEDS, 1, PQ_SUB)
        for m in range(PQ_NSUB)
    ]
    assert got["books"] == [
        sorted([c, cv] for c, cv in b.items()) for b in ref_books
    ]
    assert got["pq"] == _py_pq(PQ_VECS, PQ_SEEDS, PQ_SUB, PQ_NSUB, PQ_K)

    expected_cc = _py_components(CC_EDGES, CC_NODES)
    assert got["cc"] == {str(n): c for n, c in expected_cc.items()}
