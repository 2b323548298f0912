"""Stage-level profile of t40 (incremental ingest dedup) at a given SF dir.

Times each pipeline stage in isolation by forcing materialization at the
stage boundary, so the sf1→sf10 scaling curve can be attributed:
  1. corpus/new shingle+minhash signature build (scan-bound, linear)
  2. band join candidate generation (cand0 count — bucket-collision bound)
  3. estimate prefilter survivors (cand count)
  4. exact verify join (array-intersect Jaccard over candidates)
  5. full t40 (windows + left join back)
Optionally repeats candidate generation with bucket_cap set.

Usage: python tools/profile_t40.py <sf_dir> [bucket_cap]
(sf1/sf10 dirs come from bench.ensure_sf1/ensure_sf10 — run bench once or
call those helpers to materialize /tmp/dls_bench_sf1 and _sf10.)

Measured r10 (local[32], warm JVM) on the LINEAR-PAIR fixture (replicas
are distinct documents under per-replica affine substitution; replica 1
stays a near-dup — see bench._scale_documents):

    stage                      sf1 (10x reps)   sf10 (100x reps)  growth
    raw band collisions         52,059  2.7s       507,942 11.7s   9.8x
    estimate-prefilter cand     12,781  2.4s       113,973 10.8s   8.9x
    verified hits (jac>=0.7)       324  4.1s         2,753 21.2s   8.5x
    full t40 query                      4.2s               29.4s   6.9x
      (warm min-of-2, bench-style:     5.2s               28.3s   5.5x)
    corpus bucket max/p999      318/29             488/26

Every cardinality now grows ~LINEARLY with corpus size — the fixture
artifact is fixed at the source instead of being explained away.

Measured r11 on the sf10→sf100 DECADE (corrected 5M-doc fixture — the
r10 one-off reused affine maps past k=285 and carried 1.4M unintended
exact-dup groups; see bench._scale_documents):

    stage                      sf10              sf100             growth
    raw band collisions         507,942 12.1s     5,720,837 120.6s  11.3x/10.0x
    estimate-prefilter cand     113,973 11.1s     1,202,928 121.3s  10.6x/11.0x
    verified hits (jac>=0.7)      2,753 22.3s        27,040 188.5s   9.8x/8.5x
    full t40 query                      22.4s               260.4s  11.6x
    corpus bucket p999               26                28

The decade is linear at every stage — the honest asymptote (t39 measures
10.4x at the same scales), fully amortized. r10's 6.3x was the broken
fixture, not a sublinearity. Re-measure via SPARK_GRAFT_SF100=1 (bench
stanza, gated at SF100_DECADE_LIMIT=12x). For the
record, the r9 fixture (every replica a near-dup of every other) measured
collisions 211k → 20.3M (96x), verified pairs 2,700 → 269,860 (100x),
full query 6.1 → 35.2 s: pair work grew with the SQUARE of the
replication factor, and this tool existed to prove the 4-5x wall-time
curve was sublinear in that true work. bucket_cap=2000 at sf10 measured
SLOWER on the r9 fixture (41.6s vs 32.0s, identical hits): bucket growth
was uniform (no viral bucket), so the cap's group-count join + new-side
replication is pure overhead; it stays reserved for the skewed
single-hot-bucket regime it guards.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from dask_lightgbm_spark.operators import dedup
from dask_lightgbm_spark.operators.dedup import (
    _band_views,
    shingle_hash_array,
    signatures_from_array,
)
from dask_lightgbm_spark.queries.text import BAND_SIZE, K_SHINGLE, NUM_PERM
from dask_lightgbm_spark.session import get_spark
from dask_lightgbm_spark.sources.readers import load_table


def main() -> None:
    sf_dir = sys.argv[1]
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else None
    spark = get_spark()
    d = load_table(spark, sf_dir, "documents")
    new = d.filter(F.col("source") == "src0")
    corpus = d.filter(F.col("source") != "src0")

    def tick(label, fn):
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        print(f"{label:<40} {dt:7.2f}s  {out}")
        return out

    tick("counts new/corpus", lambda: (new.count(), corpus.count()))

    arr_new = shingle_hash_array(new, "doc_id", "text", K_SHINGLE)
    arr_cor = shingle_hash_array(corpus, "doc_id", "text", K_SHINGLE)
    tick(
        "1 signature build (corpus count)",
        lambda: signatures_from_array(arr_cor, "doc_id", NUM_PERM).count(),
    )

    sig_arr = F.array(*[F.col(f"mh{i}") for i in range(NUM_PERM)])
    bands_new = _band_views(
        signatures_from_array(arr_new, "doc_id", NUM_PERM),
        "doc_id", NUM_PERM, BAND_SIZE, extra_cols=[sig_arr.alias("sigarr")],
    )
    bands_cor = _band_views(
        signatures_from_array(arr_cor, "doc_id", NUM_PERM),
        "doc_id", NUM_PERM, BAND_SIZE, extra_cols=[sig_arr.alias("sigarr")],
    )
    cond = F.col("a.band") == F.col("b.band")
    for j in range(BAND_SIZE):
        cond = cond & (F.col(f"a.bv{j}") == F.col(f"b.bv{j}"))
    a, b = bands_new.alias("a"), bands_cor.alias("b")
    raw = a.join(b, cond)
    tick("2 band-join raw collisions", lambda: raw.count())

    matches = F.aggregate(
        F.zip_with(F.col("a.sigarr"), F.col("b.sigarr"), lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    cand = (
        raw.filter(matches >= NUM_PERM // 2)
        .select(F.col("a.doc_id").alias("new_id"), F.col("b.doc_id").alias("corpus_id"))
        .distinct()
    )
    tick("3 estimate-prefilter cand", lambda: cand.count())

    # bucket-size distribution on the corpus side
    bvs = ["band"] + [f"bv{j}" for j in range(BAND_SIZE)]
    dist = (
        bands_cor.groupBy(*bvs).count()
        .agg(
            F.max("count").alias("max_bucket"),
            F.expr("percentile_approx(count, 0.999)").alias("p999"),
            F.count(F.lit(1)).alias("n_buckets"),
        )
        .collect()[0]
    )
    print(f"corpus bucket dist: max={dist.max_bucket} p999={dist.p999} n={dist.n_buckets}")

    t0 = time.time()
    full = dedup.minhash_lsh_match_against(
        new, corpus, "doc_id", "text",
        k_shingle=K_SHINGLE, num_perm=NUM_PERM, band_size=BAND_SIZE,
        threshold=0.7, bucket_cap=cap,
    )
    n = full.count()
    print(f"4 full match_against (cap={cap}): {time.time()-t0:7.2f}s  hits={n}")

    from dask_lightgbm_spark.queries.text import t40_incremental_ingest_dedup

    t0 = time.time()
    nrows = t40_incremental_ingest_dedup(spark, sf_dir).count()
    print(f"5 full t40 query: {time.time()-t0:7.2f}s  rows={nrows}")


if __name__ == "__main__":
    main()
