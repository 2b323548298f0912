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

Measured r9 (local[32], warm JVM) — the numbers behind SCALE.md's
"t40 sf10 time is sublinear in true work" row:

    stage                      sf1 (10x reps)   sf10 (100x reps)   growth
    raw band collisions        211,043  5.2s    20,280,676  13.5s   96x
    estimate-prefilter cand     37,012  6.4s     3,536,299  14.8s   96x
    verified hits (jac>=0.7)     2,700  5.3s       269,860  31.6s  100x
    full t40 query                       6.1s                35.2s  5.8x
    corpus bucket max/p999      351/170           3,361/1,288

Every cardinality grows ~100x for 10x input — pair count scales with the
SQUARE of the fixture replication factor (each new-doc replica matches
every replica of its corpus near-dup set) — while wall time grows <6x:
the curve is sublinear in the work the verify stage is proportional to.
bucket_cap=2000 at sf10 measured SLOWER (41.6s vs 32.0s, identical hits):
bucket growth here is uniform (max/p999 ratio ~2.6, no viral bucket), so
the cap's group-count join + new-side replication is pure overhead; it
stays reserved for the skewed single-hot-bucket regime it guards.
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
