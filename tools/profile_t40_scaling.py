"""Profile t40 (incremental ingest dedup) scaling sf1 -> sf10.

Reproduces the r9 analysis behind docs/SCALE.md's "t40 sf10 scaling is
sublinear in true work" claim: counts the VERIFIED pair cardinality (the
work the verify stage is proportional to) at both scales and times the
full operator, with and without ``bucket_cap``.

Measured r9 (local[32], warm JVM):

    sf1  (10x replicas):  new=2,500  corpus=47,500   hits=2,700     7.4 s
    sf10 (100x replicas): new=25,000 corpus=475,000  hits=269,860  32.0 s
    sf10 + bucket_cap=2000:                          hits=269,860  41.6 s

10x input -> 100x verified pairs (every replica of a new doc matches every
replica of its corpus near-dup set: pair count grows with the SQUARE of the
fixture's replication factor) but only ~4.3x wall time — the time curve is
SUBLINEAR in the true work. bucket_cap is counterproductive here because the
duplication is UNIFORM across buckets (all buckets deepen 10x together; no
single viral bucket), so the cap's extra group-count join + new-side
replication is pure overhead. The cap remains the right guard for the skewed
regime it was built for (one template bucket ~ millions of rows).

Usage: python tools/profile_t40_scaling.py  [SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import pyspark.sql.functions as F

    import bench
    from dask_lightgbm_spark.operators import dedup
    from dask_lightgbm_spark.queries.text import BAND_SIZE, K_SHINGLE, NUM_PERM
    from dask_lightgbm_spark.session import get_spark
    from dask_lightgbm_spark.sources.readers import load_table

    src = os.environ["SPARK_GRAFT_SF_DIR"]
    sf1 = bench.ensure_sf1(src)
    sf10 = bench.ensure_sf10(src)
    spark = get_spark()

    def run(sf_dir: str, bucket_cap: int | None = None) -> None:
        d = load_table(spark, sf_dir, "documents")
        new = d.filter(F.col("source") == "src0")
        corpus = d.filter(F.col("source") != "src0")
        hits = dedup.minhash_lsh_match_against(
            new, corpus, "doc_id", "text",
            k_shingle=K_SHINGLE, num_perm=NUM_PERM, band_size=BAND_SIZE,
            threshold=0.7, bucket_cap=bucket_cap,
        )
        t0 = time.time()
        n_hits = hits.count()
        dt = time.time() - t0
        print(
            f"{sf_dir} cap={bucket_cap}: new={new.count()} "
            f"corpus={corpus.count()} verified_pairs={n_hits} time={dt:.2f}s",
            flush=True,
        )

    run(sf1)
    run(sf10)
    run(sf10, bucket_cap=2000)
    spark.stop()


if __name__ == "__main__":
    main()
