"""Streaming ingest-dedup against a STORED band index.

The x14 catalog entry proves the streaming LSH admission-gate plan at
fixture scale with the corpus side computed inline; this module is the
PRODUCTION topology the t40_indexed/build_minhash_band_index lifecycle
promises — the corpus side is the persisted index tables (built once,
appended per admitted batch, compacted on the size trigger), and each
streaming micro-batch pays signatures only for ITSELF plus a stored-table
equi-join. Nothing here shingles the corpus at match time, so the drain
cost scales with candidate collisions (linear in corpus size on the
fixture's geometry), not with corpus recompute.

Reference parity: this extends the reference-consumed dedup surface the
same way t40/x14 do (reference has no streaming engine); the plan is the
x14 plan with the static side swapped for the stored tables.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dask_lightgbm_spark.streaming.diag import drain_and_capture, state_partitions


def stream_match_against_index(
    spark: SparkSession,
    new_dir: str,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_shingle: int = 5,
    num_perm: int = 16,
    band_size: int = 4,
    threshold: float = 0.7,
    glob: str = "*.parquet",
    max_files_per_trigger: int | None = None,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """Stream the documents under ``new_dir`` against the STORED band
    index at ``index_dir`` (the two tables ``build_minhash_band_index``
    writes), emitting verified near-dup pairs (new_id, corpus_id,
    jaccard >= threshold) as an append stream — the continuous form of
    ``minhash_lsh_match_against_index``, bit-identical on a drained
    bounded source (pinned in tests and the bench x14 scaling leg).

    Plan per micro-batch (the x14 shape): row-local shingles → minhash →
    band explode on the STREAM side only; equi-join against the stored
    band table (static batch plan, re-planned per trigger — at scale the
    band-partitioned index prunes to colliding partitions); the one
    stateful op is dropDuplicates on the candidate pair (band-collision-
    sized state, watermarked on ingest time in production); exact-Jaccard
    verify joins the stored verify arrays. The new doc's shingle array
    rides the band rows (``keep_cols``) so the verify stage never re-joins
    the stream to itself."""
    from dask_lightgbm_spark.operators.dedup import (
        _band_views,
        shingle_hash_array,
        signatures_from_array,
    )

    corpus_bands = spark.read.parquet(f"{index_dir}/bands.parquet").select(
        F.col(id_col).alias("corpus_id"),
        "band",
        *[F.col(f"bv{j}") for j in range(band_size)],
        F.col("sigarr").alias("sig_cor"),
    )
    corpus_verify = spark.read.parquet(f"{index_dir}/verify.parquet").select(
        F.col(id_col).alias("corpus_id"), F.col("hs").alias("hb")
    )
    from dask_lightgbm_spark.sources.readers import raw_parquet_schema

    schema = raw_parquet_schema(spark, new_dir, glob)
    with state_partitions(spark, shuffle_partitions):
        reader = spark.readStream.schema(schema).option("pathGlobFilter", glob)
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        src = reader.parquet(new_dir)
        arr_new = shingle_hash_array(src, id_col, text_col, k_shingle)
        sig_arr = F.expr("array(%s)" % ", ".join(f"mh{i}" for i in range(num_perm)))
        bands_new = _band_views(
            signatures_from_array(arr_new, id_col, num_perm, keep_cols=("hs",)),
            id_col,
            num_perm,
            band_size,
            extra_cols=[sig_arr.alias("sig_new"), F.col("hs").alias("ha")],
        ).select(
            F.col(id_col).alias("new_id"),
            "band",
            *[F.col(f"bv{j}") for j in range(band_size)],
            "sig_new",
            "ha",
        )
        from dask_lightgbm_spark.operators.dedup import sig_match_count

        matches = sig_match_count("sig_new", "sig_cor", num_perm)
        # no broadcast hint: the stored band table is data-sized at scale
        cand = (
            bands_new.join(
                corpus_bands, ["band"] + [f"bv{j}" for j in range(band_size)]
            )
            .filter(matches >= num_perm // 2)
            .dropDuplicates(["new_id", "corpus_id"])
            .select("new_id", "corpus_id", "ha")
        )
        inter = F.size(F.array_intersect(F.col("ha"), F.col("hb")))
        verified = (
            cand.join(corpus_verify, "corpus_id")
            .select(
                "new_id",
                "corpus_id",
                (
                    inter
                    / (F.size(F.col("ha")) + F.size(F.col("hb")) - inter)
                ).alias("jaccard"),
            )
            .filter(F.col("jaccard") >= threshold)
        )
        name = f"stream_idx_match_{uuid.uuid4().hex[:8]}"
        q = (
            verified.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .start()
        )
    drain_and_capture(q)
    return spark.table(name)
