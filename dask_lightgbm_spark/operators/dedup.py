"""Deduplication operators for large-scale training-data pipelines:
exact, MinHash+LSH, SimHash, and n-gram Jaccard — all pure DataFrame
compositions (JVM-side, codegen'd; no Python UDFs in any hot path).

Scale design (the 100 TB story):

- **exact**: one hash-groupBy shuffle on a 16-byte digest; trivially
  partition-parallel.
- **minhash_lsh**: per-doc signature is a single groupBy with k MIN
  aggregates (map-side partial agg → tiny shuffle), candidates come from a
  self-equi-join on banded signature buckets (shuffle keyed on small band
  tuples), and only candidates get exact-Jaccard verification. No all-pairs
  stage anywhere.
- **simhash**: signature via 60 conditional-sum aggregates in ONE groupBy
  (no bit-explosion shuffle); near-dup pairs via pigeonhole block join
  (hamming ≤ d pairs must agree on ≥1 of d+1 signature blocks) — again an
  equi-join, never a cross-product.
- **ngram_jaccard**: exact all-shared-shingle join; correct but quadratic in
  docs sharing hot shingles — the scale path is minhash_lsh_neardup, which
  uses this only on the (tiny) candidate set.

Hashes are md5-derived (functions/hashing.py) so the DuckDB oracle computes
identical values.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dask_lightgbm_spark.functions.hashing import (
    MINHASH_COEF,
    md5_hash32,
    md5_hash60,
    minhash_value,
)


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup by content digest: one row per distinct content with the
    id to keep (min id) and the copy count."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def char_shingles(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """Distinct character k-gram shingles per document: (id, shingle).
    explode(sequence) is JVM-side; no Python boundary."""
    n_pos = F.greatest(F.length(text_col) - (k - 1), F.lit(1))
    return (
        df.select(
            F.col(id_col),
            F.explode(F.sequence(F.lit(1), n_pos)).alias("__g"),
            F.col(text_col),
        )
        .select(F.col(id_col), F.col(text_col).substr(F.col("__g"), F.lit(k)).alias("shingle"))
        .distinct()
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k_shingle: int = 5, num_perm: int = 8
) -> DataFrame:
    """Wide minhash signature: (id, mh0..mh{n-1}). One shuffle: the
    k permutation minima are computed as k MIN aggregates over the shingle
    set (map-side combine shrinks each partition to one row per doc)."""
    sh = char_shingles(df, id_col, text_col, k_shingle)
    h = sh.select(F.col(id_col), md5_hash32(F.col("shingle")).alias("h"))
    aggs = [
        F.min(minhash_value(F.col("h"), i)).alias(f"mh{i}") for i in range(num_perm)
    ]
    return h.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    sig: DataFrame, id_col: str, num_perm: int = 8, band_size: int = 2
) -> DataFrame:
    """Banded-LSH candidate pairs (id_a < id_b) from a wide signature:
    docs agreeing on all rows of ≥1 band. Equi-join on (band, values) —
    shuffle-friendly, no cross-product."""
    n_bands = num_perm // band_size
    bands = functools.reduce(
        DataFrame.unionByName,
        [
            sig.select(
                F.col(id_col),
                F.lit(b).alias("band"),
                *[
                    F.col(f"mh{b * band_size + j}").alias(f"bv{j}")
                    for j in range(band_size)
                ],
            )
            for b in range(n_bands)
        ],
    )
    a, b = bands.alias("a"), bands.alias("b")
    cond = (F.col("a.band") == F.col("b.band")) & (
        F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    )
    for j in range(band_size):
        cond = cond & (F.col(f"a.bv{j}") == F.col(f"b.bv{j}"))
    return (
        a.join(b, cond)
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def jaccard_for_pairs(
    pairs: DataFrame, shingles: DataFrame, id_col: str
) -> DataFrame:
    """Exact Jaccard for an explicit candidate pair set: |∩| via shingle
    join restricted to candidates, |∪| from per-doc set sizes.
    jaccard = inter / (na + nb - inter): integer ops + one division →
    bit-exact across engines."""
    sizes = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    sa = shingles.select(F.col(id_col).alias("id_a"), "shingle")
    sb = shingles.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        pairs.join(sa, "id_a")
        .join(sb, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("na")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("nb")), "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))).alias("jaccard"),
        )
    )


def minhash_lsh_neardup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k_shingle: int = 5,
    num_perm: int = 8,
    band_size: int = 2,
    threshold: float = 0.7,
) -> DataFrame:
    """The scale-path near-dup pipeline: shingle → minhash → LSH bands →
    candidate pairs → exact-Jaccard verify ≥ threshold."""
    sig = minhash_signatures(df, id_col, text_col, k_shingle, num_perm)
    cand = lsh_candidate_pairs(sig, id_col, num_perm, band_size)
    sh = char_shingles(df, id_col, text_col, k_shingle)
    jac = jaccard_for_pairs(cand, sh, id_col)
    return jac.filter(F.col("jaccard") >= threshold)


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, threshold: float = 0.8
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard via inverted-index join. Quadratic in
    docs per hot shingle — use on bounded sets (or as the verify stage of
    minhash_lsh_neardup at scale)."""
    sh = char_shingles(df, id_col, text_col, k)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("na")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("nb")), "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))).alias("jaccard"),
        )
    )
    return out.filter(F.col("jaccard") >= threshold)


SIMHASH_BITS = 60  # 15 md5 hex chars → 60-bit token hashes


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """60-bit SimHash over distinct whitespace tokens: (id, simhash).

    Single groupBy with 60 conditional-sum aggregates (one shuffle,
    map-side combined) — no per-bit row explosion."""
    toks = (
        df.select(
            F.col(id_col),
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .distinct()
        .select(F.col(id_col), md5_hash60(F.col("tok")).alias("h"))
    )
    sums = toks.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{j}")
            for j in range(SIMHASH_BITS)
        ]
    )
    sim = functools.reduce(
        operator.add,
        [
            F.when(F.col(f"b{j}") > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
            for j in range(SIMHASH_BITS)
        ],
    )
    return sums.select(F.col(id_col), sim.alias("simhash"))


def _simhash_blocks(col: Column, n_blocks: int) -> list[Column]:
    width = SIMHASH_BITS // n_blocks
    mask = (1 << width) - 1
    return [
        F.shiftright(col, i * width).bitwiseAND(F.lit(mask)).alias(f"blk{i}")
        for i in range(n_blocks)
    ]


def simhash_neardup_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs with simhash hamming distance ≤ d via pigeonhole
    blocking: split the signature into d+1 blocks; any pair within distance
    d agrees on ≥1 block → equi-join per block, then exact hamming filter."""
    n_blocks = max_hamming + 1
    sig = simhash(df, id_col, text_col)
    blocks = functools.reduce(
        DataFrame.unionByName,
        [
            sig.select(
                F.col(id_col),
                F.col("simhash"),
                F.lit(i).alias("blk_id"),
                _simhash_blocks(F.col("simhash"), n_blocks)[i].alias("blk_val"),
            )
            for i in range(n_blocks)
        ],
    )
    a, b = blocks.alias("a"), blocks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.blk_id") == F.col("b.blk_id"))
            & (F.col("a.blk_val") == F.col("b.blk_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return cand.select(
        "id_a",
        "id_b",
        F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("long").alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)
