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
- **simhash**: signature computed fully row-locally (one fold over the
  per-doc token-hash array with a 60-slot accumulator — zero shuffle);
  near-dup pairs via pigeonhole block join (hamming ≤ d pairs must agree on
  ≥1 of d+1 signature blocks) — again an equi-join, never a cross-product.
- **ngram_jaccard**: exact all-shared-shingle join; correct but quadratic in
  docs sharing hot shingles — the scale path is minhash_lsh_neardup, which
  uses this only on the (tiny) candidate set.

Shingle hashes use a 32-bit rolling hash over char codes; token hashes
(simhash) are md5-derived — both defined in functions/hashing.py so the
DuckDB oracle computes identical values.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dask_lightgbm_spark.functions.partitioning import ensure_parallelism
from dask_lightgbm_spark.functions.hashing import (
    md5_hash60,
    minhash_value,
    poly_shingle_hash,
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

    The whole set is built inside ONE projection —
    ``explode(array_distinct(transform(sequence(...))))`` — so the text is
    scanned once per row, exploded rows carry only the k-char shingle (not
    the full document), and per-doc dedup happens locally with NO shuffle
    (per-doc distinct ≡ global (id, shingle) distinct)."""
    n_pos = F.greatest(F.length(text_col) - (k - 1), F.lit(1))
    shingle_set = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n_pos),
            lambda g: F.col(text_col).substr(g, F.lit(k)),
        )
    )
    return df.select(F.col(id_col), F.explode(shingle_set).alias("shingle"))


def hashed_shingles(
    df: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """Exploded (row-per-element) view of :func:`shingle_hash_array` —
    for the generic candidate-verify join path when per-doc arrays would be
    too large to carry through a join."""
    return shingle_hash_array(df, id_col, text_col, k).select(
        F.col(id_col), F.explode(F.col("hs")).alias("h")
    )


def shingle_hash_array(
    df: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """Per-doc distinct shingle-hash ARRAY: (id, hs array<long>). The whole
    set stays row-local — no explode, no shuffle. Document length is bounded,
    so the array is too (~1 int64 per char); this is the carrier for the
    zero-shuffle signature + verify stages. Shingles are hashed with a
    32-bit rolling hash over a per-char code array (one pass per doc,
    5 mult-adds per position — no per-shingle md5). Works on streaming
    inputs too (pure projection; the parallelism spread is batch-only —
    a stream's partitioning is the source's)."""
    if not df.isStreaming:
        df = ensure_parallelism(df)
    n_pos = F.greatest(F.length(text_col) - (k - 1), F.lit(1))
    codes = F.transform(F.split(F.col(text_col), ""), lambda c: F.ascii(c))
    return df.withColumn("__codes", codes).select(
        F.col(id_col),
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n_pos),
                lambda g: poly_shingle_hash(F.col("__codes"), g, k),
            )
        ).alias("hs"),
    )


def signatures_from_array(
    arr: DataFrame, id_col: str, num_perm: int, keep_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Wide minhash signature from per-doc hash arrays: (id, mh0..mh{n-1}).
    array_min over a row-local transform — NO shuffle at all. ``keep_cols``
    carries input columns (e.g. the hs array itself) alongside the
    signature — the streaming ingest path needs the verify-stage array on
    the same row because a second stream-side join is not an option."""
    from dask_lightgbm_spark.functions.hashing import MINHASH_COEF

    if not 1 <= num_perm <= len(MINHASH_COEF):
        raise ValueError(
            f"num_perm must be in [1, {len(MINHASH_COEF)}] (fixed permutation "
            f"table shared with the SQL oracle); got {num_perm}"
        )

    def perm_fn(i):
        # nb: a plain `lambda h, i=i:` would be treated as a binary
        # (element, index) HOF lambda by Spark — keep it unary via closure
        return lambda h: minhash_value(h, i)

    cols = [
        F.array_min(F.transform(F.col("hs"), perm_fn(i))).alias(f"mh{i}")
        for i in range(num_perm)
    ]
    return arr.select(
        F.col(id_col), *[F.col(c) for c in keep_cols], *cols
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k_shingle: int = 5, num_perm: int = 16
) -> DataFrame:
    return signatures_from_array(
        shingle_hash_array(df, id_col, text_col, k_shingle), id_col, num_perm
    )


def _band_views(
    sig: DataFrame, id_col: str, num_perm: int, band_size: int, extra_cols=()
) -> DataFrame:
    """Per-band view of a wide signature: (id, band, bv0..bv{r-1}
    [, extras]) — the single source of the banding layout. ONE projection +
    explode (not a union of per-band scans), so the signature input is read
    once regardless of band count — at 100 TB a b-way union would re-scan
    the signature b times."""
    if band_size < 1 or num_perm % band_size != 0:
        raise ValueError(
            f"num_perm ({num_perm}) must be a positive multiple of band_size "
            f"({band_size}); trailing permutations would be silently dropped"
        )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                *[
                    F.col(f"mh{b * band_size + j}").alias(f"bv{j}")
                    for j in range(band_size)
                ],
            )
            for b in range(num_perm // band_size)
        ]
    )
    exploded = sig.select(
        F.col(id_col), F.explode(band_structs).alias("__b"), *extra_cols
    )
    return exploded.select(
        F.col(id_col),
        F.col("__b.band").alias("band"),
        *[F.col(f"__b.bv{j}").alias(f"bv{j}") for j in range(band_size)],
        *[F.col(c) for c in exploded.columns if c not in (id_col, "__b")],
    )


def _band_join_cond(id_col: str, band_size: int):
    cond = (F.col("a.band") == F.col("b.band")) & (
        F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    )
    for j in range(band_size):
        cond = cond & (F.col(f"a.bv{j}") == F.col(f"b.bv{j}"))
    return cond


def lsh_candidate_pairs(
    sig: DataFrame, id_col: str, num_perm: int = 8, band_size: int = 2
) -> DataFrame:
    """Banded-LSH candidate pairs (id_a < id_b) from a wide signature:
    docs agreeing on all rows of ≥1 band. Equi-join on (band, values) —
    shuffle-friendly, no cross-product. (minhash_lsh_neardup uses the same
    band layout fused with its estimate filter via _band_views.)"""
    bands = _band_views(sig, id_col, num_perm, band_size)
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(b, _band_join_cond(id_col, band_size))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def jaccard_for_pairs(
    pairs: DataFrame, shingles: DataFrame, id_col: str, set_col: str = "h"
) -> DataFrame:
    """Exact Jaccard for an explicit candidate pair set: |∩| via set-element
    join restricted to candidates, |∪| from per-doc set sizes.
    jaccard = inter / (na + nb - inter): integer ops + one division →
    bit-exact across engines."""
    sizes = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    sa = shingles.select(F.col(id_col).alias("id_a"), set_col)
    sb = shingles.select(F.col(id_col).alias("id_b"), set_col)
    inter = (
        pairs.join(sa, "id_a")
        .join(sb, ["id_b", set_col])
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


def estimate_filter_pairs(
    pairs: DataFrame, sig: DataFrame, id_col: str, num_perm: int, min_matches: int
) -> DataFrame:
    """Drop candidate pairs whose signature-estimated similarity is low:
    keep pairs with ≥ min_matches of num_perm equal minhashes. Cheap (two
    broadcast-able joins on the small signature table) and kills the bulk
    of false LSH candidates before the expensive exact verify."""
    sa = sig.select(
        F.col(id_col).alias("id_a"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(num_perm)],
    )
    sb = sig.select(
        F.col(id_col).alias("id_b"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(num_perm)],
    )
    matches = functools.reduce(
        operator.add,
        [(F.col(f"a{i}") == F.col(f"b{i}")).cast("int") for i in range(num_perm)],
    )
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("__m", matches)
        .filter(F.col("__m") >= min_matches)
        .select("id_a", "id_b")
    )


def minhash_lsh_neardup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k_shingle: int = 5,
    num_perm: int = 16,
    band_size: int = 4,
    threshold: float = 0.7,
    est_min_matches: int | None = None,
    bucket_cap: int | None = None,
) -> DataFrame:
    """The scale-path near-dup pipeline: shingle → minhash → LSH bands →
    candidate pairs → signature-estimate prefilter → exact-Jaccard verify
    ≥ threshold. Recall loss from the prefilter is tiny near/above the
    threshold (binomial: P[≥ n/2 of n matches | j=0.7] ≈ 0.98 for n=16).

    ``bucket_cap`` bounds hot band-buckets (SCALE.md's watch-item for
    duplicate-heavy corpora): a bucket holding m identical signatures forms
    m² candidate pairs on ONE reducer in the plain band self-join. With a
    cap, each bucket is split into ⌈m/cap⌉ HASH groups (id hashed mod the
    group count, which comes from a linear per-bucket count aggregate — no
    per-bucket rank window, whose hot-bucket sort would itself be a
    single-task skew bottleneck) and the self-join is salted over
    (group_a, group_b) sub-tasks — the shuffle key gains both group ids,
    so no reducer ever holds more than ~cap rows per side (~cap²
    pair-work), while each unordered pair is still formed exactly once:
    the join is oriented lower-group-first (ties broken by id within a
    group) and the output pair re-canonicalized to id_a < id_b. Total
    pair count is unchanged — the cap spreads the quadratic bucket work,
    it does not drop it. Replication cost: each row ships ≤ ⌈m/cap⌉
    copies of its band row. Default None keeps the plain equi-join plan.

    Cache contract: the per-doc shingle-hash array is ``persist()``-ed
    (MEMORY_AND_DISK) because the result consumes it three times (signature
    + both verify sides) and it cannot be unpersisted here — the returned
    DataFrame is lazy and still depends on it. The persist is registered
    with :func:`dask_lightgbm_spark.session.track_lazy_persist`; a
    long-running service invoking this repeatedly calls
    ``session.release_caches(spark)`` between corpora to drop the blocks
    without evicting its own cached DataFrames (the streaming twin x14 and
    match_against avoid the cache entirely for this reason)."""
    if est_min_matches is None:
        est_min_matches = num_perm // 2
    # per-doc hash arrays feed both the signature and the verify stage —
    # persist so the shingling projection runs once. The signature itself is
    # NOT persisted: since the band views became a single explode, sig is
    # consumed exactly once, and a cache write would be pure overhead.
    from dask_lightgbm_spark.session import track_lazy_persist

    arr = track_lazy_persist(
        shingle_hash_array(df, id_col, text_col, k_shingle).persist()
    )
    sig = signatures_from_array(arr, id_col, num_perm)
    # band views carry the FULL signature as an array so the estimate filter
    # evaluates inline on the band join output — no extra signature joins
    sig_arr = F.array(*[F.col(f"mh{i}") for i in range(num_perm)])
    bands = _band_views(
        sig, id_col, num_perm, band_size, extra_cols=[sig_arr.alias("sigarr")]
    )
    matches = F.aggregate(
        F.zip_with(
            F.col("a.sigarr"), F.col("b.sigarr"), lambda x, y: (x == y).cast("int")
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    if bucket_cap is not None:
        if bucket_cap < 1:
            raise ValueError(f"bucket_cap must be >= 1, got {bucket_cap}")
        bvs = ["band"] + [f"bv{j}" for j in range(band_size)]
        ng = bands.groupBy(*bvs).agg(
            F.expr(
                f"(count(*) + {bucket_cap - 1}) div {bucket_cap}"
            ).alias("__ng")
        )
        grouped = (
            bands.join(ng, bvs)
            .withColumn("__g", F.pmod(F.hash(F.col(id_col)), F.col("__ng")))
            .withColumn("__gmax", F.col("__ng") - F.lit(1))
        )
        a = grouped.withColumn("__ga", F.col("__g")).withColumn(
            "__gb", F.explode(F.sequence(F.col("__g"), F.col("__gmax")))
        ).alias("a")
        b = grouped.withColumn("__gb", F.col("__g")).withColumn(
            "__ga", F.explode(F.sequence(F.lit(0), F.col("__g")))
        ).alias("b")
        # orient lower-group-first (id within a group): hash groups are not
        # monotone in id, so the pair canonicalizes to (least, greatest)
        # AFTER the join
        cond = (F.col("a.band") == F.col("b.band"))
        for j in range(band_size):
            cond = cond & (F.col(f"a.bv{j}") == F.col(f"b.bv{j}"))
        cond = (
            cond
            & (F.col("a.__ga") == F.col("b.__ga"))
            & (F.col("a.__gb") == F.col("b.__gb"))
            & (
                (F.col("a.__g") < F.col("b.__g"))
                | (
                    (F.col("a.__g") == F.col("b.__g"))
                    & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
                )
            )
        )
        ids = (
            F.least(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_a"),
            F.greatest(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_b"),
        )
    else:
        a, b = bands.alias("a"), bands.alias("b")
        cond = _band_join_cond(id_col, band_size)
        ids = (
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
    cand = (
        a.join(b, cond)
        .filter(matches >= est_min_matches)
        .select(*ids)
        .distinct()
    )
    # verify: row-local array_intersect per candidate pair — no exploded join
    a = arr.select(F.col(id_col).alias("id_a"), F.col("hs").alias("ha"))
    b = arr.select(F.col(id_col).alias("id_b"), F.col("hs").alias("hb"))
    inter = F.size(F.array_intersect(F.col("ha"), F.col("hb")))
    jac = (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            (inter / (F.size(F.col("ha")) + F.size(F.col("hb")) - inter)).alias("jaccard"),
        )
    )
    return jac.filter(F.col("jaccard") >= threshold)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.8,
    max_rows: int | None = 10_000,
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard via inverted-index join. Quadratic in
    docs per hot shingle — a bounded-set / verify-stage operator, NOT a
    corpus-scale dedup (that is :func:`minhash_lsh_neardup`, whose banded
    equi-join never forms all pairs).

    ``max_rows`` (default 10k) refuses larger inputs so the quadratic plan
    cannot be pointed at a full corpus by accident; pass ``max_rows=None``
    to opt out explicitly after reading this."""
    if max_rows is not None:
        n = df.count()
        if n > max_rows:
            raise ValueError(
                f"ngram_jaccard_pairs is exact all-pairs (quadratic per hot "
                f"shingle); input has {n} rows > max_rows={max_rows}. Use "
                "minhash_lsh_neardup for corpus-scale near-dup detection, "
                "or pass max_rows=None to run it anyway on a bounded set."
            )
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

    Fully row-local: the distinct token set, token hashes, per-bit ±1 sums
    (60 array folds), and the final bit-pack all happen inside one
    projection — NO explode, NO shuffle. Integer addition is associative,
    so the oracle's list_sum reproduces the folds exactly."""
    df = ensure_parallelism(df)
    toks = F.array_distinct(
        F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != "")
    )
    hs = F.transform(toks, lambda t: md5_hash60(t))

    # ONE fold over the token hashes with a 60-slot array accumulator —
    # the hash array is consumed exactly once (60 separate per-bit folds
    # would make Catalyst recompute the md5 transform per fold).
    powers = F.array(*[F.lit(1 << j).cast("long") for j in range(SIMHASH_BITS)])
    sums = F.aggregate(
        hs,
        F.array_repeat(F.lit(0).cast("long"), SIMHASH_BITS),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(powers, lambda p: F.when(h.bitwiseAND(p) != 0, 1).otherwise(-1)),
            lambda a, b: a + b,
        ),
    )
    # pack: sum of 2^j where sums[j] > 0
    packed = F.aggregate(
        F.zip_with(
            sums, powers, lambda s, p: F.when(s > 0, p).otherwise(F.lit(0).cast("long"))
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return df.select(F.col(id_col), packed.alias("simhash"))


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
    # one projection + explode (not an n_blocks-way union): the signature
    # input is scanned once regardless of block count
    blk_cols = _simhash_blocks(F.col("simhash"), n_blocks)
    blk_structs = F.array(
        *[
            F.struct(F.lit(i).alias("blk_id"), blk_cols[i].alias("blk_val"))
            for i in range(n_blocks)
        ]
    )
    blocks = sig.select(
        F.col(id_col), F.col("simhash"), F.explode(blk_structs).alias("__blk")
    ).select(
        F.col(id_col),
        F.col("simhash"),
        F.col("__blk.blk_id").alias("blk_id"),
        F.col("__blk.blk_val").alias("blk_val"),
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


def build_minhash_band_index(
    corpus_df: DataFrame,
    id_col: str,
    text_col: str,
    k_shingle: int = 5,
    num_perm: int = 16,
    band_size: int = 4,
) -> tuple[DataFrame, DataFrame]:
    """Corpus-side dedup INDEX, as two persistable tables:

    * ``bands`` — (id, band, bv0..bv{r-1}, sigarr) in the _band_views
      layout; the LSH join side.
    * ``verify`` — (id, hs array<long>); the exact-Jaccard verify side.

    This is the production artifact ``minhash_lsh_match_against``'s
    docstring promises: at scale the index is written ONCE (parquet,
    partitionable by ``band``) and every ingest batch joins against the
    stored tables — signature recompute leaves the hot path entirely.
    ``minhash_lsh_match_against_index(new, bands, verify, ...)`` consumes
    either these live DataFrames or their parquet round-trip; the match
    set is identical by construction (same layout, same join)."""
    arr_cor = shingle_hash_array(corpus_df, id_col, text_col, k_shingle)
    sig_arr = F.array(*[F.col(f"mh{i}") for i in range(num_perm)])
    bands_cor = _band_views(
        signatures_from_array(arr_cor, id_col, num_perm),
        id_col, num_perm, band_size, extra_cols=[sig_arr.alias("sigarr")],
    )
    return bands_cor, arr_cor


def append_to_band_index(
    admitted_df: DataFrame,
    index_dir: str,
    id_col: str,
    text_col: str,
    k_shingle: int = 5,
    num_perm: int = 16,
    band_size: int = 4,
) -> None:
    """Index MAINTENANCE for the continuous-ingest loop: after a batch is
    admitted (post-dedup), append ITS band rows and verify arrays to the
    stored corpus index at ``index_dir`` (the two parquet tables
    ``build_minhash_band_index`` lays down), so the next batch's
    ``minhash_lsh_match_against_index`` also matches against it. Append
    cost is proportional to the ADMITTED batch alone — the corpus is
    never rewritten, which is what makes the index viable at 100 TB
    (parquet append = new files; compact with q78's small-files pass when
    the file count grows). Caller contract: admitted ids are globally
    unique (the ingest pipeline's id authority), else matches will report
    duplicate corpus_ids."""
    bands, verify = build_minhash_band_index(
        admitted_df, id_col, text_col, k_shingle, num_perm, band_size
    )
    bands.write.mode("append").parquet(f"{index_dir}/bands.parquet")
    verify.write.mode("append").parquet(f"{index_dir}/verify.parquet")


def compact_band_index(
    spark: SparkSession, index_dir: str, target_files: int = 4
) -> dict[str, int]:
    """Index MAINTENANCE step 2 (r12 verdict #5, completing the lifecycle
    build → append → COMPACT, the same trio s27/s28 give the IVF index):
    after N ingest batches, ``append_to_band_index`` has left the stored
    index as N small file-sets — scan cost and task count grow with batch
    COUNT instead of corpus size. This rewrites both tables to at most
    ``target_files`` files each; pure physical-layout change, so match
    results are bit-identical before/after (unit-pinned in
    tests/test_dedup.py; bench.py records match latency before/after).

    Safety: each table is rewritten to a ``.compact_tmp`` sibling first
    and row-count-checked against the source (parquet metadata count — no
    data scan) BEFORE the delete+rename swap, so a failed rewrite leaves
    the live index untouched. The swap itself is two FS metadata ops; a
    crash between them loses only the index (rebuildable from the corpus)
    never corrupts match results with partial data, and at real scale the
    same rewrite would sit behind a table format's atomic commit.
    Returns per-table file counts before/after."""
    if target_files < 1:
        raise ValueError(f"target_files must be >= 1, got {target_files}")
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    stats: dict[str, int] = {}
    for table in ("bands", "verify"):
        live = f"{index_dir}/{table}.parquet"
        # NOT dot/underscore-prefixed: Spark's file index treats those as
        # hidden and the tmp rewrite must be a readable first-class table
        # for the pre-swap row-count check
        tmp = f"{index_dir}/{table}.parquet.compacting"
        df = spark.read.parquet(live)
        before = len(df.inputFiles())
        # one round-robin shuffle sized to the target file count; at 100 TB
        # target_files scales with table bytes (files of ~1 shuffle
        # partition each), and the rewrite cost is one pass over live rows
        df.repartition(target_files).write.mode("overwrite").parquet(tmp)
        n_live = df.count()
        n_tmp = spark.read.parquet(tmp).count()
        if n_tmp != n_live:
            raise RuntimeError(
                f"compaction row-count mismatch on {live}: {n_live} live "
                f"vs {n_tmp} rewritten — live index left untouched"
            )
        path = jvm.org.apache.hadoop.fs.Path(live)
        fs = path.getFileSystem(hconf)
        if not fs.delete(path, True):
            raise RuntimeError(f"compaction could not remove {live}")
        if not fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), path):
            raise RuntimeError(
                f"compaction rename {tmp} -> {live} failed; index must be "
                f"rebuilt or restored from {tmp}"
            )
        stats[f"{table}_files_before"] = before
        stats[f"{table}_files_after"] = len(
            spark.read.parquet(live).inputFiles()
        )
    return stats


def minhash_lsh_match_against(
    new_df: DataFrame,
    corpus_df: DataFrame,
    id_col: str,
    text_col: str,
    k_shingle: int = 5,
    num_perm: int = 16,
    band_size: int = 4,
    threshold: float = 0.7,
    est_min_matches: int | None = None,
    bucket_cap: int | None = None,
) -> DataFrame:
    """INCREMENTAL ingest dedup: match a NEW batch against an EXISTING
    corpus (two-sided LSH, not the t05 self-join) → (new_id, corpus_id,
    jaccard ≥ threshold). The production shape for continuous ingestion:
    the corpus side's signatures are the persisted dedup index (rebuilt
    here from text because the fixture has no stored index; at scale the
    corpus band table is read, not recomputed — build it once with
    ``build_minhash_band_index``, write to parquet, and match via
    ``minhash_lsh_match_against_index``; bench.py's t40_indexed leg times
    exactly that), the new batch is small, and the band equi-join touches
    only colliding buckets. Same estimate-prefilter → exact-verify ladder
    as minhash_lsh_neardup; no ordering constraint because the two sides
    are disjoint id spaces.

    ``bucket_cap`` guards a viral-template pile-up on the CORPUS side
    (one bucket holding millions of copies meets every colliding new doc
    on one reducer): corpus band rows hash-split into ⌈m/cap⌉ groups per
    bucket (linear count aggregate, no rank window) and the NEW side —
    the small one, by the ingest contract — replicates once per group, so
    the join key gains the group id and no reducer holds more than ~cap
    corpus rows per new doc. Match set unchanged (every corpus row keeps
    exactly one group; the new side covers all groups)."""
    # NO persist (r8): the shingle arrays are scan-local projections, so
    # the verify join's second use recomputes them — at 100 TB, re-running
    # a projection beats caching corpus-sized arrays in executor memory,
    # and repeated invocations leave nothing behind in the CacheManager
    # (the r7 advisor's accumulation finding; an earlier persist here also
    # let identical re-invocations silently serve from cache, which is not
    # a result a benchmark or a retry should get for free).
    bands_cor, arr_cor = build_minhash_band_index(
        corpus_df, id_col, text_col, k_shingle, num_perm, band_size
    )
    return minhash_lsh_match_against_index(
        new_df,
        bands_cor,
        arr_cor,
        id_col,
        text_col,
        k_shingle=k_shingle,
        num_perm=num_perm,
        band_size=band_size,
        threshold=threshold,
        est_min_matches=est_min_matches,
        bucket_cap=bucket_cap,
        # bands were built three lines up with THESE params — the stored-
        # index mismatch the probe guards cannot happen, and the probe's
        # LIMIT-1 job would recompute one partition's signatures per call
        # on the recompute hot path (t05/t40 bench legs)
        _validate_index=False,
    )


def minhash_lsh_match_against_index(
    new_df: DataFrame,
    corpus_bands: DataFrame,
    corpus_verify: DataFrame,
    id_col: str,
    text_col: str,
    k_shingle: int = 5,
    num_perm: int = 16,
    band_size: int = 4,
    threshold: float = 0.7,
    est_min_matches: int | None = None,
    bucket_cap: int | None = None,
    _validate_index: bool = True,
) -> DataFrame:
    """Ingest-match against a PREBUILT corpus index (the two tables from
    ``build_minhash_band_index``, live or read back from parquet). Only
    the NEW batch — small by the ingest contract — pays shingling and
    signature cost; the corpus side is a stored-table scan, and with the
    index partitioned by ``band`` the band equi-join prunes to colliding
    partitions. Identical match set to ``minhash_lsh_match_against`` on
    the same corpus (same layout, same join, same verify ladder).

    Fails LOUDLY on an index/param mismatch (r12 advisor, medium): with a
    matching band layout but a different ``num_perm``, ``zip_with`` over
    different-length sigarr columns yields NULL match counts, the
    ``est_min_matches`` filter drops every candidate, and the call would
    silently return ZERO matches — a silently-wrong dedup result in the
    ingest path. A schema check plus one LIMIT-1 probe of the stored
    index (negligible at ingest-batch frequency) turns that into an
    error naming both values. ``_validate_index=False`` (internal) skips
    the check when the caller just built the tables with these params —
    the recompute wrapper's hot path pays no probe job."""
    if _validate_index:
        got_bv = sorted(
            c for c in corpus_bands.columns
            if c.startswith("bv") and c[2:].isdigit()
        )
        want_bv = sorted(f"bv{j}" for j in range(band_size))
        if got_bv != want_bv:
            raise ValueError(
                f"band index layout mismatch: stored index has band columns "
                f"{got_bv} but band_size={band_size} expects {want_bv} — the "
                f"index was built with different LSH params; rebuild it or "
                f"pass the build-time band_size"
            )
        probe = corpus_bands.select(F.size("sigarr").alias("n")).first()
        if probe is not None and probe["n"] != num_perm:
            raise ValueError(
                f"band index signature mismatch: stored index sigarr has "
                f"{probe['n']} minhash values but num_perm={num_perm} — the "
                f"index was built with a different num_perm; rebuild it or "
                f"pass the build-time num_perm"
            )
    if est_min_matches is None:
        est_min_matches = num_perm // 2
    arr_new = shingle_hash_array(new_df, id_col, text_col, k_shingle)
    arr_cor = corpus_verify
    sig_arr = F.array(*[F.col(f"mh{i}") for i in range(num_perm)])
    bands_new = _band_views(
        signatures_from_array(arr_new, id_col, num_perm),
        id_col, num_perm, band_size, extra_cols=[sig_arr.alias("sigarr")],
    )
    bands_cor = corpus_bands
    cond = F.col("a.band") == F.col("b.band")
    for j in range(band_size):
        cond = cond & (F.col(f"a.bv{j}") == F.col(f"b.bv{j}"))
    if bucket_cap is not None:
        if bucket_cap < 1:
            raise ValueError(f"bucket_cap must be >= 1, got {bucket_cap}")
        bvs = ["band"] + [f"bv{j}" for j in range(band_size)]
        ng = bands_cor.groupBy(*bvs).agg(
            F.expr(
                f"(count(*) + {bucket_cap - 1}) div {bucket_cap}"
            ).alias("__ng")
        )
        b = (
            bands_cor.join(ng, bvs)
            .withColumn("__g", F.pmod(F.hash(F.col(id_col)), F.col("__ng")))
            .alias("b")
        )
        # the new side must reach every corpus group of its bucket — it
        # joins the group counts (bucket-cardinality-sized) and explodes
        a = (
            bands_new.join(ng, bvs)
            .withColumn(
                "__g", F.explode(F.sequence(F.lit(0), F.col("__ng") - 1))
            )
            .alias("a")
        )
        cond = cond & (F.col("a.__g") == F.col("b.__g"))
    else:
        a, b = bands_new.alias("a"), bands_cor.alias("b")
    matches = F.aggregate(
        F.zip_with(
            F.col("a.sigarr"), F.col("b.sigarr"), lambda x, y: (x == y).cast("int")
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    cand = (
        a.join(b, cond)
        .filter(matches >= est_min_matches)
        .select(
            F.col(f"a.{id_col}").alias("new_id"),
            F.col(f"b.{id_col}").alias("corpus_id"),
        )
        .distinct()
    )
    an = arr_new.select(F.col(id_col).alias("new_id"), F.col("hs").alias("ha"))
    bc = arr_cor.select(F.col(id_col).alias("corpus_id"), F.col("hs").alias("hb"))
    inter = F.size(F.array_intersect(F.col("ha"), F.col("hb")))
    jac = (
        cand.join(an, "new_id")
        .join(bc, "corpus_id")
        .select(
            "new_id",
            "corpus_id",
            (
                inter / (F.size(F.col("ha")) + F.size(F.col("hb")) - inter)
            ).alias("jaccard"),
        )
    )
    return jac.filter(F.col("jaccard") >= threshold)
