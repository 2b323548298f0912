"""Text-analysis + deduplication query surface (SURVEY.md §7 M6) over the
``documents`` fixture table.

Spark implementations live in operators/dedup.py and operators/text_ops.py;
this module registers them with DuckDB oracles. Oracle SQL for minhash /
simhash is generated from the same constants (functions/hashing.py) the
Spark plans use, so both engines compute identical integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dask_lightgbm_spark.functions.hashing import (
    MINHASH_COEF,
    MINHASH_PRIME,
    md5_hash32,
    sql_hash32,
    sql_hash60,
    sql_poly_shingle_hash,
)
from dask_lightgbm_spark.functions.partitioning import ensure_parallelism, key_skew_stats
from dask_lightgbm_spark.operators import dedup, text_ops
from dask_lightgbm_spark.operators.dedup import SIMHASH_BITS
from dask_lightgbm_spark.operators.text_ops import LANG_MARKERS
from dask_lightgbm_spark.queries import query
from dask_lightgbm_spark.sources.readers import load_table

NUM_PERM = 16
BAND_SIZE = 4
K_SHINGLE = 5

# ---- shared SQL fragments (mirror the Spark operators exactly) ------------

# per-doc distinct shingle-hash ARRAY, mirroring dedup.shingle_hash_array
# (32-bit rolling hash over char codes — same fold as poly_shingle_hash)
_SQL_SHINGLE_ARR = f"""
arr AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(length(text) - {K_SHINGLE - 1}, 1)),
           g -> {sql_poly_shingle_hash('text', 'g', K_SHINGLE)})) AS hs
  FROM documents
)"""

_minhash_mins = ",\n         ".join(
    f"list_min(list_transform(hs, h -> (h * {a} + {b}) % {MINHASH_PRIME})) AS mh{i}"
    for i, (a, b) in enumerate(MINHASH_COEF[:NUM_PERM])
)
_SQL_MINHASH_WIDE = f"""
m AS (SELECT doc_id,
         {_minhash_mins}
      FROM arr)"""


# ---------------------------------------------------------------------------
# t01/t02 — exact dedup.
# ---------------------------------------------------------------------------

_T01_SQL = """
SELECT COUNT(*) AS n_docs, COUNT(DISTINCT md5(text)) AS n_unique FROM documents
"""


@query("t01_dedup_exact_stats", _T01_SQL)
def t01_dedup_exact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5("text")).alias("n_unique"),
    )


_T02_SQL = """
SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
FROM documents GROUP BY md5(text)
"""


@query("t02_dedup_exact_groups", _T02_SQL)
def t02_dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dedup.exact_dedup_groups(d, "doc_id", "text")


# ---------------------------------------------------------------------------
# t03 — exact n-gram Jaccard near-dup pairs (bounded doc subset; the
# unbounded scale path is t05).
# ---------------------------------------------------------------------------

_T03_SQL = """
WITH sub AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
sh3 AS (
  SELECT DISTINCT doc_id, substr(text, g, 3) AS shingle
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, greatest(length(text) - 2, 1))) AS g FROM sub)
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh3 GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
  FROM sh3 a JOIN sh3 b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, inter / (sa.n + sb.n - inter) AS jaccard
FROM inter JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
WHERE inter / (sa.n + sb.n - inter) >= 0.5
"""


@query("t03_ngram_jaccard_pairs", _T03_SQL)
def t03_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return dedup.ngram_jaccard_pairs(d, "doc_id", "text", k=3, threshold=0.5)


# ---------------------------------------------------------------------------
# t04 — minhash signatures (long format: doc_id, perm, minhash).
# ---------------------------------------------------------------------------

_T04_SQL = (
    "WITH" + _SQL_SHINGLE_ARR + "," + _SQL_MINHASH_WIDE
    + "\n"
    + "\nUNION ALL\n".join(
        f"SELECT doc_id, {i} AS perm, mh{i} AS minhash FROM m" for i in range(NUM_PERM)
    )
)


@query("t04_minhash_signatures", _T04_SQL)
def t04_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    sig = dedup.minhash_signatures(d, "doc_id", "text", K_SHINGLE, NUM_PERM)
    stack = ", ".join(f"{i}, mh{i}" for i in range(NUM_PERM))
    return sig.selectExpr(
        "doc_id", f"stack({NUM_PERM}, {stack}) AS (perm, minhash)"
    ).select("doc_id", F.col("perm").cast("int").alias("perm"), "minhash")


# ---------------------------------------------------------------------------
# t05 — MinHash-LSH near-dup pipeline (the 100 TB dedup path): bands →
# candidates → exact-Jaccard verify.
# ---------------------------------------------------------------------------

_bands_sql = "\nUNION ALL\n".join(
    f"SELECT doc_id, {b} AS band, "
    + ", ".join(f"mh{b * BAND_SIZE + j} AS bv{j}" for j in range(BAND_SIZE))
    + " FROM m"
    for b in range(NUM_PERM // BAND_SIZE)
)

_est_matches = " + ".join(
    f"CASE WHEN ma.mh{i} = mb.mh{i} THEN 1 ELSE 0 END" for i in range(NUM_PERM)
)

_T05_SQL = (
    "WITH" + _SQL_SHINGLE_ARR + "," + _SQL_MINHASH_WIDE + f""",
bands AS ({_bands_sql}),
cand0 AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bv0 = b.bv0 AND a.bv1 = b.bv1 AND a.bv2 = b.bv2 AND a.bv3 = b.bv3 AND a.doc_id < b.doc_id
),
cand AS (
  SELECT id_a, id_b FROM cand0
  JOIN m ma ON ma.doc_id = id_a
  JOIN m mb ON mb.doc_id = id_b
  WHERE ({_est_matches}) >= {NUM_PERM // 2}
),
verified AS (
  SELECT c.id_a, c.id_b,
         len(list_intersect(a.hs, b.hs)) AS inter,
         len(a.hs) AS na, len(b.hs) AS nb
  FROM cand c
  JOIN arr a ON a.doc_id = c.id_a
  JOIN arr b ON b.doc_id = c.id_b
)
SELECT id_a, id_b, inter / (na + nb - inter) AS jaccard
FROM verified
WHERE inter / (na + nb - inter) >= 0.7
"""
)


@query("t05_minhash_lsh_neardup", _T05_SQL)
def t05_minhash_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_neardup(
        d, "doc_id", "text", K_SHINGLE, NUM_PERM, BAND_SIZE, threshold=0.7
    )


# ---------------------------------------------------------------------------
# t06/t07 — SimHash signatures + hamming near-dup (pigeonhole block join).
# Oracle for t07 uses all-pairs hamming (identical result by pigeonhole,
# simpler SQL; the Spark side uses the scalable blocked join).
# ---------------------------------------------------------------------------

# row-local twin of dedup.simhash: per-doc token-hash list, 60 list_sum
# folds (integer addition — order-free), bit-pack. list aliases mirror the
# Spark plan exactly.
_SQL_TOKHASH_ARR = rf"""
tharr AS (
  SELECT doc_id,
         list_transform(
           list_distinct(list_filter(string_split_regex(trim(text), '[ \t\n\f\r]+'), x -> x <> '')),
           t -> {sql_hash60('t')}) AS th
  FROM documents
)"""

_bitsums = ",\n         ".join(
    f"CAST(list_sum(list_transform(th, h -> CASE WHEN (h >> {j}) & 1 = 1 "
    f"THEN 1 ELSE -1 END)) AS BIGINT) AS b{j}"
    for j in range(SIMHASH_BITS)
)
_simexpr = " + ".join(
    f"CASE WHEN b{j} > 0 THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    for j in range(SIMHASH_BITS)
)

_T06_SQL = (
    "WITH" + _SQL_TOKHASH_ARR + f""",
sums AS (SELECT doc_id,
         {_bitsums}
         FROM tharr)
SELECT doc_id, CAST({_simexpr} AS BIGINT) AS simhash FROM sums
"""
)


@query("t06_simhash", _T06_SQL)
def t06_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dedup.simhash(d, "doc_id", "text")


_T07_SQL = (
    "WITH" + _SQL_TOKHASH_ARR + f""",
sums AS (SELECT doc_id,
         {_bitsums}
         FROM tharr),
sig AS (SELECT doc_id, CAST({_simexpr} AS BIGINT) AS simhash FROM sums)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""
)


@query("t07_simhash_neardup", _T07_SQL)
def t07_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dedup.simhash_neardup_pairs(d, "doc_id", "text", max_hamming=3)


# ---------------------------------------------------------------------------
# t08 — language-ID heuristic (marker-token argmax; see operators/text_ops
# for the honest caveat about the synthetic corpus).
# ---------------------------------------------------------------------------


def _sql_marker_count(markers: list[str]) -> str:
    conds = " OR ".join(f"x = '{m}'" for m in markers)
    return (
        r"len(list_filter(list_filter("
        r"string_split_regex(trim(text), '[ \t\n\f\r]+'), x -> x <> ''), "
        f"x -> {conds}))"
    )


_langs = sorted(LANG_MARKERS)
_score_cols = ",\n       ".join(
    f"{_sql_marker_count(LANG_MARKERS[lang])} AS s_{lang}" for lang in _langs
)
_case_chain = "\n            ".join(
    "WHEN "
    + " AND ".join(f"s_{lang} >= s_{other}" for other in _langs if other != lang)
    + f" THEN '{lang}'"
    for lang in _langs
)

_T08_SQL = f"""
WITH scored AS (
  SELECT doc_id, lang,
       {_score_cols}
  FROM documents
)
SELECT doc_id, lang,
       CASE {_case_chain}
            ELSE '{_langs[0]}' END AS pred_lang
FROM scored
"""


@query("t08_lang_id", _T08_SQL)
def t08_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return text_ops.lang_id(d, "doc_id", "text", truth_col="lang")


# ---------------------------------------------------------------------------
# t09 — per-doc quality features (exact-int ratios).
# ---------------------------------------------------------------------------

_stop_cond = " OR ".join(f"x = '{m}'" for m in ["the", "a", "of", "and"])

_T09_SQL = rf"""
WITH base AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(len(list_filter(string_split_regex(trim(text), '[ \t\n\f\r]+'), x -> x <> '')) AS BIGINT) AS n_tokens,
         CAST(length(regexp_replace(text, '\s', '', 'g')) AS BIGINT) AS n_nonspace,
         CAST(len(list_filter(list_filter(string_split_regex(trim(text), '[ \t\n\f\r]+'), x -> x <> ''), x -> {_stop_cond})) AS BIGINT) AS stop_toks
  FROM documents
)
SELECT doc_id, n_chars, n_tokens,
       n_nonspace / n_tokens AS avg_token_len,
       (n_chars - n_nonspace) / n_chars AS space_ratio,
       stop_toks / n_tokens AS stop_ratio
FROM base
"""


@query("t09_text_quality", _T09_SQL)
def t09_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return text_ops.text_quality(d, "doc_id", "text")


# ---------------------------------------------------------------------------
# t10 — token stats per source.
# ---------------------------------------------------------------------------

_T10_SQL = r"""
WITH base AS (
  SELECT source,
         CAST(len(list_filter(string_split_regex(trim(text), '[ \t\n\f\r]+'), x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(n_tokens) AS BIGINT) / COUNT(*) AS avg_tokens,
       MAX(n_tokens) AS max_tokens
FROM base GROUP BY source
"""


@query("t10_token_stats", _T10_SQL)
def t10_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    nt = text_ops.token_count(F.col("text"))
    return (
        d.select("source", nt.alias("n_tokens"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            (F.sum("n_tokens") / F.count(F.lit(1))).alias("avg_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# t11 — normalized-content fingerprint.
# ---------------------------------------------------------------------------

_T11_SQL = r"""
SELECT doc_id, md5(lower(trim(regexp_replace(text, '[ \t\n\f\r]+', ' ', 'g')))) AS fp
FROM documents
"""


@query("t11_fingerprint", _T11_SQL)
def t11_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return text_ops.fingerprint(d, "doc_id", "text")


# ---------------------------------------------------------------------------
# t12 — multimodal column plumbing: binary payload + typed metadata
# (decode/feature-extraction stubs live in operators/multimodal.py; this
# query checks the schema/byte-level plumbing the stubs ride on).
# ---------------------------------------------------------------------------

_T12_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       CAST(length(text) AS BIGINT) AS char_len,
       md5(text) AS content_hash
FROM documents
"""


@query("t12_multimodal_meta", _T12_SQL)
def t12_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dask_lightgbm_spark.operators.multimodal import binary_metadata

    d = load_table(spark, sf_dir, "documents")
    return binary_metadata(d, "doc_id", "text")


# ---------------------------------------------------------------------------
# t13 — TF-IDF-style term scoring, log-free for oracle exactness: score =
# tf · N/df (exact integer counts + one division). Top-3 terms per doc with
# deterministic tie-break. The shape is the classic two-pass corpus
# statistic: per-doc term counts (row-local) ⋈ document frequencies (one
# small aggregation), both shuffle-light at scale.
# ---------------------------------------------------------------------------

_T13_SQL = r"""
WITH tok AS (
  SELECT doc_id, t AS term FROM (
    SELECT doc_id, unnest(list_filter(string_split_regex(trim(text), '[ \t\n\f\r]+'), x -> x <> '')) AS t
    FROM documents
  )
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, term FROM tok) GROUP BY term),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, CAST(tf.tf AS BIGINT) AS tf,
         tf.tf * (n.n_docs / df.df) AS tfidf
  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
),
ranked AS (
  SELECT doc_id, term, tf, tfidf,
         CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS INTEGER) AS rnk
  FROM scored
)
SELECT doc_id, term, tf, tfidf, rnk FROM ranked WHERE rnk <= 3
"""


@query("t13_tfidf_topterms", _T13_SQL)
def t13_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.trim(F.col("text")), r"[ \t\n\f\r]+"), lambda x: x != "")
        ).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = toks.distinct().groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # corpus size as a broadcast 1-row aggregate: keeps the query fully lazy
    # (a driver-side d.count() here would run a Spark job at plan-build time)
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        # df_ is VOCABULARY-sized (grows with the corpus) — no broadcast
        # hint; the planner broadcasts it while under the threshold and
        # shuffle-joins on term at the scale where it no longer fits
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            (F.col("tf") * (F.col("n_docs") / F.col("df"))).alias("tfidf"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "tf", "tfidf", "rnk")
    )


# ---------------------------------------------------------------------------
# t14 — dedup GROUPS: connected components over the MinHash-LSH near-dup
# pairs (iterative label propagation on Spark; recursive-CTE transitive
# closure in the oracle — both assign each doc the min reachable doc_id).
# ---------------------------------------------------------------------------

# shared transitive-closure prefix ending at comp(doc_id, min_reach) —
# t14 selects the per-doc component label; t31 picks each component's
# representative document on top of the same closure
_T14_CTES = (
    "WITH RECURSIVE" + _SQL_SHINGLE_ARR + "," + _SQL_MINHASH_WIDE + f""",
bands AS ({_bands_sql}),
cand0 AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bv0 = b.bv0 AND a.bv1 = b.bv1 AND a.bv2 = b.bv2 AND a.bv3 = b.bv3 AND a.doc_id < b.doc_id
),
cand AS (
  SELECT id_a, id_b FROM cand0
  JOIN m ma ON ma.doc_id = id_a
  JOIN m mb ON mb.doc_id = id_b
  WHERE ({_est_matches}) >= {NUM_PERM // 2}
),
edges AS (
  SELECT c.id_a, c.id_b
  FROM cand c JOIN arr a ON a.doc_id = c.id_a JOIN arr b ON b.doc_id = c.id_b
  WHERE len(list_intersect(a.hs, b.hs))
        / (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs))) >= 0.7
),
sym AS (SELECT id_a AS a, id_b AS b FROM edges UNION SELECT id_b, id_a FROM edges),
reach(a, b) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
),
comp AS (SELECT a AS doc_id, MIN(b) AS min_reach FROM reach GROUP BY a)"""
)

_T14_SQL = (
    _T14_CTES
    + """
SELECT d.doc_id,
       CAST(COALESCE(LEAST(c.doc_id, c.min_reach), d.doc_id) AS BIGINT) AS component
FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
"""
)


@query("t14_dedup_components", _T14_SQL)
def t14_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dask_lightgbm_spark.operators.components import connected_components

    d = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_neardup(
        d, "doc_id", "text", K_SHINGLE, NUM_PERM, BAND_SIZE, threshold=0.7
    ).select("id_a", "id_b")
    return connected_components(pairs, d.select("doc_id"))


# ---------------------------------------------------------------------------
# t15 — repetition detection: fraction of duplicated word 3-grams per doc
# (1 - distinct/total) — a standard LLM-data quality signal for boilerplate
# and degenerate repetition. Row-local (token array → n-gram array →
# distinct), exact-int division.
# ---------------------------------------------------------------------------

_T15_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '[ \t\n\f\r]+'), x -> x <> '') AS ws
  FROM documents
),
grams AS (
  SELECT doc_id,
         list_transform(generate_series(1, greatest(len(ws) - 2, 0)),
                        g -> ws[g] || ' ' || ws[g+1] || ' ' || ws[g+2]) AS ng
  FROM toks
)
SELECT doc_id,
       CAST(len(ng) AS BIGINT) AS n_grams,
       CAST(len(list_distinct(ng)) AS BIGINT) AS n_distinct,
       CASE WHEN len(ng) > 0
            THEN 1.0 - len(list_distinct(ng)) / len(ng)
            ELSE 0.0 END AS rep_ratio
FROM grams
"""


@query("t15_repetition_ratio", _T15_SQL)
def t15_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    ws = F.filter(F.split(F.trim(F.col("text")), r"[ \t\n\f\r]+"), lambda x: x != "")
    d = d.select("doc_id", ws.alias("ws"))
    # guard: Spark's sequence(1, 0) is the DESCENDING [1, 0], not [] (DuckDB
    # generate_series(1,0) IS empty) — docs under 3 tokens need an explicit
    # empty array or element_at walks off the end
    ng = F.when(
        F.size("ws") >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size("ws") - 2),
            lambda g: F.concat_ws(
                " ",
                F.element_at(F.col("ws"), g),
                F.element_at(F.col("ws"), g + F.lit(1)),
                F.element_at(F.col("ws"), g + F.lit(2)),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    d = d.select("doc_id", ng.alias("ng"))
    n = F.size("ng").cast("long")
    nd = F.size(F.array_distinct("ng")).cast("long")
    return d.select(
        "doc_id",
        n.alias("n_grams"),
        nd.alias("n_distinct"),
        F.when(n > 0, F.lit(1.0) - nd / n).otherwise(F.lit(0.0)).alias("rep_ratio"),
    )


# ---------------------------------------------------------------------------
# t16 — corpus token-frequency / Zipf profile: top-25 tokens with rank and
# relative frequency. The canonical vocabulary statistic a training-data
# pipeline computes before filtering; exact ints + one division → oracle
# bit-parity. At scale: explode feeds a map-side partial count, shuffle
# carries one row per distinct token, top-k via a single window over the
# (small) vocabulary.
# ---------------------------------------------------------------------------

_T16_SQL = r"""
WITH tok AS (
  SELECT t AS token FROM (
    SELECT unnest(list_filter(string_split_regex(trim(text), '[ \t\n\f\r]+'), x -> x <> '')) AS t
    FROM documents
  )
),
counts AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY token),
total AS (SELECT SUM(n) AS total FROM counts),
ranked AS (
  SELECT token, CAST(n AS BIGINT) AS n,
         CAST(row_number() OVER (ORDER BY n DESC, token) AS INTEGER) AS rnk
  FROM counts
)
SELECT token, n, rnk, n / total.total AS freq
FROM ranked CROSS JOIN total WHERE rnk <= 25
"""


@query("t16_token_zipf", _T16_SQL)
def t16_token_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(
            F.filter(F.split(F.trim(F.col("text")), r"[ \t\n\f\r]+"), lambda x: x != "")
        ).alias("token")
    )
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("total"))
    # two-level top-25: a bare global rank window would sort the whole
    # vocabulary on one task; grouped_topk's final window sees ≤ salt×25
    from dask_lightgbm_spark.functions.partitioning import grouped_topk

    return (
        grouped_topk(
            counts, [], [F.desc("n"), F.asc("token")], 25, salt_on=["token"]
        )
        .withColumn("rnk", F.col("__rank").cast("int"))
        .crossJoin(F.broadcast(total))
        .select("token", "n", "rnk", (F.col("n") / F.col("total")).alias("freq"))
    )


# ---------------------------------------------------------------------------
# t17 — deterministic train/val/test split: bucket = md5-hash(doc_id) mod
# 100 → 80/10/10. Hash-based (not rand()) so the split is reproducible
# across engines, runs, and cluster sizes — the correct way to split a
# 100 TB corpus (a seeded rand() is partition-order-dependent in Spark).
# Oracle computes the identical buckets, so the gate checks membership
# exactly, not just proportions.
# ---------------------------------------------------------------------------

_T17_SQL = f"""
WITH b AS (
  SELECT doc_id, lang,
         ({sql_hash32("CAST(doc_id AS VARCHAR)")}) % 100 AS bucket
  FROM documents
),
s AS (
  SELECT doc_id, lang,
         CASE WHEN bucket < 80 THEN 'train'
              WHEN bucket < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM b
)
SELECT split, lang, COUNT(*) AS n, MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
FROM s GROUP BY split, lang
"""


@query("t17_deterministic_split", _T17_SQL)
def t17_deterministic_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dask_lightgbm_spark.functions.hashing import md5_hash32

    d = load_table(spark, sf_dir, "documents")
    bucket = md5_hash32(F.col("doc_id").cast("string")) % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        d.select("doc_id", "lang", split.alias("split"))
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
    )


# ---------------------------------------------------------------------------
# t18 — PII-ish pattern scan (emails / URLs): the redaction-stage statistic
# of a training-data pipeline. Patterns stay within the regex subset Java
# and RE2 interpret identically (character classes, alternation, bounded
# repetition — no lookaround/backrefs), probed cross-engine in CI.
# Row-local regexp scan → one tiny aggregation; scales linearly.
# ---------------------------------------------------------------------------

_EMAIL_RX = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_URL_RX = r"https?://[^ ]+"

_T18_SQL = f"""
WITH scanned AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{_EMAIL_RX}')) AS n_emails,
         len(regexp_extract_all(text, '{_URL_RX}')) AS n_urls
  FROM documents
)
SELECT COUNT(*) AS n_docs,
       CAST(SUM(n_emails) AS BIGINT) AS total_emails,
       CAST(SUM(n_urls) AS BIGINT) AS total_urls,
       CAST(SUM(CASE WHEN n_emails + n_urls > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_flagged
FROM scanned
"""


@query("t18_pii_scan", _T18_SQL)
def t18_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    n_emails = F.size(F.regexp_extract_all("text", F.lit(_EMAIL_RX), F.lit(0)))
    n_urls = F.size(F.regexp_extract_all("text", F.lit(_URL_RX), F.lit(0)))
    scanned = d.select(
        n_emails.alias("n_emails"), n_urls.alias("n_urls")
    )
    return scanned.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_emails").cast("long").alias("total_emails"),
        F.sum("n_urls").cast("long").alias("total_urls"),
        F.sum(((F.col("n_emails") + F.col("n_urls")) > 0).cast("long"))
        .cast("long")
        .alias("docs_flagged"),
    )


# ---------------------------------------------------------------------------
# t19 — cross-corpus decontamination: scan the TRAIN corpus for character
# k-gram overlap with a (small) EVAL set — the standard train/test
# contamination check in LLM data pipelines. Scale shape: the eval shingle
# set is distinct'd and BROADCAST (eval sets are small by nature), the train
# side streams through a map-side hash join, and the only shuffle carries
# matched (doc, shingle) rows into a per-doc count. No all-pairs anywhere;
# train volume can be 100 TB.
# ---------------------------------------------------------------------------

_t19_shingles = f"""
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(length(text) - {K_SHINGLE - 1}, 1)),
           g -> {sql_poly_shingle_hash('text', 'g', K_SHINGLE)})) AS hs
  FROM documents
"""

_T19_SQL = f"""
WITH tarr AS ({_t19_shingles} WHERE doc_id % 20 <> 0),
earr AS ({_t19_shingles} WHERE doc_id % 20 = 0),
ev AS (SELECT DISTINCT unnest(hs) AS h FROM earr),
tsh AS (SELECT doc_id, unnest(hs) AS h FROM tarr),
ov AS (
  SELECT doc_id, COUNT(*) AS n_overlap FROM tsh JOIN ev USING (h) GROUP BY doc_id
),
sz AS (SELECT doc_id, CAST(len(hs) AS BIGINT) AS n_shingles FROM tarr)
SELECT sz.doc_id, sz.n_shingles,
       CAST(COALESCE(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
       COALESCE(ov.n_overlap, 0) * 5 >= sz.n_shingles AS contaminated
FROM sz LEFT JOIN ov ON sz.doc_id = ov.doc_id
ORDER BY sz.doc_id
"""


def _t19_distributed(tr: DataFrame, ev: DataFrame) -> DataFrame:
    """Driver-budget fallback branch of t19: every stage distributed, no
    driver-resident shingle set. The eval split's distinct shingles come
    from a shuffled distinct; per-doc size rides the explode (every doc
    yields >= 1 shingle, so the explode drops no doc) and one LEFT join +
    groupBy answers size and overlap together. The eval side of the join
    is pinned shuffle_hash: both sides are kernel (mapInArrow) outputs
    whose default stats could otherwise flip a corpus-sized relation into
    a driver-serial broadcast build (the r15 t40 lesson). Results are
    identical to the gathered-set branch: same distinct shingle values,
    same binary membership, same exact-int counts."""
    ev_h = (
        dedup.shingle_hash_array(ev, "doc_id", "text", K_SHINGLE)
        .select(F.explode("hs").alias("h"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    tsh = dedup.shingle_hash_array(tr, "doc_id", "text", K_SHINGLE).select(
        "doc_id",
        F.size("hs").cast("long").alias("n_shingles"),
        F.explode("hs").alias("h"),
    )
    return (
        tsh.join(ev_h.hint("shuffle_hash"), "h", "left")
        .groupBy("doc_id")
        .agg(
            F.max("n_shingles").alias("n_shingles"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("long").alias("n_overlap"),
        )
        .withColumn("contaminated", F.col("n_overlap") * 5 >= F.col("n_shingles"))
        .orderBy("doc_id")
    )


@query("t19_decontamination", _T19_SQL)
def t19_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination: per train doc, the count of its distinct
    char 5-gram shingles that also appear anywhere in the eval split
    (doc_id % 20 == 0), plus a >=20% overlap flag (integer-exact compare).

    Topology (r15, guide §1.2 / §4.2): the eval split's distinct shingle
    set — small by nature, and ALREADY collected driver-side by the
    previous plan's BroadcastExchange — is gathered once (per-partition
    uniques union'd by np.unique) and rebroadcast as a sorted int64 array;
    the train side then answers size AND overlap from ONE fused mapInArrow
    pass (shingle kernel + searchsorted membership + segmented count).
    This removes the eval-side distinct exchange, the train-side explode
    (|text| rows per doc), the broadcast hash join, and the per-doc groupBy
    exchange — output is one row per train doc straight from the kernel.
    Overlap counts distinct train shingles found in the eval set, exactly
    the exploded-join COUNT(*) the oracle computes (hs is distinct per
    doc; membership is binary). The driver holds the eval set either way
    (broadcast relations are driver-built), so the scale bound is
    unchanged: eval corpus << train corpus.

    Scale gate (r16, closes the r15 verdict's #3): an eval split whose
    plan-size estimate exceeds ``SPARK_GRAFT_T19_DRIVER_BYTES`` (default
    256 MiB) would not fit the driver in EITHER historical plan — such
    inputs take :func:`_t19_distributed`, a fully shuffled join plan with
    no driver residency on any side (both branches produce identical
    results; tests/test_text.py pins branch equality)."""
    import os

    from dask_lightgbm_spark.functions.partitioning import _plan_size_bytes

    d = load_table(spark, sf_dir, "documents")
    tr = d.filter(F.col("doc_id") % 20 != 0)
    ev = d.filter(F.col("doc_id") % 20 == 0)

    budget = int(os.environ.get("SPARK_GRAFT_T19_DRIVER_BYTES", 256 << 20))
    est = _plan_size_bytes(ev.select("text"))
    if est is None or est < 0 or est > budget:
        # conservative on missing stats: never gamble driver memory
        return _t19_distributed(tr, ev)

    # --- phase 1: eval shingle set, per-partition uniques -> driver union
    def ev_kernel(batches):
        import numpy as np
        import pyarrow as pa

        from dask_lightgbm_spark.functions.shingle_kernel import (
            shingle_hashes_flat_arrow,
        )

        for batch in batches:
            values, _ = shingle_hashes_flat_arrow(batch.column(0), K_SHINGLE)
            yield pa.RecordBatch.from_arrays(
                [pa.array(np.unique(values), type=pa.int64())], ["h"]
            )

    import numpy as np

    ev_parts = (
        ensure_parallelism(ev.select("text"))
        .mapInArrow(ev_kernel, T.StructType([T.StructField("h", T.LongType())]))
        .toArrow()
    )
    ev_set = np.unique(np.asarray(ev_parts.column("h"), dtype=np.int64))
    b_ev = spark.sparkContext.broadcast(ev_set)

    # --- phase 2: fused shingle + membership count over the train split
    def tr_kernel(batches):
        import numpy as np
        import pyarrow as pa

        from dask_lightgbm_spark.functions.shingle_kernel import (
            shingle_hashes_flat_arrow,
        )

        ev_sorted = b_ev.value
        for batch in batches:
            ids = batch.column(0)
            values, offsets = shingle_hashes_flat_arrow(batch.column(1), K_SHINGLE)
            n_sh = offsets[1:] - offsets[:-1]
            if len(values) and len(ev_sorted):
                idx = np.searchsorted(ev_sorted, values)
                idx[idx == len(ev_sorted)] = 0
                hit = ev_sorted[idx] == values
                doc_of = np.repeat(np.arange(len(n_sh), dtype=np.int64), n_sh)
                n_ov = np.bincount(doc_of[hit], minlength=len(n_sh)).astype(np.int64)
            else:
                n_ov = np.zeros(len(n_sh), dtype=np.int64)
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array(n_sh, type=pa.int64()),
                    pa.array(n_ov, type=pa.int64()),
                    pa.array(n_ov * 5 >= n_sh),
                ],
                ["doc_id", "n_shingles", "n_overlap", "contaminated"],
            )

    out_schema = T.StructType(
        [
            tr.schema["doc_id"],
            T.StructField("n_shingles", T.LongType()),
            T.StructField("n_overlap", T.LongType()),
            T.StructField("contaminated", T.BooleanType()),
        ]
    )
    src = tr.select("doc_id", "text")
    target = spark.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < target:
        # narrow input needs a parallelism spread anyway — make the spread
        # exchange RANGE-partitioned on the output sort key so the final
        # ORDER BY is satisfied by construction (ranged partitions + local
        # sort; the kernel is row-order-preserving). A sort AFTER the
        # kernel costs a second kernel execution: the range partitioner's
        # sampling job re-runs the sort's child, which includes the
        # MapInArrow (measured 1.82 s -> 1.05 s at sf0.1). The trailing
        # sortWithinPartitions is a no-op-cost local sort that puts the
        # ordering in the plan explicitly.
        return (
            src.repartitionByRange(target, "doc_id")
            .sortWithinPartitions("doc_id")
            .mapInArrow(tr_kernel, out_schema)
            .sortWithinPartitions("doc_id")
        )
    # wide (at-scale) input: leave the scan partitioning alone — an extra
    # full-corpus range shuffle of (doc_id, text) would dwarf the narrow
    # 4-column output sort the classic plan pays.
    return src.mapInArrow(tr_kernel, out_schema).orderBy("doc_id")


# ---------------------------------------------------------------------------
# t20 — corpus-cleaning composite: the canonical training-data pipeline
# (exact dedup keep-list ∘ token-count quality floor) with per-source
# retention accounting. Each stage is one shuffle (dedup groupBy, keep-list
# join, final per-source agg); nothing quadratic, nothing driver-side.
# ---------------------------------------------------------------------------

_T20_SQL = r"""
WITH k AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
u AS (SELECT d.* FROM documents d JOIN k USING (doc_id)),
q AS (
  SELECT * FROM u
  WHERE len(list_filter(string_split_regex(trim(text), '[ \t\n\f\r]+'),
            x -> x <> '')) >= 30
),
t AS (SELECT source, COUNT(*) AS n_total FROM documents GROUP BY source),
uu AS (SELECT source, COUNT(*) AS n_unique FROM u GROUP BY source),
qq AS (SELECT source, COUNT(*) AS n_kept FROM q GROUP BY source)
SELECT t.source, t.n_total,
       CAST(COALESCE(uu.n_unique, 0) AS BIGINT) AS n_unique,
       CAST(COALESCE(qq.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(COALESCE(qq.n_kept, 0) AS DOUBLE) / CAST(t.n_total AS DOUBLE)
         AS retention
FROM t LEFT JOIN uu ON t.source = uu.source LEFT JOIN qq ON t.source = qq.source
ORDER BY t.source
"""


@query("t20_cleaning_pipeline", _T20_SQL)
def t20_cleaning_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source retention through the cleaning pipeline: exact-dedup
    survivors (min doc_id per content hash) filtered by a >=30-token
    quality floor; retention = kept/total (single IEEE division, identical
    operands both engines)."""
    from dask_lightgbm_spark.operators import text_ops

    d = load_table(spark, sf_dir, "documents")
    keep = dedup.exact_dedup_groups(d, "doc_id", "text").select(
        F.col("keep_id").alias("doc_id")
    )
    u = d.join(keep, "doc_id")
    q = u.filter(text_ops.token_count(F.col("text")) >= 30)
    t = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_total"))
    uu = u.groupBy("source").agg(F.count(F.lit(1)).alias("__nu"))
    qq = q.groupBy("source").agg(F.count(F.lit(1)).alias("__nk"))
    return (
        t.join(uu, "source", "left")
        .join(qq, "source", "left")
        .select(
            "source",
            "n_total",
            F.coalesce("__nu", F.lit(0)).cast("long").alias("n_unique"),
            F.coalesce("__nk", F.lit(0)).cast("long").alias("n_kept"),
            (
                F.coalesce("__nk", F.lit(0)).cast("double")
                / F.col("n_total").cast("double")
            ).alias("retention"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# t21 — cross-document boilerplate n-grams (CCNet-style): token 3-grams
# appearing in >= 2 distinct docs of the same source — the discovery stage
# of boilerplate stripping (headers, footers, templates). Per-doc distinct
# grams are built row-locally (one projection, no shuffle); the only
# shuffle is the (source, gram) count. Linear in corpus size.
# ---------------------------------------------------------------------------

_T21_SQL = r"""
WITH toks AS (
  SELECT doc_id, source,
         list_filter(string_split_regex(trim(text), '[ \t\n\f\r]+'),
                     x -> x <> '') AS t
  FROM documents
),
grams AS (
  SELECT doc_id, source,
         unnest(list_distinct(CASE WHEN len(t) >= 3 THEN
           list_transform(generate_series(1, len(t) - 2),
                          i -> array_to_string(list_slice(t, i, i + 2), ' '))
           ELSE [] END)) AS gram
  FROM toks
)
SELECT source, gram, COUNT(*) AS n_docs
FROM grams GROUP BY source, gram
HAVING COUNT(*) >= 2
ORDER BY source, gram
"""


@query("t21_boilerplate_ngrams", _T21_SQL)
def t21_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token 3-grams shared by >= 2 docs within a source (boilerplate
    discovery). Distinct-per-doc grams keep the count = distinct docs
    without a COUNT(DISTINCT) shuffle."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.trim(F.col("text")), r"[ \t\n\f\r]+"), lambda x: x != "")
    grams = F.when(
        F.size(toks) >= 3,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 2),
                lambda i: F.array_join(F.slice(toks, i, 3), " "),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        d.select("doc_id", "source", F.explode(grams).alias("gram"))
        .groupBy("source", "gram")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .orderBy("source", "gram")
    )


# ---------------------------------------------------------------------------
# t22 — training-mixture allocation: split a fixed token budget across
# sources proportionally to their token counts using the largest-remainder
# method — entirely int64 arithmetic (floor-division shares + remainder
# ranking), so the allocation is bit-identical across engines and runs.
# The heavy stage is one per-source token-count agg; the allocation itself
# is a 20-row window. This is the "mix ratios" step of corpus assembly.
# ---------------------------------------------------------------------------

_T22_BUDGET = 100_000

_T22_SQL = rf"""
WITH tok AS (
  SELECT source,
         CAST(SUM(CAST(len(list_filter(string_split_regex(trim(text), '[ \t\n\f\r]+'),
                 x -> x <> '')) AS BIGINT)) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total FROM tok),
base AS (
  SELECT source, n_tokens,
         ({_T22_BUDGET} * n_tokens) // total AS base_alloc,
         ({_T22_BUDGET} * n_tokens) % total AS rem
  FROM tok, tot
),
ranked AS (
  SELECT source, n_tokens, base_alloc,
         row_number() OVER (ORDER BY rem DESC, source) AS rk,
         {_T22_BUDGET} - SUM(base_alloc) OVER () AS leftover
  FROM base
)
SELECT source, n_tokens,
       CAST(base_alloc + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
         AS alloc_tokens
FROM ranked
ORDER BY source
"""


@query("t22_mixture_allocation", _T22_SQL)
def t22_mixture_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder allocation of a 100k-token budget across sources,
    proportional to measured token mass — exact integer arithmetic; the
    allocations sum to the budget by construction."""
    from dask_lightgbm_spark.functions.partitioning import (
        largest_remainder_allocation,
    )

    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.trim(F.col("text")), r"[ \t\n\f\r]+"), lambda x: x != "")
    tok = d.select("source", F.size(toks).cast("long").alias("__nt")).groupBy(
        "source"
    ).agg(F.sum("__nt").alias("n_tokens"))
    out = largest_remainder_allocation(tok, "source", "n_tokens", _T22_BUDGET)
    return out.select(
        "source", "n_tokens", F.col("allocation").alias("alloc_tokens")
    ).orderBy("source")


# ---------------------------------------------------------------------------
# t23 — deterministic per-group sampling: k docs per source chosen by hash
# order (md5 of the id) — reproducible subsampling with no RNG state, the
# standard way to cut a stable dev subset from a moving corpus. One window
# per source partition; no global sort.
# ---------------------------------------------------------------------------

_T23_SQL = """
SELECT source, doc_id FROM (
  SELECT source, doc_id,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
) WHERE rn <= 5
ORDER BY source, doc_id
"""


@query("t23_hash_sample_per_source", _T23_SQL)
def t23_hash_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5 docs per source in md5(doc_id) order — deterministic, seedless,
    stable under corpus growth for unchanged ids."""

    from dask_lightgbm_spark.functions.partitioning import grouped_topk

    d = load_table(spark, sf_dir, "documents")
    # two-level bottom-5 in hash order: a handful of sources means a plain
    # window sorts a source's whole corpus share on one task
    return (
        grouped_topk(
            d.select("source", "doc_id"),
            ["source"],
            [F.md5(F.col("doc_id").cast("string")), F.col("doc_id")],
            5,
            salt_on=["doc_id"],
        )
        .select("source", "doc_id")
        .orderBy("source", "doc_id")
    )


# ---------------------------------------------------------------------------
# t24 — multimodal feature-extraction path, driver-verified: the REAL
# mapInPandas Arrow kernel (operators/multimodal.py:extract_features, the
# stub "decoder" = deterministic byte histogram) runs on binary payloads
# attached from text, and its per-bucket shares are converted back to exact
# integer byte counts, which DuckDB recomputes character-by-character. This
# puts the Pandas-UDF multimodal plumbing itself under the bit-exact gate
# (previously pytest-only). Fixture text is pure ASCII, so UTF-8 bytes ==
# codepoints and ascii() is the byte value on both engines.
# ---------------------------------------------------------------------------

_T24_SQL = """
WITH codes AS (
  SELECT doc_id, length(text) AS n_bytes,
         list_transform(generate_series(1, length(text)),
                        i -> ascii(substr(text, i, 1)) % 8) AS m
  FROM documents
)
SELECT doc_id, g.j AS bucket,
       CAST(len(list_filter(m, x -> x = g.j)) AS BIGINT) AS cnt,
       CAST(n_bytes AS BIGINT) AS n_bytes
FROM codes, generate_series(0, 7) AS g(j)
ORDER BY doc_id, bucket
"""


@query("t24_multimodal_features", _T24_SQL)
def t24_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-histogram features over binary payloads via the multimodal
    mapInPandas kernel; shares × n_bytes rounds back to exact integer
    counts (float32 rel-error ~1e-7 × counts ≪ 0.5 at document sizes)."""
    from dask_lightgbm_spark.operators import multimodal as mm

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    target = spark.sparkContext.defaultParallelism
    spread = d.rdd.getNumPartitions() < target
    if spread:
        # narrow input needs a parallelism spread anyway (single-row-group
        # scan = single-task kernel): make it a RANGE spread on the output
        # sort key so the final ORDER BY is free — a sort AFTER the kernel
        # re-executes the kernel inside the range partitioner's sampling
        # job (same reasoning as t19; guide §2.4). At scale the scan is
        # wide and the classic sort-after plan stands.
        d = d.repartitionByRange(target, "doc_id").sortWithinPartitions("doc_id")
    # only (doc_id, payload) cross the Python boundary — mapInPandas ships
    # every input column it sees, and `text` duplicates the payload bytes
    # (guide §4.1: select the needed columns before an opaque kernel).
    p = mm.attach_binary_payload(d, "text").select("doc_id", "payload")
    f = mm.extract_features(p, dim=8)
    out = (
        f.select(
            "doc_id",
            "n_bytes",
            F.posexplode("feature").alias("bucket0", "share"),
        )
        .select(
            "doc_id",
            F.col("bucket0").cast("long").alias("bucket"),
            F.round(F.col("share").cast("double") * F.col("n_bytes"))
            .cast("long")
            .alias("cnt"),
            F.col("n_bytes"),
        )
    )
    if spread:
        # posexplode preserves row order: ranged-by-doc_id partitions each
        # locally (doc_id, bucket)-sorted == the global ORDER BY
        return out.sortWithinPartitions("doc_id", "bucket")
    return out.orderBy("doc_id", "bucket")


# ---------------------------------------------------------------------------
# t25 — multimodal frame sampling, driver-verified: the row-expanding
# mapInPandas kernel (operators/multimodal.py:sample_frames; stub decoder =
# evenly-spaced 16-byte windows) emits 4 frames per payload; each frame's
# md5 is recomputed by DuckDB from the same substring arithmetic. Verifies
# the 1→N Arrow kernel shape a real video decoder needs. (Fixture docs are
# all ≥ 44 bytes, so the zero-padding branch never fires and frames are
# pure substrings on both engines.)
# ---------------------------------------------------------------------------

_T25_SQL = """
WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
f AS (
  SELECT doc_id, g.i AS frame_idx,
         least(g.i * greatest(n // 4, 1), greatest(n - 16, 0)) AS start0,
         text, n
  FROM d, generate_series(0, 3) AS g(i)
)
SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
       md5(substr(text, CAST(start0 + 1 AS BIGINT), 16)) AS frame_md5
FROM f
ORDER BY doc_id, frame_idx
"""


@query("t25_frame_sampling", _T25_SQL)
def t25_frame_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4 evenly-spaced 16-byte frames per payload through the real
    mapInPandas sampling kernel; md5 per frame hash-checked cross-engine."""
    from dask_lightgbm_spark.operators import multimodal as mm

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    p = mm.attach_binary_payload(d, "text")
    frames = mm.sample_frames(p, n_frames=4, frame_bytes=16)
    return frames.select(
        "doc_id", "frame_idx", F.md5(F.col("frame")).alias("frame_md5")
    ).orderBy("doc_id", "frame_idx")


# ---------------------------------------------------------------------------
# t26 — multimodal resize kernel, driver-verified: the stub "resize"
# truncates the payload to width·height bytes (6×6=36 ≤ the 44-byte minimum
# doc, so the zero-pad branch never fires); md5 of each resized payload is
# recomputed by DuckDB from substr. Completes gate coverage of all three
# multimodal kernel shapes (1→1 features, 1→N frames, 1→1 resize).
# ---------------------------------------------------------------------------

_T26_SQL = """
SELECT doc_id, 6 AS width, 6 AS height, md5(substr(text, 1, 36)) AS payload_md5
FROM documents
ORDER BY doc_id
"""


@query("t26_resize_payloads", _T26_SQL)
def t26_resize_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dask_lightgbm_spark.operators import multimodal as mm

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    p = mm.attach_binary_payload(d, "text")
    r = mm.resize_images(p, width=6, height=6)
    return r.select(
        "doc_id",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.md5(F.col("payload")).alias("payload_md5"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# t27 — unigram-LM familiarity scoring (the CCNet/KenLM quality-filter
# shape, integer-exact): build corpus unigram counts, then score each doc
# by the sum of its tokens' corpus frequencies. Docs of common words score
# high; gibberish scores low. Integer sums keep the oracle bit-exact (a
# log-prob sum would be a float fold with engine-dependent ordering).
#
# Scale: tokens→freq is one shuffle on token (AQE skew-join absorbs the
# stopword head); the freq lookup join broadcasts when the vocabulary fits
# (typical after frequency trimming), else it's a shuffled hash join on the
# same key — both standard at 100 TB corpus size.
# ---------------------------------------------------------------------------

_T27_SQL = """
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(trim(text), '[ \t\n\f\r]+'),
                            x -> x <> '')) AS t
  FROM documents
),
freq AS (SELECT t, COUNT(*) AS cnt FROM toks GROUP BY t),
per_doc AS (
  SELECT toks.doc_id,
         CAST(SUM(freq.cnt) AS BIGINT) AS fam_sum,
         COUNT(*) AS n_tokens
  FROM toks JOIN freq USING (t)
  GROUP BY toks.doc_id
)
SELECT doc_id, fam_sum, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST((fam_sum * 100) // n_tokens AS BIGINT) AS fam_per_token_x100
FROM per_doc
"""


@query("t27_unigram_lm_familiarity", _T27_SQL)
def t27_unigram_lm_familiarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(
                F.filter(F.split(F.trim(F.col("text")), r"[ \t\n\f\r]+"), lambda x: x != "")
            ).alias("t"),
        )
    )
    freq = toks.groupBy("t").agg(F.count(F.lit(1)).alias("cnt"))
    per_doc = (
        toks.join(freq, "t")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("fam_sum"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
    )
    return per_doc.select(
        "doc_id",
        "fam_sum",
        "n_tokens",
        F.expr("fam_sum * 100 div n_tokens").alias("fam_per_token_x100"),
    )


# ---------------------------------------------------------------------------
# t28 — BPE-style regex tokenization (letter runs / digit runs / single
# punctuation — the GPT-2 pre-tokenizer shape without the unicode classes)
# + top-10 tokens per language. Alternatives match disjoint character
# classes, so Java (Spark) and RE2 (DuckDB) regex engines produce identical
# token streams; counts are ints, ranking deterministically tie-broken.
# Scale: regexp_extract_all is JVM codegen (no Python boundary); the count
# is one shuffle on (lang, token); top-10 is a tiny per-lang window.
# ---------------------------------------------------------------------------

_BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\f\r]"

_T28_SQL = f"""
WITH toks AS (
  SELECT lang, unnest(regexp_extract_all(text, '{_BPE_PATTERN}')) AS token
  FROM documents
),
counts AS (SELECT lang, token, COUNT(*) AS n FROM toks GROUP BY lang, token),
ranked AS (
  SELECT lang, token, n,
         CAST(row_number() OVER (PARTITION BY lang ORDER BY n DESC, token) AS INTEGER) AS rank
  FROM counts
)
SELECT lang, token, n, rank FROM ranked WHERE rank <= 10
"""


@query("t28_bpe_token_topk", _T28_SQL)
def t28_bpe_token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:

    toks = (
        load_table(spark, sf_dir, "documents")
        .select(
            "lang",
            F.explode(
                F.regexp_extract_all(F.col("text"), F.lit(_BPE_PATTERN), 0)
            ).alias("token"),
        )
    )
    counts = toks.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("n"))
    # two-level top-10: ~10 langs means a plain window sorts a tenth of
    # the BPE vocab per task; grouped_topk keeps every sort salt-bounded
    from dask_lightgbm_spark.functions.partitioning import grouped_topk

    return grouped_topk(
        counts, ["lang"], [F.desc("n"), F.asc("token")], 10, salt_on=["token"]
    ).select("lang", "token", "n", F.col("__rank").cast("int").alias("rank"))


# ---------------------------------------------------------------------------
# t29 — deterministic WEIGHTED sampling (importance sampling for data
# mixing): each doc's inclusion probability is proportional to a quality
# weight (here a length-based tier: longer docs sampled harder, the
# standard up-weight-good-data move). Inclusion = md5-hash(doc_id) mod 1M
# < weight_ppm — reproducible across engines, runs, and cluster sizes
# (seeded rand() is partition-order-dependent in Spark, so hash-threshold
# is the only correct form at scale). Companion to t23's uniform
# per-source rate; zero shuffle until the tiny per-tier audit agg.
# ---------------------------------------------------------------------------

_T29_SQL = f"""
WITH w AS (
  SELECT doc_id, lang,
         CASE WHEN n_chars >= 200 THEN 750000
              WHEN n_chars >= 100 THEN 500000
              ELSE 250000 END AS weight_ppm
  FROM documents
),
kept AS (
  SELECT * FROM w
  WHERE ({sql_hash32("CAST(doc_id AS VARCHAR)")}) % 1000000 < weight_ppm
)
SELECT weight_ppm, lang, COUNT(*) AS n_kept,
       MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
FROM kept GROUP BY weight_ppm, lang
ORDER BY weight_ppm, lang
"""


@query("t29_weighted_sampling", _T29_SQL)
def t29_weighted_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.when(F.col("n_chars") >= 200, 750000)
        .when(F.col("n_chars") >= 100, 500000)
        .otherwise(250000)
        .alias("weight_ppm"),
    )
    kept = d.filter(
        F.pmod(md5_hash32(F.col("doc_id").cast("string")), F.lit(1000000))
        < F.col("weight_ppm")
    )
    return (
        kept.groupBy("weight_ppm", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("weight_ppm", "lang")
    )


# ---------------------------------------------------------------------------
# t30 — sequence packing: concatenate the corpus (doc_id order) into one
# virtual token stream and cut it into fixed 256-token training sequences.
# The cumulative offset is a GLOBAL prefix sum — computed by the two-level
# scan in operators/prefix_sum.py (bucketed parallel windows + a tiny
# bucket-offset window), NOT a single-task ORDER-BY-only window, so the
# plan survives 100 TB. Oracle uses DuckDB's plain windowed cumsum (single
# node — the naive spelling is fine there) over identical token counts.
# ---------------------------------------------------------------------------

_T30_SEQ_LEN = 256

_T30_SQL = rf"""
WITH toks AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(trim(text), '[ \t\n\f\r]+'),
                         x -> x <> '')) AS n_tok
  FROM documents
),
cum AS (
  SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
         SUM(n_tok) OVER (ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS end_tok
  FROM toks
)
SELECT doc_id, n_tok,
       CAST(end_tok - n_tok AS BIGINT) AS start_tok,
       CAST(end_tok AS BIGINT) AS end_tok,
       CAST((end_tok - n_tok) // {_T30_SEQ_LEN} AS BIGINT) AS first_chunk,
       CAST(CASE WHEN n_tok > 0 THEN (end_tok - 1) // {_T30_SEQ_LEN}
                 ELSE (end_tok - n_tok) // {_T30_SEQ_LEN} END AS BIGINT)
         AS last_chunk,
       CAST(CASE WHEN n_tok > 0
                 THEN (end_tok - 1) // {_T30_SEQ_LEN}
                      - (end_tok - n_tok) // {_T30_SEQ_LEN} + 1
                 ELSE 0 END AS BIGINT) AS n_chunks
FROM cum
ORDER BY doc_id
"""


@query("t30_sequence_packing", _T30_SQL)
def t30_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc packed-stream offsets and chunk spans at SEQ_LEN=256 via the
    distributed two-level prefix sum (operators/prefix_sum.py)."""
    from dask_lightgbm_spark.operators.prefix_sum import pack_sequences

    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.trim(F.col("text")), r"[ \t\n\f\r]+"), lambda x: x != "")
    counted = d.select("doc_id", F.size(toks).cast("long").alias("n_tok"))
    return pack_sequences(counted, "doc_id", "n_tok", _T30_SEQ_LEN).orderBy("doc_id")


# ---------------------------------------------------------------------------
# t31 — near-dup cluster representative selection: the step AFTER t14's
# connected components in a real dedup pipeline — per cluster keep exactly
# one document (longest text wins, doc_id breaks ties) and report what was
# kept vs dropped. Oracle reuses t14's transitive-closure CTEs verbatim.
# ---------------------------------------------------------------------------

_T31_SQL = (
    _T14_CTES
    + """,
labeled AS (
  SELECT d.doc_id, d.n_chars,
         CAST(COALESCE(LEAST(c.doc_id, c.min_reach), d.doc_id) AS BIGINT)
           AS component
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
),
ranked AS (
  SELECT component, doc_id, n_chars,
         row_number() OVER (PARTITION BY component
                            ORDER BY n_chars DESC, doc_id ASC) AS rk,
         COUNT(*) OVER (PARTITION BY component) AS n_docs,
         SUM(n_chars) OVER (PARTITION BY component) AS total_chars
  FROM labeled
)
SELECT component, doc_id AS rep_doc_id,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(total_chars AS BIGINT) AS total_chars,
       CAST(n_chars AS BIGINT) AS kept_chars
FROM ranked WHERE rk = 1
ORDER BY component
"""
)


@query("t31_cluster_representatives", _T31_SQL)
def t31_cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One representative per near-dup cluster (max n_chars, tie min doc_id),
    with per-cluster kept/total accounting. Reuses the t14 component labels;
    the rep pick is a per-component window — shuffle key is the component id,
    bounded by cluster sizes, never all-pairs."""

    from dask_lightgbm_spark.operators.components import connected_components

    d = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_neardup(
        d, "doc_id", "text", K_SHINGLE, NUM_PERM, BAND_SIZE, threshold=0.7
    ).select("id_a", "id_b")
    labeled = connected_components(pairs, d.select("doc_id")).join(
        d.select("doc_id", "n_chars"), "doc_id"
    )
    # representative = two-level top-1 (a viral dup cluster is exactly a
    # hot component — never sort it on one task); sizes ride a linear
    # hash aggregation joined back on component
    from dask_lightgbm_spark.functions.partitioning import grouped_topk

    stats = labeled.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )
    rep = grouped_topk(
        labeled,
        ["component"],
        [F.desc("n_chars"), F.asc("doc_id")],
        1,
        salt_on=["doc_id"],
    )
    return (
        rep.join(stats, "component")
        .select(
            "component",
            F.col("doc_id").alias("rep_doc_id"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("total_chars").cast("long").alias("total_chars"),
            F.col("n_chars").cast("long").alias("kept_chars"),
        )
        .orderBy("component")
    )


# ---------------------------------------------------------------------------
# t32 — PII/sensitive-term redaction: the TRANSFORM side of t18's scan —
# replace matched spans in the text, count replacements, and emit a digest
# of the redacted text (digest keeps the oracle compare exact without
# hashing megabyte strings row-wise in the driver). Word-boundary regex
# behaves identically in Java regex (Spark) and RE2 (DuckDB) for this
# pattern class. Pure projection: zero shuffle at any scale.
# ---------------------------------------------------------------------------

_T32_RX = r"\b(customer|value|key)\b"

_T32_SQL = rf"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_T32_RX}')) AS BIGINT) AS n_redactions,
       md5(regexp_replace(text, '{_T32_RX}', '[REDACTED]', 'g')) AS redacted_hash
FROM documents
ORDER BY doc_id
"""


@query("t32_pii_redaction", _T32_SQL)
def t32_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(_T32_RX), F.lit(0)))
        .cast("long")
        .alias("n_redactions"),
        F.md5(F.regexp_replace("text", _T32_RX, "[REDACTED]")).alias("redacted_hash"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# t33 — LSH dedup quality report: precision/recall of the t05 MinHash-LSH
# pipeline against exact all-pairs ground truth at the SAME similarity
# definition (5-gram-hash Jaccard >= 0.7), on the bounded doc_id < 100
# subset (all-pairs is the measurement cost you pay once on a sample, not
# a corpus plan — the t03 discipline). Band bucketing is row-local, so the
# subset's LSH pairs equal the full corpus's pairs restricted to the
# subset; the report is therefore an unbiased sample estimate of corpus
# recall. The dedup analog of s19's ANN recall harness.
# ---------------------------------------------------------------------------

_T33_SQL = (
    "WITH" + _SQL_SHINGLE_ARR + f""",
sub AS (SELECT * FROM arr WHERE doc_id < 100),
m AS (SELECT doc_id,
         {_minhash_mins}
      FROM sub),
bands AS ({_bands_sql}),
cand0 AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bv0 = b.bv0 AND a.bv1 = b.bv1 AND a.bv2 = b.bv2 AND a.bv3 = b.bv3 AND a.doc_id < b.doc_id
),
cand AS (
  SELECT id_a, id_b FROM cand0
  JOIN m ma ON ma.doc_id = id_a
  JOIN m mb ON mb.doc_id = id_b
  WHERE ({_est_matches}) >= {NUM_PERM // 2}
),
lsh AS (
  SELECT c.id_a, c.id_b
  FROM cand c JOIN sub a ON a.doc_id = c.id_a JOIN sub b ON b.doc_id = c.id_b
  WHERE len(list_intersect(a.hs, b.hs))
        / (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs))) >= 0.7
),
truth AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sub a JOIN sub b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.hs, b.hs))
        / (len(a.hs) + len(b.hs) - len(list_intersect(a.hs, b.hs))) >= 0.7
),
hits AS (SELECT t.id_a, t.id_b FROM truth t JOIN lsh l
         ON t.id_a = l.id_a AND t.id_b = l.id_b)
SELECT (SELECT COUNT(*) FROM truth) AS n_truth,
       (SELECT COUNT(*) FROM lsh) AS n_detected,
       (SELECT COUNT(*) FROM hits) AS n_hits,
       CASE WHEN (SELECT COUNT(*) FROM lsh) = 0 THEN NULL
            ELSE (SELECT COUNT(*) FROM hits) / (SELECT COUNT(*) FROM lsh)
       END AS precision,
       CASE WHEN (SELECT COUNT(*) FROM truth) = 0 THEN NULL
            ELSE (SELECT COUNT(*) FROM hits) / (SELECT COUNT(*) FROM truth)
       END AS recall
"""
)


@query("t33_lsh_quality_report", _T33_SQL)
def t33_lsh_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    arr = dedup.shingle_hash_array(d, "doc_id", "text", K_SHINGLE)
    a = arr.select(F.col("doc_id").alias("id_a"), F.col("hs").alias("hsa"))
    b = arr.select(F.col("doc_id").alias("id_b"), F.col("hs").alias("hsb"))
    inter = F.size(F.array_intersect("hsa", "hsb"))
    jac = inter / (F.size("hsa") + F.size("hsb") - inter)
    truth = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .filter(jac >= 0.7)
        .select("id_a", "id_b")
    )
    lsh = dedup.minhash_lsh_neardup(
        d, "doc_id", "text", K_SHINGLE, NUM_PERM, BAND_SIZE, threshold=0.7
    ).select("id_a", "id_b")
    hits = truth.join(lsh, ["id_a", "id_b"])
    nt = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    nd = lsh.agg(F.count(F.lit(1)).alias("n_detected"))
    nh = hits.agg(F.count(F.lit(1)).alias("n_hits"))
    row = nt.crossJoin(F.broadcast(nd)).crossJoin(F.broadcast(nh))
    return row.select(
        "n_truth",
        "n_detected",
        "n_hits",
        F.when(
            F.col("n_detected") > 0, F.col("n_hits") / F.col("n_detected")
        ).alias("precision"),
        F.when(F.col("n_truth") > 0, F.col("n_hits") / F.col("n_truth")).alias(
            "recall"
        ),
    )


# ---------------------------------------------------------------------------
# t34 — semantic dedup (the SemDeDup composition, Abbas et al. 2023): k-means
# cluster the embeddings, then WITHIN each cluster mark as duplicates any
# pair with cosine >= threshold and keep exactly one member per duplicate
# relation — the member LEAST similar to its cluster centroid (the paper's
# keep-outliers rule), vec_id breaking exact ties. No all-pairs stage ever:
# pairs exist only inside a cluster (the s06 per-cell shape), and at corpus
# scale k grows ∝ n so the per-cluster pair bound (cluster_size²) stays
# constant — k×dim centroids remain a driver-side kilobyte/megabyte object
# (50k×768 doubles ≈ 300 MB is the published upper end; our fixture trains
# the s09 ladder: K=8, 2 Lloyd iterations, fixed-point means).
# Oracle = s09's chained k-means CTEs + s10's sqdist assignment + an
# anti-exists dominance join, all bit-exact.
# ---------------------------------------------------------------------------

_T34_K = 8
_T34_ITERS = 2
_T34_DIM = 64
_T34_TAU = 0.42
# Hot-cell guard (r7 judge task 4): dominance CANDIDATES are capped at the
# _T34_CAP least-central members per cell (same (cs_cent ASC, vec_id ASC)
# order as the dominance tie-break, so the cap prefix is exactly the
# strongest dominators). Per-cell pair work is |cell| x CAP — LINEAR in
# cell size — instead of |cell|^2; a skewed embedding space (one cell
# swallowing the corpus) can no longer go quadratic. Semantics: a vector
# is removed iff it is tau-close to a lex-smaller member among the cell's
# CAP least-central; cells at or under the cap are bit-identical to the
# uncapped SemDeDup rule (sf0.01 fixture: max cell ~80), and the oracle
# applies the SAME cap so every SF verifies exactly. Selection runs as a
# two-level rank (salted partial bottom-CAP, then final rank over the
# bounded union) so no single task ever sorts a hot cell.
# Cap-boundary determinism (r8 advisor): the cap prefix is ordered on the
# FLOATING-POINT cs_cent, which is safe here only because both engines
# compute it as the identical strict sequential left-fold over the same
# doubles (operators/similarity.dot/norm ↔ the oracle's list_reduce; IEEE
# ops in the same order are bit-equal, and 0.0+x1 == x1 covers the init
# difference), so per-row cs_cent — emitted in the output and compared
# with EXACT float equality by tools/check.compare on the cap-BINDING
# skewed fixture (test_r8_caps) — agrees bit-for-bit and the (cs_cent,
# vec_id) prefix cannot diverge. If dot/norm ever switches to a pairwise/
# SIMD summation (numpy, pandas UDF), this argument dies: re-key the cap
# on an integer quantization before shipping that change.
_T34_CAP = 256
_T34_SALT = 64  # phase-1 fanout; a salt partition holds ~|cell|/64 rows


def _t34_sql() -> str:
    from dask_lightgbm_spark.queries.similarity import (
        _kmeans_cte_prefix,
        _sql_cos,
        _sql_sqdist,
    )

    n = _T34_ITERS
    return (
        _kmeans_cte_prefix(_T34_K, n, _T34_DIM)
        + f""",
af AS (
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_sql_sqdist('e.v', 'c.cv')} ASC, c.cid ASC) AS rn
    FROM e, c{n} c
  ) WHERE rn = 1
),
sc AS (
  SELECT af.vec_id, af.v, af.cid, {_sql_cos('af.v', 'c.cv')} AS cs_cent
  FROM af JOIN c{n} c ON af.cid = c.cid
),
bc AS (
  SELECT vec_id, v, cid, cs_cent FROM (
    SELECT sc.*, row_number() OVER (PARTITION BY cid
                 ORDER BY cs_cent ASC, vec_id ASC) AS brn
    FROM sc
  ) WHERE brn <= {_T34_CAP}
),
dom AS (
  SELECT DISTINCT a.vec_id
  FROM sc a JOIN bc b ON a.cid = b.cid AND a.vec_id <> b.vec_id
  WHERE ({_sql_cos('a.v', 'b.v')}) >= {_T34_TAU}
    AND (b.cs_cent < a.cs_cent
         OR (b.cs_cent = a.cs_cent AND b.vec_id < a.vec_id))
)
SELECT s.vec_id, s.cid AS cell, s.cs_cent,
       (d.vec_id IS NULL) AS kept
FROM sc s LEFT JOIN dom d ON s.vec_id = d.vec_id
ORDER BY s.vec_id"""
    )


@query("t34_semantic_dedup", _t34_sql())
def t34_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: learned k-means cells (centroids collected once per
    session — k×dim doubles — and applied as a zero-shuffle literal
    assignment), per-cluster cosine pairs against a CAPPED candidate set
    (the _T34_CAP least-central members per cell — see the constant's
    comment; ≤ K×CAP rows total, broadcast), keep-least-central per
    duplicate relation via a LEFT ANTI dominance join. Norms are computed
    once per vector and reused on both sides of every pair — the s06 serve
    shape. Per-cell work is |cell|×CAP, so a hot cell degrades linearly,
    never quadratically."""
    from dask_lightgbm_spark.operators import similarity as sim
    from dask_lightgbm_spark.operators.kmeans import (
        assign_vectorized,
        kmeans_centroids,
    )

    e = load_table(spark, sf_dir, "embeddings")
    cache = getattr(spark, "_dls_semdedup_cents", None)
    if cache is None:
        cache = {}
        spark._dls_semdedup_cents = cache
    if sf_dir not in cache:
        cents_df = kmeans_centroids(
            e, init_filter=F.col("vec_id") < _T34_K, n_iters=_T34_ITERS
        )
        cache[sf_dir] = sorted((r.cid, list(r.cv)) for r in cents_df.collect())
    cents = cache[sf_dir]

    from dask_lightgbm_spark.functions.partitioning import ensure_parallelism

    # cost hint (r15 advisor): everything downstream of this spread runs
    # the INTERPRETED per-pair cosine folds the cap-boundary contract pins
    # (~1 core-s per 64 KiB of embeddings — measured sf0.1 width curve:
    # 4.6 s at the 1 MiB kernel default -> 2.2 s at 64 KiB), so the same
    # byte count must spread ~16x wider than for a NumPy kernel.
    corpus = ensure_parallelism(
        e.select("vec_id", "embedding"), bytes_per_task=64 << 10
    ).select("vec_id", sim.to_double_array("embedding").alias("v"))
    assigned = assign_vectorized(corpus, cents)
    cent_rows = spark.createDataFrame(
        [(int(cid), list(cv)) for cid, cv in cents], "cid int, cv array<double>"
    )
    sc = (
        assigned.join(F.broadcast(cent_rows), "cid")
        .select(
            "vec_id",
            "v",
            "cid",
            F.try_divide(
                sim.dot("v", "cv"),
                sim.norm("v") * sim.norm("cv"),
            ).alias("cs_cent"),
            sim.norm("v").alias("nn"),
        )
    )
    a = sc.select(
        F.col("vec_id").alias("id_a"),
        F.col("v").alias("va"),
        F.col("cid"),
        F.col("cs_cent").alias("cs_a"),
        F.col("nn").alias("na"),
    )
    from dask_lightgbm_spark.functions.partitioning import grouped_topk

    # TWO-LEVEL bottom-CAP per cell (grouped_topk): a single per-cell rank
    # window would sort a hot cell on ONE task — the exact skew this cap
    # exists to guard against. The selected set is identical to a single
    # window's, so the oracle keeps the simple one-window form.
    b = grouped_topk(
        sc,
        ["cid"],
        [F.asc("cs_cent"), F.asc("vec_id")],
        _T34_CAP,
        salt_on=["vec_id"],
        n_salt=_T34_SALT,
    ).select(
        F.col("vec_id").alias("id_b"),
        F.col("v").alias("vb"),
        F.col("cid"),
        F.col("cs_cent").alias("cs_b"),
        F.col("nn").alias("nb"),
    )
    pair_cos = F.try_divide(
        sim.dot("va", "vb"), F.col("na") * F.col("nb")
    )
    # capped candidate side is <= K x CAP rows — broadcast it, so the
    # dominance check is a broadcast hash join over the corpus (no corpus
    # shuffle at all)
    dominated = (
        a.join(F.broadcast(b), "cid")
        .filter(F.col("id_a") != F.col("id_b"))
        .filter(pair_cos >= _T34_TAU)
        .filter(
            (F.col("cs_b") < F.col("cs_a"))
            | ((F.col("cs_b") == F.col("cs_a")) & (F.col("id_b") < F.col("id_a")))
        )
        .select(F.col("id_a").alias("vec_id"))
        .distinct()
        .withColumn("is_dom", F.lit(True))
    )
    return (
        sc.join(dominated, "vec_id", "left")
        .select(
            "vec_id",
            F.col("cid").alias("cell"),
            "cs_cent",
            F.coalesce(~F.col("is_dom"), F.lit(True)).alias("kept"),
        )
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# t35 — quality-classifier scoring (the fasttext-style corpus filter): a
# linear model over HASHED TOKEN BIGRAMS, scored as a pure zero-shuffle
# projection. The model is a B-bucket integer weight table (stand-in for a
# trained fasttext export — swap the literals, keep the plan): score(doc) =
# Σ w[h(bigram) mod B], kept = per-bigram mean (×100, integer div) ≥ τ.
# Integer weights + int64 sums keep both engines bit-exact (addition is
# associative — no float fold-order concerns), and the whole scorer is
# expressions inside one projection: no explode, no groupBy, no Python.
# At 100 TB this runs at scan speed; the model broadcast is B integers.
# Pairs with t09/t20: this is the model-driven stage of the cleaning
# composite (CCNet/fasttext quality gate).
# ---------------------------------------------------------------------------

_T35_B = 64  # weight buckets
_T35_THRESH = 300  # keep iff mean bucket weight x100 >= this
# deterministic "pretrained" weights: fixed LCG so source stays compact and
# both engines embed identical literals (range -49..50)
_T35_W = [((1103515245 * i + 12345) % 2147483648) % 100 - 49 for i in range(_T35_B)]

_T35_SEP = chr(31)  # unit separator — cannot appear in whitespace-split tokens

_T35_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '[ \t\n\f\r]+'),
                     x -> x <> '') AS ts
  FROM documents
),
scored AS (
  SELECT doc_id,
         CAST(COALESCE(SUM(
           ({_T35_W}::BIGINT[])[
             CAST((('0x' || substr(md5(bg), 1, 8))::BIGINT % {_T35_B}) AS INT) + 1]
         ), 0) AS BIGINT) AS score_sum,
         CAST(COUNT(bg) AS BIGINT) AS n_bigrams
  FROM toks LEFT JOIN LATERAL (
    SELECT unnest(list_transform(generate_series(1, len(ts) - 1),
                                 i -> ts[i] || '{_T35_SEP}' || ts[i + 1])) AS bg
  ) ON TRUE
  GROUP BY doc_id
)
SELECT doc_id, score_sum, n_bigrams,
       CASE WHEN n_bigrams > 0
            THEN score_sum * 100 // n_bigrams ELSE NULL END AS score_x100,
       (n_bigrams > 0 AND score_sum * 100 // n_bigrams >= {_T35_THRESH}) AS keep
FROM scored
ORDER BY doc_id
"""


def quality_score_projection(d: DataFrame) -> DataFrame:
    """The t35 scorer as a reusable STATELESS projection (docs in → scored
    docs out, zero shuffle) — shared verbatim by the batch query and x12's
    streaming twin, so batch backfill and streaming serve score
    identically by construction."""
    toks = F.filter(
        F.split(F.trim(F.col("text")), r"[ \t\n\f\r]+"), lambda x: x != ""
    )
    w_lit = F.array(*[F.lit(int(w)) for w in _T35_W])
    d = d.select("doc_id", toks.alias("ts"))
    bigrams = F.transform(
        F.slice(F.col("ts"), 1, F.greatest(F.size("ts") - 1, F.lit(0))),
        lambda x, i: F.concat(x, F.lit(_T35_SEP), F.element_at(F.col("ts"), i + 2)),
    )
    bucket = lambda bg: F.pmod(  # noqa: E731 — md5-derived hash is nonneg
        F.conv(F.substring(F.md5(bg), 1, 8), 16, 10).cast("long"), F.lit(_T35_B)
    )
    score_sum = F.aggregate(
        bigrams,
        F.lit(0).cast("long"),
        lambda acc, bg: acc + F.element_at(w_lit, bucket(bg).cast("int") + 1),
    )
    scored = d.select(
        "doc_id",
        score_sum.alias("score_sum"),
        F.size(bigrams).cast("long").alias("n_bigrams"),
    )
    return scored.select(
        "doc_id",
        "score_sum",
        "n_bigrams",
        F.when(
            F.col("n_bigrams") > 0, F.expr("score_sum * 100 div n_bigrams")
        ).alias("score_x100"),
        (
            (F.col("n_bigrams") > 0)
            & (F.expr("score_sum * 100 div n_bigrams") >= _T35_THRESH)
        ).alias("keep"),
    )


@query("t35_quality_classifier", _T35_SQL)
def t35_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return quality_score_projection(d).orderBy("doc_id")


# ---------------------------------------------------------------------------
# t36 — contamination ATTRIBUTION: t19 says WHETHER a train doc overlaps the
# eval split; this says WHICH eval doc leaked where — per eval doc, the
# top-5 train docs by shared distinct-shingle count (with an integer
# permille of the eval doc's shingles covered). The leak-tracing report a
# contamination incident actually needs. Scale: eval shingles broadcast
# (eval sets are small), the pair aggregation shuffles on (train, eval) doc
# id pairs — linear in matched shingles, never all-pairs — and the final
# top-5 window partitions on eval_doc (bounded by the eval set size).
# ---------------------------------------------------------------------------

_T36_SQL = f"""
WITH tarr AS ({_t19_shingles} WHERE doc_id % 20 <> 0),
earr AS ({_t19_shingles} WHERE doc_id % 20 = 0),
esh AS (SELECT doc_id AS eval_doc, unnest(hs) AS h FROM earr),
tsh AS (SELECT doc_id AS train_doc, unnest(hs) AS h FROM tarr),
pairs AS (
  SELECT train_doc, eval_doc, COUNT(*) AS n_shared
  FROM tsh JOIN esh USING (h) GROUP BY train_doc, eval_doc
),
esz AS (SELECT doc_id AS eval_doc, CAST(len(hs) AS BIGINT) AS eval_n FROM earr),
ranked AS (
  SELECT p.eval_doc, p.train_doc,
         CAST(p.n_shared AS BIGINT) AS n_shared,
         CAST(p.n_shared * 1000 // e.eval_n AS BIGINT) AS covered_permille,
         CAST(row_number() OVER (PARTITION BY p.eval_doc
                                 ORDER BY p.n_shared DESC, p.train_doc) AS INTEGER) AS rank
  FROM pairs p JOIN esz e USING (eval_doc)
)
SELECT eval_doc, train_doc, n_shared, covered_permille, rank
FROM ranked WHERE rank <= 5
ORDER BY eval_doc, rank
"""


@query("t36_contamination_attribution", _T36_SQL)
def t36_contamination_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per eval doc, the 5 train docs sharing the most distinct 5-gram
    shingles (ties → lowest train doc id), with integer permille coverage
    of the eval doc's shingle set."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    tr = dedup.shingle_hash_array(
        d.filter(F.col("doc_id") % 20 != 0), "doc_id", "text", K_SHINGLE
    )
    ev = dedup.shingle_hash_array(
        d.filter(F.col("doc_id") % 20 == 0), "doc_id", "text", K_SHINGLE
    )
    esh = ev.select(F.col("doc_id").alias("eval_doc"), F.explode("hs").alias("h"))
    tsh = tr.select(F.col("doc_id").alias("train_doc"), F.explode("hs").alias("h"))
    pairs = (
        tsh.join(F.broadcast(esh), "h")
        .groupBy("train_doc", "eval_doc")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    esz = ev.select(
        F.col("doc_id").alias("eval_doc"), F.size("hs").cast("long").alias("eval_n")
    )
    w = W.partitionBy("eval_doc").orderBy(F.desc("n_shared"), F.asc("train_doc"))
    return (
        pairs.join(F.broadcast(esz), "eval_doc")
        .select(
            "eval_doc",
            "train_doc",
            F.col("n_shared").cast("long").alias("n_shared"),
            F.expr("n_shared * 1000 div eval_n").alias("covered_permille"),
        )
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 5)
        .select("eval_doc", "train_doc", "n_shared", "covered_permille", "rank")
        .orderBy("eval_doc", "rank")
    )


# ---------------------------------------------------------------------------
# t37 — n-gram LM count table (the classic MapReduce language-model job:
# Brants et al., "Large Language Models in Machine Translation" — count all
# 1..3-grams, prune by min-count, keep heavy hitters). One explode per
# order, ONE shuffle on (n, gram) for the count, then a tiny top-k window
# whose input is the pruned vocabulary — sublinear in the corpus by the
# Zipf/heavy-hitter argument (min_count pruning is exactly what bounds the
# tail at 100 TB; stupid-backoff LMs train from precisely this table).
# n-gram construction is JVM array expressions (no Python, no join): the
# token array is sliced/zipped against itself inside one projection.
# ---------------------------------------------------------------------------

_T37_MIN_COUNT = 3
_T37_TOPK = 15

_T37_SQL = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(trim(text), '[ \t\n\f\r]+'),
                             x -> x <> '') AS ts
  FROM documents
),
grams AS (
  SELECT 1 AS n, unnest(ts) AS gram FROM toks
  UNION ALL
  SELECT 2 AS n, unnest(list_transform(generate_series(1, len(ts) - 1),
     g -> array_to_string(ts[g:g+1], ' '))) AS gram FROM toks
  UNION ALL
  SELECT 3 AS n, unnest(list_transform(generate_series(1, len(ts) - 2),
     g -> array_to_string(ts[g:g+2], ' '))) AS gram FROM toks
),
counts AS (
  SELECT n, gram, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM grams GROUP BY n, gram
  HAVING COUNT(*) >= {_T37_MIN_COUNT}
),
ranked AS (
  SELECT n, gram, cnt,
         CAST(row_number() OVER (PARTITION BY n ORDER BY cnt DESC, gram)
              AS INTEGER) AS rank
  FROM counts
)
SELECT n, gram, cnt, rank FROM ranked WHERE rank <= {_T37_TOPK}
ORDER BY n, rank
"""


@query("t37_ngram_lm_counts", _T37_SQL)
def t37_ngram_lm_counts(spark: SparkSession, sf_dir: str) -> DataFrame:

    d = load_table(spark, sf_dir, "documents")
    ts = F.filter(
        F.split(F.trim(F.col("text")), r"[ \t\n\f\r]+"), lambda x: x != ""
    )
    docs = d.select(ts.alias("ts"))

    def ngrams(n: int):
        if n == 1:
            return F.col("ts")
        # slice to the n-gram window count, then join each start token with
        # its n-1 successors — pure array expressions, zero Python
        return F.transform(
            F.slice(F.col("ts"), 1, F.greatest(F.size("ts") - (n - 1), F.lit(0))),
            lambda x, i: F.array_join(
                F.slice(F.col("ts"), i + 1, n), " "
            ),
        )

    parts = [
        docs.select(F.lit(n).alias("n"), F.explode(ngrams(n)).alias("gram"))
        for n in (1, 2, 3)
    ]
    grams = parts[0].unionAll(parts[1]).unionAll(parts[2])
    counts = (
        grams.groupBy("n", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= _T37_MIN_COUNT)
    )
    from dask_lightgbm_spark.functions.partitioning import grouped_topk

    # two-level top-k: a plain window here partitions by n — THREE
    # partitions — so one task would sort a third of the pruned vocab;
    # grouped_topk keeps every sort bounded by vocab/n_salt
    return (
        grouped_topk(
            counts,
            ["n"],
            [F.desc("cnt"), F.asc("gram")],
            _T37_TOPK,
            salt_on=["gram"],
        )
        .select(
            "n", "gram", "cnt", F.col("__rank").cast("int").alias("rank")
        )
        .orderBy("n", "rank")
    )


# ---------------------------------------------------------------------------
# t38 — inverted-index build (token → document-frequency + truncated
# posting list): the retrieval-side data structure every corpus search /
# BM25 / dedup-audit path needs. Postings are doc_id-ordered and HEAD-
# TRUNCATED (first 8 ids) via a per-token rank window — the bounded
# "posting segment" layout: per-token partitions are the natural index
# shard, stopword-heavy tokens sort-spill rather than OOM, and production
# would write successive rank-windows as chained segments. Serialized as a
# comma-joined string so both engines compare exactly. df/tf_total come
# from the same single (token,doc) aggregation — one shuffle on token.
# ---------------------------------------------------------------------------

_T38_HEAD = 8

_T38_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(trim(text), '[ \t\n\f\r]+'),
                                    x -> x <> '')) AS token
  FROM documents
),
tf AS (SELECT token, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
       FROM toks GROUP BY token, doc_id),
ranked AS (
  SELECT token, doc_id, tf,
         row_number() OVER (PARTITION BY token ORDER BY doc_id) AS rnk
  FROM tf
)
SELECT token,
       CAST(COUNT(*) AS BIGINT) AS df,
       CAST(SUM(tf) AS BIGINT) AS tf_total,
       CAST(MAX(tf) AS BIGINT) AS max_tf,
       COALESCE(string_agg(CASE WHEN rnk <= {_T38_HEAD}
                                THEN CAST(doc_id AS VARCHAR) END,
                           ',' ORDER BY doc_id), '') AS postings_head
FROM ranked GROUP BY token ORDER BY token
"""


@query("t38_inverted_index", _T38_SQL)
def t38_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.trim(F.col("text")), r"[ \t\n\f\r]+"),
                lambda x: x != "",
            )
        ).alias("token"),
    )
    tf = toks.groupBy("token", "doc_id").agg(
        F.count(F.lit(1)).alias("tf")
    )
    # df/tf_total/max_tf: one linear hash aggregation per token. The head
    # postings are a per-token bottom-8 via grouped_topk — a plain
    # per-token rank window would sort a stopword's entire posting list on
    # one task; two-level ranking keeps every sort salt-bounded. The two
    # vocab-sized results join back on token.
    from dask_lightgbm_spark.functions.partitioning import grouped_topk

    stats = tf.groupBy("token").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("tf_total"),
        F.max("tf").alias("max_tf"),
    )
    heads = (
        grouped_topk(
            tf.select("token", "doc_id"),
            ["token"],
            [F.asc("doc_id")],
            _T38_HEAD,
            salt_on=["doc_id"],
        )
        .groupBy("token")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings_head"),
        )
    )
    return (
        stats.join(heads, "token")
        .select("token", "df", "tf_total", "max_tf", "postings_head")
        .orderBy("token")
    )


# ---------------------------------------------------------------------------
# t39 — chunk-level exact dedup (the C4 / "three-sentence span" move,
# Raffel et al. §2.2, applied at token-window granularity since the fixture
# text has no sentence boundaries): every 8-token chunk that appears
# anywhere earlier in the corpus (order = (doc_id, chunk_idx)) is dropped;
# docs are reported with their surviving-chunk count and an md5 digest of
# the reconstructed text so the oracle verifies the exact surviving
# CONTENT, not just counts.
#
# Scale (r8 final shape — JOIN-FREE dedup): chunk rows travel SLIM
# (doc_id, chunk_idx, md5-digest — no text). The min-struct aggregate per
# digest yields the WINNER occurrence of every distinct chunk, and the
# winners are themselves the complete answer: re-aggregating them by their
# winning doc gives each doc's kept indexes and count directly, with no
# join back to the chunk rows at all. n_chunks is size(dgs) — computed
# doc-side, zero shuffle. Only then does one doc-level join attach the
# verdict lists to the tokenized docs (per_doc is doc-count-sized, so it
# broadcasts at fixture scale; at 100 TB it hash-joins on doc_id), and the
# surviving text is re-sliced doc-locally (_t39_rebuild). Exchanges that
# scale with chunk count: exactly two (slim→digest, winners→doc), both
# carrying 16-byte keys + ints. No all-pairs, no sort anywhere but the
# output ORDER BY, and a billion-copy chunk partial-combines map-side to
# one row per map partition.
# ---------------------------------------------------------------------------

_T39_W = 8

_T39_SQL = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(trim(text), '[ \t\n\f\r]+'),
                             x -> x <> '') AS ts
  FROM documents
),
chunks AS (
  SELECT doc_id, g AS chunk_idx,
         array_to_string(ts[(g-1)*{_T39_W}+1 : least(g*{_T39_W}, len(ts))],
                         ' ') AS chunk
  FROM toks, LATERAL (SELECT unnest(generate_series(
         1, CAST((len(ts) + {_T39_W} - 1) // {_T39_W} AS INT))) AS g)
),
kept AS (
  SELECT doc_id, chunk_idx, chunk,
         row_number() OVER (PARTITION BY chunk
                            ORDER BY doc_id, chunk_idx) AS rn
  FROM chunks
),
per_doc AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_chunks,
         CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         md5(COALESCE(string_agg(CASE WHEN rn = 1 THEN chunk END,
                                 ' ' ORDER BY chunk_idx), '')) AS kept_digest
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(p.n_chunks, 0) AS n_chunks,
       COALESCE(p.n_kept, 0) AS n_kept,
       COALESCE(p.kept_digest, md5('')) AS kept_digest
FROM documents d LEFT JOIN per_doc p USING (doc_id)
ORDER BY d.doc_id
"""


def _t39_chunked_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, ts: array<token>, dgs: array<md5(chunk)>).

    Used by t44 (and by t39's network-bound variant, see its comment).
    Chunk TEXT never leaves the doc's own row: the frequency shuffles
    downstream key and carry only the 16-byte digest (at 100 TB the
    exchange ships digests, not ~50-token strings — md5 collisions are
    negligible at 2^64 chunks), and surviving text is re-sliced doc-side
    from ``ts`` after the verdict joins back on doc_id.
    """
    from dask_lightgbm_spark.functions.partitioning import ensure_parallelism

    d = ensure_parallelism(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    ts = F.filter(
        F.split(F.trim(F.col("text")), r"[ \t\n\f\r]+"), lambda x: x != ""
    )
    n_chunks = F.expr(f"(size(ts) + {_T39_W - 1}) div {_T39_W}")
    # sequence(1, 0) would step BACKWARD in Spark — guard empty docs
    dg_arr = F.when(
        n_chunks >= 1,
        F.transform(
            F.sequence(F.lit(1), n_chunks.cast("int")),
            lambda g: F.md5(
                F.array_join(
                    F.slice(F.col("ts"), (g - 1) * _T39_W + 1, _T39_W), " "
                )
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return d.select("doc_id", ts.alias("ts")).select(
        "doc_id", "ts", dg_arr.alias("dgs")
    )


def _t39_rebuild(idxs):  # noqa: ANN001 — Column expr helper
    """md5 of the chunks named by ``idxs`` (1-based), re-sliced from ts."""
    return F.md5(
        F.array_join(
            F.transform(
                idxs,
                lambda i: F.array_join(
                    F.slice(F.col("ts"), (i - 1) * _T39_W + 1, _T39_W), " "
                ),
            ),
            " ",
        )
    )


@query("t39_chunk_dedup", _T39_SQL)
def t39_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NO checkpoint/persist: the tokenized docs feed BOTH the slim chunk
    # pipeline and the final rebuild join, and an earlier revision
    # localCheckpoint'ed them to save the second tokenize pass. That is a
    # memory-CAPACITY bet: the materialized ts+dgs arrays are ~3-5x the
    # text bytes, and past the block store's budget the blocks spill,
    # serialize, and GC-churn — measured on the r11 sf100 ladder as the
    # decade bending 9.9x (recompute) -> 17.9-32x (checkpoint), with the
    # lingering blocks also starving the NEXT query's heap. Tokenizing is
    # scan-local and embarrassingly parallel — exactly the work that
    # scales — so recompute wins everywhere past toy scale (the same
    # trade operators/dedup.py made for t40's shingle arrays in r8).
    docs = _t39_chunked_docs(spark, sf_dir)
    slim = docs.select(
        "doc_id", F.posexplode("dgs").alias("pos", "dg")
    ).select("doc_id", (F.col("pos") + 1).alias("chunk_idx"), "dg")
    # First occurrence is a MIN-STRUCT AGGREGATE — not a row_number
    # window: it partial-combines map-side, so a chunk duplicated a
    # billion times collapses to one row per map partition with no sort.
    # The winner rows ARE the dedup verdict: every distinct chunk names
    # its keeper (doc_id, chunk_idx), so grouping the winners by their
    # winning doc yields each doc's kept indexes directly — no join back
    # to the chunk rows (r8 final: the earlier shuffled-hash verify join
    # was a third chunk-count-sized exchange doing no work the winner
    # set didn't already encode).
    winners = slim.groupBy("dg").agg(
        F.min(F.struct("doc_id", "chunk_idx")).alias("w")
    )
    per_doc = winners.groupBy(F.col("w.doc_id").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sort_array(F.collect_list("w.chunk_idx")).alias("keep_idxs"),
    )
    # one doc-level join attaches verdicts to the RAW documents scan and
    # re-tokenizes AFTER the join (r13): joining the tokenized `docs`
    # shipped ts (~hundreds of tokens) + dgs (one md5 string per chunk)
    # through the doc_id exchange and then SORTED that payload for the
    # merge join — measured 199 s for the full query at sf100 (5M docs,
    # ~15 GB through the exchange) where the whole digest pipeline costs
    # ~27 s. The raw text string is the strictly smallest carrier of the
    # information the rebuild needs (ts re-derives row-locally; n_chunks
    # is ceil(|ts|/8) — dgs was shipped only to take its size), and the
    # shuffle_hash hint keeps the text side UNSORTED (streamed against
    # the per-doc verdict hash map; both sides doc_id-partitioned, the
    # right plan at 100 TB where neither side broadcasts). Docs with
    # zero kept chunks (every chunk seen earlier) and empty docs both
    # fall to md5('').
    from dask_lightgbm_spark.functions.partitioning import ensure_parallelism

    raw = ensure_parallelism(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    ts = F.filter(
        F.split(F.trim(F.col("text")), r"[ \t\n\f\r]+"), lambda x: x != ""
    )
    # global output order WITHOUT orderBy-on-the-expensive-plan: a bare
    # .orderBy here made the RangePartitioner's boundary-sampling job
    # re-execute the whole join + md5 rebuild a second time (sampling
    # evaluates every child row). Decomposed: range-exchange the SLIM
    # join output first (doc_id + raw text + verdict ints — the sampler
    # recomputes only the join probe, no tokenize/md5), then do the
    # rebuild once post-exchange, then sort the final small rows within
    # partitions — range partitions are key-ordered, so the collected
    # result is globally doc_id-sorted, same contract as orderBy.
    return (
        raw.join(per_doc.hint("shuffle_hash"), "doc_id", "left")
        .repartitionByRange("doc_id")
        .select("doc_id", ts.alias("ts"), "n_kept", "keep_idxs")
        .select(
            "doc_id",
            "ts",
            F.expr(f"(size(ts) + {_T39_W - 1}) div {_T39_W}")
            .cast("long")
            .alias("n_chunks"),
            "n_kept",
            "keep_idxs",
        )
        .select(
            "doc_id",
            F.col("n_chunks").cast("long").alias("n_chunks"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            # fully-kept docs (the overwhelming case — the fixture keeps
            # ~94% of chunks, and a real corpus keeps most) shortcut the
            # per-chunk transform+slice+join rebuild: keeping chunks
            # 1..n re-sliced and re-joined by ' ' IS array_join(ts, ' ')
            # — one md5 over the row's own tokens, no array copies
            F.when(F.col("keep_idxs").isNull(), F.md5(F.lit("")))
            .when(
                F.col("n_kept") == F.col("n_chunks"),
                F.md5(F.array_join(F.col("ts"), " ")),
            )
            .otherwise(_t39_rebuild(F.col("keep_idxs")))
            .alias("kept_digest"),
        )
        .sortWithinPartitions("doc_id")
    )


# ---------------------------------------------------------------------------
# t40 — INCREMENTAL ingest dedup (new batch vs existing corpus): the
# continuous-ingestion counterpart of t05's batch self-dedup. The arriving
# batch (source = 'src0', small) is LSH-matched against the EXISTING
# corpus's signature index — a two-sided band equi-join, disjoint id
# spaces, so no self-join and no ordering constraint — then each new doc
# gets an admit/reject verdict with its best-matching corpus doc (highest
# verified Jaccard, ties → lowest corpus id). At scale the corpus band
# table is the persisted dedup index read from storage; only colliding
# buckets are touched, and the new batch never scans the corpus text
# except for the verified candidates' arrays.
# ---------------------------------------------------------------------------

# shared WITH-chain through the verified pairs ("hits") — x14's streaming
# twin reuses it verbatim as its own oracle
_T40_HITS_SQL = (
    "WITH" + _SQL_SHINGLE_ARR + "," + _SQL_MINHASH_WIDE + f""",
bands AS ({_bands_sql}),
newdocs AS (SELECT doc_id FROM documents WHERE source = 'src0'),
cand0 AS (
  SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS corpus_id
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bv0 = b.bv0 AND a.bv1 = b.bv1
   AND a.bv2 = b.bv2 AND a.bv3 = b.bv3
  WHERE a.doc_id IN (SELECT doc_id FROM newdocs)
    AND b.doc_id NOT IN (SELECT doc_id FROM newdocs)
),
cand AS (
  SELECT new_id, corpus_id FROM cand0
  JOIN m ma ON ma.doc_id = new_id
  JOIN m mb ON mb.doc_id = corpus_id
  WHERE ({_est_matches}) >= {NUM_PERM // 2}
),
verified AS (
  SELECT c.new_id, c.corpus_id,
         len(list_intersect(a.hs, b.hs)) AS inter,
         len(a.hs) AS na, len(b.hs) AS nb
  FROM cand c
  JOIN arr a ON a.doc_id = c.new_id
  JOIN arr b ON b.doc_id = c.corpus_id
),
hits AS (
  SELECT new_id, corpus_id, inter / (na + nb - inter) AS jaccard
  FROM verified WHERE inter / (na + nb - inter) >= 0.7
)"""
)

_T40_SQL = (
    _T40_HITS_SQL
    + """,
best AS (
  SELECT new_id, corpus_id, jaccard,
         CAST(COUNT(*) OVER (PARTITION BY new_id) AS BIGINT) AS n_matches,
         row_number() OVER (PARTITION BY new_id
                            ORDER BY jaccard DESC, corpus_id) AS rn
  FROM hits
)
SELECT n.doc_id,
       COALESCE(b.n_matches, 0) AS n_matches,
       b.corpus_id AS best_match_id,
       b.jaccard AS best_jaccard,
       b.new_id IS NOT NULL AS is_dup
FROM newdocs n LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
  ON n.doc_id = b.new_id
ORDER BY n.doc_id
"""
)


def _t40_report(new: DataFrame, hits: DataFrame) -> DataFrame:
    """t40's per-new-doc report over a (new_id, corpus_id, jaccard) hit
    set — shared by the recompute path (the catalog query) and the
    persisted-index path (t40_ingest_dedup_indexed / bench t40_indexed),
    so the two paths differ ONLY in where the corpus signatures come
    from."""
    from pyspark.sql import Window as W

    w = W.partitionBy("new_id")
    wr = W.partitionBy("new_id").orderBy(F.desc("jaccard"), F.asc("corpus_id"))
    best = (
        hits.withColumn("n_matches", F.count(F.lit(1)).over(w).cast("long"))
        .withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
    )
    return (
        new.select("doc_id")
        .join(best, F.col("doc_id") == F.col("new_id"), "left")
        .select(
            "doc_id",
            F.coalesce("n_matches", F.lit(0)).alias("n_matches"),
            F.col("corpus_id").alias("best_match_id"),
            F.col("jaccard").alias("best_jaccard"),
            F.col("new_id").isNotNull().alias("is_dup"),
        )
        .orderBy("doc_id")
    )


def t40_build_index(spark: SparkSession, sf_dir: str, index_dir: str) -> None:
    """Write t40's corpus dedup index (band table + verify table) to
    parquet — the one-time production cost the incremental ingest path
    amortizes. bench.py's t40_indexed leg times this separately from
    the per-batch match."""
    d = load_table(spark, sf_dir, "documents")
    corpus = d.filter(F.col("source") != "src0")
    dedup.write_band_index(
        corpus, index_dir, "doc_id", "text",
        k_shingle=K_SHINGLE, num_perm=NUM_PERM, band_size=BAND_SIZE,
    )


def t40_ingest_dedup_indexed(
    spark: SparkSession, sf_dir: str, index_dir: str
) -> DataFrame:
    """t40 with the corpus side read from the STORED index (production
    ingest shape): only the new batch pays shingling + signatures; the
    corpus is a parquet scan. Bit-identical output to the catalog t40
    on the same fixture (bench asserts it)."""
    d = load_table(spark, sf_dir, "documents")
    new = d.filter(F.col("source") == "src0")
    bands = spark.read.parquet(f"{index_dir}/bands.parquet")
    verify = spark.read.parquet(f"{index_dir}/verify.parquet")
    # production validation pattern: check the params ONCE against the
    # index manifest (a tiny FS read) and skip the per-match sigarr
    # probe; indices that predate the manifest fall back to the probe
    manifest = dedup._read_index_manifest(spark, index_dir)
    validate = manifest is None
    if manifest is not None:
        dedup._check_manifest_params(
            manifest, index_dir, K_SHINGLE, NUM_PERM, BAND_SIZE
        )
    hits = dedup.minhash_lsh_match_against_index(
        new, bands, verify, "doc_id", "text",
        k_shingle=K_SHINGLE, num_perm=NUM_PERM, band_size=BAND_SIZE,
        threshold=0.7, _validate_index=validate,
    )
    return _t40_report(new, hits)


@query("t40_incremental_ingest_dedup", _T40_SQL)
def t40_incremental_ingest_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    new = d.filter(F.col("source") == "src0")
    corpus = d.filter(F.col("source") != "src0")
    hits = dedup.minhash_lsh_match_against(
        new, corpus, "doc_id", "text",
        k_shingle=K_SHINGLE, num_perm=NUM_PERM, band_size=BAND_SIZE,
        threshold=0.7,
    )
    return _t40_report(new, hits)


# ---------------------------------------------------------------------------
# t41 — Gopher-style document quality rules (Rae et al. 2021, App. A1):
# the rule-based filter battery every corpus pipeline runs before the
# model-based scorer (t35) — word-count bounds, mean-word-length band,
# short-word ratio, minimum stop-word evidence, max single-token share.
# Every rule is INTEGER arithmetic on row-local token statistics (the
# cross-multiplied form: 10·Σlen ∈ [42n, 48n] instead of a float mean), so
# the whole battery is one zero-shuffle projection — scan speed at 100 TB
# — and bit-exact against the oracle. Per-rule booleans are emitted (not
# just the final keep) because production debugging needs per-rule drop
# attribution. Thresholds tuned to the fixture so every rule has a
# non-trivial pass/fail split.
# ---------------------------------------------------------------------------

_T41_SQL = r"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(trim(text), '[ \t\n\f\r]+'),
                             x -> x <> '') AS ts
  FROM documents
),
feat AS (
  SELECT doc_id,
         CAST(len(ts) AS BIGINT) AS n_words,
         CAST(list_sum(list_transform(ts, t -> length(t))) AS BIGINT) AS sum_chars,
         CAST(len(list_filter(ts, t -> length(t) <= 2)) AS BIGINT) AS n_short,
         CAST(len(list_filter(ts, t -> t = 'the' OR t = 'a' OR t = 'data'))
              AS BIGINT) AS n_stop,
         CAST(list_max(list_transform(list_distinct(ts),
                 t -> len(list_filter(ts, x -> x = t)))) AS BIGINT) AS max_tf
  FROM toks
)
SELECT doc_id, n_words,
       n_words >= 25 AS rule_word_count,
       10*sum_chars >= 42*n_words AND 10*sum_chars <= 48*n_words
         AS rule_mean_word_len,
       5*n_short <= n_words AS rule_short_ratio,
       n_stop >= 2 AS rule_stopwords,
       100*max_tf <= 11*n_words AS rule_max_token_share,
       (n_words >= 25
        AND 10*sum_chars >= 42*n_words AND 10*sum_chars <= 48*n_words
        AND 5*n_short <= n_words
        AND n_stop >= 2
        AND 100*max_tf <= 11*n_words) AS keep
FROM feat
ORDER BY doc_id
"""


@query("t41_gopher_quality_rules", _T41_SQL)
def t41_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    ts = F.filter(
        F.split(F.trim(F.col("text")), r"[ \t\n\f\r]+"), lambda x: x != ""
    )
    feat = d.select("doc_id", ts.alias("ts")).select(
        "doc_id",
        F.size("ts").cast("long").alias("n_words"),
        F.aggregate(
            F.col("ts"), F.lit(0).cast("long"), lambda a, t: a + F.length(t)
        ).alias("sum_chars"),
        F.size(F.filter(F.col("ts"), lambda t: F.length(t) <= 2))
        .cast("long")
        .alias("n_short"),
        F.size(
            F.filter(
                F.col("ts"),
                lambda t: (t == "the") | (t == "a") | (t == "data"),
            )
        )
        .cast("long")
        .alias("n_stop"),
        F.array_max(
            F.transform(
                F.array_distinct("ts"),
                lambda t: F.size(
                    F.filter(F.col("ts"), lambda x: x == t)
                ),
            )
        )
        .cast("long")
        .alias("max_tf"),
    )
    r1 = F.col("n_words") >= 25
    r2 = (10 * F.col("sum_chars") >= 42 * F.col("n_words")) & (
        10 * F.col("sum_chars") <= 48 * F.col("n_words")
    )
    r3 = 5 * F.col("n_short") <= F.col("n_words")
    r4 = F.col("n_stop") >= 2
    r5 = 100 * F.col("max_tf") <= 11 * F.col("n_words")
    return feat.select(
        "doc_id",
        "n_words",
        r1.alias("rule_word_count"),
        r2.alias("rule_mean_word_len"),
        r3.alias("rule_short_ratio"),
        r4.alias("rule_stopwords"),
        r5.alias("rule_max_token_share"),
        (r1 & r2 & r3 & r4 & r5).alias("keep"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# t42 — edit-distance verification of near-dup pairs: the LSH pipeline's
# verified pairs (t05's output — already bounded by banding + Jaccard)
# annotated with EXACT Levenshtein distance and an integer permille of the
# longer text — the character-level confirmation layer used when shingle
# Jaccard is too coarse (e.g. small local edits vs block moves).
# Levenshtein is the classic O(len²) DP per pair: affordable precisely
# because it runs on the verified-pair set, never the corpus — the staged
# cheap-filter → expensive-verify discipline that makes quadratic
# primitives usable at 100 TB. Both engines implement the same DP
# (unit-cost insert/delete/substitute), so the integers agree exactly.
# ---------------------------------------------------------------------------

_T42_SQL = f"""
WITH pairs AS ({_T05_SQL})
SELECT p.id_a, p.id_b,
       CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist,
       CAST(levenshtein(a.text, b.text) * 1000
            // greatest(length(a.text), length(b.text)) AS BIGINT)
         AS dist_permille
FROM pairs p
JOIN documents a ON a.doc_id = p.id_a
JOIN documents b ON b.doc_id = p.id_b
ORDER BY p.id_a, p.id_b
"""


@query("t42_editdist_verify", _T42_SQL)
def t42_editdist_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_neardup(
        d, "doc_id", "text",
        k_shingle=K_SHINGLE, num_perm=NUM_PERM, band_size=BAND_SIZE,
        threshold=0.7,
    ).select("id_a", "id_b")
    a = d.select(F.col("doc_id").alias("id_a"), F.col("text").alias("ta"))
    b = d.select(F.col("doc_id").alias("id_b"), F.col("text").alias("tb"))
    dist = F.levenshtein(F.col("ta"), F.col("tb"))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            dist.cast("long").alias("edit_dist"),
            F.expr(
                "CAST(levenshtein(ta, tb) * 1000 div "
                "greatest(length(ta), length(tb)) AS BIGINT)"
            ).alias("dist_permille"),
        )
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# t43 — dataset card (per-source corpus summary): the one-page statistical
# summary every released dataset ships — per source: volume (docs/tokens),
# language spread, exact-duplicate exposure, model-quality retention
# (t35's scorer, SHARED code), and — r7 judge task 6 — the DEDUP-KEY SKEW
# VERDICT: q85's skew diagnostic (key_skew_stats, the operator form living
# next to the salting utilities in functions/partitioning.py) applied to
# the md5 digest the t01-style exact dedup shuffles on. A source whose
# heaviest digest group exceeds _T43_SKEW_PERMILLE ×mean (a viral template
# / empty-page pile-up) is flagged dedup_key_skewed=true — the signal to
# reach for q53/q62's salting or AQE skew-join before running the dedup at
# scale. Composes one-shuffle passes: a zero-shuffle token/quality
# projection, one md5-digest groupBy for dup exposure + skew, and the
# final per-source aggregation. Everything is integer, so the card is
# bit-exact; output is one row per source — the audit artifact, not data.
# ---------------------------------------------------------------------------

# heaviest dedup-key group ≥ 20x the mean ⇒ salt the dedup shuffle
_T43_SKEW_PERMILLE = 20000

_T43_SQL = f"""
WITH q AS ({_T35_SQL.replace("ORDER BY doc_id", "")}),
base AS (
  SELECT d.doc_id, d.source, d.lang,
         len(list_filter(string_split_regex(trim(d.text), '[ \t\n\f\r]+'),
                         x -> x <> '')) AS n_tokens,
         md5(d.text) AS digest
  FROM documents d
),
dupes AS (
  SELECT digest FROM base GROUP BY digest HAVING COUNT(*) > 1
),
skew AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(SUM(n) AS BIGINT) AS n_rows,
         CAST(MAX(n) AS BIGINT) AS max_n
  FROM (SELECT source, digest, COUNT(*) AS n FROM base
        GROUP BY source, digest)
  GROUP BY source
),
card AS (
  SELECT b.source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(b.n_tokens) AS BIGINT) AS n_tokens,
         CAST(COUNT(DISTINCT b.lang) AS BIGINT) AS n_langs,
         CAST(SUM(CASE WHEN dup.digest IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_exact_dup_docs,
         CAST(SUM(CASE WHEN q.keep THEN 1 ELSE 0 END) AS BIGINT)
           AS n_quality_keep
  FROM base b
  LEFT JOIN dupes dup ON dup.digest = b.digest
  JOIN q ON q.doc_id = b.doc_id
  GROUP BY b.source
)
SELECT c.source, c.n_docs, c.n_tokens, c.n_langs, c.n_exact_dup_docs,
       c.n_quality_keep,
       s.max_n AS max_dup_group,
       CAST(s.max_n * 1000 // (s.n_rows // s.n_keys) AS BIGINT)
         AS dedup_skew_permille,
       (s.max_n * 1000 // (s.n_rows // s.n_keys)) >= {_T43_SKEW_PERMILLE}
         AS dedup_key_skewed
FROM card c JOIN skew s ON s.source = c.source
ORDER BY c.source
"""


@query("t43_dataset_card", _T43_SQL)
def t43_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.trim(F.col("text")), r"[ \t\n\f\r]+"), lambda x: x != ""
    )
    base = d.select(
        "doc_id",
        "source",
        "lang",
        F.size(toks).cast("long").alias("n_tokens"),
        F.md5("text").alias("digest"),
    )
    dupes = (
        base.groupBy("digest")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .select("digest", F.lit(True).alias("__dup"))
    )
    quality = quality_score_projection(d).select("doc_id", "keep")
    card = (
        # no broadcast hint: the dup-digest set is data-dependent (could be
        # corpus-scale on a duplicate-heavy crawl) — the digest join reuses
        # the groupBy's hash partitioning anyway
        base.join(dupes, "digest", "left")
        .join(quality, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
            F.sum(
                F.when(F.col("__dup"), 1).otherwise(0)
            ).cast("long").alias("n_exact_dup_docs"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0))
            .cast("long")
            .alias("n_quality_keep"),
        )
    )
    skew = key_skew_stats(base, ["digest"], by=["source"]).select(
        "source",
        F.col("max_n").alias("max_dup_group"),
        F.col("skew_ratio_permille").alias("dedup_skew_permille"),
        (F.col("skew_ratio_permille") >= _T43_SKEW_PERMILLE).alias(
            "dedup_key_skewed"
        ),
    )
    # per-source frames are group-cardinality-sized; the join is trivial
    return card.join(skew, "source").orderBy("source")


# ---------------------------------------------------------------------------
# t44 — boilerplate removal by document frequency (the RefinedWeb/Dolma
# line rule at t39's chunk granularity): a chunk appearing in ≥ DF_MIN
# DISTINCT documents is boilerplate (nav text, license blurbs, templates)
# and is removed from EVERY document — including its first occurrence,
# which is what distinguishes this from t39's keep-first dedup. Plan: the
# same single digest-keyed shuffle as t39 computes distinct-doc frequency,
# boilerplate flags join back on the already-partitioned digest key, and
# the cleaned text is re-sliced doc-side and digest-verified per doc. The
# df table is vocabulary-, not corpus-sized.
# ---------------------------------------------------------------------------

_T44_DF_MIN = 3

_T44_SQL = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(trim(text), '[ \t\n\f\r]+'),
                             x -> x <> '') AS ts
  FROM documents
),
chunks AS (
  SELECT doc_id, g AS chunk_idx,
         array_to_string(ts[(g-1)*{_T39_W}+1 : least(g*{_T39_W}, len(ts))],
                         ' ') AS chunk
  FROM toks, LATERAL (SELECT unnest(generate_series(
         1, CAST((len(ts) + {_T39_W} - 1) // {_T39_W} AS INT))) AS g)
),
df AS (
  SELECT chunk, COUNT(DISTINCT doc_id) AS df FROM chunks GROUP BY chunk
),
flagged AS (
  SELECT c.doc_id, c.chunk_idx, c.chunk, d.df >= {_T44_DF_MIN} AS boiler
  FROM chunks c JOIN df d ON d.chunk = c.chunk
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(CASE WHEN boiler THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       md5(COALESCE(string_agg(CASE WHEN NOT boiler THEN chunk END,
                               ' ' ORDER BY chunk_idx), '')) AS cleaned_digest
FROM flagged GROUP BY doc_id
ORDER BY doc_id
"""


@query("t44_boilerplate_chunk_removal", _T44_SQL)
def t44_boilerplate_chunk_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t39_chunked_docs(spark, sf_dir)
    slim = docs.select(
        "doc_id", F.posexplode("dgs").alias("pos", "dg")
    ).select("doc_id", (F.col("pos") + 1).alias("chunk_idx"), "dg")
    # digest-keyed DF count (vocabulary-sized) joins back on the digest the
    # slim rows are already partitioned by
    df = slim.groupBy("dg").agg(F.countDistinct("doc_id").alias("df"))
    flagged = slim.join(df, "dg").withColumn(
        "boiler", F.col("df") >= _T44_DF_MIN
    )
    per_doc = flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.when(F.col("boiler"), 1).otherwise(0)).alias("n_removed"),
        F.sort_array(
            F.collect_list(F.when(~F.col("boiler"), F.col("chunk_idx")))
        ).alias("keep_idxs"),
    )
    # inner join = the oracle's GROUP BY over flagged (docs with ≥1 chunk)
    return (
        docs.join(per_doc, "doc_id")
        .select(
            "doc_id",
            "n_chunks",
            "n_removed",
            _t39_rebuild(F.col("keep_idxs")).alias("cleaned_digest"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# t45 — filter-impact drift report (the monitoring artifact a filtering
# stage ships with): how does the t35 quality gate shift the corpus's
# LANGUAGE MIX? Per language: docs before/after, each side's share of its
# own total (integer permille), the shift, and per-language retention —
# the numbers a data team reads before accepting a filter that silently
# skews multilinguality (the known failure mode of quality classifiers).
# The scorer is t35's SHARED projection; totals ride a 1-row broadcast
# aggregate; all columns are integer-exact.
# ---------------------------------------------------------------------------

_T45_SQL = f"""
WITH q AS ({_T35_SQL.replace("ORDER BY doc_id", "")}),
j AS (SELECT d.lang, q.keep FROM documents d JOIN q ON q.doc_id = d.doc_id),
per_lang AS (
  SELECT lang,
         CAST(COUNT(*) AS BIGINT) AS n_before,
         CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_after
  FROM j GROUP BY lang
),
tot AS (SELECT SUM(n_before) AS tb, SUM(n_after) AS ta FROM per_lang)
SELECT lang, n_before, n_after,
       CAST(n_before * 1000 // tot.tb AS BIGINT) AS share_before_permille,
       CAST(n_after * 1000 // tot.ta AS BIGINT) AS share_after_permille,
       CAST(n_after * 1000 // tot.ta - n_before * 1000 // tot.tb AS BIGINT)
         AS shift_permille,
       CAST(n_after * 1000 // n_before AS BIGINT) AS retention_permille
FROM per_lang CROSS JOIN tot
ORDER BY lang
"""


@query("t45_filter_drift_report", _T45_SQL)
def t45_filter_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    q = quality_score_projection(d).select("doc_id", "keep")
    per_lang = (
        d.select("doc_id", "lang")
        .join(q, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_before"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0))
            .cast("long")
            .alias("n_after"),
        )
    )
    tot = per_lang.agg(
        F.sum("n_before").alias("tb"), F.sum("n_after").alias("ta")
    )
    sb = F.expr("n_before * 1000 div tb")
    sa = F.expr("n_after * 1000 div ta")
    return (
        per_lang.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "n_before",
            "n_after",
            sb.alias("share_before_permille"),
            sa.alias("share_after_permille"),
            (sa - sb).alias("shift_permille"),
            F.expr("n_after * 1000 div n_before").alias("retention_permille"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# t46 — curriculum staging (length-based curriculum learning prep): every
# document gets a stage 1..4 = its length quartile WITHIN ITS LANGUAGE
# (ntile with doc_id tiebreak — per-language because raw length quartiles
# would just reproduce the language mix), plus each stage's doc/token
# budget — the schedule table a curriculum-ordered training run consumes.
# One per-language window (languages are the partitions — bounded) and
# one small aggregation.
# ---------------------------------------------------------------------------

_T46_SQL = """
WITH staged AS (
  SELECT doc_id, lang, n_chars,
         CAST(ntile(4) OVER (PARTITION BY lang
                             ORDER BY n_chars, doc_id) AS INT) AS stage
  FROM documents
)
SELECT lang, stage,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars_total,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars
FROM staged
GROUP BY lang, stage
ORDER BY lang, stage
"""


@query("t46_curriculum_stages", _T46_SQL)
def t46_curriculum_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy("n_chars", "doc_id")
    staged = d.select(
        "lang", "n_chars", F.ntile(4).over(w).cast("int").alias("stage")
    )
    return (
        staged.groupBy("lang", "stage")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("n_chars_total"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("lang", "stage")
    )


# ---------------------------------------------------------------------------
# t47 — tokenizer fertility report (chars-per-token by language): the
# standard tokenizer-evaluation metric (how many characters one token
# covers — low fertility on a language means the tokenizer fragments it,
# inflating its effective sequence length and training cost). Uses t28's
# BPE-style regex tokenizer; fertility is reported as integer permille
# (chars·1000 ÷ tokens) per the determinism contract. One zero-shuffle
# projection + a per-language aggregate.
# ---------------------------------------------------------------------------

_T47_SQL = f"""
WITH tok AS (
  SELECT lang,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(len(regexp_extract_all(text, '{_BPE_PATTERN}')) AS BIGINT)
           AS n_tokens
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(SUM(n_chars) * 1000 // SUM(n_tokens) AS BIGINT)
         AS chars_per_token_permille
FROM tok GROUP BY lang ORDER BY lang
"""


@query("t47_tokenizer_fertility", _T47_SQL)
def t47_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "lang",
        F.length("text").cast("long").alias("n_chars"),
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit(_BPE_PATTERN), 0)
        ).cast("long").alias("n_tokens"),
    )
    return (
        tok.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("n_chars"),
            F.sum("n_tokens").alias("n_tokens"),
            F.expr("sum(n_chars) * 1000 div sum(n_tokens)").alias(
                "chars_per_token_permille"
            ),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# t48 — duplication profile (the power-law audit of corpus duplication):
# histogram of exact-duplicate GROUP SIZES — how many contents appear
# once, twice, ... — plus each band's share of total docs in integer
# permille. The chart a dedup report leads with (crawl corpora follow a
# heavy-tailed copy distribution; a spike at high n_copies means a
# template or mirror). Composes t02's digest groups; the histogram input
# is content-cardinality-sized.
# ---------------------------------------------------------------------------

_T48_SQL = """
WITH g AS (
  SELECT md5(text) AS digest, CAST(COUNT(*) AS BIGINT) AS n_copies
  FROM documents GROUP BY digest
),
tot AS (SELECT CAST(SUM(n_copies) AS BIGINT) AS n_docs FROM g)
SELECT n_copies,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(COUNT(*) * n_copies AS BIGINT) AS n_docs_in_band,
       CAST(COUNT(*) * n_copies * 1000 // tot.n_docs AS BIGINT)
         AS share_permille
FROM g CROSS JOIN tot
GROUP BY n_copies, tot.n_docs
ORDER BY n_copies
"""


@query("t48_duplication_profile", _T48_SQL)
def t48_duplication_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    g = d.groupBy(F.md5("text").alias("digest")).agg(
        F.count(F.lit(1)).alias("n_copies")
    )
    tot = g.agg(F.sum("n_copies").alias("n_docs"))
    return (
        g.crossJoin(F.broadcast(tot))
        .groupBy("n_copies", "n_docs")
        .agg(F.count(F.lit(1)).alias("n_groups"))
        .select(
            "n_copies",
            "n_groups",
            (F.col("n_groups") * F.col("n_copies")).alias("n_docs_in_band"),
            F.expr("n_groups * n_copies * 1000 div n_docs").alias(
                "share_permille"
            ),
        )
        .orderBy("n_copies")
    )


# ---------------------------------------------------------------------------
# t49 — data-driven stopword induction: tokens whose DOCUMENT frequency
# exceeds a permille threshold of the corpus are corpus-specific
# stopwords (the IDF-based list that replaces t41's hardcoded stoplist on
# a new corpus — CCNet builds its per-language lists exactly this way).
# One (token, doc) distinct shuffle then a vocabulary-sized aggregate;
# thresholds in integer permille per the determinism contract.
# ---------------------------------------------------------------------------

_T49_DF_PERMILLE = 600

_T49_SQL = f"""
WITH toks AS (
  SELECT DISTINCT doc_id,
         unnest(list_filter(string_split_regex(trim(text), '[ \t\n\f\r]+'),
                            x -> x <> '')) AS token
  FROM documents
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
df AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM toks GROUP BY token
)
SELECT token, df,
       CAST(df * 1000 // tot.n_docs AS BIGINT) AS df_permille,
       df * 1000 // tot.n_docs >= {_T49_DF_PERMILLE} AS is_stopword
FROM df CROSS JOIN tot
ORDER BY token
"""


@query("t49_stopword_induction", _T49_SQL)
def t49_stopword_induction(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split(F.trim(F.col("text")), r"[ \t\n\f\r]+"),
                    lambda x: x != "",
                )
            )
        ).alias("token"),
    )
    tot = d.agg(F.count(F.lit(1)).alias("n_docs"))
    df = toks.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    return (
        df.crossJoin(F.broadcast(tot))
        .select(
            "token",
            "df",
            F.expr("df * 1000 div n_docs").alias("df_permille"),
            (F.expr("df * 1000 div n_docs") >= _T49_DF_PERMILLE).alias(
                "is_stopword"
            ),
        )
        .orderBy("token")
    )


# ---------------------------------------------------------------------------
# t50 — language-ID confusion audit: t08's marker-argmax classifier
# evaluated against the fixture's TRUE lang labels as a full confusion
# matrix (true lang × predicted lang, exact integer counts + row-permille
# rates) — the eval harness that tells you WHICH languages the heuristic
# confuses before you trust its routing (the s19/t33 evaluation pattern
# applied to the lang-ID component). Shares the operator with t08
# verbatim; one small aggregation over the predictions.
# ---------------------------------------------------------------------------

_T50_SQL = f"""
WITH scored AS (
  SELECT doc_id, lang,
       {_score_cols}
  FROM documents
),
pred AS (
  SELECT doc_id, lang,
         CASE {_case_chain}
              ELSE '{_langs[0]}' END AS pred_lang
  FROM scored
),
rowtot AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_lang FROM pred GROUP BY lang
)
SELECT p.lang AS true_lang, p.pred_lang,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) * 1000 // r.n_lang AS BIGINT) AS rate_permille
FROM pred p JOIN rowtot r ON r.lang = p.lang
GROUP BY p.lang, p.pred_lang, r.n_lang
ORDER BY true_lang, pred_lang
"""


@query("t50_langid_confusion", _T50_SQL)
def t50_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    pred = text_ops.lang_id(d, "doc_id", "text", truth_col="lang")
    w = W.partitionBy("lang")
    return (
        pred.groupBy(F.col("lang").alias("true_lang"), "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("n_lang", F.sum("n").over(W.partitionBy("true_lang")))
        .select(
            "true_lang",
            "pred_lang",
            "n",
            F.expr("n * 1000 div n_lang").alias("rate_permille"),
        )
        .orderBy("true_lang", "pred_lang")
    )
