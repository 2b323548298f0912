"""Relational query surface (SURVEY.md §2 Table B + the standard relational
operator categories listed there: join / window / sort / set-op / rollup /
pivot / string / date / sessionization / as-of).

The reference consumes these through Dask (scan B1, projection B2,
elementwise B3/B5, aggregation B4 — ``/root/reference/system_tests/
test_fit_predict.py:26-56``); here they are first-class, Catalyst-optimized
DataFrame plans, each with a DuckDB oracle.

Determinism: see queries/__init__ docstring — money/qty aggregates use exact
int64 fixed-point (cents) before SUM, so no floating-point summation order
can diverge. At true 100 TB scale the production path would use plain double
sums (or Spark decimal); the fixed-point forms here exist to make the
correctness gate bit-exact, and overflow headroom is documented per query
(int64 holds ~9.2e18; worst case here is ~1e11/row · 6e8 rows at sf100 —
still within range for charge-style triple products only up to ~1e7 rows per
group; the engine's own API surfaces double aggregates).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from dask_lightgbm_spark.queries import query
from dask_lightgbm_spark.sources.readers import load_table


def _cents(c: Column) -> Column:
    """Exact int64 fixed-point: value·100 (inputs are 2-decimal doubles)."""
    return F.round(c * 100).cast("long")


def _pct(c: Column) -> Column:
    """Exact int64 percent units for discount/tax (2-decimal fractions)."""
    return F.round(c * 100).cast("long")


# ---------------------------------------------------------------------------
# q01 — TPC-H Q1-style pricing summary: scan → filter → groupBy → 8 aggs.
# The flagship query (entry() runs it at sf0.001).
# ---------------------------------------------------------------------------

_Q01_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_qty,
  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_base_price,
  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)/10000.0 AS sum_disc_price,
  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT)) * (100 + CAST(round(l_tax*100) AS BIGINT))) AS DOUBLE)/1000000.0 AS sum_charge,
  CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS DOUBLE)/100.0/COUNT(*) AS avg_qty,
  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100.0/COUNT(*) AS avg_price,
  CAST(SUM(CAST(round(l_discount*100) AS BIGINT)) AS DOUBLE)/100.0/COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query("q01_pricing_summary", _Q01_SQL)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    qty_c = _cents(F.col("l_quantity"))
    ep_c = _cents(F.col("l_extendedprice"))
    disc_c = _pct(F.col("l_discount"))
    tax_c = _pct(F.col("l_tax"))
    cnt = F.count(F.lit(1))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(qty_c).cast("double") / F.lit(100.0)).alias("sum_qty"),
            (F.sum(ep_c).cast("double") / F.lit(100.0)).alias("sum_base_price"),
            (F.sum(ep_c * (F.lit(100) - disc_c)).cast("double") / F.lit(10000.0)).alias(
                "sum_disc_price"
            ),
            (
                F.sum(ep_c * (F.lit(100) - disc_c) * (F.lit(100) + tax_c)).cast("double")
                / F.lit(1000000.0)
            ).alias("sum_charge"),
            (F.sum(qty_c).cast("double") / F.lit(100.0) / cnt).alias("avg_qty"),
            (F.sum(ep_c).cast("double") / F.lit(100.0) / cnt).alias("avg_price"),
            (F.sum(disc_c).cast("double") / F.lit(100.0) / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# q02 — projection + pushed-down filter + row-level elementwise arithmetic
# (B2/B5). Row-level IEEE ops are bit-exact across engines.
# ---------------------------------------------------------------------------

_Q02_SQL = """
SELECT
  l_orderkey, l_linenumber, l_quantity, l_extendedprice,
  l_extendedprice * (1 - l_discount) AS disc_price
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
  AND l_quantity >= 45
"""


@query("q02_filter_project", _Q02_SQL)
def q02_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_quantity") >= 45)
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias("disc_price"),
    )


# ---------------------------------------------------------------------------
# q03 — global aggregation (B4): sum/avg/min/max/count/count distinct.
# ---------------------------------------------------------------------------

_Q03_SQL = """
SELECT
  COUNT(*) AS n_rows,
  CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_qty,
  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100.0/COUNT(*) AS avg_price,
  MIN(l_extendedprice) AS min_price,
  MAX(l_extendedprice) AS max_price,
  COUNT(DISTINCT l_partkey) AS n_parts
FROM lineitem
"""


@query("q03_global_agg", _Q03_SQL)
def q03_global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    cnt = F.count(F.lit(1))
    return l.agg(
        cnt.alias("n_rows"),
        (F.sum(_cents(F.col("l_quantity"))).cast("double") / F.lit(100.0)).alias("sum_qty"),
        (F.sum(_cents(F.col("l_extendedprice"))).cast("double") / F.lit(100.0) / cnt).alias(
            "avg_price"
        ),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.countDistinct("l_partkey").alias("n_parts"),
    )


# ---------------------------------------------------------------------------
# q04 — multi-way join with broadcast dims: revenue per region/nation.
# nation/region are CONSTANT-size → forced broadcast at any SF. supplier
# GROWS with SF, so it gets no hint: Catalyst auto-broadcasts it below
# spark.sql.autoBroadcastJoinThreshold (every local fixture) and falls
# back to a shuffle join at the SF where a forced broadcast would OOM —
# lineitem shuffles only beyond that point, plus the final groupBy.
# ---------------------------------------------------------------------------

_Q04_SQL = """
SELECT
  r_name, n_name,
  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)/10000.0 AS revenue,
  COUNT(*) AS n_items
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY r_name, n_name
"""


@query("q04_join_nation_revenue", _Q04_SQL)
def q04_join_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    ep_c = _cents(F.col("l_extendedprice"))
    disc_c = _pct(F.col("l_discount"))
    return (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            (F.sum(ep_c * (F.lit(100) - disc_c)).cast("double") / F.lit(10000.0)).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("r_name", "n_name")
    )


# ---------------------------------------------------------------------------
# q05 — global sort + limit (top-k). Tie-broken on the key → deterministic.
# Spark executes as TakeOrderedAndProject (no full sort at scale).
# ---------------------------------------------------------------------------

_Q05_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""


@query("q05_top_orders", _Q05_SQL)
def q05_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q06 — window function: top-3 orders per customer (row_number).
# ---------------------------------------------------------------------------

_Q06_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
  FROM orders
) WHERE rn <= 3
"""


@query("q06_window_topk_per_customer", _Q06_SQL)
def q06_window_topk_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


# ---------------------------------------------------------------------------
# q07/q08/q09 — set ops + semi/anti joins.
# ---------------------------------------------------------------------------

_Q07_SQL = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
"""


@query("q07_setop_intersect", _Q07_SQL)
def q07_setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.intersect(b)


_Q08_SQL = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


@query("q08_anti_join", _Q08_SQL)
def q08_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


_Q09_SQL = """
SELECT c_custkey, c_mktsegment FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
"""


@query("q09_semi_join", _Q09_SQL)
def q09_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_mktsegment")


# ---------------------------------------------------------------------------
# q10/q20 — rollup & cube (grouping sets).
# ---------------------------------------------------------------------------

_Q10_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@query("q10_rollup", _Q10_SQL)
def q10_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.sum(_cents(F.col("l_quantity"))).cast("double") / F.lit(100.0)).alias("sum_qty"),
    )


_Q20_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@query("q20_cube", _Q20_SQL)
def q20_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.cube("l_returnflag", "l_linestatus").agg(F.count(F.lit(1)).alias("n_rows"))


# ---------------------------------------------------------------------------
# q11 — grouped distinct counts.
# ---------------------------------------------------------------------------

_Q11_SQL = """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_supps,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""


@query("q11_distinct_counts", _Q11_SQL)
def q11_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# q12 — string functions.
# ---------------------------------------------------------------------------

_Q12_SQL = """
SELECT p_partkey,
       upper(p_brand) AS brand_u,
       lower(p_type) AS type_l,
       substr(p_name, 1, 8) AS name_pfx,
       length(p_name) AS name_len,
       p_brand || '/' || p_type AS brand_type
FROM part
WHERE p_type LIKE '%ECONOMY%'
"""


@query("q12_string_funcs", _Q12_SQL)
def q12_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.filter(F.col("p_type").like("%ECONOMY%")).select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.lower("p_type").alias("type_l"),
        F.substring("p_name", 1, 8).alias("name_pfx"),
        F.length("p_name").cast("long").alias("name_len"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
    )


# ---------------------------------------------------------------------------
# q13 — date functions + grouped agg.
# ---------------------------------------------------------------------------

_Q13_SQL = """
SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
       CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS o_month,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS total_price
FROM orders
GROUP BY 1, 2
ORDER BY 1, 2
"""


@query("q13_date_agg", _Q13_SQL)
def q13_date_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("int").alias("o_year"),
            F.month("o_orderdate").cast("int").alias("o_month"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(_cents(F.col("o_totalprice"))).cast("double") / F.lit(100.0)).alias(
                "total_price"
            ),
        )
        .orderBy("o_year", "o_month")
    )


# ---------------------------------------------------------------------------
# q14 — time-bucketed event aggregation (batch twin of the streaming query).
# ---------------------------------------------------------------------------

_Q14_SQL = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


@query("q14_events_hourly", _Q14_SQL)
def q14_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(_cents(F.col("value"))).cast("double") / F.lit(100.0)).alias("sum_value"),
        )
        .orderBy("hour", "event_type")
    )


# ---------------------------------------------------------------------------
# q15 — sessionization: 30-min-gap sessions per user via lag + running sum.
# Exact integer microsecond arithmetic on both sides.
# ---------------------------------------------------------------------------

_Q15_SQL = """
WITH flagged AS (
  SELECT user_id,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
FROM flagged GROUP BY user_id
"""


@query("q15_sessionize", _Q15_SQL)
def q15_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    prev = F.lag(us).over(w)
    new_s = F.when(prev.isNull() | ((us - prev) > 1800000000), 1).otherwise(0)
    return (
        e.withColumn("new_session", new_s)
        .groupBy("user_id")
        .agg(F.sum("new_session").alias("n_sessions"), F.count(F.lit(1)).alias("n_events"))
    )


# ---------------------------------------------------------------------------
# q16 — pivot (wide aggregation).
# ---------------------------------------------------------------------------

_Q16_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(round(l_quantity*100) AS BIGINT) END) AS DOUBLE)/100.0 AS qty_O,
       CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(round(l_quantity*100) AS BIGINT) END) AS DOUBLE)/100.0 AS qty_F
FROM lineitem GROUP BY l_returnflag
"""


@query("q16_pivot", _Q16_SQL)
def q16_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    piv = (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(_cents(F.col("l_quantity"))))
    )
    return piv.select(
        "l_returnflag",
        (F.col("O").cast("double") / F.lit(100.0)).alias("qty_O"),
        (F.col("F").cast("double") / F.lit(100.0)).alias("qty_F"),
    )


# ---------------------------------------------------------------------------
# q17 — argmax via self-join on an exact aggregate (max is order-insensitive).
# ---------------------------------------------------------------------------

_Q17_SQL = """
SELECT o.o_custkey, o.o_orderkey, o.o_totalprice
FROM orders o
JOIN (SELECT o_custkey, MAX(o_totalprice) AS max_price FROM orders GROUP BY o_custkey) m
  ON o.o_custkey = m.o_custkey AND o.o_totalprice = m.max_price
"""


@query("q17_customer_max_order", _Q17_SQL)
def q17_customer_max_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(F.col("o_custkey").alias("m_custkey")).agg(
        F.max("o_totalprice").alias("max_price")
    )
    return o.join(
        m, (o.o_custkey == m.m_custkey) & (o.o_totalprice == m.max_price)
    ).select("o_custkey", "o_orderkey", "o_totalprice")


# ---------------------------------------------------------------------------
# q18 — TPC-H Q3-style shipping priority: 3-way join + agg + top-k.
# Revenue is exact fixed-point → deterministic ordering.
# ---------------------------------------------------------------------------

_Q18_SQL = """
SELECT l_orderkey,
       CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)/10000.0 AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@query("q18_shipping_priority", _Q18_SQL)
def q18_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    ep_c = _cents(F.col("l_extendedprice"))
    disc_c = _pct(F.col("l_discount"))
    # lineitem⋈orders is fact⋈fact (both grow with SF): pin a shuffle join.
    # Unpinned, the planner broadcasts the filtered lineitem side whenever
    # its pruned-column estimate dips under the threshold — a driver-serial
    # hash build of an SF-growing relation (measured 0.85 s of the 3.0 s
    # sf1 wall). The customer join below stays unhinted: a real dim,
    # broadcast by the threshold policy (r9s4).
    return (
        l.hint("merge").join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum(ep_c * (F.lit(100) - disc_c)).cast("double") / F.lit(10000.0)).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q19 — CASE WHEN bucketing + grouped exact-division average.
# ---------------------------------------------------------------------------

_Q19_SQL = """
SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'high'
            WHEN o_orderpriority = '3-MEDIUM' THEN 'mid'
            ELSE 'low' END AS prio_bucket,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100.0/COUNT(*) AS avg_price
FROM orders GROUP BY 1
"""


@query("q19_case_bucket", _Q19_SQL)
def q19_case_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high")
        .when(F.col("o_orderpriority") == "3-MEDIUM", "mid")
        .otherwise("low")
    )
    cnt = F.count(F.lit(1))
    return o.groupBy(bucket.alias("prio_bucket")).agg(
        cnt.alias("n_orders"),
        (F.sum(_cents(F.col("o_totalprice"))).cast("double") / F.lit(100.0) / cnt).alias(
            "avg_price"
        ),
    )


# ---------------------------------------------------------------------------
# q21 — as-of join (Spark lacks a native one): for each purchase, the most
# recent prior-or-same-instant 'view' by the same user. Implemented with the
# scalable union + running-max trick (one shuffle on user_id, no range
# explosion) — see operators/asof.py for the reusable operator.
# ---------------------------------------------------------------------------

_Q21_SQL = """
WITH u AS (
  SELECT user_id, ts, CAST(NULL AS BIGINT) AS event_id, CAST(NULL AS DOUBLE) AS value,
         0 AS kind, ts AS view_ts
  FROM events WHERE event_type = 'view'
  UNION ALL
  SELECT user_id, ts, event_id, value, 1 AS kind, CAST(NULL AS TIMESTAMP) AS view_ts
  FROM events WHERE event_type = 'purchase'
), w AS (
  SELECT *, max(view_ts) OVER (PARTITION BY user_id ORDER BY ts, kind
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_view_ts
  FROM u
)
SELECT event_id, user_id, ts, value, last_view_ts FROM w WHERE kind = 1
"""


@query("q21_asof_join", _Q21_SQL)
def q21_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dask_lightgbm_spark.operators.asof import asof_join

    e = load_table(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view").select("user_id", "ts")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    return asof_join(
        purchases, views, on="ts", by="user_id", value_col="ts", out_col="last_view_ts"
    ).select("event_id", "user_id", "ts", "value", "last_view_ts")


# ---------------------------------------------------------------------------
# q23 — elementwise predicate-as-data ratio (B3): the reference's accuracy
# metric pattern ((dy == dy_pred).sum() / len(dy),
# system_tests/test_fit_predict.py:35) over fixture data.
# ---------------------------------------------------------------------------

_Q23_SQL = """
SELECT CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS DOUBLE)/COUNT(*) AS frac_n,
       COUNT(*) AS n
FROM lineitem
"""


@query("q23_predicate_ratio", _Q23_SQL)
def q23_predicate_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.agg(
        (
            F.sum(F.when(F.col("l_returnflag") == "N", 1).otherwise(0)).cast("double")
            / F.count(F.lit(1))
        ).alias("frac_n"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# q22 — positional column projection (reference B2: data.iloc[:, :-1],
# system_tests/test_fit_predict.py:27). Pure metadata op via data.iloc_cols.
# ---------------------------------------------------------------------------

_Q22_SQL = """
SELECT n_nationkey, n_name FROM nation
"""


@query("q22_positional_projection", _Q22_SQL)
def q22_positional_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dask_lightgbm_spark.data import iloc_cols

    n = load_table(spark, sf_dir, "nation")
    return iloc_cols(n, slice(None, -1))  # all but last column


# ---------------------------------------------------------------------------
# q24 — arbitrary-Python-per-group (reference B6 / applyInPandas): z-score
# of quantity within each returnflag group, computed in a pandas kernel with
# exact-int sums so the SQL window oracle reproduces it bit-exactly.
# ---------------------------------------------------------------------------

_Q24_SQL = """
WITH base AS (
  SELECT l_orderkey, l_linenumber, l_returnflag,
         CAST(round(l_quantity*100) AS BIGINT) AS qc
  FROM lineitem
), stats AS (
  SELECT l_orderkey, l_linenumber, l_returnflag, qc,
         SUM(qc) OVER w AS s, COUNT(*) OVER w AS n, SUM(qc*qc) OVER w AS sq
  FROM base
  WINDOW w AS (PARTITION BY l_returnflag)
)
SELECT l_orderkey, l_linenumber, l_returnflag,
       (qc - s/n) / sqrt((sq - s*(s/n))/n) AS z
FROM stats
"""


@query("q24_grouped_zscore_pandas", _Q24_SQL)
def q24_grouped_zscore_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The per-group kernel is just (sum, count, sum-of-squares) + row-local
    # float math, so it needs no Python boundary at all (guide §4.1): the
    # exact-int group stats come from a built-in partial aggregation (3
    # groups -> a few rows) broadcast back onto the fact rows, and the z
    # expression below is the ORACLE's own float expression verbatim —
    # (qc - s/n) / sqrt((sq - s*(s/n))/n) — the identical IEEE op sequence
    # the previous applyInPandas kernel ran (mean = s/n; sd =
    # sqrt((sq - s*mean)/n); z = (qc - mean)/sd). The old plan shipped
    # every row JVM->Python->JVM and shuffled the whole table on a 3-value
    # key (one straggler partition per group); this one shuffles 3 rows.
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.round(F.col("l_quantity") * 100).cast("long").alias("qc"),
    )
    stats = l.groupBy("l_returnflag").agg(
        F.sum("qc").alias("__s"),
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col("qc") * F.col("qc")).alias("__sq"),
    )
    return (
        l.join(F.broadcast(stats), "l_returnflag")
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            F.expr("(qc - __s/__n) / sqrt((__sq - __s*(__s/__n))/__n)").alias("z"),
        )
    )


# ---------------------------------------------------------------------------
# q25 — arbitrary-Python-per-partition (reference B7 / mapInPandas, the
# map_partitions/map_blocks surface, core.py:165,171): elementwise math in a
# pandas batch kernel; numpy float64 ops are bit-identical to SQL doubles.
# ---------------------------------------------------------------------------

_Q25_SQL = """
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS disc_price,
       l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
FROM lineitem
WHERE l_quantity >= 49
"""


@query("q25_mapinpandas_elementwise", _Q25_SQL)
def q25_mapinpandas_elementwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)

    def kernel(batches):
        for pdf in batches:
            disc = pdf["l_extendedprice"] * (1 - pdf["l_discount"])
            yield pd.DataFrame(
                {
                    "l_orderkey": pdf["l_orderkey"],
                    "l_linenumber": pdf["l_linenumber"],
                    "disc_price": disc,
                    "charge": disc * (1 + pdf["l_tax"]),
                }
            )

    return l.mapInPandas(
        kernel,
        schema="l_orderkey long, l_linenumber int, disc_price double, charge double",
    )


# ---------------------------------------------------------------------------
# q26 — JSON functions: extract a numeric field from the events.props JSON
# string and aggregate it (exact ints). Spark get_json_object ≡ DuckDB
# json_extract_string.
# ---------------------------------------------------------------------------

_Q26_SQL = """
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
"""


@query("q26_json_extract", _Q26_SQL)
def q26_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


# ---------------------------------------------------------------------------
# q27 — explicit GROUPING SETS (beyond rollup/cube): totals by returnflag,
# by linestatus, and grand total — via the SQL API (Catalyst produces the
# same Expand plan either way).
# ---------------------------------------------------------------------------

_Q27_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


@query("q27_grouping_sets", _Q27_SQL)
def q27_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    l.createOrReplaceTempView("__q27_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows
        FROM __q27_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


# ---------------------------------------------------------------------------
# q28 — session_window (Spark's gap-based session operator, usable in batch
# and streaming). Oracle derives identical sessions with lag + running-sum
# window functions: a session breaks when the gap exceeds 30 min; session
# start/end/count must match exactly (integer µs arithmetic).
# ---------------------------------------------------------------------------

_Q28_SQL = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
FROM numbered GROUP BY user_id, session_id
"""


@query("q28_session_window", _Q28_SQL)
def q28_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# q29 — TPC-H Q14-style promo revenue: conditional aggregation over a join
# (CASE inside SUM), exact fixed-point ratio.
# ---------------------------------------------------------------------------

_Q29_SQL = """
SELECT
  CAST(SUM(CASE WHEN p_type LIKE 'ECONOMY%'
       THEN CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))
       ELSE 0 END) AS DOUBLE)
  / CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)
  AS promo_frac,
  COUNT(*) AS n
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
"""


@query("q29_promo_revenue", _Q29_SQL)
def q29_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = _cents(F.col("l_extendedprice")) * (F.lit(100) - _pct(F.col("l_discount")))
    promo = F.when(F.col("p_type").like("ECONOMY%"), rev).otherwise(F.lit(0))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            (F.sum(promo).cast("double") / F.sum(rev).cast("double")).alias("promo_frac"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# q30 — TPC-H Q19-style disjunctive multi-clause predicate (OR of ANDs
# across two tables): Catalyst pushes the common l_partkey=p_partkey while
# evaluating the residual disjunction post-join.
# ---------------------------------------------------------------------------

_Q30_SQL = """
SELECT COUNT(*) AS n,
       CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 20)
   OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 10 AND l_quantity <= 35)
   OR (p_brand = 'Brand#33' AND p_size BETWEEN 20 AND 50 AND l_quantity >= 20 AND l_quantity <= 50)
"""


@query("q30_disjunctive_predicates", _Q30_SQL)
def q30_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#11") & F.col("p_size").between(1, 15) & q.between(1, 20))
        | ((F.col("p_brand") == "Brand#22") & F.col("p_size").between(10, 30) & q.between(10, 35))
        | ((F.col("p_brand") == "Brand#33") & F.col("p_size").between(20, 50) & q.between(20, 50))
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(_cents(F.col("l_extendedprice"))).cast("double") / F.lit(100.0)).alias(
                "revenue"
            ),
        )
    )


# ---------------------------------------------------------------------------
# q31 — NOT IN subquery (TPC-H Q16 flavor): parts never shipped by supplier
# s_suppkey <= 3. Spark: left_anti join; SQL: NOT IN.
# ---------------------------------------------------------------------------

_Q31_SQL = """
SELECT p_brand, COUNT(*) AS n_parts
FROM part
WHERE p_partkey NOT IN (
  SELECT l_partkey FROM lineitem WHERE l_suppkey <= 3
)
GROUP BY p_brand
"""


@query("q31_not_in_subquery", _Q31_SQL)
def q31_not_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    shipped = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_suppkey") <= 3)
        .select("l_partkey")
    )
    return (
        p.join(shipped, p.p_partkey == shipped.l_partkey, "left_anti")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


# ---------------------------------------------------------------------------
# q32 — scalar subquery: customers whose balance exceeds every supplier's
# (exact MAX comparison — order-insensitive, no float-summation ambiguity).
# ---------------------------------------------------------------------------

_Q32_SQL = """
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE c_acctbal > (SELECT MAX(s_acctbal) FROM supplier)
"""


@query("q32_scalar_subquery", _Q32_SQL)
def q32_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    c.createOrReplaceTempView("__q32_customer")
    s.createOrReplaceTempView("__q32_supplier")
    return spark.sql(
        """
        SELECT c_custkey, c_name, c_acctbal
        FROM __q32_customer
        WHERE c_acctbal > (SELECT MAX(s_acctbal) FROM __q32_supplier)
        """
    )


# ---------------------------------------------------------------------------
# q33 — exact percentiles (continuous interpolation): Spark percentile ≡
# DuckDB quantile_cont. Quantities are whole numbers, so interpolated
# values are exactly-representable small fractions.
# ---------------------------------------------------------------------------

_Q33_SQL = """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.5) AS p50_qty,
       quantile_cont(l_quantity, 0.9) AS p90_qty,
       MIN(l_quantity) AS min_qty,
       MAX(l_quantity) AS max_qty
FROM lineitem GROUP BY l_returnflag
"""


@query("q33_percentiles", _Q33_SQL)
def q33_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", F.lit(0.5)).alias("p50_qty"),
        F.percentile("l_quantity", F.lit(0.9)).alias("p90_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


# ---------------------------------------------------------------------------
# q34 — array + regexp functions: split/sort/size/contains and a group-1
# regexp extraction, all reduced to scalar outputs for oracle comparison.
# ---------------------------------------------------------------------------

_Q34_SQL = """
SELECT p_partkey,
       CAST(len(string_split(p_type, ' ')) AS INTEGER) AS n_words,
       list_sort(string_split(p_type, ' '))[1] AS first_word_sorted,
       list_contains(string_split(p_type, ' '), 'ECONOMY') AS has_economy,
       regexp_extract(p_type, '([A-Z]+)$', 1) AS last_word
FROM part
"""


@query("q34_array_regexp_funcs", _Q34_SQL)
def q34_array_regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    words = F.split(F.col("p_type"), " ")
    return p.select(
        "p_partkey",
        F.size(words).alias("n_words"),
        F.sort_array(words).getItem(0).alias("first_word_sorted"),
        F.array_contains(words, "ECONOMY").alias("has_economy"),
        F.regexp_extract(F.col("p_type"), r"([A-Z]+)$", 1).alias("last_word"),
    )


# ---------------------------------------------------------------------------
# q35 — approximate aggregates (HLL distinct + approx percentile). Sketch
# internals differ across engines by construction, so the raw approx values
# can never hash-match an oracle. Instead the result embeds the approximation
# CONTRACT as data (the ml01/ml02 wide-margin-boolean pattern): Spark
# computes both the sketch and the exact statistic and emits
# ``abs(approx - exact) <= margin`` booleans; the oracle computes the same
# exact statistics and asserts the booleans are literally TRUE. Margins are
# wide (3x the HLL rsd=0.05 for distinct; 5% relative + 1.0 absolute for
# the t-digest median at accuracy=10000) so the deterministic sketches pass
# at every fixture SF with room to spare — a hash mismatch means the sketch
# actually broke its error bound, which is exactly what the gate should
# catch. Exact ints (n_rows, exact_parts) ride along for value-level
# verification of the non-approximate columns.
# ---------------------------------------------------------------------------

_Q35_SQL = """
SELECT l_returnflag,
       COUNT(*) AS n_rows,
       COUNT(DISTINCT l_partkey) AS exact_parts,
       TRUE AS parts_ok,
       TRUE AS median_ok
FROM lineitem GROUP BY l_returnflag
"""


@query("q35_approx_stats", _Q35_SQL)
def q35_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    # Keep the exact-distinct count OUT of the sketch aggregation: mixing
    # count_distinct with the object-state aggregates makes Catalyst key
    # the FIRST aggregation on (l_returnflag, l_partkey), so every one of
    # the ~200k fine groups carries the full per-group state — 52 HLL
    # longs + a t-digest + the exact-percentile value map — through two
    # exchanges, and ObjectHashAggregate falls back to sort-based past 128
    # groups (measured 6.8 s noop at sf0.1). Split, the sketch pass keeps
    # heavy state for only the 3 flag groups (codegen'd partial agg) and
    # the distinct pass is a plain long-only hash aggregate; the two
    # 3-row results join broadcast. Same scan columns, same aggregate
    # arithmetic per group, exact columns (n_rows, exact_parts, __em)
    # unchanged — oracle-verified bit-exact.
    sketches = l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("__ap"),
        F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(10000)).alias("__am"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("__em"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    exact = l.groupBy("l_returnflag").agg(
        F.count_distinct(F.col("l_partkey")).alias("exact_parts")
    )
    agg = sketches.join(F.broadcast(exact), "l_returnflag")
    return agg.select(
        "l_returnflag",
        "n_rows",
        "exact_parts",
        (
            F.abs(F.col("__ap") - F.col("exact_parts"))
            <= F.lit(0.15) * F.col("exact_parts")
        ).alias("parts_ok"),
        (
            F.abs(F.col("__am") - F.col("__em"))
            <= F.lit(0.05) * F.col("__em") + F.lit(1.0)
        ).alias("median_ok"),
    )


# ---------------------------------------------------------------------------
# q36 — MERGE INTO emulation (CDC upsert on plain parquet): update-else-
# insert via full-outer join + COALESCE. Updates = orders with status 'P'
# get a flagged priority; inserts = synthetic new keys.
# ---------------------------------------------------------------------------

_Q36_SQL = """
WITH updates AS (
  SELECT o_orderkey + 10000000 AS o_orderkey, o_custkey, o_orderstatus,
         o_totalprice, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey <= 5
  UNION ALL
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
         '0-MERGED' AS o_orderpriority
  FROM orders WHERE o_orderstatus = 'P'
)
SELECT COALESCE(u.o_orderkey, t.o_orderkey) AS o_orderkey,
       COALESCE(u.o_custkey, t.o_custkey) AS o_custkey,
       COALESCE(u.o_orderstatus, t.o_orderstatus) AS o_orderstatus,
       COALESCE(u.o_totalprice, t.o_totalprice) AS o_totalprice,
       COALESCE(u.o_orderdate, t.o_orderdate) AS o_orderdate,
       COALESCE(u.o_orderpriority, t.o_orderpriority) AS o_orderpriority
FROM orders t FULL OUTER JOIN updates u ON t.o_orderkey = u.o_orderkey
"""


@query("q36_merge_upsert", _Q36_SQL)
def q36_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dask_lightgbm_spark.operators.merge import merge_upsert

    o = load_table(spark, sf_dir, "orders")
    inserts = o.filter(F.col("o_orderkey") <= 5).withColumn(
        "o_orderkey", F.col("o_orderkey") + 10000000
    )
    changes = o.filter(F.col("o_orderstatus") == "P").withColumn(
        "o_orderpriority", F.lit("0-MERGED")
    )
    updates = inserts.select(*o.columns).unionByName(changes.select(*o.columns))
    return merge_upsert(o, updates, key="o_orderkey")


# ---------------------------------------------------------------------------
# q37 — remaining set ops: UNION ALL (bag) and EXCEPT (set difference).
# ---------------------------------------------------------------------------

_Q37_SQL = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
UNION ALL
SELECT c_custkey AS o_custkey FROM customer WHERE c_acctbal < 0
"""


@query("q37_union_except", _Q37_SQL)
def q37_union_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    opened = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    pending = o.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    negative = c.filter(F.col("c_acctbal") < 0).select(F.col("c_custkey").alias("o_custkey"))
    # subtract == ANSI EXCEPT (set semantics: distinct rows of A not in B)
    return opened.subtract(pending).unionAll(negative)


# ---------------------------------------------------------------------------
# q38 — posexplode / lateral unnest with ordinality: words of p_type with
# their position.
# ---------------------------------------------------------------------------

_Q38_SQL = """
SELECT p_partkey,
       CAST(g - 1 AS INTEGER) AS pos,
       string_split(p_type, ' ')[g] AS word
FROM (
  SELECT p_partkey, p_type,
         unnest(generate_series(1, len(string_split(p_type, ' ')))) AS g
  FROM part
)
"""


@query("q38_posexplode", _Q38_SQL)
def q38_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.posexplode(F.split(F.col("p_type"), " ")).alias("pos", "word"),
    )


# ---------------------------------------------------------------------------
# q39 — window FRAMES: 7-row moving sum/avg over daily revenue
# (rowsBetween; exact fixed-point arithmetic inside the frame).
# ---------------------------------------------------------------------------

_Q39_SQL = """
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS rev_c,
         COUNT(*) AS n_orders
  FROM orders GROUP BY 1
)
SELECT day,
       CAST(rev_c AS DOUBLE)/100.0 AS revenue,
       n_orders,
       CAST(SUM(rev_c) OVER w AS DOUBLE)/100.0 AS rev_7d,
       CAST(SUM(rev_c) OVER w AS DOUBLE)/100.0/CAST(SUM(n_orders) OVER w AS BIGINT) AS avg_order_7d
FROM daily
WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


@query("q39_moving_window_frame", _Q39_SQL)
def q39_moving_window_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.date_trunc("day", "o_orderdate").alias("day")).agg(
        F.sum(_cents(F.col("o_totalprice"))).alias("rev_c"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = W.orderBy("day").rowsBetween(-6, 0)
    return daily.select(
        "day",
        (F.col("rev_c").cast("double") / F.lit(100.0)).alias("revenue"),
        "n_orders",
        (F.sum("rev_c").over(w).cast("double") / F.lit(100.0)).alias("rev_7d"),
        (
            F.sum("rev_c").over(w).cast("double")
            / F.lit(100.0)
            / F.sum("n_orders").over(w)
        ).alias("avg_order_7d"),
    )


# ---------------------------------------------------------------------------
# q40 — funnel analysis: per user, did view → click → purchase happen in
# temporal order? Exact µs min-timestamps per stage, then ordered-stage
# counting — a training-data-pipeline staple on event logs.
# ---------------------------------------------------------------------------

_Q40_SQL = """
WITH stages AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_view,
         MIN(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t_purchase
  FROM events GROUP BY user_id
)
SELECT
  COUNT(*) AS n_users,
  CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_viewed,
  CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view THEN 1 ELSE 0 END) AS BIGINT) AS n_clicked_after,
  CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view AND t_purchase > t_click THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
FROM stages
"""


@query("q40_funnel", _Q40_SQL)
def q40_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    stages = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", us)).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", us)).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias("t_purchase"),
    )
    viewed = F.col("t_view").isNotNull()
    clicked = viewed & (F.col("t_click") > F.col("t_view"))
    full = clicked & (F.col("t_purchase") > F.col("t_click"))

    def count_true(cond):
        # NULL-safe: a three-valued NULL (e.g. viewed but never clicked)
        # must count as 0, exactly like the oracle's CASE ... ELSE 0 —
        # sum(cast) would skip NULLs and return NULL on an all-NULL column
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    return stages.agg(
        F.count(F.lit(1)).alias("n_users"),
        count_true(viewed).alias("n_viewed"),
        count_true(clicked).alias("n_clicked_after"),
        count_true(full).alias("n_full_funnel"),
    )


# ---------------------------------------------------------------------------
# q41 — MapType surface: parse the props JSON into map<string,long>, then
# map_keys/size/element access reduced to scalars.
# ---------------------------------------------------------------------------

_Q41_SQL = """
SELECT event_id,
       CAST(len(json_keys(props)) AS INTEGER) AS n_keys,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
FROM events
WHERE event_type = 'purchase'
"""


@query("q41_map_funcs", _Q41_SQL)
def q41_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    m = F.from_json(F.col("props"), T.MapType(T.StringType(), T.LongType()))
    return e.select(
        "event_id",
        F.size(F.map_keys(m)).alias("n_keys"),
        # try_element_at: ANSI mode (Spark 4 default) raises on a missing
        # map key; the oracle's json_extract_string yields NULL
        F.try_element_at(m, F.lit("k")).alias("k_value"),
    )


# ---------------------------------------------------------------------------
# q42 — HAVING (post-aggregation filter).
# ---------------------------------------------------------------------------

_Q42_SQL = """
SELECT l_orderkey, COUNT(*) AS n_items,
       CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS DOUBLE)/100.0 AS total_qty
FROM lineitem
GROUP BY l_orderkey
HAVING COUNT(*) >= 6
"""


@query("q42_having", _Q42_SQL)
def q42_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            (F.sum(_cents(F.col("l_quantity"))).cast("double") / F.lit(100.0)).alias("total_qty"),
        )
        .filter(F.col("n_items") >= 6)
    )


# ---------------------------------------------------------------------------
# q43 — date arithmetic: ship latency in whole days per order priority
# (datediff ≡ date_diff('day') for midnight-aligned dates; exact ints).
# ---------------------------------------------------------------------------

_Q43_SQL = """
SELECT o_orderpriority,
       COUNT(*) AS n,
       CAST(SUM(date_diff('day', o_orderdate, l_shipdate)) AS BIGINT) AS total_latency_days,
       CAST(SUM(date_diff('day', o_orderdate, l_shipdate)) AS BIGINT) / COUNT(*) AS avg_latency_days,
       MAX(date_diff('day', o_orderdate, l_shipdate)) AS max_latency_days
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


@query("q43_date_arithmetic", _Q43_SQL)
def q43_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    lat = F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).cast("long")
    cnt = F.count(F.lit(1))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            cnt.alias("n"),
            F.sum(lat).alias("total_latency_days"),
            (F.sum(lat) / cnt).alias("avg_latency_days"),
            F.max(lat).alias("max_latency_days"),
        )
    )


# ---------------------------------------------------------------------------
# q44 — INTERSECT ALL (bag semantics, multiplicity-preserving — the
# complement of q07's set INTERSECT and q37's set EXCEPT).
# ---------------------------------------------------------------------------

_Q44_SQL = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT ALL
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
"""


@query("q44_intersect_all", _Q44_SQL)
def q44_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.intersectAll(b)


# ---------------------------------------------------------------------------
# q45 — remaining window functions: lag/lead/first_value/ntile with a fully
# deterministic ordering.
# ---------------------------------------------------------------------------

_Q45_SQL = """
SELECT o_custkey, o_orderkey,
       lag(o_orderkey) OVER w AS prev_order,
       lead(o_orderkey) OVER w AS next_order,
       first_value(o_orderkey) OVER w AS first_order,
       CAST(ntile(4) OVER w AS INTEGER) AS quartile
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@query("q45_window_functions", _Q45_SQL)
def q45_window_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
        F.first("o_orderkey").over(w).alias("first_order"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
    )


# ---------------------------------------------------------------------------
# q46 — ordered string aggregation: Spark collect_list has no deterministic
# order, so sort before joining (≡ string_agg ... ORDER BY).
# ---------------------------------------------------------------------------

_Q46_SQL = """
SELECT o_custkey,
       string_agg(o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_custkey
"""


@query("q46_string_agg", _Q46_SQL)
def q46_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.array_join(F.array_sort(F.collect_list("o_orderstatus")), ",").alias("statuses"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# q47 — correlated scalar subquery: per-customer order count computed as a
# correlated subquery; Catalyst decorrelates it into an aggregate + outer
# join (subquery decorrelation is one of the §4 optimizer capabilities the
# substrate provides for free).
# ---------------------------------------------------------------------------

_Q47_SQL = """
SELECT c_custkey, c_mktsegment,
       (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders
FROM customer c
"""


@query("q47_correlated_scalar_subquery", _Q47_SQL)
def q47_correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("__q47_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("__q47_orders")
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment,
               (SELECT COUNT(*) FROM __q47_orders o WHERE o.o_custkey = c.c_custkey) AS n_orders
        FROM __q47_customer c
        """
    )


# ---------------------------------------------------------------------------
# q48 — time-RANGE window frame: per-event count/sum over the trailing hour
# within its event_type, keyed on exact int64 microseconds so the frame
# bounds are identical on both engines. Complements q39's ROWS frame — a
# RANGE frame over a time axis is the other physical windowing mode (peers
# by value, not position).
# ---------------------------------------------------------------------------

_Q48_SQL = """
SELECT event_id,
       COUNT(*) OVER w AS n_trailing_1h,
       CAST(SUM(CAST(round(value*100) AS BIGINT)) OVER w AS BIGINT) AS sum_cents_1h
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""


@query("q48_range_interval_window", _Q48_SQL)
def q48_range_interval_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("event_type")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "event_id",
        F.count(F.lit(1)).over(w).alias("n_trailing_1h"),
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .over(w)
        .cast("long")
        .alias("sum_cents_1h"),
    )


# ---------------------------------------------------------------------------
# q49 — conditional aggregation (FILTER-clause semantics): per-segment
# order stats split by status without self-joins — count_if / sum(CASE).
# ---------------------------------------------------------------------------

_Q49_SQL = """
SELECT c.c_mktsegment,
       CAST(SUM(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
       CAST(SUM(CASE WHEN o.o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
       CAST(SUM(CASE WHEN o.o_orderstatus = 'F'
                     THEN CAST(round(o.o_totalprice*100) AS BIGINT) ELSE 0 END) AS BIGINT)
         AS filled_cents
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1
"""


@query("q49_conditional_agg", _Q49_SQL)
def q49_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count_if(F.col("o_orderstatus") == "F").alias("n_filled"),
            F.count_if(F.col("o_orderstatus") == "O").alias("n_open"),
            F.sum(
                F.when(
                    F.col("o_orderstatus") == "F",
                    F.round(F.col("o_totalprice") * 100).cast("long"),
                ).otherwise(F.lit(0).cast("long"))
            ).cast("long").alias("filled_cents"),
        )
    )


# ---------------------------------------------------------------------------
# q50 — analytic distribution window functions: percent_rank / cume_dist /
# nth_value with an explicit full-partition frame (nth_value without one is
# nondeterministic — the default frame stops at CURRENT ROW).
# ---------------------------------------------------------------------------

_Q50_SQL = """
SELECT c_custkey, c_mktsegment,
       percent_rank() OVER w AS pr,
       cume_dist() OVER w AS cd,
       nth_value(c_custkey, 2) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS second_richest
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
"""


@query("q50_distribution_windows", _Q50_SQL)
def q50_distribution_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.nth_value("c_custkey", 2).over(wfull).alias("second_richest"),
    )


# ---------------------------------------------------------------------------
# q51 — UNPIVOT (wide measures → long): per-measure fixed-point totals over
# lineitem. Spark: stack(); oracle: UNION ALL of per-measure aggregates
# (semantically the UNPIVOT plan after pushdown).
# ---------------------------------------------------------------------------

_Q51_SQL = """
SELECT 'discount' AS measure, CAST(SUM(CAST(round(l_discount*100) AS BIGINT)) AS BIGINT) AS total_cents FROM lineitem
UNION ALL
SELECT 'extendedprice', CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) FROM lineitem
UNION ALL
SELECT 'quantity', CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) FROM lineitem
UNION ALL
SELECT 'tax', CAST(SUM(CAST(round(l_tax*100) AS BIGINT)) AS BIGINT) FROM lineitem
"""


@query("q51_unpivot_measures", _Q51_SQL)
def q51_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    long = li.select(
        F.expr(
            "stack(4, 'discount', l_discount, 'extendedprice', l_extendedprice, "
            "'quantity', l_quantity, 'tax', l_tax) AS (measure, val)"
        )
    )
    return long.groupBy("measure").agg(
        F.sum(F.round(F.col("val") * 100).cast("long")).cast("long").alias("total_cents")
    )


# ---------------------------------------------------------------------------
# q52 — Python UDTF via LATERAL join (the table-function surface of the UDF
# API): split each order's total into 3 integer-cent installments. Python
# row-at-a-time is the slow path by design — registered on a bounded subset;
# the same lateral topology with a builtin generator (explode/sequence) is
# the scale path (exactly what the oracle formulates).
# ---------------------------------------------------------------------------

_Q52_SQL = """
SELECT o_orderkey, CAST(i AS INTEGER) AS installment,
       CAST(CASE WHEN i <= cents % 3 THEN cents // 3 + 1 ELSE cents // 3 END AS BIGINT)
         AS amount_cents
FROM (SELECT o_orderkey, CAST(round(o_totalprice*100) AS BIGINT) AS cents
      FROM orders WHERE o_orderkey < 1000),
     (SELECT unnest(generate_series(1, 3)) AS i)
"""


@query("q52_python_udtf_lateral", _Q52_SQL)
def q52_python_udtf_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="installment int, amount_cents bigint")
    class SplitInstallments:
        def eval(self, total_cents: int, n: int):
            base, rem = divmod(total_cents, n)
            for i in range(n):
                yield i + 1, base + (1 if i < rem else 0)

    spark.udtf.register("split_installments", SplitInstallments)
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    o.select(
        "o_orderkey", F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    ).createOrReplaceTempView("__q52_orders")
    return spark.sql(
        """
        SELECT t.o_orderkey, s.installment, s.amount_cents
        FROM __q52_orders t, LATERAL split_installments(cents, 3) s
        """
    )


# ---------------------------------------------------------------------------
# q53 — two-phase SALTED aggregation over a skewed key (event_type has a few
# hot values): phase 1 reduces (key, salt) groups so no single reducer owns
# a hot key, phase 2 merges the <= n_salt partials per key. Exact-integer
# inputs (cents) make the result bit-identical to a direct groupBy — the
# salt only reshapes the shuffle, which is the point at 100 TB: a hot key
# that would pin one reducer becomes n_salt parallel partials.
# ---------------------------------------------------------------------------

_Q53_SQL = """
SELECT event_type,
       CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_cents,
       COUNT(*) AS n_rows
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@query("q53_salted_skew_agg", _Q53_SQL)
def q53_salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof sum/count per event_type via two-phase salted aggregation
    (functions/partitioning.py:salted_sum_count); oracle is the plain
    groupBy — identical results, reshaped shuffle."""
    from dask_lightgbm_spark.functions.partitioning import salted_sum_count

    e = load_table(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    out = salted_sum_count(e, ["event_type"], "cents", n_salt=16)
    return out.select(
        "event_type",
        F.col("sum_cents").cast("long").alias("sum_value_cents"),
        F.col("n_rows"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# q54 — RECURSIVE CTE (Spark 4 WITH RECURSIVE): dense monthly date spine
# generated by recursion, left-joined to sparse monthly revenue — the
# gap-filling reporting pattern. Recursion depth = month count (bounded,
# driver-independent); the heavy side stays one groupBy shuffle.
# ---------------------------------------------------------------------------

_Q54_BODY = """
WITH RECURSIVE months(m) AS (
  SELECT {lo}
  UNION ALL
  SELECT m + INTERVAL '1' MONTH FROM months
  WHERE m < {hi}
),
rev AS (
  SELECT date_trunc('month', o_orderdate) AS m,
         COUNT(*) AS n_orders,
         CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
           AS rev_cents
  FROM {orders} GROUP BY 1
)
SELECT months.m AS month,
       CAST(COALESCE(rev.n_orders, 0) AS BIGINT) AS n_orders,
       CAST(COALESCE(rev.rev_cents, 0) AS BIGINT) AS rev_cents
FROM months LEFT JOIN rev ON months.m = rev.m
ORDER BY months.m
"""

_Q54_SQL = _Q54_BODY.format(
    orders="orders",
    lo="(SELECT date_trunc('month', MIN(o_orderdate)) FROM orders)",
    hi="(SELECT date_trunc('month', MAX(o_orderdate)) FROM orders)",
)


@query("q54_recursive_date_spine", _Q54_SQL)
def q54_recursive_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive-CTE month spine joined to monthly order revenue (same
    WITH RECURSIVE shape on both engines). The spine BOUNDS are computed
    first as one bounded aggregate (two scalars collected) and inlined as
    literals: Spark's UnionLoopExec runs one job per recursion step and
    re-evaluates scalar subqueries in the recursive member EACH step, so
    bounds-as-subqueries cost ~84 rescans of orders for an 84-row spine
    (measured 12.8 s vs 0.6 s at sf0.01 — the full-catalog census's
    worst outlier; at warehouse scale it is 84 full scans). The oracle
    keeps the self-contained subquery form — DuckDB evaluates it once."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__q54_orders")
    lo, hi = o.agg(
        F.date_trunc("month", F.min("o_orderdate")),
        F.date_trunc("month", F.max("o_orderdate")),
    ).first()
    fmt = "%Y-%m-%d %H:%M:%S"
    # Empty orders → MIN/MAX are NULL. Inline NULL literals: the anchor
    # emits one NULL-month row and the recursion predicate (m < NULL) is
    # NULL so recursion stops — exactly the subquery form's degradation,
    # so the DuckDB oracle still matches (1 row: NULL month, 0, 0).
    null_ts = "CAST(NULL AS TIMESTAMP)"
    return spark.sql(
        _Q54_BODY.format(
            orders="__q54_orders",
            lo=f"TIMESTAMP '{lo.strftime(fmt)}'" if lo is not None else null_ts,
            hi=f"TIMESTAMP '{hi.strftime(fmt)}'" if hi is not None else null_ts,
        )
    )


# ---------------------------------------------------------------------------
# q55 — explicit physical join strategies via hints: the same
# orders⋈customer aggregation computed twice, once forcing SHUFFLE_HASH and
# once forcing MERGE (sort-merge), results unioned with a strategy tag.
# Identical values under both strategies (and to the hint-free oracle) —
# the point is that plan strategy is a per-join dial, not an engine-wide
# accident; at 100 TB you pick hash when one side fits per-partition memory
# and merge when both sides are huge or pre-sorted.
# ---------------------------------------------------------------------------

_Q55_SQL = """
WITH agg AS (
  SELECT c.c_mktsegment,
         COUNT(*) AS n_orders,
         CAST(SUM(CAST(round(o.o_totalprice*100) AS BIGINT)) AS BIGINT)
           AS total_cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY c.c_mktsegment
)
SELECT 'hash' AS strategy, * FROM agg
UNION ALL
SELECT 'merge' AS strategy, * FROM agg
ORDER BY strategy, c_mktsegment
"""


@query("q55_join_strategy_hints", _Q55_SQL)
def q55_join_strategy_hints(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")

    def agg(strategy: str, hint: str) -> DataFrame:
        joined = o.join(c.hint(hint), o.o_custkey == c.c_custkey)
        return joined.groupBy("c_mktsegment").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "total_cents"
            ),
        ).select(F.lit(strategy).alias("strategy"), "c_mktsegment", "n_orders",
                 "total_cents")

    return (
        agg("hash", "SHUFFLE_HASH")
        .unionAll(agg("merge", "MERGE"))
        .orderBy("strategy", "c_mktsegment")
    )


# ---------------------------------------------------------------------------
# q56 — pure range join (NO equi key) via the binned-interval rewrite:
# each error event opens a 5-minute window; find every purchase (any user)
# inside it. Naively this is a BroadcastNestedLoopJoin (O(n*m) — the
# 100 TB scale-killer); operators/range_join.py turns it into an equi hash
# join on a time bin with the exact bounds re-checked, each pair produced
# exactly once. DuckDB's oracle uses its native IEJoin for the same
# predicate.
# ---------------------------------------------------------------------------

_Q56_SQL = """
SELECT e.event_id AS error_id, p.event_id AS purchase_id,
       e.ts AS error_ts, p.ts AS purchase_ts
FROM (SELECT event_id, ts FROM events WHERE event_type = 'error') e
JOIN (SELECT event_id, ts FROM events WHERE event_type = 'purchase') p
  ON p.ts >= e.ts AND p.ts <= e.ts + INTERVAL 5 MINUTE
"""


@query("q56_binned_range_join", _Q56_SQL)
def q56_binned_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dask_lightgbm_spark.operators.range_join import binned_interval_join

    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("error_ts"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTE")).alias("win_end"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("ts").alias("purchase_ts")
    )
    joined = binned_interval_join(
        errors, purchases,
        start_col="error_ts", end_col="win_end", t_col="purchase_ts",
        bin_width_sec=300,
    )
    return joined.select("error_id", "purchase_id", "error_ts", "purchase_ts")


# ---------------------------------------------------------------------------
# q57 — forward-fill (gap-fill): carry each user's last observed purchase
# value forward onto every subsequent event — the standard time-series
# imputation operator (last_value IGNORE NULLS over an unbounded-preceding
# frame). Values pass through unchanged (no float arithmetic), ordering is
# total (ts, event_id), so the oracle is bit-exact. One shuffle on user_id;
# the window is a per-partition linear scan — scales as sort-within-user.
# ---------------------------------------------------------------------------

_Q57_SQL = """
SELECT user_id, event_id, ts,
       last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS last_purchase_value
FROM events
"""


@query("q57_forward_fill", _Q57_SQL)
def q57_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    marked = F.when(F.col("event_type") == "purchase", F.col("value"))
    return e.select(
        "user_id",
        "event_id",
        "ts",
        F.last(marked, ignorenulls=True).over(w).alias("last_purchase_value"),
    )


# ---------------------------------------------------------------------------
# q58 — TPC-H Q5 shape (local-supplier volume): the 6-table join whose
# order Catalyst must get right — region/nation broadcast, the
# customer=supplier nation equality threaded through, lineitem scanned
# once with the date filter pushed to orders. The classic join-reordering
# benchmark query, fixed-point revenue per the determinism contract.
# ---------------------------------------------------------------------------

_Q58_SQL = """
SELECT n_name,
       CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)/10000.0
         AS revenue,
       COUNT(*) AS n_items
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
GROUP BY n_name
ORDER BY n_name
"""


@query("q58_tpch_q5_local_supplier", _Q58_SQL)
def q58_tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = _cents(F.col("l_extendedprice")) * (
        F.lit(100) - _pct(F.col("l_discount"))
    )
    # (customer⋈orders)⋈lineitem is fact⋈fact: pin a shuffle join (the
    # planner otherwise broadcasts ALL of lineitem from its pruned-column
    # estimate — a 6M-row driver-serial hash build, 2.6 s of the 3.7 s sf1
    # wall; measured 3.0 → 1.2 s with the pin). supplier/nation/region
    # joins below keep the threshold/hint broadcast policy.
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(l.hint("merge"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            (F.sum(rev).cast("double") / F.lit(10000.0)).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# q59 — TPC-H Q4 shape (order-priority check): EXISTS decorrelated into a
# semi join — orders in a date window with at least one "late" line
# (shipped > 60 days after order date; the fixture has no
# commit/receiptdate). Exercises the correlated-EXISTS → LeftSemi rewrite.
# ---------------------------------------------------------------------------

_Q59_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= DATE '1996-07-01' AND o_orderdate < DATE '1996-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("q59_tpch_q4_priority_check", _Q59_SQL)
def q59_tpch_q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01"))
        & (F.col("o_orderdate") < F.lit("1996-10-01"))
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        l,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# q60 — integer-exact PageRank (3 iterations) over the customer-supplier
# bipartite graph (edge = customer ordered from supplier, symmetrized).
# The canonical iterative algorithm as driver-iterated joins
# (operators/pagerank.py); pure int64 arithmetic makes the per-iteration
# state bit-reproducible, so the DuckDB oracle (same iterations as chained
# CTEs) hash-matches — impossible for float PageRank, where summation
# order changes the result.
# ---------------------------------------------------------------------------

def _q60_oracle() -> str:
    head = """
WITH eo AS (
  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                  's' || CAST(l_suppkey AS VARCHAR) AS dst
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
edges AS (SELECT src, dst FROM eo UNION ALL SELECT dst, src FROM eo),
deg AS (SELECT src, COUNT(*) AS out_deg FROM edges GROUP BY src),
nodes AS (SELECT src AS node FROM deg),
r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS pr FROM deg)"""
    iters = []
    for i in range(1, 4):
        iters.append(f"""
c{i} AS (
  SELECT e.dst AS node, SUM(r.pr // d.out_deg) AS sc
  FROM edges e JOIN r{i-1} r ON e.src = r.node JOIN deg d ON e.src = d.src
  GROUP BY e.dst),
r{i} AS (
  SELECT n.node,
         CAST(150000 + (85 * COALESCE(c{i}.sc, 0)) // 100 AS BIGINT) AS pr
  FROM nodes n LEFT JOIN c{i} ON n.node = c{i}.node)""")
    return (
        head + "," + ",".join(iters)
        + "\nSELECT node, pr FROM r3 ORDER BY pr DESC, node LIMIT 20"
    )


@query("q60_pagerank_int", _q60_oracle())
def q60_pagerank_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dask_lightgbm_spark.operators.pagerank import pagerank_int

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    eo = (
        o.join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    edges = eo.unionAll(eo.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    ranks = pagerank_int(edges, n_iters=3)
    return (
        ranks.select("node", F.col("rank").alias("pr"))
        .orderBy(F.desc("pr"), F.asc("node"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q61 — CDC MERGE with deletes (tombstones): the change feed deletes every
# customer with key % 10 == 0, updates the account balance (+1000.0) for
# key % 10 == 1, and inserts clones shifted by +10M for key % 10 == 2.
# Delete = left-anti on tombstone keys; upsert = full-outer COALESCE
# (operators/merge.py merge_cdc) — two key-shuffles total, bucketing makes
# both co-located at scale.
# ---------------------------------------------------------------------------

_Q61_SQL = """
WITH dels AS (SELECT c_custkey FROM customer WHERE c_custkey % 10 = 0),
ups AS (
  SELECT c_custkey, c_name, c_nationkey, c_acctbal + 1000.0 AS c_acctbal,
         c_mktsegment
  FROM customer WHERE c_custkey % 10 = 1
  UNION ALL
  SELECT c_custkey + 10000000, c_name, c_nationkey, c_acctbal, c_mktsegment
  FROM customer WHERE c_custkey % 10 = 2
),
kept AS (
  SELECT * FROM customer
  WHERE c_custkey NOT IN (SELECT c_custkey FROM dels)
),
merged AS (
  SELECT COALESCE(u.c_custkey, t.c_custkey) AS c_custkey,
         COALESCE(u.c_name, t.c_name) AS c_name,
         COALESCE(u.c_nationkey, t.c_nationkey) AS c_nationkey,
         COALESCE(u.c_acctbal, t.c_acctbal) AS c_acctbal,
         COALESCE(u.c_mktsegment, t.c_mktsegment) AS c_mktsegment
  FROM kept t FULL OUTER JOIN ups u ON t.c_custkey = u.c_custkey
)
SELECT c_custkey, c_nationkey, c_acctbal, c_mktsegment FROM merged
"""


@query("q61_merge_cdc_deletes", _Q61_SQL)
def q61_merge_cdc_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dask_lightgbm_spark.operators.merge import merge_cdc

    c = load_table(spark, sf_dir, "customer")
    dels = c.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        F.lit(None).cast("string").alias("c_name"),
        F.lit(None).cast("int").alias("c_nationkey"),
        F.lit(None).cast("double").alias("c_acctbal"),
        F.lit(None).cast("string").alias("c_mktsegment"),
        F.lit("D").alias("op"),
    )
    upd = c.filter(F.col("c_custkey") % 10 == 1).select(
        "c_custkey", "c_name", "c_nationkey",
        (F.col("c_acctbal") + F.lit(1000.0)).alias("c_acctbal"),
        "c_mktsegment", F.lit("U").alias("op"),
    )
    ins = c.filter(F.col("c_custkey") % 10 == 2).select(
        (F.col("c_custkey") + F.lit(10000000)).alias("c_custkey"),
        "c_name", "c_nationkey", "c_acctbal", "c_mktsegment",
        F.lit("U").alias("op"),
    )
    changes = dels.unionAll(upd).unionAll(ins)
    merged = merge_cdc(c, changes, "c_custkey")
    return merged.select("c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment")


# ---------------------------------------------------------------------------
# q62 — salted skew JOIN (the join-side companion to q53's salted agg):
# the events fact stream joined to the customer dim through an explicit
# (key, salt) equi-join — dim replicated n_salt times, fact salted by
# row-hash — so a pathologically hot user_id spreads across n_salt
# reducers. Semantically identical to the plain join, which is exactly
# what the oracle checks.
# ---------------------------------------------------------------------------

_Q62_SQL = """
SELECT c.c_mktsegment,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(round(e.value*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
"""


@query("q62_salted_skew_join", _Q62_SQL)
def q62_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dask_lightgbm_spark.functions.partitioning import salted_join

    e = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("c_custkey"), "value", "event_id"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = salted_join(e, c, "c_custkey", n_salt=8)
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.sum(F.round(F.col("value") * 100).cast("long")).cast("double")
                / F.lit(100.0)
            ).alias("sum_value"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# q63 — SCD2 history build: turn a change log (each order = a new version
# of its customer's state) into a slowly-changing-dimension type-2 table
# with validity intervals — valid_from = version date, valid_to = next
# version's date (NULL = current). One shuffle on the key, then a linear
# per-partition lead() scan; total order (date, orderkey) makes the
# intervals deterministic under date ties.
# ---------------------------------------------------------------------------

_Q63_SQL = """
SELECT o_custkey, o_orderkey AS version_id, o_orderdate AS valid_from,
       lead(o_orderdate) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey) AS valid_to,
       (lead(o_orderdate) OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) IS NULL)
         AS is_current,
       o_totalprice
FROM orders
"""


@query("q63_scd2_history", _Q63_SQL)
def q63_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        F.col("o_orderkey").alias("version_id"),
        F.col("o_orderdate").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
        "o_totalprice",
    )


# ---------------------------------------------------------------------------
# q64 — TPC-H Q9 shape (product-type profit by nation and year): lineitem
# joins FOUR dimensions. The scale story: nation (constant) is
# hint-broadcast; part/supplier (SF-growing) join unhinted — planner-
# broadcast while under the threshold, shuffle-joined at the SF where a
# forced broadcast would OOM. The only always-shuffle is the
# lineitem⋈orders equi-join on orderkey. The fixture has no
# partsupp, so supply cost is modeled as 10% of p_retailprice — profit =
# extprice·(1-disc) - 0.1·retailprice·qty, all in exact 1e-4-dollar int64
# units per the fixed-point contract.
# ---------------------------------------------------------------------------

_Q64_SQL = """
SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                  * (100 - CAST(round(l_discount*100) AS BIGINT))
                - CAST(round(l_quantity) AS BIGINT)
                  * CAST(round(p_retailprice*100) AS BIGINT) * 10
               ) AS DOUBLE)/10000.0 AS profit,
       COUNT(*) AS n_items
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, o_year
ORDER BY n_name, o_year
"""


@query("q64_tpch_q9_profit", _Q64_SQL)
def q64_tpch_q9_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    amount = _cents(F.col("l_extendedprice")) * (
        F.lit(100) - _pct(F.col("l_discount"))
    ) - F.round(F.col("l_quantity")).cast("long") * _cents(
        F.col("p_retailprice")
    ) * F.lit(10)
    # the orders join is fact⋈fact (both sides grow with SF): pin a shuffle
    # join so the planner cannot broadcast the 1.5M-row orders side from its
    # two-column estimate (a driver-serial build, ~0.9 s at sf1). part/
    # supplier stay unhinted per the threshold policy; nation is a hinted
    # constant dim.
    return (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o.hint("merge"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "n_name", F.year("o_orderdate").cast("int").alias("o_year")
        )
        .agg(
            (F.sum(amount).cast("double") / F.lit(10000.0)).alias("profit"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("n_name", "o_year")
    )


# ---------------------------------------------------------------------------
# q65 — partitioned parquet sink + partition-pruned read-back: the batch
# data-engineering counterpart to x09's streaming sink. Events are written
# to scratch partitioned by event_type (Hive layout), read back with a
# partition-column predicate, and aggregated. The read-back plan must show
# partition pruning — only the selected event_type directories are
# scanned — which tests/test_plans.py pins via PartitionFilters. At 100 TB,
# writing partitioned by a low-cardinality routing column + pruning on read
# is the difference between scanning 100 TB and scanning one partition's
# share; dynamic partition overwrite keeps re-runs idempotent.
# ---------------------------------------------------------------------------

_Q65_SQL = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events
WHERE event_type IN ('click', 'purchase')
GROUP BY event_type
ORDER BY event_type
"""


@query("q65_partitioned_sink_roundtrip", _Q65_SQL)
def q65_partitioned_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dask_lightgbm_spark.session import scratch_dir
    from dask_lightgbm_spark.sources.readers import load_table

    e = load_table(spark, sf_dir, "events")
    out = scratch_dir("q65_part_sink") + "/" + sf_dir.strip("/").replace("/", "_")
    # dynamic overwrite: only the partitions present in the batch are
    # replaced — the idempotent production layout for routed writes
    (
        e.select("event_id", "event_type", "value")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("event_type")
        .parquet(out)
    )
    back = spark.read.parquet(out).filter(
        F.col("event_type").isin("click", "purchase")
    )
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q66 — TPC-H Q13 shape (customer distribution): LEFT OUTER join customers
# to orders, count per customer INCLUDING zeros, then histogram the counts
# — the canonical two-level aggregation. Scale: the outer join shuffles on
# custkey once; the second aggregation's key space is order-counts (tiny).
# Customers with no orders survive via the left join (COUNT of a
# right-side column counts only matches).
# ---------------------------------------------------------------------------

_Q66_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@query("q66_tpch_q13_custdist", _Q66_SQL)
def q66_tpch_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# q67 — null-semantics parity: NULLs are where engines quietly disagree
# (grouping: NULL forms its own group; COUNT(col) skips NULLs; ASC default
# null placement differs — Spark NULLS FIRST vs DuckDB NULLS LAST, so the
# ordering is pinned explicitly; join equality drops NULLs unless
# null-safe). The Spark plan exercises a genuine null-safe equi-join
# (eqNullSafe against a 2-row dim containing a NULL key — Catalyst plans
# this as a hash join on a null-safe key, not a filter).
# ---------------------------------------------------------------------------

_Q67_SQL = """
WITH base AS (
  SELECT event_id,
         NULLIF(event_type, 'click') AS et_null,
         CASE WHEN value < 1 THEN NULL ELSE value END AS v_null
  FROM events
),
dim(et) AS (VALUES ('view'), (NULL)),
kept AS (
  SELECT b.* FROM base b JOIN dim d ON b.et_null IS NOT DISTINCT FROM d.et
)
SELECT et_null,
       COUNT(*) AS n_rows,
       COUNT(v_null) AS n_nonnull,
       CAST(SUM(CASE WHEN v_null IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       CAST(SUM(CAST(round(coalesce(v_null, 0)*100) AS BIGINT)) AS BIGINT)
         AS sum_cents
FROM kept
GROUP BY et_null
ORDER BY et_null ASC NULLS FIRST
"""


@query("q67_null_semantics", _Q67_SQL)
def q67_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    base = e.select(
        "event_id",
        F.nullif(F.col("event_type"), F.lit("click")).alias("et_null"),
        F.when(F.col("value") >= 1, F.col("value")).alias("v_null"),
    )
    dim = spark.createDataFrame([("view",), (None,)], "et string")
    kept = base.join(
        F.broadcast(dim), base["et_null"].eqNullSafe(dim["et"])
    ).drop("et")
    return (
        kept.groupBy("et_null")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("v_null").alias("n_nonnull"),
            F.sum(F.col("v_null").isNull().cast("long")).cast("long").alias("n_null"),
            F.sum(F.round(F.coalesce(F.col("v_null"), F.lit(0)) * 100).cast("long"))
            .cast("long")
            .alias("sum_cents"),
        )
        .orderBy(F.col("et_null").asc_nulls_first())
    )


# ---------------------------------------------------------------------------
# q68 — TPC-H Q22 shape (global-opportunity): customers above the global
# positive-balance average with no URGENT orders, grouped by a country code. Three
# classic patterns in one plan: an uncorrelated scalar aggregate broadcast
# into a filter, a LEFT ANTI join (NOT EXISTS decorrelation, with a pushed
# predicate on the subquery side so the result is non-trivial at every SF),
# and derived-key grouping. Scale: the scalar is one row; the anti join is the only
# shuffle (both sides keyed on custkey); the fixed-point average divides
# exact ints so both engines compare against the identical double.
# ---------------------------------------------------------------------------

_Q68_SQL = """
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(round(c_acctbal*100) AS BIGINT)) AS DOUBLE)/100.0/COUNT(*) AS a
  FROM customer WHERE c_acctbal > 0
),
elig AS (
  SELECT c_custkey, CAST(c_nationkey % 5 AS INT) AS cntry, c_acctbal
  FROM customer, avg_bal WHERE c_acctbal > a
),
no_orders AS (
  SELECT e.* FROM elig e
  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = e.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
)
SELECT cntry, COUNT(*) AS numcust,
       CAST(SUM(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS totacctbal_cents
FROM no_orders GROUP BY cntry ORDER BY cntry
"""


@query("q68_tpch_q22_global_opportunity", _Q68_SQL)
def q68_tpch_q22_global_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(_cents(F.col("c_acctbal"))).cast("double")
            / F.lit(100.0)
            / F.count(F.lit(1))
        ).alias("a")
    )
    elig = (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .select(
            "c_custkey",
            (F.col("c_nationkey") % 5).cast("int").alias("cntry"),
            "c_acctbal",
        )
    )
    no_orders = elig.join(
        o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey"),
        F.col("c_custkey") == F.col("o_custkey"),
        "left_anti",
    )
    return (
        no_orders.groupBy("cntry")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_cents(F.col("c_acctbal"))).cast("long").alias("totacctbal_cents"),
        )
        .orderBy("cntry")
    )


# ---------------------------------------------------------------------------
# q69 — GLOBAL SORTED SINK: write a table in total order without a
# single-task sort (`repartitionByRange` samples range boundaries, each
# partition sorts locally, partition i's range precedes partition i+1's),
# then PROVE the physical layout is globally sorted by reconstructing each
# row's global rank from the written files alone: parquet `_metadata`
# row_index within the file + an n_files-row offset table (per-file counts,
# cumsummed — bounded driver-of-layout state, the t30 two-level-scan shape)
# joined back by broadcast. The rank is hash-compared against the oracle's
# row_number() OVER (ORDER BY ...), so any row out of place — across files
# or within one — mismatches. Hash comparison alone is order-insensitive;
# the rank column is what makes this verification order-SENSITIVE.
# This is the sorted-corpus-shard layout op (zone-map/min-max friendly
# parquet for range-pruned reads); tests/test_plans.py pins the write plan
# to a rangepartitioning exchange with NO global sort node.
# ---------------------------------------------------------------------------

_Q69_SQL = """
SELECT CAST(row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS rank,
       o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY rank
"""


def _q69_sorted_write(spark: SparkSession, sf_dir: str) -> str:
    """Write orders sorted by (o_totalprice, o_orderkey) as a range-
    partitioned parquet layout; returns the output path. Split out so the
    plan test can inspect the write-side DataFrame."""
    from dask_lightgbm_spark.session import scratch_dir

    o = load_table(spark, sf_dir, "orders")
    out = scratch_dir("q69_sorted_sink") + "/" + sf_dir.strip("/").replace("/", "_")
    (
        _q69_write_df(o)
        .write.mode("overwrite")
        .parquet(out)
    )
    return out


def _q69_write_df(o: DataFrame) -> DataFrame:
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .repartitionByRange(8, F.col("o_totalprice"), F.col("o_orderkey"))
        .sortWithinPartitions("o_totalprice", "o_orderkey")
    )


@query("q69_global_sorted_sink", _Q69_SQL)
def q69_global_sorted_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = _q69_sorted_write(spark, sf_dir)
    back = spark.read.parquet(out).select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.regexp_extract(F.col("_metadata.file_path"), r"part-(\d+)", 1)
        .cast("int")
        .alias("file_idx"),
        F.col("_metadata.row_index").alias("row_in_file"),
    )
    counts = back.groupBy("file_idx").agg(F.count(F.lit(1)).alias("n"))
    # no-partition window over an n_files-row table — bounded by the layout,
    # never by the data (t30's offset-table argument)
    woff = W.orderBy("file_idx").rowsBetween(W.unboundedPreceding, -1)
    offsets = counts.select(
        "file_idx", F.coalesce(F.sum("n").over(woff), F.lit(0)).alias("off")
    )
    return (
        back.join(F.broadcast(offsets), "file_idx")
        .select(
            (F.col("off") + F.col("row_in_file") + 1).cast("long").alias("rank"),
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
        )
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# q70 — TPC-H Q7 shape (volume shipping between geographies): lineitem's
# revenue flows classified by SUPPLIER nation × CUSTOMER nation, i.e. two
# independent joins against the same dimension (nation) under different
# roles — the classic self-dimension aliasing query. Scale: nation/region
# are hint-broadcast twice (aliased, constant size); supplier joins
# unhinted (planner-broadcast while small); the fact table shuffles
# exactly twice — lineitem⋈orders on orderkey, then ⋈customer on custkey
# — the minimum for this shape (customer is data-sized, NOT broadcast).
# Revenue is exact int64 fixed-point per the determinism contract.
# ---------------------------------------------------------------------------

_Q70_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)/10000.0
         AS revenue,
       COUNT(*) AS n_items
FROM supplier
JOIN lineitem ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
JOIN region r1 ON n1.n_regionkey = r1.r_regionkey AND r1.r_name = 'EUROPE'
JOIN region r2 ON n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'ASIA'
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1998-01-01'
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@query("q70_tpch_q7_volume_shipping", _Q70_SQL)
def q70_tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    # the same dim under two roles: alias columns before joining twice
    n1 = n.join(
        F.broadcast(r.filter(F.col("r_name") == "EUROPE")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select(
        F.col("n_nationkey").alias("supp_nationkey"),
        F.col("n_name").alias("supp_nation"),
    )
    n2 = n.join(
        F.broadcast(r.filter(F.col("r_name") == "ASIA")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select(
        F.col("n_nationkey").alias("cust_nationkey"),
        F.col("n_name").alias("cust_nation"),
    )
    rev = _cents(F.col("l_extendedprice")) * (
        F.lit(100) - _pct(F.col("l_discount"))
    )
    return (
        l.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("supp_nationkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cust_nationkey"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            (F.sum(rev).cast("double") / F.lit(10000.0)).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# q71 — TPC-H Q10 shape (returned-item reporting): top-20 customers by
# revenue lost to returns in one quarter. Exercises agg-then-global-top-k:
# the revenue ranking happens on int64 cents (exact ordering — no float
# ties) with c_custkey as the deterministic tiebreak, and the LIMIT is a
# TakeOrderedAndProject over the already-aggregated (small) result, never
# a global sort of the fact table. Date filter pushed to orders; nation
# broadcast.
# ---------------------------------------------------------------------------

_Q71_SQL = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT)
         AS revenue_x10k,
       COUNT(*) AS n_items
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= DATE '1996-10-01' AND o_orderdate < DATE '1997-01-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue_x10k DESC, c_custkey
LIMIT 20
"""


@query("q71_tpch_q10_returned_items", _Q71_SQL)
def q71_tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    rev = _cents(F.col("l_extendedprice")) * (
        F.lit(100) - _pct(F.col("l_discount"))
    )
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.sum(rev).alias("revenue_x10k"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("revenue_x10k").desc(), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q72 — TPC-H Q8 shape (national market share): of all ECONOMY-part revenue
# sold to AMERICA-region customers, what fraction came from one supplier
# nation, per year. The determinism-sensitive part is the share RATIO: both
# numerator and denominator are exact int64 sums, and the share is ONE
# division of those two integers — bit-identical across engines (IEEE 754
# division is exactly specified given identical operands). Part filter
# pushed to the part scan (planner-broadcast while small); customer-side
# region restriction rides the hint-broadcast nation dim; the fact
# shuffles on orderkey/custkey only.
# ---------------------------------------------------------------------------

_Q72_SQL = """
WITH vol AS (
  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         CAST(round(l_extendedprice*100) AS BIGINT)
           * (100 - CAST(round(l_discount*100) AS BIGINT)) AS volume,
         n2.n_name AS supp_nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey AND r_name = 'AMERICA'
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE p_type = 'ECONOMY'
    AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1998-01-01'
)
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
            AS DOUBLE)
         / CAST(SUM(volume) AS DOUBLE) AS mkt_share,
       CAST(SUM(volume) AS DOUBLE)/10000.0 AS total_volume,
       COUNT(*) AS n_items
FROM vol
GROUP BY o_year
ORDER BY o_year
"""


@query("q72_tpch_q8_market_share", _Q72_SQL)
def q72_tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    # customer-side nation restricted to the region; supplier-side nation
    # under its own role alias
    n1 = n.join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("cust_nationkey"))
    n2 = n.select(
        F.col("n_nationkey").alias("supp_nationkey"),
        F.col("n_name").alias("supp_nation"),
    )
    volume = _cents(F.col("l_extendedprice")) * (
        F.lit(100) - _pct(F.col("l_discount"))
    )
    vol = (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("supp_nationkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("cust_nationkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            volume.alias("volume"),
            "supp_nation",
        )
    )
    return (
        vol.groupBy("o_year")
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", F.col("volume"))
                    .otherwise(F.lit(0).cast("long"))
                ).cast("double")
                / F.sum("volume").cast("double")
            ).alias("mkt_share"),
            (F.sum("volume").cast("double") / F.lit(10000.0)).alias(
                "total_volume"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# q73 — BUCKETED co-located join (the shuffle-free join layout): both join
# sides are written as tables bucketed on the join key into the same
# bucket count, then joined — Spark reads bucket i of each side into the
# same task and the SortMergeJoin runs with ZERO Exchange on either side
# (tests/test_plans.py pins the absence). At 100 TB this is the layout
# decision that matters most: a fact table bucketed on its FK turns every
# recurring join against it from a full-network shuffle into a local merge.
# The tables are external (explicit scratch path), bucket count 8, and the
# result is the plain join+agg the oracle recomputes from the raw files.
# ---------------------------------------------------------------------------

_Q73_SQL = """
SELECT o_orderpriority,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)/10000.0
         AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

_Q73_BUCKETS = 8


def bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write lineitem/orders as orderkey-bucketed tables (once per
    session+sf_dir) and return their table names. The write is the one-time
    layout cost; every subsequent join on orderkey is exchange-free."""
    from dask_lightgbm_spark.session import scratch_dir

    tag = sf_dir.strip("/").replace("/", "_").replace(".", "_")
    lt, ot = f"q73_lineitem_{tag}", f"q73_orders_{tag}"
    cache = getattr(spark, "_dls_bucketed_tables", None)
    if cache is None:
        cache = set()
        spark._dls_bucketed_tables = cache
    if (lt, ot) not in cache:
        base = scratch_dir("q73_bucketed") + "/" + tag
        l = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        )
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority"
        )
        (
            l.write.mode("overwrite")
            .bucketBy(_Q73_BUCKETS, "l_orderkey")
            .sortBy("l_orderkey")
            .option("path", f"{base}/lineitem")
            .saveAsTable(lt)
        )
        (
            o.write.mode("overwrite")
            .bucketBy(_Q73_BUCKETS, "o_orderkey")
            .sortBy("o_orderkey")
            .option("path", f"{base}/orders")
            .saveAsTable(ot)
        )
        cache.add((lt, ot))
    return lt, ot


@query("q73_bucketed_join", _Q73_SQL)
def q73_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    lt, ot = bucketed_tables(spark, sf_dir)
    l, o = spark.table(lt), spark.table(ot)
    rev = _cents(F.col("l_extendedprice")) * (
        F.lit(100) - _pct(F.col("l_discount"))
    )
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            (F.sum(rev).cast("double") / F.lit(10000.0)).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# q74 — incremental aggregate maintenance (materialized-view delta merge):
# the hourly rollup is maintained as base_agg ⊕ agg(delta) instead of
# recomputing over all data — the algebraic property (SUM/COUNT are
# commutative monoids, so partial aggregates merge by re-aggregation) that
# underlies every incremental pipeline. Here the base aggregate is
# MATERIALIZED to parquet (the stored MV), the delta (last day of events)
# is aggregated alone, and the result is the re-aggregated union. The
# oracle recomputes from ALL raw events — equality IS the merge law. At
# 100 TB the delta is a day and the base is never rescanned.
# ---------------------------------------------------------------------------

_Q74_SPLIT = "2024-01-20 00:00:00"

_Q74_SQL = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events
GROUP BY hour, event_type
ORDER BY hour, event_type
"""


@query("q74_incremental_agg_merge", _Q74_SQL)
def q74_incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dask_lightgbm_spark.session import scratch_dir

    e = load_table(spark, sf_dir, "events")
    split = F.lit(_Q74_SPLIT).cast("timestamp")

    def agg(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_cents(F.col("value"))).alias("value_cents"),
        )

    # the stored MV: aggregate of everything before the split, materialized
    mv = scratch_dir("q74_mv") + "/" + sf_dir.strip("/").replace("/", "_")
    agg(e.filter(F.col("ts") < split)).write.mode("overwrite").parquet(mv)
    base = spark.read.parquet(mv)
    delta = agg(e.filter(F.col("ts") >= split))
    # merge law: partial aggregates re-aggregate (n: SUM, value: SUM)
    return (
        base.unionByName(delta)
        .groupBy("hour", "event_type")
        .agg(
            F.sum("n").alias("n"),
            F.sum("value_cents").alias("value_cents"),
        )
        .orderBy("hour", "event_type")
    )


# ---------------------------------------------------------------------------
# q75 — data-quality constraint audit (the deequ/great-expectations shape):
# a declarative battery of integrity checks — referential (FK anti-joins),
# domain ranges, sign rules, key uniqueness — each evaluated as ONE
# aggregate pass and unioned into a single report. Scale: every check is
# scan+agg (no row-level output, counts only); the FK checks are LEFT
# ANTI joins whose parent-key side the planner broadcasts while small
# (both parents grow with SF, so no forced hint); the PK check is one groupBy
# on the candidate key. The fixture genuinely fails two checks (negative
# balances, duplicate (orderkey, linenumber) pairs) and passes the FK
# checks — the audit finds real findings, it doesn't rubber-stamp.
# ---------------------------------------------------------------------------

_Q75_SQL = """
WITH checks AS (
  SELECT 'customer_acctbal_nonneg' AS constraint_name,
         (SELECT COUNT(*) FROM customer) AS n_checked,
         (SELECT COUNT(*) FROM customer WHERE c_acctbal < 0) AS n_violations
  UNION ALL
  SELECT 'lineitem_discount_range',
         (SELECT COUNT(*) FROM lineitem),
         (SELECT COUNT(*) FROM lineitem
          WHERE l_discount < 0 OR l_discount > 0.1)
  UNION ALL
  SELECT 'lineitem_orderkey_fk',
         (SELECT COUNT(*) FROM lineitem),
         (SELECT COUNT(*) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM orders o
                            WHERE o.o_orderkey = l.l_orderkey))
  UNION ALL
  SELECT 'lineitem_pk_unique',
         (SELECT COUNT(*) FROM lineitem),
         (SELECT COALESCE(SUM(cnt - 1), 0) FROM (
            SELECT COUNT(*) AS cnt FROM lineitem
            GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1))
  UNION ALL
  SELECT 'lineitem_quantity_max45',
         (SELECT COUNT(*) FROM lineitem),
         (SELECT COUNT(*) FROM lineitem WHERE l_quantity > 45)
  UNION ALL
  SELECT 'orders_custkey_fk',
         (SELECT COUNT(*) FROM orders),
         (SELECT COUNT(*) FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM customer c
                            WHERE c.c_custkey = o.o_custkey))
)
SELECT constraint_name, CAST(n_checked AS BIGINT) AS n_checked,
       CAST(n_violations AS BIGINT) AS n_violations,
       n_violations = 0 AS passed
FROM checks
ORDER BY constraint_name
"""


@query("q75_constraint_audit", _Q75_SQL)
def q75_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")

    def check(name: str, base: DataFrame, viol) -> DataFrame:
        return base.agg(
            F.count(F.lit(1)).alias("n_checked"),
            F.coalesce(
                F.sum(F.when(viol, 1).otherwise(0)), F.lit(0)
            ).cast("long").alias("n_violations"),
        ).select(F.lit(name).alias("constraint_name"), "n_checked", "n_violations")

    checks = [
        check("customer_acctbal_nonneg", c, F.col("c_acctbal") < 0),
        check(
            "lineitem_discount_range",
            l,
            (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1),
        ),
        # FK: count rows whose key has no match — LEFT ANTI against the
        # parent key set (planner-broadcast while under the threshold)
        l.join(
            o.select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .crossJoin(F.broadcast(l.agg(F.count(F.lit(1)).alias("n_checked"))))
        .select(
            F.lit("lineitem_orderkey_fk").alias("constraint_name"),
            "n_checked",
            "n_violations",
        ),
        l.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(
            F.sum(F.col("cnt")).alias("n_checked"),
            F.coalesce(
                F.sum(
                    F.when(F.col("cnt") > 1, F.col("cnt") - 1).otherwise(0)
                ),
                F.lit(0),
            ).cast("long").alias("n_violations"),
        )
        .select(
            F.lit("lineitem_pk_unique").alias("constraint_name"),
            "n_checked",
            "n_violations",
        ),
        check("lineitem_quantity_max45", l, F.col("l_quantity") > 45),
        o.join(
            c.select("c_custkey"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .crossJoin(F.broadcast(o.agg(F.count(F.lit(1)).alias("n_checked"))))
        .select(
            F.lit("orders_custkey_fk").alias("constraint_name"),
            "n_checked",
            "n_violations",
        ),
    ]
    out = checks[0]
    for chk in checks[1:]:
        out = out.unionByName(chk)
    return out.select(
        "constraint_name",
        "n_checked",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    ).orderBy("constraint_name")


# ---------------------------------------------------------------------------
# q76 — ORC sink + scan round-trip: the second columnar format (Spark ships
# a native vectorized ORC reader/writer). The lineitem projection is
# written as zstd ORC partitioned work, read back, and aggregated — the
# oracle computes the same aggregate from the original parquet, so the
# round-trip proves lossless storage of doubles/strings/longs across the
# format boundary. At scale the interesting property is preserved
# vectorization: the read-back plan is a columnar ORC scan with the
# returnflag filter pushed down, same as parquet.
# ---------------------------------------------------------------------------

_Q76_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT)
         AS price_cents
FROM lineitem
WHERE l_returnflag <> 'N'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query("q76_orc_roundtrip", _Q76_SQL)
def q76_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dask_lightgbm_spark.session import scratch_dir

    l = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_extendedprice"
    )
    out = scratch_dir("q76_orc") + "/" + sf_dir.strip("/").replace("/", "_")
    l.write.mode("overwrite").option("compression", "zstd").orc(out)
    back = spark.read.orc(out).filter(F.col("l_returnflag") != "N")
    return (
        back.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_cents(F.col("l_extendedprice"))).alias("price_cents"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# q77 — gzip CSV sink + glob scan round-trip: the reference's ONLY source
# format driven through the oracle gate (B1 — dd.read_csv('*.gz',
# compression='gzip'), system_tests/test_fit_predict.py:26). The orders
# projection is written as multiple gzip CSV part files, read back through
# the same read_csv_glob the library exposes (explicit schema — the scale
# path; inference double-reads), and aggregated. Gzip parts are
# unsplittable (one file = one partition — exactly the reference's
# blocksize=None semantics), so the writer controls read parallelism by
# part count; doubles survive because Spark's CSV writer emits full
# precision and the reader parses to the same IEEE doubles.
# ---------------------------------------------------------------------------

_Q77_SQL = """
SELECT o_orderpriority, COUNT(*) AS n,
       CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders
WHERE o_orderstatus <> 'F'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("q77_csv_gzip_roundtrip", _Q77_SQL)
def q77_csv_gzip_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dask_lightgbm_spark.session import scratch_dir
    from dask_lightgbm_spark.sources.readers import read_csv_glob

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderstatus", "o_totalprice"
    )
    out = scratch_dir("q77_csv") + "/" + sf_dir.strip("/").replace("/", "_")
    (
        o.repartition(4)  # 4 gzip parts = 4 read partitions (unsplittable)
        .write.mode("overwrite")
        .option("header", "true")
        .option("compression", "gzip")
        .csv(out)
    )
    back = read_csv_glob(
        spark,
        out + "/*.csv.gz",
        header=True,
        schema="o_orderpriority string, o_orderstatus string, o_totalprice double",
    ).filter(F.col("o_orderstatus") != "F")
    return (
        back.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_cents(F.col("o_totalprice"))).alias("total_cents"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# q78 — small-files compaction (the table-maintenance op every long-lived
# lake table needs): a fragmented layout (64 tiny parquet files — the
# residue of streaming ingest or over-parallel writes) is compacted to a
# few scan-sized files with a single narrow repartition, and the
# compacted table is verified content-identical by aggregation. At 100 TB
# the metadata + open-cost of millions of small files dominates scan time;
# compaction trades one bounded shuffle for permanently cheaper scans.
# tests/test_plans.py pins the file counts (fragmented 64 → compacted ≤ 4).
# ---------------------------------------------------------------------------

_Q78_SQL = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events
GROUP BY event_type
ORDER BY event_type
"""

_Q78_FRAGMENTS = 64
_Q78_TARGET = 4


def compact_files(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write the fragmented layout once per session+sf_dir, compact it, and
    return (fragmented_dir, compacted_dir)."""
    from dask_lightgbm_spark.session import scratch_dir

    tag = sf_dir.strip("/").replace("/", "_")
    base = scratch_dir("q78_compact") + "/" + tag
    frag, compacted = f"{base}/fragmented", f"{base}/compacted"
    cache = getattr(spark, "_dls_compacted", None)
    if cache is None:
        cache = set()
        spark._dls_compacted = cache
    if base not in cache:
        e = load_table(spark, sf_dir, "events").select(
            "event_id", "event_type", "value"
        )
        e.repartition(_Q78_FRAGMENTS).write.mode("overwrite").parquet(frag)
        (
            spark.read.parquet(frag)
            .repartition(_Q78_TARGET)
            .write.mode("overwrite")
            .parquet(compacted)
        )
        cache.add(base)
    return frag, compacted


@query("q78_small_files_compaction", _Q78_SQL)
def q78_small_files_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, compacted = compact_files(spark, sf_dir)
    return (
        spark.read.parquet(compacted)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_cents(F.col("value"))).alias("value_cents"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q79 — analytic-function battery: the ranking/distribution window surface
# not yet covered elsewhere (q45 has rank/dense_rank/lag; q50 has
# stddev/moments): ntile, percent_rank, cume_dist, first/last_value with
# an explicit full-partition frame, and nth_value. All are exact — the
# distribution functions are single divisions of window-derived integers,
# so doubles are bit-identical. Per-segment windows partition on
# mktsegment (5 groups): at scale the window input is per-partition sorted
# once; no global sort.
# ---------------------------------------------------------------------------

_Q79_SQL = """
SELECT c_custkey, c_mktsegment,
       CAST(round(c_acctbal*100) AS BIGINT) AS acctbal_cents,
       CAST(ntile(4) OVER w AS INT) AS quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume,
       first_value(c_custkey) OVER w2 AS poorest_cust,
       last_value(c_custkey) OVER w2 AS richest_cust,
       nth_value(c_custkey, 2) OVER w2 AS second_cust
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment
             ORDER BY round(c_acctbal*100), c_custkey),
       w2 AS (PARTITION BY c_mktsegment
              ORDER BY round(c_acctbal*100), c_custkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY c_mktsegment, acctbal_cents, c_custkey
"""


@query("q79_analytic_battery", _Q79_SQL)
def q79_analytic_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    c = c.withColumn("acctbal_cents", cents)
    w = W.partitionBy("c_mktsegment").orderBy("acctbal_cents", "c_custkey")
    w2 = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "acctbal_cents",
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.first("c_custkey").over(w2).alias("poorest_cust"),
        F.last("c_custkey").over(w2).alias("richest_cust"),
        F.nth_value("c_custkey", 2).over(w2).alias("second_cust"),
    ).orderBy("c_mktsegment", "acctbal_cents", "c_custkey")


# ---------------------------------------------------------------------------
# q80 — gap-filled time series (resample + forward fill): the warehouse op
# behind every per-entity hourly dashboard — a dense hour spine ×
# entity-set scaffold LEFT-joined to the sparse observations, missing
# hours carried forward with last_value IGNORE NULLS. The scaffold is a
# generated sequence (no table scan) crossed with the BOUNDED entity set;
# the observation side is one hourly aggregation; the fill window runs per
# entity over the dense series. Output size = entities × hours by
# construction — the op's cost is declared up front, not data-dependent.
# ---------------------------------------------------------------------------

_Q80_START = "2024-01-01 00:00:00"
_Q80_END_EXCL = "2024-01-08 00:00:00"

_Q80_SQL = f"""
WITH hours AS (
  SELECT unnest(generate_series(TIMESTAMP '{_Q80_START}',
                                TIMESTAMP '2024-01-07 23:00:00',
                                INTERVAL 1 HOUR)) AS hour
),
users AS (SELECT DISTINCT user_id FROM events WHERE user_id < 50),
agg AS (
  SELECT user_id, date_trunc('hour', ts) AS hour,
         CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS cents,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events WHERE user_id < 50 AND ts < TIMESTAMP '{_Q80_END_EXCL}'
  GROUP BY user_id, hour
)
SELECT u.user_id AS user_id, h.hour AS hour,
       COALESCE(a.n, 0) AS n,
       last_value(a.cents IGNORE NULLS)
         OVER (PARTITION BY u.user_id ORDER BY h.hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS filled_cents
FROM hours h CROSS JOIN users u
LEFT JOIN agg a ON a.user_id = u.user_id AND a.hour = h.hour
ORDER BY user_id, hour
"""


@query("q80_gapfill_timeseries", _Q80_SQL)
def q80_gapfill_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(
        (F.col("user_id") < 50)
        & (F.col("ts") < F.lit(_Q80_END_EXCL).cast("timestamp"))
    )
    hours = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(_Q80_START).cast("timestamp"),
                F.lit("2024-01-07 23:00:00").cast("timestamp"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("hour")
    )
    users = e.select("user_id").distinct()
    agg = e.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(
        F.sum(_cents(F.col("value"))).alias("cents"),
        F.count(F.lit(1)).alias("n"),
    )
    # scaffold cardinality = |spine| × |entities| BY CONSTRUCTION — the
    # caller's filter bounds the entity set (here 50 users × 168 hours).
    # A generic gap-fill API must carry that bound as an explicit contract:
    # the scaffold is the OUTPUT's own size (every gap-filled series has
    # one row per (entity, tick)), so it is never a blow-up relative to the
    # result — but an unfiltered entity set × a fine-grained spine IS the
    # result being huge, and the caller owns that choice.
    scaffold = hours.crossJoin(users)
    w = (
        W.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        scaffold.join(agg, ["user_id", "hour"], "left")
        .select(
            "user_id",
            "hour",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.last("cents", ignorenulls=True).over(w).alias("filled_cents"),
        )
        .orderBy("user_id", "hour")
    )


# ---------------------------------------------------------------------------
# q81 — k-anonymity audit (the privacy gate a dataset release runs next to
# t18's PII scan): group the table by its QUASI-IDENTIFIERS (segment ×
# nation × coarse balance band — attributes that jointly re-identify) and
# report how many equivalence classes fall below k, and how many rows they
# expose. One groupBy + one summary aggregate, counts only — the audit
# never materializes row-level output, so it runs at scan speed on any
# table size. The fixture genuinely violates k=5 at every SF.
# ---------------------------------------------------------------------------

_Q81_K = 5

_Q81_SQL = f"""
WITH g AS (
  SELECT c_mktsegment, c_nationkey,
         CAST(floor(c_acctbal/1000) AS INT) AS bal_band,
         COUNT(*) AS n
  FROM customer GROUP BY c_mktsegment, c_nationkey, bal_band
)
SELECT CAST({_Q81_K} AS INT) AS k,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(MIN(n) AS BIGINT) AS min_group_size,
       CAST(SUM(CASE WHEN n < {_Q81_K} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating_groups,
       CAST(SUM(CASE WHEN n < {_Q81_K} THEN n ELSE 0 END) AS BIGINT)
         AS n_exposed_rows,
       MIN(n) >= {_Q81_K} AS is_k_anonymous
FROM g
"""


@query("q81_k_anonymity_audit", _Q81_SQL)
def q81_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    g = c.groupBy(
        "c_mktsegment",
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).cast("int").alias("bal_band"),
    ).agg(F.count(F.lit(1)).alias("n"))
    viol = F.col("n") < _Q81_K
    return g.agg(
        F.lit(_Q81_K).cast("int").alias("k"),
        F.count(F.lit(1)).alias("n_groups"),
        F.min("n").alias("min_group_size"),
        F.sum(viol.cast("long")).alias("n_violating_groups"),
        F.sum(F.when(viol, F.col("n")).otherwise(0)).alias("n_exposed_rows"),
        (F.min("n") >= _Q81_K).alias("is_k_anonymous"),
    )


# ---------------------------------------------------------------------------
# q82 — bivariate statistics from EXACT integer moments: corr/covariance
# are normally float aggregations (summation-order-dependent — banned by
# the determinism contract), but over fixed-point ints the five moments
# (Σx, Σy, Σxy, Σx², Σy², n) are exact, and Pearson r / covariance become
# single deterministic expressions of them. Units are chosen for int64
# headroom in the n·Σ products on BOTH engines (DuckDB promotes SUM to
# int128, Spark does not — the narrower engine sets the budget): x = whole
# quantity units (~50), y = whole kilodollars (~100), so n·Σy² ≈ 4e17 at
# sf1; DECIMAL(38) takes over at sf100. The statistic is then the exact
# correlation OF THE SCALED VALUES — a defined, engine-identical quantity.
# Same map-side-combine scan as any SUM; per-group stat-table output.
# ---------------------------------------------------------------------------

_Q82_SQL = """
WITH m AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         SUM(CAST(round(l_quantity) AS BIGINT)) AS sx,
         SUM(CAST(round(l_extendedprice/1000) AS BIGINT)) AS sy,
         SUM(CAST(round(l_quantity) AS BIGINT)
             * CAST(round(l_extendedprice/1000) AS BIGINT)) AS sxy,
         SUM(CAST(round(l_quantity) AS BIGINT)
             * CAST(round(l_quantity) AS BIGINT)) AS sxx,
         SUM(CAST(round(l_extendedprice/1000) AS BIGINT)
             * CAST(round(l_extendedprice/1000) AS BIGINT)) AS syy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, CAST(n AS BIGINT) AS n,
       CAST(n*sxy - sx*sy AS DOUBLE)
         / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS covariance,
       CAST(n*sxy - sx*sy AS DOUBLE)
         / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
            * sqrt(CAST(n*syy - sy*sy AS DOUBLE))) AS pearson_r
FROM m ORDER BY l_returnflag
"""


@query("q82_exact_bivariate_stats", _Q82_SQL)
def q82_exact_bivariate_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    x = F.round(F.col("l_quantity")).cast("long")
    y = F.round(F.col("l_extendedprice") / 1000).cast("long")
    m = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    return m.select(
        "l_returnflag",
        "n",
        (
            num
            / (F.col("n").cast("double") * F.col("n").cast("double"))
        ).alias("covariance"),
        (
            num
            / (
                F.sqrt(
                    (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                        "double"
                    )
                )
                * F.sqrt(
                    (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
                        "double"
                    )
                )
            )
        ).alias("pearson_r"),
    ).orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# q83 — table diff / reconciliation (the migration-validation op: "did the
# new system load exactly what the old one had?"): two table versions are
# compared by a FULL OUTER join on the key with row-content digests —
# classifying every key as unchanged / changed / only_left / only_right
# and reporting counts per class. Content is compared by md5 of a
# canonical column concatenation, so the join carries 2 digests per key,
# never the rows. v2 is derived deterministically from orders (updates on
# orderkey % 100 == 0, deletes on % 97 == 0, inserts as shifted keys) so
# the diff is non-trivial and the oracle reproduces it exactly. At scale
# this is one co-partitioned shuffle join on the key + a counts-only agg.
# ---------------------------------------------------------------------------

_Q83_DIGEST = (
    "md5(concat_ws('|', CAST(o_custkey AS VARCHAR), o_orderstatus, "
    "CAST(CAST(round(o_totalprice*100) AS BIGINT) AS VARCHAR), "
    "o_orderpriority))"
)

_Q83_SQL = f"""
WITH v1 AS (
  SELECT o_orderkey AS k, {_Q83_DIGEST} AS digest FROM orders
),
v2src AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CASE WHEN o_orderkey % 100 = 0 THEN o_totalprice + 10.0
              ELSE o_totalprice END AS o_totalprice,
         o_orderpriority
  FROM orders WHERE o_orderkey % 97 <> 0
),
v2 AS (
  SELECT o_orderkey AS k, {_Q83_DIGEST} AS digest FROM v2src
  UNION ALL
  SELECT o_orderkey + 100000000 AS k,
         md5(concat_ws('|', CAST(o_custkey AS VARCHAR), 'NEW')) AS digest
  FROM orders WHERE o_orderkey % 101 = 0
),
d AS (
  SELECT COALESCE(v1.k, v2.k) AS k,
         CASE WHEN v1.k IS NULL THEN 'only_right'
              WHEN v2.k IS NULL THEN 'only_left'
              WHEN v1.digest = v2.digest THEN 'unchanged'
              ELSE 'changed' END AS status
  FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k
)
SELECT status, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(k) AS BIGINT) AS min_key, CAST(MAX(k) AS BIGINT) AS max_key
FROM d GROUP BY status ORDER BY status
"""


@query("q83_table_diff", _Q83_SQL)
def q83_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    digest = F.md5(
        F.concat_ws(
            "|",
            F.col("o_custkey").cast("string"),
            F.col("o_orderstatus"),
            _cents(F.col("o_totalprice")).cast("string"),
            F.col("o_orderpriority"),
        )
    )
    v1 = o.select(F.col("o_orderkey").alias("k"), digest.alias("d1"))
    v2base = (
        o.filter(F.col("o_orderkey") % 97 != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 100 == 0, F.col("o_totalprice") + 10.0
            ).otherwise(F.col("o_totalprice")),
        )
        .select(F.col("o_orderkey").alias("k"), digest.alias("d2"))
    )
    v2new = o.filter(F.col("o_orderkey") % 101 == 0).select(
        (F.col("o_orderkey") + 100000000).alias("k"),
        F.md5(
            F.concat_ws("|", F.col("o_custkey").cast("string"), F.lit("NEW"))
        ).alias("d2"),
    )
    v2 = v2base.unionByName(v2new)
    d = v1.join(v2, "k", "full_outer").select(
        "k",
        F.when(F.col("d1").isNull(), "only_right")
        .when(F.col("d2").isNull(), "only_left")
        .when(F.col("d1") == F.col("d2"), "unchanged")
        .otherwise("changed")
        .alias("status"),
    )
    return (
        d.groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").alias("min_key"),
            F.max("k").alias("max_key"),
        )
        .orderBy("status")
    )


# ---------------------------------------------------------------------------
# q84 — time-weighted average (TWAP) over IRREGULAR event times: each
# event's value is weighted by how long it "held" (seconds until the
# user's next event — lead over the per-user time order), and the average
# is ΣvΔt/ΣΔt — the financial/telemetry aggregation a plain AVG gets
# wrong on irregular sampling. Determinism: Δt is exact integer
# MICROSECONDS (epoch_us — DuckDB's epoch() returns fractional doubles
# whose BIGINT cast ROUNDS while Spark's unix_timestamp truncates, so
# seconds are not parity-safe), value is exact cents, the weighted sum is
# int64 (~1e10/row → ~6e16 headroom at sf1), and the TWAP is ONE
# division. A user's last event has no successor and drops out (both
# engines agree). Per-user windows then one small agg.
# ---------------------------------------------------------------------------

_Q84_SQL = """
WITH t AS (
  SELECT user_id,
         CAST(round(value*100) AS BIGINT) AS v_cents,
         epoch_us(lead(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id))
           - epoch_us(ts) AS dt_us
  FROM events
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_held,
       CAST(SUM(dt_us) AS BIGINT) AS total_us,
       CAST(SUM(v_cents * dt_us) AS DOUBLE)
         / CAST(SUM(dt_us) AS DOUBLE) / 100.0 AS twap
FROM t WHERE dt_us IS NOT NULL
GROUP BY user_id
ORDER BY user_id
"""


@query("q84_twap_irregular_events", _Q84_SQL)
def q84_twap_irregular_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    t = e.select(
        "user_id",
        _cents(F.col("value")).alias("v_cents"),
        (
            F.unix_micros(F.lead("ts").over(w))
            - F.unix_micros(F.col("ts"))
        ).cast("long").alias("dt_us"),
    ).filter(F.col("dt_us").isNotNull())
    return (
        t.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_held"),
            F.sum("dt_us").alias("total_us"),
            (
                F.sum(F.col("v_cents") * F.col("dt_us")).cast("double")
                / F.sum("dt_us").cast("double")
                / F.lit(100.0)
            ).alias("twap"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# q85 — join-key skew report (the diagnostic run BEFORE choosing q53/q62's
# salting): per-key frequency stats for a prospective join key — top-5
# heaviest keys, and the skew ratio (max key count ×1000 ÷ mean key
# count, integer) that decides whether AQE skew handling or explicit
# salting is needed. The heavy-key list is a rank window over the
# per-key counts (key-cardinality-sized, not row-sized); ratios are
# integer permille per the determinism contract. The stats-only form is
# functions/partitioning.key_skew_stats, which t43's dataset card uses to
# auto-flag skewed dedup keys per source (r7 judge task 6) — this query
# keeps its inline shape because it additionally ranks the heavy keys.
# ---------------------------------------------------------------------------

_Q85_SQL = """
WITH counts AS (
  SELECT o_custkey AS key, CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY o_custkey
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys, CAST(SUM(n) AS BIGINT) AS n_rows,
         CAST(MAX(n) AS BIGINT) AS max_n
  FROM counts
),
ranked AS (
  SELECT key, n,
         CAST(row_number() OVER (ORDER BY n DESC, key) AS INT) AS rank
  FROM counts
)
SELECT r.rank, r.key, r.n,
       s.n_keys, s.n_rows,
       CAST(s.max_n * 1000 // (s.n_rows // s.n_keys) AS BIGINT)
         AS skew_ratio_permille
FROM ranked r CROSS JOIN stats s
WHERE r.rank <= 5
ORDER BY r.rank
"""


@query("q85_join_key_skew_report", _Q85_SQL)
def q85_join_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    counts = o.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    stats = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_n"),
    )
    # two-level top-5 (grouped_topk with no group): the heavy-key rank
    # never sorts the whole key-cardinality count table on one task
    from dask_lightgbm_spark.functions.partitioning import grouped_topk

    ranked = grouped_topk(
        counts, [], [F.desc("n"), F.asc("key")], 5, salt_on=["key"]
    ).withColumn("rank", F.col("__rank").cast("int")).drop("__rank")
    return (
        ranked.crossJoin(F.broadcast(stats))
        .select(
            "rank",
            "key",
            "n",
            "n_keys",
            "n_rows",
            # divide before the cardinality multiply — max_n*1000*n_keys
            # overflows int64 at the scale this diagnostic targets (ANSI
            # mode raises); floor-mean denominator ≥ 1 since n_rows ≥ n_keys
            F.expr("max_n * 1000 div (n_rows div n_keys)").alias(
                "skew_ratio_permille"
            ),
        )
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# q86 — moving statistical bands from EXACT window moments (the Bollinger
# shape over irregular event values): per user, a trailing 4-row window
# carries integer Σv and Σv² (cents), and mean/variance come out of the
# exact-moment identity as single expressions — the q82 trick applied to
# MOVING frames, where a naive stddev window would be float-fold-order
# dependent. Upper/lower bands = mean ± 2σ, each ONE expression over the
# integer sums. Window input is per-user ordered — the q39 frame shape.
# ---------------------------------------------------------------------------

_Q86_SQL = """
WITH t AS (
  SELECT user_id, event_id, ts,
         CAST(round(value*100) AS BIGINT) AS v,
         CAST(COUNT(*) OVER w AS BIGINT) AS n,
         CAST(SUM(CAST(round(value*100) AS BIGINT)) OVER w AS BIGINT) AS sv,
         CAST(SUM(CAST(round(value*100) AS BIGINT)
                  * CAST(round(value*100) AS BIGINT)) OVER w AS BIGINT) AS svv
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
)
SELECT user_id, event_id, n,
       CAST(sv AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 AS mov_mean,
       (CAST(sv AS DOUBLE) / CAST(n AS DOUBLE)
        + 2.0 * sqrt(CAST(n*svv - sv*sv AS DOUBLE)
                     / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))) / 100.0
         AS upper_band,
       (CAST(sv AS DOUBLE) / CAST(n AS DOUBLE)
        - 2.0 * sqrt(CAST(n*svv - sv*sv AS DOUBLE)
                     / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))) / 100.0
         AS lower_band
FROM t
ORDER BY user_id, event_id
"""


@query("q86_moving_bands_exact", _Q86_SQL)
def q86_moving_bands_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    v = _cents(F.col("value"))
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, W.currentRow)
    )
    t = e.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum(v).over(w).alias("sv"),
        F.sum(v * v).over(w).alias("svv"),
    )
    mean_c = F.col("sv").cast("double") / F.col("n").cast("double")
    sd_c = 2.0 * F.sqrt(
        (F.col("n") * F.col("svv") - F.col("sv") * F.col("sv")).cast("double")
        / (F.col("n").cast("double") * F.col("n").cast("double"))
    )
    return t.select(
        "user_id",
        "event_id",
        "n",
        (mean_c / F.lit(100.0)).alias("mov_mean"),
        ((mean_c + sd_c) / F.lit(100.0)).alias("upper_band"),
        ((mean_c - sd_c) / F.lit(100.0)).alias("lower_band"),
    ).orderBy("user_id", "event_id")


# ---------------------------------------------------------------------------
# q87 — period-over-period comparison (the BI staple): weekly revenue per
# event type with each week's exact integer delta vs the prior week — a
# lag window over the AGGREGATED series (weeks × types — tiny), never
# over raw events; the raw scan is one groupBy. The delta stays in CENTS,
# not a ratio: deltas go negative, and negative integer division FLOORS in
# DuckDB (//) but TRUNCATES in Spark (div) — a cross-engine trap the
# determinism contract sidesteps by not dividing. First week per type has
# no prior and reports NULL (both engines).
# ---------------------------------------------------------------------------

_Q87_SQL = """
WITH weekly AS (
  SELECT event_type, date_trunc('week', ts) AS week,
         CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS rev_cents
  FROM events GROUP BY event_type, week
)
SELECT event_type, week, rev_cents,
       lag(rev_cents) OVER (PARTITION BY event_type ORDER BY week)
         AS prev_cents,
       rev_cents - lag(rev_cents) OVER (PARTITION BY event_type
                                        ORDER BY week) AS delta_cents
FROM weekly
ORDER BY event_type, week
"""


@query("q87_period_over_period", _Q87_SQL)
def q87_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    weekly = e.groupBy(
        "event_type", F.date_trunc("week", F.col("ts")).alias("week")
    ).agg(F.sum(_cents(F.col("value"))).alias("rev_cents"))
    w = W.partitionBy("event_type").orderBy("week")
    prev = F.lag("rev_cents").over(w)
    return weekly.select(
        "event_type",
        "week",
        "rev_cents",
        prev.alias("prev_cents"),
        (F.col("rev_cents") - prev).alias("delta_cents"),
    ).orderBy("event_type", "week")
