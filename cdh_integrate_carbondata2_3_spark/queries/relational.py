"""Relational operator surface: scans, filters, joins, aggregations,
windows, set ops, scalar functions — the part of the reference's query
surface that CarbonData delegates to Spark SQL (SURVEY.md §2.3-§2.8).

Implemented with the DataFrame API so Catalyst plans pushdown/broadcast
freely; every query has a DuckDB oracle. Numeric conventions for
engine-vs-oracle hash equality:

- money/discount sums go through DECIMAL casts (exact, order-independent)
- averages are ROUND(...)ed (double summation order differs across engines)
- raw column pass-through (same parquet bits) needs no treatment

Reference parity notes are cited per query (file:line in /root/reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.registry import load_table
from . import query

DEC = "decimal(12,2)"       # money / qty / discount at parquet precision
DEC_OUT = "decimal(38,2)"   # final sum type, identical in both engines
DEC4_OUT = "decimal(38,4)"
DEC6_OUT = "decimal(38,6)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _dec(col: str) -> F.Column:
    return F.col(col).cast(DEC)


# ---------------------------------------------------------------------------
# TPC-H-shaped queries (the reference's MV/bench suite uses q1/q3/q5/q6/q7
# shapes — reference integration/spark/src/test/scala/org/apache/carbondata/
# view/rewrite/MVTpchTestCase.scala:66-176)
# ---------------------------------------------------------------------------

@query("q1_pricing_summary", oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4))
                * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
       CAST(ROUND(AVG(l_quantity), 3) AS DOUBLE) AS avg_qty,
       CAST(ROUND(AVG(l_extendedprice), 3) AS DOUBLE) AS avg_price,
       CAST(ROUND(AVG(l_discount), 4) AS DOUBLE) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""")
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary (reference MVTpchTestCase.scala:66)."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    charge = disc_price.cast("decimal(18,4)") * (F.lit(1) + _dec("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.round(F.avg("l_quantity"), 3).cast("double").alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 3).cast("double").alias("avg_price"),
            F.round(F.avg("l_discount"), 4).cast("double").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query("q3_shipping_priority", oracle="""
SELECT o_orderkey,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
       CAST(o_orderdate AS DATE) AS order_date,
       o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""")
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: unshipped-order revenue; customer dim is broadcast
    (reference delegates join choice to Spark — SURVEY.md §2.3)."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-03-15")
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select(
            "o_orderkey", "revenue",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@query("q5_local_supplier_volume", oracle="""
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
     JOIN lineitem ON l_orderkey = o_orderkey
     JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
     JOIN nation ON s_nationkey = n_nationkey
     JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
""")
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: regional revenue through local suppliers
    (reference MVTpchTestCase.scala q5 shape). Dims broadcast."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01"))
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp),
              (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


@query("q6_forecast_revenue", oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.02 AND 0.06
  AND l_quantity < 24
""")
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure filter+agg — fully pushed to the parquet scan."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.02) & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24))
        .agg((F.sum(_dec("l_extendedprice") * _dec("l_discount")))
             .cast("double").alias("revenue"))
    )


@query("q7_volume_shipping", oracle="""
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(volume) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
         CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) AS volume
  FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
       JOIN orders ON o_orderkey = l_orderkey
       JOIN customer ON c_custkey = o_custkey
       JOIN nation n1 ON s_nationkey = n1.n_nationkey
       JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
""")
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: nation-pair trade volume by year
    (reference MVTpchTestCase.scala q7 shape)."""
    supp = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") <= "1997-12-31"))
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    volume = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")))
        .withColumn("l_year", F.year("l_shipdate").cast("int"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum(volume).cast("double").alias("revenue"))
    )


@query("q10_returned_items", oracle="""
SELECT c_custkey, c_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
       c_acctbal, n_name
FROM customer JOIN orders ON c_custkey = o_custkey
     JOIN lineitem ON l_orderkey = o_orderkey
     JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""")
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top customers by returned-item revenue."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-10-01") & (F.col("o_orderdate") < "1997-01-01"))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Scan / filter / projection surface (reference pushes these to the format:
# CarbonFilters.scala:75-250; ours reach parquet via Catalyst pushdown)
# ---------------------------------------------------------------------------

@query("filter_point_lookup", oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
FROM lineitem WHERE l_orderkey = 4242
""")
def filter_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point filter → parquet row-group skipping via min/max stats."""
    return (_t(spark, sf_dir, "lineitem")
            .filter(F.col("l_orderkey") == 4242)
            .select("l_orderkey", "l_linenumber", "l_quantity",
                    "l_extendedprice", "l_returnflag"))


@query("filter_range_scan", oracle="""
SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-06-08 00:00:00'
  AND l_quantity BETWEEN 10 AND 20
""")
def filter_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range predicates (reference RangeValueFilterExecutorImpl analogue —
    Parquet stats do the skipping)."""
    return (_t(spark, sf_dir, "lineitem")
            .filter((F.col("l_shipdate") >= "1997-06-01")
                    & (F.col("l_shipdate") < "1997-06-08")
                    & F.col("l_quantity").between(10, 20))
            .select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity"))


@query("filter_in_like_null", oracle="""
SELECT o_orderkey, o_orderpriority, o_orderstatus, o_totalprice
FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
  AND o_orderstatus <> 'P'
  AND o_orderpriority LIKE '%-%'
  AND o_totalprice IS NOT NULL
  AND o_orderkey % 10 = 3
""")
def filter_in_like_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / NOT-EQUAL / LIKE / NULL-check predicate surface
    (reference expression tree: core/.../scan/expression/conditional/)."""
    return (_t(spark, sf_dir, "orders")
            .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
                    & (F.col("o_orderstatus") != "P")
                    & F.col("o_orderpriority").like("%-%")
                    & F.col("o_totalprice").isNotNull()
                    & (F.col("o_orderkey") % 10 == 3))
            .select("o_orderkey", "o_orderpriority", "o_orderstatus", "o_totalprice"))


@query("count_star_metadata", oracle="SELECT COUNT(*) AS count_rows FROM lineitem")
def count_star_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only count(*) — answered from parquet footers without a
    scan, mirroring the reference's driver-side CarbonCountStar
    (integration/spark/.../sql/CarbonCountStar.scala:44-108)."""
    from ..plans.countstar import count_star_dataframe
    return count_star_dataframe(spark, f"{sf_dir}/lineitem.parquet")


# ---------------------------------------------------------------------------
# Aggregation surface (delegated to Spark in the reference — SURVEY.md §2.4)
# ---------------------------------------------------------------------------

@query("agg_count_distinct", oracle="""
SELECT l_returnflag,
       COUNT(DISTINCT l_suppkey) AS distinct_supp,
       COUNT(DISTINCT l_partkey) AS distinct_part,
       COUNT(*) AS n
FROM lineitem GROUP BY l_returnflag
""")
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (_t(spark, sf_dir, "lineitem")
            .groupBy("l_returnflag")
            .agg(F.countDistinct("l_suppkey").alias("distinct_supp"),
                 F.countDistinct("l_partkey").alias("distinct_part"),
                 F.count(F.lit(1)).alias("n")))


@query("agg_rollup", oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
""")
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ROLLUP (reference exposes via Spark; MV rollup tests)."""
    return (_t(spark, sf_dir, "lineitem")
            .rollup("l_returnflag", "l_linestatus")
            .agg(F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
                 F.count(F.lit(1)).alias("n")))


@query("agg_cube", oracle="""
SELECT o_orderstatus, o_orderpriority,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
       COUNT(*) AS n
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
""")
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (_t(spark, sf_dir, "orders")
            .cube("o_orderstatus", "o_orderpriority")
            .agg(F.sum(_dec("o_totalprice")).cast("double").alias("sum_price"),
                 F.count(F.lit(1)).alias("n")))


@query("agg_having", oracle="""
SELECT l_suppkey,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
FROM lineitem
GROUP BY l_suppkey
HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 15500
""")
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (_t(spark, sf_dir, "lineitem")
            .groupBy("l_suppkey")
            .agg(F.sum(_dec("l_quantity")).alias("_tq"))
            .filter(F.col("_tq") > 15500)
            .select("l_suppkey", F.col("_tq").cast("double").alias("total_qty")))


@query("agg_conditional_pivot", oracle="""
SELECT o_orderpriority,
       COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open,
       COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_fulfilled,
       COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_partial,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(12,2)) ELSE 0 END) AS DOUBLE) AS open_price
FROM orders GROUP BY o_orderpriority
""")
def agg_conditional_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot expressed as conditional aggregation (stable column names)."""
    o = _t(spark, sf_dir, "orders")
    return (o.groupBy("o_orderpriority")
            .agg(F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_open"),
                 F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_fulfilled"),
                 F.count(F.when(F.col("o_orderstatus") == "P", 1)).alias("n_partial"),
                 F.sum(F.when(F.col("o_orderstatus") == "O", _dec("o_totalprice"))
                       .otherwise(F.lit(0).cast(DEC)))
                 .cast("double").alias("open_price")))


@query("agg_minmax_stats", oracle="""
SELECT l_linestatus,
       MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
       MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship,
       MIN(l_orderkey) AS min_ok, MAX(l_orderkey) AS max_ok
FROM lineitem GROUP BY l_linestatus
""")
def agg_minmax_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN/MAX over numeric/timestamp/integer — exact pass-through values."""
    return (_t(spark, sf_dir, "lineitem")
            .groupBy("l_linestatus")
            .agg(F.min("l_quantity").alias("min_qty"), F.max("l_quantity").alias("max_qty"),
                 F.min("l_shipdate").alias("min_ship"), F.max("l_shipdate").alias("max_ship"),
                 F.min("l_orderkey").alias("min_ok"), F.max("l_orderkey").alias("max_ok")))


# ---------------------------------------------------------------------------
# Window surface (reference test: testsuite/windowsexpr/WindowsExprTestCase
# .scala:50-61 — dense_rank / row_number / sum-over)
# ---------------------------------------------------------------------------

_RANK_BODY = """
SELECT c_custkey, c_nationkey, c_acctbal,
       ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn,
       RANK()       OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS rnk,
       DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS drnk
FROM customer
"""


# Spark twin: QUALIFY is DuckDB-only — same windows, subquery filter
@query("window_rank_customers",
       oracle=_RANK_BODY + "QUALIFY rn <= 5",
       spark_oracle=f"SELECT * FROM ({_RANK_BODY}) WHERE rn <= 5")
def window_rank_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number/rank/dense_rank + top-k-per-group filter."""
    cust = _t(spark, sf_dir, "customer")
    w_u = W.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    w_t = W.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"))
    return (cust.select(
                "c_custkey", "c_nationkey", "c_acctbal",
                F.row_number().over(w_u).alias("rn"),
                F.rank().over(w_t).alias("rnk"),
                F.dense_rank().over(w_t).alias("drnk"))
            .filter(F.col("rn") <= 5))


@query("window_running_lag", oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
       LAG(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_orderkey,
       LEAD(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_orderkey
FROM orders WHERE o_custkey < 200
""")
def window_running_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum + lag/lead with explicit frame (decimal → exact)."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey", "o_orderkey",
        F.sum(_dec("o_totalprice")).over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("double").alias("running_spend"),
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"))


@query("window_ntile_buckets", oracle="""
SELECT s_suppkey, s_nationkey,
       NTILE(4) OVER (ORDER BY s_acctbal DESC, s_suppkey) AS balance_quartile
FROM supplier
""")
def window_ntile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    w = W.orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    return s.select("s_suppkey", "s_nationkey",
                    F.ntile(4).over(w).alias("balance_quartile"))


# ---------------------------------------------------------------------------
# Join surface beyond the TPC-H shapes (semi/anti/outer — SURVEY.md §2.3)
# ---------------------------------------------------------------------------

@query("join_semi_anti", oracle="""
SELECT o_orderkey, o_totalprice, 'has_big_item' AS tag
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
UNION ALL
SELECT o_orderkey, o_totalprice, 'no_big_item' AS tag
FROM orders o
WHERE o_orderkey < 1000
  AND NOT EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
""")
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI (EXISTS) and LEFT ANTI (NOT EXISTS) joins."""
    o = _t(spark, sf_dir, "orders")
    big = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49) \
        .select("l_orderkey")
    semi = (o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
            .select("o_orderkey", "o_totalprice", F.lit("has_big_item").alias("tag")))
    anti = (o.filter(F.col("o_orderkey") < 1000)
            .join(big, o.o_orderkey == big.l_orderkey, "left_anti")
            .select("o_orderkey", "o_totalprice", F.lit("no_big_item").alias("tag")))
    return semi.unionAll(anti)


@query("join_outer_counts", oracle="""
SELECT n_name,
       COUNT(s_suppkey) AS n_suppliers,
       CAST(COALESCE(SUM(CAST(s_acctbal AS DECIMAL(12,2))), 0) AS DOUBLE) AS supp_balance
FROM nation LEFT JOIN supplier ON n_nationkey = s_nationkey
GROUP BY n_name
""")
def join_outer_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving dimension rows with no facts."""
    n = _t(spark, sf_dir, "nation")
    s = _t(spark, sf_dir, "supplier")
    return (n.join(s, n.n_nationkey == s.s_nationkey, "left")
            .groupBy("n_name")
            .agg(F.count("s_suppkey").alias("n_suppliers"),
                 F.coalesce(F.sum(_dec("s_acctbal")), F.lit(0).cast(DEC))
                 .cast("double").alias("supp_balance")))


@query("join_full_outer", oracle="""
SELECT COALESCE(c.k, s.k) AS nationkey,
       COALESCE(n_cust, 0) AS n_cust,
       COALESCE(n_supp, 0) AS n_supp
FROM (SELECT c_nationkey AS k, COUNT(*) AS n_cust FROM customer WHERE c_acctbal > 9000 GROUP BY 1) c
FULL OUTER JOIN (SELECT s_nationkey AS k, COUNT(*) AS n_supp FROM supplier WHERE s_acctbal > 5000 GROUP BY 1) s
ON c.k = s.k
""")
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (_t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
         .groupBy(F.col("c_nationkey").alias("ck")).agg(F.count(F.lit(1)).alias("n_cust")))
    s = (_t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 5000)
         .groupBy(F.col("s_nationkey").alias("sk")).agg(F.count(F.lit(1)).alias("n_supp")))
    return (c.join(s, c.ck == s.sk, "full_outer")
            .select(F.coalesce(c.ck, s.sk).alias("nationkey"),
                    F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
                    F.coalesce("n_supp", F.lit(0)).alias("n_supp")))


# ---------------------------------------------------------------------------
# Set operations (delegated in reference — SURVEY.md §2.7)
# ---------------------------------------------------------------------------

@query("setop_union_distinct", oracle="""
SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9900
UNION
SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 9000
""")
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (_t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9900)
         .select(F.col("c_nationkey").alias("nationkey")))
    s = (_t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 9000)
         .select(F.col("s_nationkey").alias("nationkey")))
    return c.union(s).distinct()


@query("setop_intersect", oracle="""
SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9900
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 9000
""")
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (_t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9900)
         .select(F.col("c_nationkey").alias("nationkey")))
    s = (_t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 9000)
         .select(F.col("s_nationkey").alias("nationkey")))
    return c.intersect(s)


@query("setop_except", oracle="""
SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 250000
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
""")
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT over a key domain that scales with the data (customers
    with a high-value order who never placed an urgent one). The old
    nationkey form saturated its 25-value domain at sf0.1 — both
    sides covered every nation and the gate passed on 0 rows (r11
    full-registry sf0.1 run); a custkey domain keeps the result a
    roughly fixed fraction at every sf."""
    o = _t(spark, sf_dir, "orders")
    hi = (o.filter(F.col("o_totalprice") > 250000)
          .select(F.col("o_custkey").alias("custkey")))
    urgent = (o.filter(F.col("o_orderpriority") == "1-URGENT")
              .select(F.col("o_custkey").alias("custkey")))
    return hi.subtract(urgent)


# ---------------------------------------------------------------------------
# Scalar function surface (string/date/math — delegated in reference,
# SURVEY.md §2.8; tested broadly by allqueries/AllDataTypesTestCase)
# ---------------------------------------------------------------------------

@query("scalar_string_funcs", oracle="""
SELECT c_custkey,
       UPPER(c_mktsegment) AS seg_upper,
       LOWER(c_name) AS name_lower,
       SUBSTR(c_name, 1, 8) AS name_prefix,
       LENGTH(c_name) AS name_len,
       c_name || '/' || c_mktsegment AS name_seg,
       REPLACE(c_name, 'Customer', 'C') AS name_short,
       TRIM(c_mktsegment) AS seg_trim
FROM customer WHERE c_custkey < 100
""")
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 100)
    return c.select(
        "c_custkey",
        F.upper("c_mktsegment").alias("seg_upper"),
        F.lower("c_name").alias("name_lower"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.concat_ws("/", "c_name", "c_mktsegment").alias("name_seg"),
        F.regexp_replace("c_name", "Customer", "C").alias("name_short"),
        F.trim(F.col("c_mktsegment")).alias("seg_trim"))


@query("scalar_date_funcs", oracle="""
SELECT o_orderkey,
       CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS order_year,
       CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS order_month,
       CAST(EXTRACT(day FROM o_orderdate) AS INTEGER) AS order_day,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date_s,
       CAST(CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS VARCHAR) AS order_month_start
FROM orders WHERE o_orderkey < 500
""")
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("int").alias("order_day"),
        F.col("o_orderdate").cast("date").cast("string").alias("order_date_s"),
        F.date_trunc("month", F.col("o_orderdate")).cast("string").alias("order_month_start"))


@query("scalar_math_case", oracle="""
SELECT p_partkey,
       CAST(FLOOR(p_retailprice) AS BIGINT) AS price_floor,
       CAST(CEIL(p_retailprice) AS BIGINT) AS price_ceil,
       ABS(p_size - 25) AS size_dist,
       p_size % 5 AS size_mod,
       CASE WHEN p_retailprice > 1500 THEN 'premium'
            WHEN p_retailprice > 900 THEN 'standard'
            ELSE 'budget' END AS price_band,
       GREATEST(p_size, 10) AS size_floor10,
       LEAST(p_size, 40) AS size_cap40
FROM part WHERE p_partkey < 1000
""")
def scalar_math_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") < 1000)
    return p.select(
        "p_partkey",
        F.floor("p_retailprice").cast("bigint").alias("price_floor"),
        F.ceil("p_retailprice").cast("bigint").alias("price_ceil"),
        F.abs(F.col("p_size") - 25).alias("size_dist"),
        (F.col("p_size") % 5).alias("size_mod"),
        F.when(F.col("p_retailprice") > 1500, "premium")
         .when(F.col("p_retailprice") > 900, "standard")
         .otherwise("budget").alias("price_band"),
        F.greatest("p_size", F.lit(10)).alias("size_floor10"),
        F.least("p_size", F.lit(40)).alias("size_cap40"))


# ---------------------------------------------------------------------------
# Sorts / limits / distinct (SURVEY.md §2.6; reference top-k:
# CarbonTakeOrderedAndProjectExec.scala:29-86 — Spark plans the same)
# ---------------------------------------------------------------------------

@query("orderby_limit_topk", oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
LIMIT 15
""")
def orderby_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT → Spark's TakeOrderedAndProject (no full sort)."""
    return (_t(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_linenumber", "l_extendedprice")
            .orderBy(F.desc("l_extendedprice"), F.asc("l_orderkey"),
                     F.asc("l_linenumber"))
            .limit(15))


@query("distinct_projection", oracle="""
SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
""")
def distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (_t(spark, sf_dir, "customer")
            .select("c_mktsegment", "c_nationkey").distinct())


@query("topk_per_group", oracle="""
SELECT p_brand, p_partkey, p_retailprice, rk FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         ROW_NUMBER() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC, p_partkey) AS rk
  FROM part) t
WHERE rk <= 3
""")
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group — the window-filter pattern."""
    p = _t(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (p.select("p_brand", "p_partkey", "p_retailprice",
                     F.row_number().over(w).alias("rk"))
            .filter(F.col("rk") <= 3))


# ---------------------------------------------------------------------------
# Events / timeseries / JSON (reference timeseries(col,'hour') UDF →
# date_trunc: MVFunctions.scala:28-32, MVTimeGranularity.scala:25-35)
# ---------------------------------------------------------------------------

_HOURLY_BODY = """
SELECT CAST(DATE_TRUNC('hour', ts) AS {s}) AS hour_bucket,
       event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM events
WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-12 00:00:00'
GROUP BY 1, 2
"""


# Spark twin: only the string type name differs (VARCHAR needs a
# length parameter under Spark's ANSI parser)
@query("events_hourly_rollup", oracle=_HOURLY_BODY.format(s="VARCHAR"),
       spark_oracle=_HOURLY_BODY.format(s="STRING"))
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """timeseries(ts,'hour') equivalent via date_trunc (SURVEY.md §2.4)."""
    from ..functions.timeseries import timeseries_bucket
    e = _t(spark, sf_dir, "events").filter(
        (F.col("ts") >= "2024-01-10") & (F.col("ts") < "2024-01-12"))
    return (e.groupBy(
                timeseries_bucket(F.col("ts"), "hour").cast("string").alias("hour_bucket"),
                F.col("event_type"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.countDistinct("user_id").alias("n_users"),
                 F.sum(F.col("value").cast("decimal(18,4)"))
                 .cast("double").alias("total_value")))


@query("events_json_extract", oracle="""
SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_bucket,
       COUNT(*) AS n,
       MIN(event_id) AS min_event
FROM events
GROUP BY 1
""")
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON payload extraction (get_json_object, JVM-side)."""
    e = _t(spark, sf_dir, "events")
    return (e.select((F.get_json_object("props", "$.k").cast("int") % 10).alias("k_bucket"),
                     "event_id")
            .groupBy("k_bucket")
            .agg(F.count(F.lit(1)).alias("n"), F.min("event_id").alias("min_event")))


@query("events_sessionize", oracle="""
WITH gaps AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events WHERE user_id < 100
), sess AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM gaps)
SELECT user_id, CAST(session_id AS INTEGER) AS session_id, COUNT(*) AS n_events,
       CAST(MIN(ts) AS VARCHAR) AS session_start
FROM sess GROUP BY user_id, session_id
""")
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via lag-gap + cumulative sum (batch analogue of
    the streaming session_window surface)."""
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts") - F.lag(F.col("ts")).over(w)
    new_session = F.when(
        gap.isNull() | (gap > F.expr("INTERVAL 30 MINUTES")), 1).otherwise(0)
    w_run = (W.partitionBy("user_id").orderBy("ts", "event_id")
             .rowsBetween(W.unboundedPreceding, W.currentRow))
    sess = (e.select("user_id", "ts", "event_id")
            .withColumn("new_session", new_session)
            .withColumn("session_id", F.sum("new_session").over(w_run).cast("int")))
    return (sess.groupBy("user_id", "session_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min("ts").cast("string").alias("session_start")))


_QUANTILES_BODY = """
SELECT o_orderpriority,
       COUNT(*) AS n,
       CAST(ROUND({q}(o_totalprice, 0.5), 4) AS DOUBLE) AS p50,
       CAST(ROUND({q}(o_totalprice, 0.95), 4) AS DOUBLE) AS p95,
       CAST(ROUND({q}(o_totalprice, 0.99), 4) AS DOUBLE) AS p99
FROM orders GROUP BY o_orderpriority
"""


# Spark twin: identical SQL, only the exact-percentile function name
# differs (DuckDB quantile_cont / Spark percentile — same linear
# interpolation on the sorted group)
@query("agg_exact_quantiles",
       oracle=_QUANTILES_BODY.format(q="quantile_cont"),
       spark_oracle=_QUANTILES_BODY.format(q="percentile"))
def agg_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles per group (Spark `percentile` ==
    DuckDB `quantile_cont`: linear interpolation on the sorted group).
    Scale note: exact percentile sorts each group's values — fine for
    grouped dashboards (group count × values/group bounded); for
    full-corpus quantiles at 100 TB switch to `approx_percentile`
    (t-digest, mergeable map-side, no global sort) and accept the
    documented error bound — that variant has no cross-engine oracle,
    which is exactly why the gate pins the exact form."""
    o = _t(spark, sf_dir, "orders")
    return (o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.95)"), 4).alias("p95"),
        F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99")))


@query("events_rolling_window", oracle="""
SELECT user_id, CAST(ts AS VARCHAR) AS ts_s,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_24h,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_24h
FROM events WHERE user_id < 40
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 24 HOURS PRECEDING AND CURRENT ROW)
""")
def events_rolling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range window frames (RANGE BETWEEN INTERVAL ... PRECEDING):
    per-event rolling 24h count and sum per user — the sliding-window
    feature shape ROWS frames can't express when event spacing is
    irregular. One shuffle on the partition key; the frame scan is a
    per-partition ordered pass. Sum accumulates in DECIMAL so the
    frame-order float addition can't drift the hash."""
    e = _t(spark, sf_dir, "events")
    e.filter(F.col("user_id") < 40).createOrReplaceTempView(
        "__rolling_events__")
    return spark.sql("""
        SELECT user_id, CAST(ts AS STRING) AS ts_s,
               CAST(COUNT(*) OVER w AS BIGINT) AS n_24h,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
                 AS sum_24h
        FROM __rolling_events__
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 24 HOURS PRECEDING
                     AND CURRENT ROW)""")
