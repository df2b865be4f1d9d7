"""TPC-H subquery shapes: EXISTS / NOT EXISTS / IN / scalar subqueries
and conditional-aggregate joins — Catalyst's subquery decorrelation
surface (delegated by the reference to Spark; covered by its
allqueries/detailquery suites, SURVEY.md §2.7, §3.1)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query
from .relational import _dec, _t


@query("q4_order_priority", oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
""")
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS correlated subquery → left-semi join
    (late-lineitem predicate adapted to the testdata's columns)."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01")
        & (F.col("o_orderdate") < "1996-10-01"))
    li = (_t(spark, sf_dir, "lineitem")
          .filter(F.col("l_returnflag") == "R")
          .select("l_orderkey"))
    return (o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("order_count")))


@query("q12_shipmode_priority", oracle="""
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_returnflag IN ('A', 'R')
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_linestatus
""")
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: fact join + conditional CASE aggregates
    (shipmode adapted to the testdata's flag/status columns)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("A", "R")
        & (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01"))
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (o.join(li, o.o_orderkey == li.l_orderkey)
            .groupBy("l_linestatus")
            .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
                 F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count")))


@query("q14_promo_effect", oracle="""
SELECT CAST(ROUND(100.00 * SUM(CASE WHEN p_type LIKE 'PROMO%'
                 THEN CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(12,2))) ELSE 0 END)
       / SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * (1 - CAST(l_discount AS DECIMAL(12,2)))), 4) AS DOUBLE) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
""")
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: broadcast dim join + conditional ratio aggregate."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01")
        & (F.col("l_shipdate") < "1996-04-01"))
    p = _t(spark, sf_dir, "part")
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0))
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .agg(F.round(F.lit(100.0) * F.sum(promo) / F.sum(rev), 4)
                 .cast("double").alias("promo_revenue")))


@query("q16_parts_supplier", oracle="""
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT ps_suppkey) AS supplier_cnt
FROM (SELECT p_brand, p_type, p_size, s_suppkey AS ps_suppkey
      FROM part JOIN supplier ON p_partkey % 100 = s_suppkey % 100
      WHERE p_brand <> 'Brand#45'
        AND p_type NOT LIKE 'MEDIUM POLISHED%'
        AND p_size IN (49, 14, 23, 45, 19, 3, 36, 9)
        AND s_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_acctbal < 0))
GROUP BY p_brand, p_type, p_size
""")
def q16_parts_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: NOT IN anti-join + count-distinct grouping
    (partsupp doesn't exist in the testdata; the part↔supplier
    mod-key join stands in for it; complaint filter → negative
    balance)."""
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & ~F.col("p_type").like("MEDIUM POLISHED%")
        & F.col("p_size").isin(49, 14, 23, 45, 19, 3, 36, 9))
    s = _t(spark, sf_dir, "supplier")
    bad = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    good = s.join(bad, "s_suppkey", "left_anti")
    joined = p.join(good, p.p_partkey % 100 == good.s_suppkey % 100)
    return (joined.groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("s_suppkey").alias("supplier_cnt")))


@query("q17_small_quantity", oracle="""
WITH pa AS (
  SELECT l_partkey AS ak,
         SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sum_q,
         COUNT(*) AS cnt
  FROM lineitem GROUP BY l_partkey)
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,2))
            / 7.0 AS DOUBLE) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN pa ON ak = l_partkey
WHERE p_brand = 'Brand#23'
  AND CAST(l_quantity AS DECIMAL(12,2)) * 5 * cnt < sum_q
""")
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: correlated scalar subquery (qty < 0.2 × per-part
    average) decorrelated into a pre-aggregate + join. The cutoff is
    compared as ``qty × 5 × cnt < sum`` — exact decimal/integer
    arithmetic, because a float 0.2×AVG cutoff can straddle an integer
    quantity differently per engine (summation order)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    pa = (li.groupBy(F.col("l_partkey").alias("ak"))
          .agg(F.sum(_dec("l_quantity")).alias("sum_q"),
               F.count(F.lit(1)).alias("cnt")))
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .join(pa, li.l_partkey == F.col("ak"))
            .filter(_dec("l_quantity") * 5 * F.col("cnt") < F.col("sum_q"))
            .agg((F.sum(_dec("l_extendedprice")).cast("decimal(38,2)")
                  / 7.0).cast("double").alias("avg_yearly")))


@query("q18_large_volume", oracle="""
SELECT c_name, o_orderkey, CAST(o_totalprice AS DOUBLE) AS totalprice,
       CAST(q.sum_qty AS DOUBLE) AS sum_qty
FROM orders
JOIN customer ON c_custkey = o_custkey
JOIN (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 250) q
  ON q.l_orderkey = o_orderkey
""")
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: IN over a grouped HAVING subquery → aggregate join."""
    li = _t(spark, sf_dir, "lineitem")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum(_dec("l_quantity")).alias("sum_qty"))
           .filter(F.col("sum_qty") > 250))
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (o.join(big, o.o_orderkey == big.l_orderkey)
            .join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .select("c_name", "o_orderkey",
                    F.col("o_totalprice").cast("double").alias("totalprice"),
                    F.col("sum_qty").cast("double").alias("sum_qty")))


@query("q22_global_sales", oracle="""
WITH el AS (
  SELECT c_custkey, c_nationkey % 10 AS cntrycode,
         CAST(c_acctbal AS DECIMAL(12,2)) AS bal
  FROM customer WHERE c_nationkey % 10 IN (1, 3, 7)
), ab AS (
  SELECT SUM(bal) AS s, COUNT(*) AS n FROM el WHERE bal > 0
)
SELECT cntrycode,
       COUNT(*) AS numcust,
       CAST(SUM(bal) AS DOUBLE) AS totacctbal
FROM el, ab
WHERE bal * n > s
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
GROUP BY cntrycode
""")
def q22_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery (global average, compared as
    ``bal × n > sum`` — exact decimal) + NOT EXISTS anti-join
    (phone-prefix country code adapted to nationkey)."""
    c = _t(spark, sf_dir, "customer").withColumn(
        "cntrycode", F.col("c_nationkey") % 10)
    eligible = (c.filter(F.col("cntrycode").isin(1, 3, 7))
                .withColumn("bal", _dec("c_acctbal")))
    ab = (eligible.filter(F.col("bal") > 0)
          .agg(F.sum("bal").alias("s"), F.count(F.lit(1)).alias("n")))
    o = (_t(spark, sf_dir, "orders")
         .filter(F.col("o_totalprice") > 300000).select("o_custkey"))
    return (eligible.crossJoin(F.broadcast(ab))
            .filter(F.col("bal") * F.col("n") > F.col("s"))
            .join(o, eligible.c_custkey == o.o_custkey, "left_anti")
            .groupBy("cntrycode")
            .agg(F.count(F.lit(1)).alias("numcust"),
                 F.sum("bal").cast("double").alias("totacctbal")))
