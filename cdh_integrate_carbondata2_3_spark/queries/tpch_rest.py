"""The remaining TPC-H query shapes (q2/q8/q9/q11/q13/q15/q19/q20/q21),
adapted to the driver's reduced star schema (no partsupp table; lineitem
grouped by (partkey, suppkey) serves as the supply relation; missing
columns get documented surrogates).

These complete the 22-query TPC-H surface the reference exercises through
its SQL delegation + MV suites (reference integration/spark/src/test/
scala/org/apache/carbondata/view/rewrite/MVTpchTestCase.scala:66-176 and
the tpch CSV fixtures under integration/spark/src/test/resources/tpch/).
Operator shapes covered here that the rest of the surface doesn't:
correlated scalar subqueries (q2, q15), share-of-total with conditional
aggregation (q8), multi-way join + derived expression profit (q9),
HAVING vs a global scalar subquery (q11), outer-join histogram (q13),
disjunctive pushdown brackets (q19), nested IN subqueries (q20),
EXISTS / NOT EXISTS anti-correlation (q21).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table
from . import query

DEC = "decimal(12,2)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _dec(col: str) -> F.Column:
    return F.col(col).cast(DEC)


def _supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """partsupp surrogate: per (partkey, suppkey) the min extended price
    seen on lineitem acts as the supply cost."""
    return (_t(spark, sf_dir, "lineitem")
            .groupBy(F.col("l_partkey").alias("ps_partkey"),
                     F.col("l_suppkey").alias("ps_suppkey"))
            .agg(F.min(_dec("l_extendedprice")).alias("ps_supplycost")))


_SUPPLY_SQL = """
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         MIN(CAST(l_extendedprice AS DECIMAL(12,2))) AS ps_supplycost
  FROM lineitem GROUP BY 1, 2
"""


@query("q2_min_cost_supplier", oracle=f"""
WITH ps AS ({_SUPPLY_SQL})
SELECT s.s_name, n.n_name, p.p_partkey, p.p_brand,
       CAST(ps.ps_supplycost AS DOUBLE) AS supplycost
FROM part p
JOIN ps ON p.p_partkey = ps.ps_partkey
JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'EUROPE' AND p.p_size <= 15
  AND ps.ps_supplycost = (
    SELECT MIN(ps2.ps_supplycost) FROM ps ps2
    JOIN supplier s2 ON ps2.ps_suppkey = s2.s_suppkey
    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
    WHERE ps2.ps_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
""")
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: min-cost supplier per part via a correlated MIN
    subquery, expressed as a join against the per-part regional minimum
    (Catalyst plans the same de-correlation; the explicit groupBy keeps
    the shuffle on ps_partkey only)."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") <= 15)
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")

    europe_sup = (sup.join(F.broadcast(nat),
                           sup.s_nationkey == nat.n_nationkey)
                  .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
                  .select("s_suppkey", "s_name", "n_name"))
    ps = _supply(spark, sf_dir).join(europe_sup,
                                     F.col("ps_suppkey") == F.col("s_suppkey"))
    min_cost = (ps.groupBy("ps_partkey")
                .agg(F.min("ps_supplycost").alias("min_cost")))
    return (ps.join(min_cost, "ps_partkey")
            .filter(F.col("ps_supplycost") == F.col("min_cost"))
            .join(part, F.col("ps_partkey") == part.p_partkey)
            .select("s_name", "n_name", "p_partkey", "p_brand",
                    F.col("ps_supplycost").cast("double").alias("supplycost")))


@query("q8_market_share", oracle="""
SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
       CAST(ROUND(
         SUM(CASE WHEN n2.n_name = 'NATION_3'
             THEN CAST(l.l_extendedprice AS DECIMAL(12,2))
                  * (1 - CAST(l.l_discount AS DECIMAL(12,2))) ELSE 0 END)
         / SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l.l_discount AS DECIMAL(12,2)))), 6) AS DOUBLE)
         AS mkt_share
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN part p ON l.l_partkey = p.p_partkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
JOIN region r ON n1.n_regionkey = r.r_regionkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
WHERE r.r_name = 'AMERICA' AND p.p_type LIKE 'STAND%'
GROUP BY 1
""")
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: national market share per order-year. Fact-fact join
    (lineitem x orders) shuffles on orderkey; every dimension is
    broadcast so no other shuffle exists before the final single-column
    aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type").like("STAND%"))
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")

    n1 = nat.select(F.col("n_nationkey").alias("c_nk"),
                    F.col("n_regionkey").alias("c_rk"))
    n2 = nat.select(F.col("n_nationkey").alias("s_nk"),
                    F.col("n_name").alias("supp_nation"))
    cust_america = (c.join(F.broadcast(n1), c.c_nationkey == F.col("c_nk"))
                    .join(F.broadcast(reg), F.col("c_rk") == reg.r_regionkey)
                    .select("c_custkey"))
    vol = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    df = (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
          .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
          .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
          .join(o, li.l_orderkey == o.o_orderkey)
          .join(cust_america, o.o_custkey == F.col("c_custkey")))
    brazil_vol = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(
        F.lit(0).cast(DEC))
    return (df.groupBy(F.year("o_orderdate").alias("o_year"))
            .agg(F.round(F.sum(brazil_vol) / F.sum(vol), 6)
                 .cast("double").alias("mkt_share")))


@query("q9_product_profit", oracle="""
SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS o_year,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                  * (1 - CAST(l.l_discount AS DECIMAL(12,2)))
                - CAST(p.p_retailprice AS DECIMAL(12,2))
                  * CAST(l.l_quantity AS DECIMAL(12,2)) * CAST(0.1 AS DECIMAL(3,1)))
            AS DOUBLE) AS sum_profit
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE p.p_name LIKE '%widget%'
GROUP BY 1, 2
""")
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: profit by supplier-nation and year. ps_supplycost
    surrogate = 10% of p_retailprice per unit (schema has no partsupp)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    profit = (_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
              - _dec("p_retailprice") * _dec("l_quantity")
              * F.lit(0.1).cast("decimal(3,1)"))
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
            .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
            .join(o, li.l_orderkey == o.o_orderkey)
            .groupBy(F.col("n_name").alias("nation"),
                     F.year("o_orderdate").alias("o_year"))
            .agg(F.sum(profit).cast("double").alias("sum_profit")))


@query("q11_important_stock", oracle=f"""
WITH ps AS ({_SUPPLY_SQL}),
val AS (
  SELECT ps.ps_partkey,
         SUM(ps.ps_supplycost) AS value
  FROM ps
  JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name = 'NATION_7'
  GROUP BY ps.ps_partkey)
SELECT ps_partkey, CAST(value AS DOUBLE) AS value
FROM val
WHERE value > (SELECT SUM(value) * 2.0 / COUNT(*) FROM val)
""")
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: per-part value filtered against a fraction of the
    global total (HAVING vs scalar subquery). The global total is a
    one-row aggregate broadcast back as a cross join — no second scan
    shuffle. The spec scales its fraction by 1/SF; a pinned 0.001 is
    sf-degenerate (0 rows at sf0.1, found by the r11 full-registry
    sf0.1 gate) — 2× the mean per-part value is the scale-free
    equivalent cut."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    ger_sup = (s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
               .select("s_suppkey"))
    val = (_supply(spark, sf_dir)
           .join(F.broadcast(ger_sup), F.col("ps_suppkey") == F.col("s_suppkey"))
           .groupBy("ps_partkey")
           .agg(F.sum("ps_supplycost").alias("value")))
    total = val.agg((F.sum("value") * F.lit(2.0) / F.count(F.lit(1)))
                    .alias("threshold"))
    return (val.join(F.broadcast(total))
            .filter(F.col("value") > F.col("threshold"))
            .select("ps_partkey", F.col("value").cast("double").alias("value")))


@query("q13_customer_distribution", oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey)
GROUP BY c_count
""")
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: histogram of orders-per-customer including the
    zero-order bucket (left outer join with an ON-clause filter, two
    cascading aggregations)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (c.join(o, c.c_custkey == o.o_custkey, "left_outer")
                .groupBy(c.c_custkey)
                .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count(F.lit(1)).alias("custdist")))


@query("q15_top_supplier", oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name, CAST(r.total_revenue AS DOUBLE) AS total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""")
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with max quarterly revenue — the revenue
    'view' is computed once and reused for both the max and the join
    (df reference sharing; Spark reuses the exchange under AQE)."""
    li = _t(spark, sf_dir, "lineitem")
    rev = (li.filter((F.col("l_shipdate") >= "1996-01-01")
                     & (F.col("l_shipdate") < "1996-04-01"))
           .groupBy(F.col("l_suppkey").alias("supplier_no"))
           .agg(F.sum(_dec("l_extendedprice")
                      * (F.lit(1) - _dec("l_discount")))
                .alias("total_revenue")))
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    s = _t(spark, sf_dir, "supplier")
    return (rev.join(F.broadcast(mx))
            .filter(F.col("total_revenue") == F.col("mx"))
            .join(s, F.col("supplier_no") == s.s_suppkey)
            .select("s_suppkey", "s_name",
                    F.col("total_revenue").cast("double").alias("total_revenue")))


@query("q19_disjunctive_brackets", oracle="""
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 1 AND 15)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 20
       AND l.l_quantity BETWEEN 10 AND 25)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 30
       AND l.l_quantity BETWEEN 20 AND 35)
""")
def q19_disjunctive_brackets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: three OR'd conjunctive brackets spanning both join
    sides. Catalyst extracts the common single-side conjuncts
    (p_size >= 1, quantity range hull) for pushdown below the join."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    qty, brand, size = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((brand == "Brand#1") & size.between(1, 10) & qty.between(1, 15))
        | ((brand == "Brand#2") & size.between(1, 20) & qty.between(10, 25))
        | ((brand == "Brand#3") & size.between(1, 30) & qty.between(20, 35)))
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (j.filter(cond)
            .agg(F.sum(rev).cast("double").alias("revenue"),
                 F.count(F.lit(1)).alias("n_rows")))


@query("q20_nested_in", oracle="""
SELECT s.s_name, s.s_suppkey
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE n.n_name = 'NATION_5'
  AND s.s_suppkey IN (
    SELECT l.l_suppkey FROM lineitem l
    WHERE l.l_partkey IN (
      SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
    GROUP BY l.l_suppkey
    HAVING SUM(CAST(l.l_quantity AS DECIMAL(12,2))) > 50)
""")
def q20_nested_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20: nested IN subqueries (part-name filter inside a
    supplier-quantity HAVING) planned as two left-semi joins."""
    p = (_t(spark, sf_dir, "part")
         .filter(F.col("p_name").like("small%"))
         .select("p_partkey"))
    li = _t(spark, sf_dir, "lineitem")
    big_sup = (li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left_semi")
               .groupBy("l_suppkey")
               .agg(F.sum(_dec("l_quantity")).alias("qty"))
               .filter(F.col("qty") > 50)
               .select("l_suppkey"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    return (s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .join(big_sup, s.s_suppkey == F.col("l_suppkey"), "left_semi")
            .select("s_name", "s_suppkey"))


@query("q21_waiting_orders", oracle="""
SELECT s.s_name, COUNT(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE o.o_orderstatus = 'F' AND n.n_name = 'NATION_2'
  AND l1.l_returnflag = 'R'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R')
GROUP BY s.s_name
""")
def q21_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the only supplier at fault in a multi-supplier
    order (EXISTS another supplier's line, NOT EXISTS another supplier's
    faulty line). 'Late delivery' surrogate: l_returnflag = 'R' (schema
    has no commit/receipt dates). Both existential subqueries collapse
    into one aggregate over the order's lines, then a single join back —
    one shuffle on orderkey instead of two correlated-join shuffles."""
    li = _t(spark, sf_dir, "lineitem")
    l1 = li.filter(F.col("l_returnflag") == "R")
    # Per (orderkey, suppkey of the faulty line): other-supplier lines
    # and other-supplier faulty lines, computed once over lineitem.
    order_stats = (li.groupBy("l_orderkey")
                   .agg(F.collect_set("l_suppkey").alias("supps"),
                        F.collect_set(F.when(F.col("l_returnflag") == "R",
                                             F.col("l_suppkey"))).alias("r_supps")))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    others = F.size(F.array_remove(F.col("supps"), F.col("l_suppkey")))
    r_others = F.size(F.array_remove(F.col("r_supps"), F.col("l_suppkey")))
    return (l1.join(order_stats, "l_orderkey")
            .filter((others > 0) & (r_others == 0))
            .join(o, F.col("l_orderkey") == o.o_orderkey, "left_semi")
            .join(F.broadcast(
                s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
                .select("s_suppkey", "s_name")),
                F.col("l_suppkey") == F.col("s_suppkey"))
            .groupBy("s_name")
            .agg(F.count(F.lit(1)).alias("numwait")))
