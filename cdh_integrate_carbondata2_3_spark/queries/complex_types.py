"""MAP-type surface inside the correctness gate (SURVEY §1.2).

The reference's complex-type support covers ARRAY/STRUCT/MAP up to
two nesting levels (format/src/main/thrift/schema.thrift:39 DataType
MAP; integration/spark complexType test suites). ARRAY is covered by
`complex_array_functions` and STRUCT by the multimodal metadata
queries; this module closes the MAP gap end-to-end: a managed table
with a `map<string,string>` column is created, written, read back
through the schema-aligned segment reader, and queried with
`element_at` / `map_keys` / `explode` — all JVM-side built-ins.

The DuckDB oracle never needs MAP: it recomputes the same final
relation from the source parquet, which is exactly the point — the
map round-trip through the table format must be lossless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog.table import Table
from . import query
from .lifecycle_queries import _scratch


@query("complex_map_functions", oracle="""
SELECT pk, pv, n_rows, min_key, n_keys, n_elem_match FROM (
  SELECT 'prio' AS pk, o_orderpriority AS pv,
         COUNT(*) AS n_rows, MIN(o_orderkey) AS min_key,
         CAST(2 AS INT) AS n_keys, CAST(0 AS BIGINT) AS n_elem_match
  FROM orders WHERE o_orderkey < 5000 GROUP BY o_orderpriority
  UNION ALL
  SELECT 'status' AS pk, o_orderstatus AS pv,
         COUNT(*) AS n_rows, MIN(o_orderkey) AS min_key,
         CAST(2 AS INT) AS n_keys, COUNT(*) AS n_elem_match
  FROM orders WHERE o_orderkey < 5000 GROUP BY o_orderstatus)
""")
def complex_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP column end-to-end: build map('status',...,'prio',...) per
    order, store it in a managed table, read it back, then explode the
    entries and aggregate per (key, value) — with map_keys/element_at
    exercised in the same plan."""
    orders = (spark.read.parquet(f"{sf_dir}/orders.parquet")
              .filter(F.col("o_orderkey") < 5000)
              .select("o_orderkey",
                      F.create_map(
                          F.lit("status"), F.col("o_orderstatus"),
                          F.lit("prio"), F.col("o_orderpriority"),
                      ).alias("props")))
    t = Table.create(spark, _scratch("maptype", sf_dir),
                     "o_orderkey bigint, props map<string,string>")
    t.insert(orders)

    df = t.read()
    # element_at + map_keys on the round-tripped column
    df = df.select(
        "o_orderkey",
        "props",
        F.size(F.map_keys(F.col("props"))).alias("n_keys"),
        F.element_at(F.col("props"), F.lit("status")).alias("status"),
    )
    entries = df.select(
        "o_orderkey", "n_keys", "status",
        F.explode(F.col("props")).alias("pk", "pv"))
    # n_elem_match forces element_at into the executed plan: for
    # pk='status' entries the looked-up value must equal the exploded
    # value (count == n_rows), and 0 for every other key.
    return (entries.groupBy("pk", "pv")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.min("o_orderkey").alias("min_key"),
                 F.max("n_keys").alias("n_keys"),
                 F.sum(F.when((F.col("pk") == "status")
                              & (F.col("pv") == F.col("status")), 1)
                       .otherwise(0)).alias("n_elem_match")))


@query("complex_nested_two_level", oracle="""
WITH src AS (
  SELECT o_custkey, o_orderstatus, o_orderkey, o_totalprice
  FROM orders WHERE o_orderkey < 3000
)
SELECT o_custkey,
       CAST(COUNT(*) AS BIGINT) AS n_statuses,
       CAST(SUM(n_orders) AS BIGINT) AS n_orders,
       CAST(MAX(max_price) AS DOUBLE) AS max_price
FROM (
  SELECT o_custkey, o_orderstatus,
         COUNT(*) AS n_orders,
         MAX(o_totalprice) AS max_price
  FROM src GROUP BY o_custkey, o_orderstatus)
GROUP BY o_custkey
""")
def complex_nested_two_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level nested types end-to-end (survey §1.2: ARRAY/STRUCT/MAP
    to depth 2, reference complexType suites): build a
    map<string, array<struct<okey,price>>> per customer (status →
    orders), round-trip it through a managed table, then unnest both
    levels back and aggregate. The oracle recomputes the same relation
    flat — the nested round-trip must be lossless at both depths."""
    orders = (spark.read.parquet(f"{sf_dir}/orders.parquet")
              .filter(F.col("o_orderkey") < 3000))
    per_status = (orders.groupBy("o_custkey", "o_orderstatus")
                  .agg(F.sort_array(F.collect_list(F.struct(
                      F.col("o_orderkey").alias("okey"),
                      F.col("o_totalprice").alias("price")))).alias("arr")))
    nested = (per_status.groupBy("o_custkey")
              .agg(F.map_from_entries(F.sort_array(F.collect_list(
                  F.struct("o_orderstatus", "arr")))).alias("by_status")))
    t = Table.create(
        spark, _scratch("nested2", sf_dir),
        "o_custkey bigint, "
        "by_status map<string,array<struct<okey:bigint,price:double>>>")
    t.insert(nested)

    df = t.read()
    lvl1 = df.select("o_custkey",
                     F.explode(F.col("by_status")).alias("status", "arr"))
    return (lvl1.select(
        "o_custkey",
        F.size("arr").cast("bigint").alias("n_orders"),
        F.aggregate(F.col("arr"), F.lit(float("-inf")),
                    lambda a, s: F.greatest(a, s["price"]))
        .alias("max_price"))
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_statuses"),
             F.sum("n_orders").cast("bigint").alias("n_orders"),
             F.max("max_price").cast("double").alias("max_price")))
