"""Test-data table registry.

The driver supplies TPC-H-ish parquet tables (TESTDATA.md). At cluster
scale these would be catalog tables backed by the segment manifest
(``catalog.table``); for the correctness gate we read the parquet
directly so Catalyst gets full pushdown/pruning on the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Tables whose parquet uses TIMESTAMP(NANOS) — Spark's vectorized parquet
# reader rejects nanos (PARQUET_TYPE_ILLEGAL). Scale path: read the ns
# column as a raw long (nanosAsLong), floor to micros with INTEGRAL
# arithmetic, and rebuild a TIMESTAMP_NTZ from date/time components —
# fully distributed, session-timezone independent, and byte-identical
# to DuckDB's own ns→us truncation of the same files.
_NANOS_TS_TABLES = {"events"}

_EPOCH_DAY_US = 86_400_000_000


def _ns_long_to_ntz(col: str):
    from pyspark.sql import functions as F
    import datetime
    us = F.expr(f"`{col}` div 1000")
    days = us - (us % _EPOCH_DAY_US)
    date = F.date_add(F.lit(datetime.date(1970, 1, 1)),
                      (F.expr(f"(`{col}` div 1000) div {_EPOCH_DAY_US}")).cast("int"))
    rem = us % _EPOCH_DAY_US
    h = (rem - rem % 3_600_000_000) / 3_600_000_000
    m = (rem % 3_600_000_000 - rem % 60_000_000) / 60_000_000
    # double seconds from integral micros: error ≪ 0.5µs, so
    # make_timestamp_ntz recovers the exact truncated microsecond
    s = (rem % 60_000_000).cast("double") / 1e6
    return F.make_timestamp_ntz(F.year(date), F.month(date), F.dayofmonth(date),
                                h.cast("int"), m.cast("int"), s)


def _load_nanos_table(spark: SparkSession, path: str) -> DataFrame:
    import pyarrow as pa
    import pyarrow.parquet as pq

    # Only TIMESTAMP(NANOS) needs the long-rebuild path; micro/milli
    # timestamps are natively supported by the vectorized reader, and
    # applying the rebuild to them would be both wrong and a plan error
    # (`ts div 1000` on a TIMESTAMP_NTZ operand).
    schema_src = path
    if os.path.isdir(path):                # Spark-written dir-parquet
        parts = sorted(f for f in os.listdir(path) if f.endswith(".parquet"))
        if not parts:
            return spark.read.parquet(path)
        schema_src = os.path.join(path, parts[0])
    ns_cols = [f.name for f in pq.read_schema(schema_src)
               if pa.types.is_timestamp(f.type) and f.type.unit == "ns"]
    if not ns_cols:
        return spark.read.parquet(path)
    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        df = spark.read.parquet(path)      # schema resolved eagerly here
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        else:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
    for c in ns_cols:
        if dict(df.dtypes).get(c) == "bigint":   # conf honored → raw ns longs
            df = df.withColumn(c, _ns_long_to_ntz(c))
    return df


# plan cache: DataFrames are immutable logical plans, so reusing one
# skips the per-call parquet footer/schema inference (the same effect a
# registered temp view gets); keyed by session so a new session never
# sees another session's plan. The cached tuple holds the session
# object itself: the identity check makes an id()-reuse collision
# impossible (the strong ref pins the address while the entry lives).
_PLAN_CACHE: dict[tuple, tuple[SparkSession, DataFrame]] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TPCH_TABLES:
        raise KeyError(f"unknown table {name!r}")
    key = (id(spark), sf_dir, name)
    hit = _PLAN_CACHE.get(key)
    if hit is not None and hit[0] is spark:
        return hit[1]
    path = f"{sf_dir}/{name}.parquet"
    df = (_load_nanos_table(spark, path) if name in _NANOS_TS_TABLES
          else spark.read.parquet(path))
    _PLAN_CACHE[key] = (spark, df)
    return df


def register_views(spark: SparkSession, sf_dir: str,
                   tables: tuple[str, ...] = TPCH_TABLES) -> None:
    """Register the test tables as temp views for the SQL surface."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
