"""Test-data table registry.

The driver supplies TPC-H-ish parquet tables (TESTDATA.md). At cluster
scale these would be catalog tables backed by the segment manifest
(``catalog.table``); for the correctness gate we read the parquet
directly so Catalyst gets full pushdown/pruning on the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Tables whose parquet uses TIMESTAMP(NANOS) — Spark's vectorized parquet
# reader rejects nanos (PARQUET_TYPE_ILLEGAL), so these go through an
# Arrow-side cast to microseconds. On a real cluster this is a one-time
# ingest normalization; here it's done at load (tables are small).
_NANOS_TS_TABLES = {"events"}


def _load_nanos_table(spark: SparkSession, path: str) -> DataFrame:
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import types as T

    tbl = pq.read_table(path)
    # Floor nanos to micros — same truncation DuckDB applies when it
    # reads TIMESTAMP(NANOS) parquet, keeping engine and oracle aligned.
    import pyarrow.compute as pc
    cols, fields = [], []
    for i, f in enumerate(tbl.schema):
        col = tbl.column(i)
        if pa.types.is_timestamp(f.type):
            col = pc.cast(pc.floor_temporal(col, unit="microsecond"),
                          pa.timestamp("us"))
            f = pa.field(f.name, pa.timestamp("us"))
        cols.append(col)
        fields.append(f)
    tbl = pa.table(cols, schema=pa.schema(fields))
    _ARROW_TO_SPARK = {
        "int64": T.LongType(), "int32": T.IntegerType(),
        "double": T.DoubleType(), "float": T.FloatType(),
        "string": T.StringType(), "large_string": T.StringType(),
    }
    spark_fields = []
    for f in tbl.schema:
        if pa.types.is_timestamp(f.type):
            spark_fields.append(T.StructField(f.name, T.TimestampNTZType()))
        else:
            spark_fields.append(T.StructField(f.name, _ARROW_TO_SPARK[str(f.type)]))
    return spark.createDataFrame(tbl.to_pandas(), schema=T.StructType(spark_fields))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TPCH_TABLES:
        raise KeyError(f"unknown table {name!r}")
    path = f"{sf_dir}/{name}.parquet"
    if name in _NANOS_TS_TABLES:
        return _load_nanos_table(spark, path)
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str,
                   tables: tuple[str, ...] = TPCH_TABLES) -> None:
    """Register the test tables as temp views for the SQL surface."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
