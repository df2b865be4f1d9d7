"""Metadata-only COUNT(*).

The reference answers ``SELECT count(*) FROM t`` on the driver from the
segment/index metadata without scanning data
(reference: integration/spark/.../sql/CarbonCountStar.scala:44-108, with
validity guards in DMLStrategy.scala:265-292 — not used when there are
update deltas / streaming segments).

Our analogue reads parquet footer row counts (O(files) metadata reads,
no column data). For manifest-managed tables (catalog.table) the counts
come straight from the manifest, which is O(1).
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession


def parquet_row_count(path: str) -> int:
    """Sum footer row counts for a parquet file or directory (no scan)."""
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
    else:
        files = [path]
    total = 0
    for f in files:
        total += pq.ParquetFile(f).metadata.num_rows
    return total


def count_star_dataframe(spark: SparkSession, path: str) -> DataFrame:
    """Driver-side count(*) fast path as a 1-row DataFrame.
    spark.range avoids the (surprisingly costly) createDataFrame
    local-relation path — the result is pure metadata either way."""
    from pyspark.sql import functions as F
    n = parquet_row_count(path)
    return spark.range(1).select(F.lit(n).cast("bigint").alias("count_rows"))
