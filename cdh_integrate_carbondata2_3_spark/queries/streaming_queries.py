"""Streaming-ingest query — StreamSQL exercised inside the driver's
correctness gate.

Reference: CREATE STREAM → Structured Streaming micro-batches into a
streaming table, then handoff to columnar
(CarbonCreateStreamCommand.scala:82-247, StreamHandoffRDD.scala:99;
SURVEY.md §2.9). The stream here drains a CSV drop-folder derived
from ``documents``; after FINISH STREAMING + handoff the table holds
exactly the source rows, so a plain SQL oracle checks the whole
ingest → rollover → handoff → read pipeline value-exactly.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog.table import Table
from ..streaming.streams import StreamManager, finish_streaming, handoff
from . import query
from .lifecycle_queries import _scratch


@query("stream_ingest_handoff", oracle="""
SELECT lang, source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY lang, source
""")
def stream_ingest_handoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream → streaming segments → FINISH STREAMING →
    handoff to columnar → aggregate. The aggregate must equal a direct
    aggregate over the source rows (ingest is row-preserving)."""
    root = _scratch("stream", sf_dir)
    drop_dir = os.path.join(root, "drop")
    os.makedirs(drop_dir, exist_ok=True)
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "lang", "source", "n_chars"))
    docs.coalesce(2).write.mode("overwrite").option("header", True) \
        .csv(drop_dir)

    sink = Table.create(spark, os.path.join(root, "t"),
                        "doc_id bigint, lang string, source string, n_chars bigint",
                        {"streaming": "true"})
    mgr = StreamManager(spark)
    info = mgr.create_stream(
        "ingest", sink, source_kind="file", source_path=drop_dir,
        source_format="csv",
        source_schema="doc_id bigint, lang string, source string, n_chars bigint")
    try:
        info.query.processAllAvailable()
    finally:
        mgr.drop_stream("ingest")
    finish_streaming(sink)
    handoff(sink, include_open=True)
    shutil.rmtree(drop_dir, ignore_errors=True)
    return (sink.read().groupBy("lang", "source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_chars").alias("total_chars")))
