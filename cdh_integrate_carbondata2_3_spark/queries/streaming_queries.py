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


@query("stream_mv_staleness", oracle="""
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY lang
""")
def stream_mv_staleness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest × materialized views — the reference's
    flagship combination (docs/usecases.md:211-228): a streaming
    commit must mark dependent MVs STALE, and incremental refresh
    must ride streaming-then-handoff segments exactly like batch
    loads. The fn ingests HALF the documents, creates+refreshes an
    MV, ingests the rest (second streaming commit), asserts the MV
    reports stale, refreshes incrementally, asserts fresh, and
    answers the aggregate THROUGH the MV rewrite path (asserted).
    The oracle is the full-corpus aggregate — a green hash proves
    the refreshed MV saw both streaming commits, row-exactly."""
    from ..mv.manager import AggSpec, MVManager, QuerySpec
    root = _scratch("streammv", sf_dir)
    drop_dir = os.path.join(root, "drop")
    shutil.rmtree(drop_dir, ignore_errors=True)
    os.makedirs(drop_dir, exist_ok=True)
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "lang", "n_chars"))
    sink = Table.create(spark, os.path.join(root, "t"),
                        "doc_id bigint, lang string, n_chars bigint",
                        {"streaming": "true"})
    mgr = StreamManager(spark)
    schema = "doc_id bigint, lang string, n_chars bigint"

    def ingest(batch_df, sub):
        d = os.path.join(drop_dir, sub)
        os.makedirs(d, exist_ok=True)
        batch_df.coalesce(1).write.mode("overwrite") \
            .option("header", True).csv(d)
        info = mgr.create_stream(
            f"mvstream_{sub}", sink, source_kind="file", source_path=d,
            source_format="csv", source_schema=schema)
        try:
            info.query.processAllAvailable()
        finally:
            mgr.drop_stream(f"mvstream_{sub}")
        finish_streaming(sink)
        handoff(sink, include_open=True)

    ingest(docs.filter(F.col("doc_id") % 2 == 0), "b1")
    mvm = MVManager(sink)
    mvm.create("mv_lang", ["lang"],
               [AggSpec("sum", "n_chars"), AggSpec("count", "*")])
    assert not mvm.show()[0]["stale"], "MV stale right after create"
    ingest(docs.filter(F.col("doc_id") % 2 == 1), "b2")
    st = mvm.show()[0]
    assert st["stale"], (
        "streaming commit did not mark the dependent MV stale")
    mvm.refresh("mv_lang", incremental=True)
    assert not mvm.show()[0]["stale"], "MV still stale after refresh"
    df, mv_used = mvm.answer(QuerySpec(
        ["lang"], {"total_chars": AggSpec("sum", "n_chars"),
                   "n_docs": AggSpec("count", "*")}))
    assert mv_used == "mv_lang", "aggregate not answered from the MV"
    shutil.rmtree(drop_dir, ignore_errors=True)
    return df.select("lang", "n_docs",
                     F.col("total_chars").cast("bigint")
                     .alias("total_chars"))
