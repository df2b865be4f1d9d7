"""StreamSQL tests — mirrors the reference's TestStreamingTableOpName
suite shape: file-source ingest, streaming-segment commit, handoff
equivalence, FINISH STREAMING, IUD-blocked-on-streaming, plus the
built-in watermark/window surface (SURVEY.md §2.9)."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from cdh_integrate_carbondata2_3_spark.catalog import Table
from cdh_integrate_carbondata2_3_spark.catalog.manifest import SegmentStatus
from cdh_integrate_carbondata2_3_spark.operators import dml
from cdh_integrate_carbondata2_3_spark.streaming import (
    StreamManager, append_streaming_batch, finish_streaming, handoff,
    streams as S)


@pytest.fixture()
def sink(spark, tmp_path):
    return Table.create(spark, str(tmp_path / "sink"),
                        "id bigint, v double",
                        {"streaming": True, "sort_columns": ["id"]})


def _write_csv(spark, path, lo, hi):
    (spark.range(lo, hi).select("id", (F.col("id") * 0.5).alias("v"))
     .coalesce(1).write.mode("append").option("header", True).csv(path))


def test_file_stream_ingest_and_handoff(spark, sink, tmp_path):
    src_dir = str(tmp_path / "incoming")
    _write_csv(spark, src_dir, 0, 100)
    mgr = StreamManager(spark)
    info = mgr.create_stream("s1", sink, source_path=src_dir,
                             source_format="csv",
                             source_schema="id bigint, v double")
    try:
        info.query.processAllAvailable()
        assert sink.read().count() == 100
        statuses = {s.status for s in sink.manifest.segments()}
        assert SegmentStatus.STREAMING in statuses
        # more files arrive → same open segment grows
        _write_csv(spark, src_dir, 100, 150)
        info.query.processAllAvailable()
        assert sink.read().count() == 150
        assert mgr.show_streams()[0]["status"] == "RUNNING"
    finally:
        mgr.drop_stream("s1")
    assert mgr.show_streams() == []

    # handoff: rows identical pre/post, streaming segment becomes columnar
    before = {(r["id"], r["v"]) for r in sink.read().collect()}
    new_ids = handoff(sink, include_open=True)
    assert new_ids
    after = {(r["id"], r["v"]) for r in sink.read().collect()}
    assert before == after
    statuses = {s.id: s.status for s in sink.manifest.segments()}
    assert statuses[new_ids[0]] == SegmentStatus.SUCCESS
    assert SegmentStatus.STREAMING not in set(statuses.values())


def test_segment_rollover_at_max_size(spark, sink):
    for lo in range(0, 300, 100):
        df = spark.range(lo, lo + 100).select("id", (F.col("id") * 1.0).alias("v"))
        append_streaming_batch(sink, df, max_segment_bytes=1)   # force roll
    segs = sink.manifest.segments()
    finished = [s for s in segs if s.status == SegmentStatus.STREAMING_FINISH]
    assert len(finished) == 3                     # each batch rolled over
    assert sink.read().count() == 300             # all still queryable


def test_finish_streaming_and_iud_block(spark, sink):
    append_streaming_batch(sink, spark.range(5).select(
        "id", F.lit(1.0).alias("v")))
    with pytest.raises(ValueError, match="streaming"):
        dml.delete_rows(sink, "id = 1")
    finish_streaming(sink)
    assert not sink.manifest.segments({SegmentStatus.STREAMING})
    assert sink.manifest.segments({SegmentStatus.STREAMING_FINISH})


def test_record_format_parsing(spark):
    df = spark.createDataFrame([('{"id": 1, "v": 2.5}',)], "value string")
    out = S.parse_payload(df, "json", "id bigint, v double").collect()
    assert (out[0]["id"], out[0]["v"]) == (1, 2.5)
    df2 = spark.createDataFrame([("7,3.5",)], "value string")
    out2 = S.parse_payload(df2, "csv", "id bigint, v double").collect()
    assert (out2[0]["id"], out2[0]["v"]) == (7, 3.5)


def test_watermark_window_surface(spark, tmp_path):
    """The engine exposes Spark's stateful streaming ops (the reference
    has none of its own — SURVEY.md §2.9 'not present in reference')."""
    src = str(tmp_path / "ev")
    (spark.createDataFrame(
        [(1, "2024-01-01 00:00:30", 1.0), (2, "2024-01-01 00:01:10", 2.0),
         (3, "2024-01-01 00:01:50", 3.0), (4, "2024-01-01 00:07:00", 4.0)],
        "id bigint, ts string, v double")
     .select("id", F.col("ts").cast("timestamp").alias("ts"), "v")
     .coalesce(1).write.parquet(src))
    stream = (spark.readStream.schema("id bigint, ts timestamp, v double")
              .parquet(src)
              .withWatermark("ts", "10 minutes")
              .groupBy(F.window("ts", "1 minute").alias("w"))
              .agg(F.sum("v").alias("sv")))
    qname = f"agg_{int(time.time())}"
    q = (stream.writeStream.outputMode("complete")
         .format("memory").queryName(qname).start())
    try:
        q.processAllAvailable()
        rows = spark.sql(f"SELECT sv FROM {qname}").collect()
        assert sorted(r["sv"] for r in rows) == [1.0, 4.0, 5.0]
    finally:
        q.stop()


def test_table_source_stream_tails_manifest(spark, sink, tmp_path):
    """CREATE STREAM with a managed-table source: each committed
    segment of the source arrives as one micro-batch in the sink."""
    src = Table.create(spark, str(tmp_path / "srctab"), "id bigint, v double")
    src.insert(spark.range(0, 50).selectExpr("id", "id * 0.5 AS v"))
    mgr = StreamManager(spark)
    info = mgr.create_stream("t1", sink, source_kind="table",
                             source_path=src.table_dir)
    try:
        info.query.processAllAvailable()
        assert sink.read().count() == 50
        src.insert(spark.range(50, 80).selectExpr("id", "id * 0.5 AS v"))
        info.query.processAllAvailable()
        assert sink.read().count() == 80
    finally:
        mgr.drop_stream("t1")


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Streaming dedup: dropDuplicatesWithinWatermark composed through
    the CREATE STREAM transform hook — duplicate keys across
    micro-batches reach the sink exactly once."""
    import json as _json
    import time as _time

    from pyspark.sql import functions as F
    from cdh_integrate_carbondata2_3_spark.catalog.table import Table
    from cdh_integrate_carbondata2_3_spark.streaming.streams import StreamManager

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    sink = Table.create(spark, str(tmp_path / "sink"),
                        "id bigint, ts timestamp, v string",
                        {"streaming": "true"})
    mgr = StreamManager(spark)
    info = mgr.create_stream(
        "dedup_s", sink, source_kind="file", source_path=str(src_dir),
        source_format="json", source_schema="id bigint, ts timestamp, v string",
        transform=lambda df: (df.withWatermark("ts", "10 minutes")
                              .dropDuplicatesWithinWatermark(["id"])),
        checkpoint_dir=str(tmp_path / "ckpt"))
    try:
        # two files, overlapping ids — batch 2 repeats every batch-1 id
        rows1 = [{"id": i, "ts": "2026-01-01T00:00:00", "v": f"a{i}"}
                 for i in range(5)]
        rows2 = [{"id": i, "ts": "2026-01-01T00:00:30", "v": f"b{i}"}
                 for i in range(3, 8)]
        for n, rows in (("f1.json", rows1), ("f2.json", rows2)):
            with open(src_dir / n, "w") as f:
                f.write("\n".join(_json.dumps(r) for r in rows))
            deadline = _time.time() + 60
            while _time.time() < deadline:
                info.query.processAllAvailable()
                if sink.read().count() > 0 and n == "f1.json":
                    break
                if n == "f2.json":
                    break
                _time.sleep(0.5)
    finally:
        mgr.drop_stream("dedup_s")
    got = sink.read().groupBy("id").count().collect()
    assert {r["id"] for r in got} == set(range(8))
    assert all(r["count"] == 1 for r in got), "duplicate id reached sink"
