"""Streaming sink crash recovery: a micro-batch that dies mid-commit
must never surface half a batch — the manifest's tmp+os.replace swap
is the ONLY commit point, file renames before it are invisible
orphans, and Spark's checkpoint redelivers the epoch on restart so
the retried batch lands exactly once.

Reference analogue: the HDFS-truncate recovery path in
CarbonAppendableStreamSink.scala:224-293 (recoverFileIfRequired +
per-batch commit via the streaming segment's status file); ours gets
the same guarantee from the manifest swap (catalog/manifest.py:419)
plus foreachBatch epoch tracking."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cdh_integrate_carbondata2_3_spark.catalog import Table
from cdh_integrate_carbondata2_3_spark.catalog.manifest import SegmentStatus
from cdh_integrate_carbondata2_3_spark.streaming import (
    StreamManager, append_streaming_batch, streams as S)


@pytest.fixture()
def sink(spark, tmp_path):
    return Table.create(spark, str(tmp_path / "sink"),
                        "id bigint, v double",
                        {"streaming": True, "sort_columns": ["id"]})


class _Boom(RuntimeError):
    pass


def _rename_bomb(monkeypatch, after: int):
    """Patch the os.rename streams.py uses so the (after+1)-th move of
    a batch file into a segment dir raises — a crash strictly inside
    the manifest mutator, after real side effects, before the swap."""
    real = os.rename
    state = {"n": 0}

    def flaky(src, dst, **kw):
        if "segment_" in str(dst) and "batch-" in str(dst):
            if state["n"] >= after:
                raise _Boom("injected crash mid-rename")
            state["n"] += 1
        return real(src, dst, **kw)

    monkeypatch.setattr(S.os, "rename", flaky)
    return state


def test_crash_mid_batch_never_enters_manifest(spark, sink, monkeypatch):
    """Die after 2 of 4 batch files are renamed into the segment dir:
    the manifest must not advance, reads must see zero rows, and the
    retried batch must land exactly once (orphans stay invisible)."""
    df = spark.range(100).select("id", (F.col("id") * 0.5).alias("v")) \
        .repartition(4)
    v0 = sink.manifest.load()["version"]
    with pytest.raises(_Boom):
        _rename_bomb(monkeypatch, after=2)
        append_streaming_batch(sink, df)
    monkeypatch.undo()

    # commit point never reached: same manifest version, no segments
    assert sink.manifest.load()["version"] == v0
    assert sink.manifest.segments() == []
    assert sink.read().count() == 0
    # ...even though orphan files physically exist in the table dir
    orphans = [f for d, _, fs in os.walk(sink.table_dir)
               for f in fs if f.startswith("batch-")]
    assert orphans, "crash was injected after real renames"

    # epoch retry (what foreachBatch does on restart): exactly once
    append_streaming_batch(sink, df)
    assert sink.read().count() == 100
    assert sink.read().select("id").distinct().count() == 100


def test_crash_into_open_segment_keeps_prior_batches(spark, sink,
                                                     monkeypatch):
    """Second micro-batch dies mid-rename INTO the already-open
    STREAMING segment: batch 1 stays fully readable, batch 2 is
    all-or-nothing absent, and its retry appends without duplicating
    batch 1."""
    b1 = spark.range(0, 50).select("id", F.lit(1.0).alias("v"))
    b2 = (spark.range(50, 90).select("id", F.lit(2.0).alias("v"))
          .repartition(4))
    append_streaming_batch(sink, b1)
    files_before = sum(len(s.files) for s in sink.manifest.segments())
    with pytest.raises(_Boom):
        _rename_bomb(monkeypatch, after=1)
        append_streaming_batch(sink, b2)
    monkeypatch.undo()

    assert sink.read().count() == 50            # batch 1 intact
    assert sum(len(s.files) for s in sink.manifest.segments()) \
        == files_before                         # no partial files listed
    append_streaming_batch(sink, b2)            # redelivery
    assert sink.read().count() == 90
    assert sink.read().filter("v = 2.0").count() == 40


def test_stream_restart_redelivers_failed_epoch(spark, sink, tmp_path):
    """End-to-end: a running stream whose sink commit crashes
    mid-micro-batch fails the query; restarting the SAME stream (same
    checkpoint) redelivers the epoch and the table converges to
    exactly the source rows — no loss, no duplicates, no partials."""
    src_dir = str(tmp_path / "incoming")
    (spark.range(100).select("id", (F.col("id") * 0.5).alias("v"))
     .coalesce(1).write.mode("append").option("header", True).csv(src_dir))

    real_append = S.append_streaming_batch
    state = {"fail": True}

    def crashy(table, df, max_segment_bytes=S.DEFAULT_MAX_SEGMENT_BYTES):
        if state["fail"]:
            state["fail"] = False
            # real partial side effect, then die before the swap
            tmp = os.path.join(table.table_dir, "segment_0")
            os.makedirs(tmp, exist_ok=True)
            with open(os.path.join(tmp, "batch-orphan.parquet"), "wb") as fh:
                fh.write(b"\x00partial")
            raise _Boom("injected crash mid-micro-batch")
        return real_append(table, df, max_segment_bytes)

    S.append_streaming_batch = crashy
    mgr = StreamManager(spark)
    try:
        info = mgr.create_stream("cr", sink, source_path=src_dir,
                                 source_format="csv",
                                 source_schema="id bigint, v double")
        with pytest.raises(Exception):
            info.query.processAllAvailable()
        mgr.drop_stream("cr")
        # half-written micro-batch never entered the manifest
        assert sink.manifest.segments() == []
        assert sink.read().count() == 0

        # restart from the same checkpoint → epoch redelivered once
        info = mgr.create_stream("cr", sink, source_path=src_dir,
                                 source_format="csv",
                                 source_schema="id bigint, v double")
        info.query.processAllAvailable()
    finally:
        S.append_streaming_batch = real_append
        mgr.stop_all()
    assert sink.read().count() == 100
    assert sink.read().select("id").distinct().count() == 100
    assert {s.status for s in sink.manifest.segments()} \
        == {SegmentStatus.STREAMING}
