"""Kafka/socket source CONTRACT tests — no broker in this sandbox, so
the connector itself can't run (documented limitation in README). What
we can and do verify end-to-end:

- the kafka/socket branch of StreamManager.create_stream configures the
  reader with exactly the caller's options (bootstrap servers,
  subscribe, ...) and the declared format;
- the payload then flows through parse_payload and the streaming sink
  into a managed table with the declared schema.

A recording fake stands in for ``spark.readStream``: it captures
format/options and hands back a real ``rate`` stream reshaped to
kafka's wire schema (key/value binary, topic, partition, offset,
timestamp, timestampType), so everything downstream of ``.load()`` is
the production code path.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from cdh_integrate_carbondata2_3_spark.catalog.table import Table
from cdh_integrate_carbondata2_3_spark.streaming.streams import (
    StreamManager, parse_payload)

KAFKA_SCHEMA_COLS = ["key", "value", "topic", "partition", "offset",
                     "timestamp", "timestampType"]


class _RecordingReader:
    def __init__(self, spark, real_reader_factory, recorded):
        self._spark = spark
        self._real = real_reader_factory
        self.rec = recorded

    def format(self, fmt):
        self.rec["format"] = fmt
        return self

    def option(self, k, v):
        self.rec.setdefault("options", {})[k] = v
        return self

    def schema(self, s):
        self.rec["schema"] = s
        return self

    def load(self, path=None):
        self.rec["loaded"] = True
        df = (self._real().format("rate")
              .option("rowsPerSecond", "100").load())
        payload = F.to_json(F.struct(
            F.col("value").alias("id"),
            F.concat(F.lit("name_"), F.col("value")).alias("name")))
        return df.select(
            F.lit(None).cast("binary").alias("key"),
            payload.cast("binary").alias("value"),
            F.lit("t0").alias("topic"),
            F.lit(0).alias("partition"),
            F.col("value").alias("offset"),
            F.col("timestamp"),
            F.lit(0).alias("timestampType"))


def _patch_readstream(monkeypatch, spark, recorded):
    cls = type(spark)
    real_prop = cls.readStream
    factory = lambda: real_prop.fget(spark)  # noqa: E731

    def fake(self):
        return _RecordingReader(self, factory, recorded)

    monkeypatch.setattr(cls, "readStream", property(fake))


def test_parse_payload_json_and_csv(spark):
    df = spark.createDataFrame(
        [('{"id": 7, "name": "x"}',), ('{"id": 8, "name": "y"}',)],
        "value string")
    got = {tuple(r) for r in
           parse_payload(df, "json", "id bigint, name string").collect()}
    assert got == {(7, "x"), (8, "y")}
    df = spark.createDataFrame([("7|x",), ("8|y",)], "value string")
    got = {tuple(r) for r in
           parse_payload(df, "csv", "id bigint, name string",
                         delimiter="|").collect()}
    assert got == {(7, "x"), (8, "y")}


def test_create_stream_kafka_options_and_sink(spark, tmp_path, monkeypatch):
    recorded: dict = {}
    _patch_readstream(monkeypatch, spark, recorded)
    sink = Table.create(spark, str(tmp_path / "sink"),
                        "id bigint, name string",
                        {"streaming": "true"})
    mgr = StreamManager(spark)
    info = mgr.create_stream(
        "k1", sink, source_kind="kafka",
        source_options={"kafka.bootstrap.servers": "broker1:9092,broker2:9092",
                        "subscribe": "events",
                        "startingOffsets": "earliest"},
        record_format="json", source_schema="id bigint, name string",
        checkpoint_dir=str(tmp_path / "ckpt"))
    try:
        assert recorded["format"] == "kafka"
        assert recorded["options"] == {
            "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
            "subscribe": "events",
            "startingOffsets": "earliest"}
        assert recorded["loaded"]
        deadline = time.time() + 30
        while time.time() < deadline:
            info.query.processAllAvailable()
            if sink.read().limit(1).count():
                break
            time.sleep(0.5)
    finally:
        mgr.drop_stream("k1")
    rows = sink.read().collect()
    assert rows, "no rows reached the sink"
    assert all(r["name"] == f"name_{r['id']}" for r in rows)


def test_cdc_kafka_source_options(spark, tmp_path, monkeypatch):
    from cdh_integrate_carbondata2_3_spark.streaming.cdc import CDCStreamer

    recorded: dict = {}
    _patch_readstream(monkeypatch, spark, recorded)
    target = Table.create(spark, str(tmp_path / "tgt"),
                          "id bigint, name string")
    streamer = CDCStreamer(spark, target, key="id")
    q = streamer.start_kafka_source(
        "b:9092", "cdc_topic", "id bigint, name string",
        checkpoint_dir=str(tmp_path / "ckpt2"))
    try:
        assert recorded["format"] == "kafka"
        assert recorded["options"]["kafka.bootstrap.servers"] == "b:9092"
        assert recorded["options"]["subscribe"] == "cdc_topic"
        assert q.isActive
    finally:
        streamer.stop()
