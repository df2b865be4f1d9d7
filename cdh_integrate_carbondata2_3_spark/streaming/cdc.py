"""CDC streamer — the engine's CarbonDataStreamer tool.

Reference: streamer (CarbonDataStreamer.scala:60-63, Source.scala,
AvroKafkaSource.scala; docs scd-and-cdc-guide.md:136-210): a
long-running job that reads a change stream (Kafka / DFS drop folder)
and periodically MERGEs it into a target table.

Ours is ``readStream`` → ``foreachBatch`` over the copy-on-write MERGE
layer: each micro-batch is deduplicated to the latest change per key
(by an ordering column, e.g. the CDC timestamp), then split into
upserts and deletes and applied as keyed merges. Kafka needs only a
different reader (same ``foreachBatch``); the file source is what the
container can exercise.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog.table import Table
from ..operators import merge as merge_ops

UPSERT_OPS = ("insert", "update", "u", "i", "c")      # c = debezium create
DELETE_OPS = ("delete", "d")


def apply_cdc_batch(target: Table, batch: DataFrame, key: str,
                    ops_col: str = "op_type",
                    order_col: str | None = None) -> None:
    """Apply one micro-batch of change records: keep the latest change
    per key, then keyed UPSERT the inserts/updates and keyed DELETE the
    deletes (reference applies the same op split per trigger)."""
    if order_col:
        w = W.partitionBy(key).orderBy(F.desc(order_col))
        batch = (batch.withColumn("_rn", F.row_number().over(w))
                 .filter(F.col("_rn") == 1).drop("_rn"))
    else:
        batch = batch.dropDuplicates([key])
    # four actions read the deduped batch (two existence probes + up to
    # two merges, and the merges scan it more than once for key-range
    # pruning); cache it for the apply so the dedup window — and
    # whatever source feeds the micro-batch — runs once, not per action
    batch = batch.cache()
    try:
        op = F.lower(F.col(ops_col))
        payload_cols = [c for c in batch.columns
                        if c not in (ops_col, order_col)]
        ups = batch.filter(op.isin(*UPSERT_OPS)).select(*payload_cols)
        dels = batch.filter(op.isin(*DELETE_OPS)).select(*payload_cols)
        if ups.limit(1).count():
            merge_ops.upsert(target, ups, key)
        if dels.limit(1).count():
            merge_ops.delete(target, dels, key)
    finally:
        batch.unpersist()


class CDCStreamer:
    """Long-running CDC apply job (file or kafka source)."""

    def __init__(self, spark: SparkSession, target: Table, key: str,
                 ops_col: str = "op_type", order_col: str | None = None):
        self.spark = spark
        self.target = target
        self.key = key
        self.ops_col = ops_col
        self.order_col = order_col
        self.query = None

    def start_file_source(self, path: str, schema: str,
                          source_format: str = "json",
                          trigger_interval: str | None = None,
                          checkpoint_dir: str | None = None):
        """DFS drop-folder source (reference's DFS Avro source; ours
        reads json/csv/parquet — avro needs spark-avro, not shipped)."""
        reader = self.spark.readStream.format(source_format).schema(schema)
        if source_format == "csv":
            reader = reader.option("header", True)
        return self._start(reader.load(path), trigger_interval, checkpoint_dir)

    def start_kafka_source(self, bootstrap_servers: str, topic: str,
                           schema: str, record_format: str = "json",
                           trigger_interval: str | None = None,
                           checkpoint_dir: str | None = None):
        """Kafka source (reference AvroKafkaSource) — requires the
        kafka connector jar on the cluster."""
        from .streams import parse_payload
        src = (self.spark.readStream.format("kafka")
               .option("kafka.bootstrap.servers", bootstrap_servers)
               .option("subscribe", topic).load())
        return self._start(parse_payload(src, record_format, schema),
                           trigger_interval, checkpoint_dir)

    def _start(self, src: DataFrame, trigger_interval: str | None,
               checkpoint_dir: str | None):
        def batch_fn(batch_df: DataFrame, epoch_id: int) -> None:
            if batch_df.limit(1).count():
                apply_cdc_batch(self.target, batch_df, self.key,
                                self.ops_col, self.order_col)

        writer = (src.writeStream.foreachBatch(batch_fn)
                  .option("checkpointLocation",
                          checkpoint_dir or os.path.join(
                              self.target.table_dir, "_meta",
                              "checkpoints", "_cdc")))
        if trigger_interval:
            writer = writer.trigger(processingTime=trigger_interval)
        self.query = writer.start()
        return self.query

    def stop(self) -> None:
        if self.query and self.query.isActive:
            self.query.stop()
