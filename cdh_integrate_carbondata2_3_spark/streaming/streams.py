"""StreamSQL: CREATE / DROP / SHOW STREAM + streaming segments + handoff.

Reference parity (SURVEY.md §2.9, §3.3):
- ``CREATE STREAM s ON TABLE t STMPROPERTIES(...) AS SELECT ...``
  starts a named Structured Streaming job from a source (file dir
  csv/json/parquet, kafka, socket; kafka payload parsed per
  ``record_format`` csv/json) into a streaming-capable table
  (reference: CarbonCreateStreamCommand.scala:82-247, parser
  CarbonSpark2SqlParser.scala:154-163, docs streaming-guide.md:287-470)
- micro-batches append to an open STREAMING segment, rolled over at
  ``max_segment_bytes`` (CarbonAppendableStreamSink.scala:117-186,
  carbon.streaming.segment.max.size)
- ALTER TABLE ... FINISH STREAMING closes the open segment
  (CarbonAlterTableFinishStreaming.scala)
- handoff rewrites finished streaming segments to sorted columnar
  SUCCESS segments (StreamHandoffRDD.scala:99+, auto-handoff)
- DROP STREAM / SHOW STREAMS (CarbonDropStreamCommand,
  CarbonShowStreamsCommand)

Spark-first: the sink is ``writeStream.foreachBatch`` committing each
micro-batch through the manifest (exactly-once per epoch via the
manifest's atomicity + Spark's epoch tracking); queries see STREAMING
segments and columnar segments transparently because both are parquet
under the same manifest — the reference needs a dual-format reader for
this (CarbonScanRDD.scala:486-497), we get it for free.
"""

from __future__ import annotations

import glob
import os
import shutil
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..catalog.manifest import Segment, SegmentStatus
from ..catalog.stats import harvest_file
from ..catalog.table import Table

DEFAULT_MAX_SEGMENT_BYTES = 1024 * 1024 * 1024      # reference default 1GB


# ---------------------------------------------------------------- sink side

def append_streaming_batch(table: Table, df: DataFrame,
                           max_segment_bytes: int = DEFAULT_MAX_SEGMENT_BYTES) -> None:
    """Append one micro-batch to the open STREAMING segment (creating
    it if needed); roll the segment over when it exceeds the max size."""
    tmp = os.path.join(table.table_dir, f"_tmp_{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(tmp)
    batch_files = [p for p in sorted(glob.glob(os.path.join(tmp, "*.parquet")))
                   if os.path.isfile(p)]

    def mutate(doc: dict) -> None:
        open_seg = None
        for s in doc["segments"]:
            if s["status"] == SegmentStatus.STREAMING:
                open_seg = s
                break
        if open_seg is None:
            seg_id = table.manifest.next_segment_id(doc)
            open_seg = Segment(id=seg_id, status=SegmentStatus.STREAMING,
                               format="parquet", files=[],
                               load_time=time.time(), source="stream").to_json()
            doc["segments"].append(open_seg)
            os.makedirs(os.path.join(table.table_dir, f"segment_{seg_id}"),
                        exist_ok=True)
        seg_id = open_seg["id"]
        for p in batch_files:
            dst_rel = os.path.join(f"segment_{seg_id}",
                                   f"batch-{uuid.uuid4().hex}.parquet")
            dst = os.path.join(table.table_dir, dst_rel)
            os.rename(p, dst)
            open_seg["files"].append(harvest_file(dst, dst_rel).to_json())
        seg_bytes = sum(f["bytes"] for f in open_seg["files"])
        if seg_bytes >= max_segment_bytes:
            open_seg["status"] = SegmentStatus.STREAMING_FINISH

    table.manifest.update(mutate)
    shutil.rmtree(tmp, ignore_errors=True)


def finish_streaming(table: Table) -> None:
    """ALTER TABLE ... FINISH STREAMING."""
    def mutate(doc: dict) -> None:
        for s in doc["segments"]:
            if s["status"] == SegmentStatus.STREAMING:
                s["status"] = SegmentStatus.STREAMING_FINISH
    table.manifest.update(mutate)


def handoff(table: Table, include_open: bool = False) -> list[int]:
    """Convert finished streaming segments to sorted columnar SUCCESS
    segments (reference StreamHandoffRDD). Returns new segment ids."""
    if include_open:
        finish_streaming(table)
    segs = table.manifest.segments({SegmentStatus.STREAMING_FINISH})
    new_ids: list[int] = []
    for seg in segs:
        if not seg.files:
            table.manifest.update(lambda doc, sid=seg.id: [
                s.update({"status": SegmentStatus.MARKED_FOR_DELETE})
                for s in doc["segments"] if s["id"] == sid])
            continue
        files = [table._abs(f.path) for f in seg.files]
        df = table.spark.read.parquet(*files)
        sort_cols = table.manifest.properties().get("sort_columns", [])
        if sort_cols:
            df = df.sortWithinPartitions(*sort_cols)
        new_id = table.insert(df, source="handoff")
        table.manifest.update(lambda doc, sid=seg.id: [
            s.update({"status": SegmentStatus.COMPACTED})
            for s in doc["segments"] if s["id"] == sid])
        new_ids.append(new_id)
    return new_ids


# ------------------------------------------------------------- source side

def parse_payload(df: DataFrame, record_format: str, schema: str,
                  delimiter: str = ",") -> DataFrame:
    """Parse a kafka-style ``value`` column per record_format
    (reference CarbonCreateStreamCommand.scala:161-178: csv via split
    UDF, json via from_json — ours: from_csv / from_json, JVM-side)."""
    if record_format == "json":
        parsed = df.select(F.from_json(F.col("value").cast("string"), schema).alias("r"))
    elif record_format == "csv":
        parsed = df.select(F.from_csv(F.col("value").cast("string"), schema,
                                      {"delimiter": delimiter}).alias("r"))
    else:
        raise ValueError(f"unsupported record_format {record_format}")
    return parsed.select("r.*")


@dataclass
class StreamInfo:
    name: str
    source_kind: str
    sink_table_dir: str
    query: StreamingQuery

    @property
    def status(self) -> str:
        return "RUNNING" if self.query.isActive else "STOPPED"


class StreamManager:
    """Named-stream registry (reference keeps them in a per-session map
    keyed by stream name; ours wraps StreamingQueryManager)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._streams: dict[str, StreamInfo] = {}

    def create_stream(self, name: str, sink: Table, *,
                      source_kind: str = "file",
                      source_path: str | None = None,
                      source_format: str = "csv",
                      source_schema: str | None = None,
                      source_options: dict | None = None,
                      record_format: str | None = None,
                      transform=None,
                      trigger_interval: str | None = None,
                      max_segment_bytes: int = DEFAULT_MAX_SEGMENT_BYTES,
                      checkpoint_dir: str | None = None) -> StreamInfo:
        """CREATE STREAM name ON TABLE sink AS SELECT <transform> FROM source."""
        if name in self._streams and self._streams[name].query.isActive:
            raise ValueError(f"stream {name} already running")
        if not sink.manifest.properties().get("streaming"):
            raise ValueError(
                "sink table must have 'streaming'='true' property "
                "(reference requires a streaming table)")

        if source_kind == "file":
            if source_path is None or source_schema is None:
                raise ValueError("file source needs source_path + source_schema")
            reader = (self.spark.readStream.format(source_format)
                      .schema(source_schema))
            for k, v in (source_options or {}).items():
                reader = reader.option(k, v)
            if source_format == "csv":
                reader = reader.option("header", True)
            src = reader.load(source_path)
        elif source_kind == "table":
            # managed-table source: tail the manifest via the "carbon"
            # datasource — a committed segment is exactly one batch, so
            # the stream never reads half-written files (reference:
            # streaming source TABLE, CarbonCreateStreamCommand.scala:
            # 82-120 resolves the source table's format/location)
            if source_path is None:
                raise ValueError("table source needs source_path (table dir)")
            from ..sources.carbon_datasource import register
            register(self.spark)
            src = self.spark.readStream.format("carbon").load(source_path)
        elif source_kind == "kafka":
            reader = self.spark.readStream.format("kafka")
            for k, v in (source_options or {}).items():
                reader = reader.option(k, v)
            src = reader.load()
            if record_format:
                src = parse_payload(src, record_format, source_schema)
        elif source_kind == "socket":
            reader = self.spark.readStream.format("socket")
            for k, v in (source_options or {}).items():
                reader = reader.option(k, v)
            src = reader.load()
            if record_format:
                src = parse_payload(
                    src.select(F.col("value")), record_format, source_schema)
        else:
            raise ValueError(f"unsupported source kind {source_kind}")

        if transform is not None:
            src = transform(src)

        def sink_batch(batch_df: DataFrame, epoch_id: int) -> None:
            append_streaming_batch(sink, batch_df, max_segment_bytes)

        writer = (src.writeStream
                  .foreachBatch(sink_batch)
                  .option("checkpointLocation",
                          checkpoint_dir or os.path.join(
                              sink.table_dir, "_meta", "checkpoints", name)))
        if trigger_interval:
            writer = writer.trigger(processingTime=trigger_interval)
        q = writer.start()
        info = StreamInfo(name, source_kind, sink.table_dir, q)
        self._streams[name] = info
        return info

    def drop_stream(self, name: str) -> None:
        """DROP STREAM — stop and deregister."""
        info = self._streams.pop(name, None)
        if info and info.query.isActive:
            info.query.stop()

    def show_streams(self) -> list[dict]:
        return [{"name": s.name, "source": s.source_kind,
                 "sink": s.sink_table_dir, "status": s.status}
                for s in self._streams.values()]

    def stop_all(self) -> None:
        for name in list(self._streams):
            self.drop_stream(name)
