"""``spark.read.format("carbon")`` — a Python DataSource over managed
tables.

The reference integrates with Spark as a datasource
(``USING carbondata``; CarbonDataSourceScan / CarbonScanRDD:115-265
does driver-side index pruning before scheduling splits). This module
exposes the same contract through PySpark 4's Python DataSource API:

- ``schema()`` comes from the table manifest;
- ``pushFilters`` receives Catalyst's pushable conjuncts and maps them
  onto the engine's manifest min/max + partition pruning, so the
  driver never schedules a task for a skippable file — the reference's
  ``getPrunedBlocklets`` step behind a standard Spark API. Every
  filter is returned as "unsupported" so Spark still evaluates it
  exactly (pruning only has to be sound, same contract as the engine's
  native path);
- one :class:`InputPartition` per surviving file; executors read
  Arrow record batches via pyarrow, aligned to the current schema
  (evolution: missing columns are filled with their era default or
  null).

NOTE on the fast path: the engine's primary scan
(``Table.read`` → ``spark.read.parquet(pruned files)``) uses Spark's
JVM vectorized parquet reader and should stay the default at scale —
this datasource is the API-compat surface (plain ``spark.read`` users,
no Engine object needed) and reads through Python workers.

Options: ``path`` (table dir), ``segments`` ("0,2,5" scope),
``as_of`` (manifest version time travel).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import StructType

from ..catalog.manifest import Manifest
from ..plans.pruning import Predicate, prune_files

_OPS = {EqualTo: "=", GreaterThan: ">", GreaterThanOrEqual: ">=",
        LessThan: "<", LessThanOrEqual: "<=", In: "in"}


class _FilePartition(InputPartition):
    def __init__(self, path: str, fmt: str, seg_id: int,
                 del_pos=None):
        self.path = path
        self.fmt = fmt
        self.seg_id = seg_id
        # this file's merge-on-read deleted positions (ascending
        # int64, catalog/deltas.py) — sliced per partition on the
        # driver so each task ships only its own file's mask
        self.del_pos = del_pos


class _CarbonReaderBase(DataSourceReader):
    """Scan logic WITHOUT ``pushFilters`` — Spark refuses to initialize
    a Python reader that overrides ``pushFilters`` when
    ``spark.sql.python.filterPushdown.enabled`` is false (the default
    on a plain session), so this base class is also the fallback
    reader: same results, no manifest pruning (Spark evaluates every
    filter exactly either way)."""

    def __init__(self, options: dict, schema: StructType):
        self._table_dir = options["path"]
        self._segments = ([int(x) for x in str(options["segments"]).split(",")]
                          if options.get("segments") else None)
        self._as_of = (int(options["as_of"])
                       if options.get("as_of") is not None else None)
        self._schema = schema
        self._predicates: list[Predicate] = []
        doc = Manifest(self._table_dir).load(self._as_of)
        self._defaults: dict = doc.get("column_defaults", {})
        self._renames: list = doc.get("column_renames", [])

    def partitions(self) -> list[_FilePartition]:
        import os

        from ..catalog.deltas import delete_positions
        m = Manifest(self._table_dir)
        dd = delete_positions(self._table_dir, m.load(self._as_of))
        parts: list[_FilePartition] = []
        for seg in m.queryable_segments(self._segments, version=self._as_of):
            for f in prune_files(seg.files, self._predicates):
                p = f.path if os.path.isabs(f.path) \
                    else os.path.join(self._table_dir, f.path)
                parts.append(_FilePartition(p, seg.format, seg.id,
                                            dd.get(f.path)))
        return parts

    def _historical_names(self, name: str) -> list[str]:
        """Current name plus every historical name that renames led
        from, newest first (rename lineage: files keep the column name
        current at their write time)."""
        chain = [name]
        for old, new in reversed(self._renames):
            if new == chain[-1]:
                chain.append(old)
        return chain

    def read(self, partition: _FilePartition) -> Iterator:
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        if partition.fmt != "parquet":
            raise NotImplementedError(
                f"carbon datasource reads parquet segments; {partition.fmt!r} "
                "segments are served by the engine's native read path")
        target = to_arrow_schema(self._schema)
        row_start = 0
        for batch in pq.ParquetFile(partition.path).iter_batches():
            n_in = batch.num_rows
            if partition.del_pos is not None and len(partition.del_pos):
                from ..catalog.deltas import filter_batch
                batch = filter_batch(batch, partition.del_pos, row_start)
            row_start += n_in
            cols = []
            for field in target:
                src = next((n for n in self._historical_names(field.name)
                            if n in batch.schema.names), None)
                if src is not None:
                    cols.append(batch.column(src).cast(field.type))
                    continue
                # era-exact default: applies only to files written
                # before the column existed (catalog add_column)
                d = self._defaults.get(field.name)
                if d and d.get("value") is not None \
                        and partition.seg_id < d["before_seg"]:
                    cols.append(pa.array(
                        [d["value"]] * batch.num_rows).cast(field.type))
                else:
                    cols.append(pa.nulls(batch.num_rows, field.type))
            yield pa.RecordBatch.from_arrays(cols, schema=target)


class CarbonScanReader(_CarbonReaderBase):
    """The pruning reader: receives Catalyst's pushable conjuncts and
    maps them onto manifest min/max + partition pruning. Requires
    ``spark.sql.python.filterPushdown.enabled`` (set by
    :func:`register`)."""

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        top = {f.name for f in self._schema.fields}
        for f in filters:
            op = _OPS.get(type(f))
            attr = getattr(f, "attribute", None)
            if op and attr and len(attr) == 1 and attr[0] in top:
                value = list(f.value) if op == "in" else f.value
                self._predicates.append((attr[0], op, value))
        # Spark re-evaluates everything exactly; pruning is just a skip
        return iter(filters)


class CarbonStreamReader(DataSourceStreamReader):
    """``spark.readStream.format("carbon")`` — tail the manifest for
    newly committed segments (the reference's "streaming source table":
    CarbonCreateStreamCommand reads a source table and streams new
    data onward, streaming-guide.md:287-470). Offsets are segment ids:
    each micro-batch covers segments in ``(start, end]``, so a load /
    INSERT / INSERT STAGE commit becomes exactly one batch — atomic,
    no half-written-file reads (files only enter the manifest after
    their segment commits)."""

    def __init__(self, options: dict, schema: StructType):
        self._table_dir = options["path"]
        self._schema = schema
        self._reader = _CarbonReaderBase(dict(options), schema)

    def _max_segment(self) -> int:
        m = Manifest(self._table_dir)
        ids = [s.id for s in m.queryable_segments()]
        return max(ids) if ids else -1

    def initialOffset(self) -> dict:
        # start before segment 0: the first batch replays the whole
        # table, then the query tails new commits
        return {"segment": -1}

    def latestOffset(self) -> dict:
        return {"segment": self._max_segment()}

    def partitions(self, start: dict, end: dict):
        import os

        from ..catalog.deltas import delete_positions
        m = Manifest(self._table_dir)
        # deltas known NOW apply to the replayed segments too — a
        # segment-tailing stream over a mor table must not replay
        # rows already deleted at batch-planning time
        dd = delete_positions(self._table_dir, m.load())
        parts = []
        for seg in m.queryable_segments():
            if start["segment"] < seg.id <= end["segment"]:
                for f in seg.files:
                    p = f.path if os.path.isabs(f.path) \
                        else os.path.join(self._table_dir, f.path)
                    parts.append(_FilePartition(p, seg.format, seg.id,
                                                dd.get(f.path)))
        return parts

    def read(self, partition: _FilePartition):
        return self._reader.read(partition)

    def commit(self, end: dict) -> None:
        pass


class CarbonDataSource(DataSource):
    """Register with ``spark.dataSource.register(CarbonDataSource)``,
    then ``spark.read.format("carbon").load(table_dir)`` or
    ``spark.readStream.format("carbon").load(table_dir)``."""

    @classmethod
    def name(cls) -> str:
        return "carbon"

    def schema(self) -> str:
        # return the DDL string — Spark parses it driver-side; parsing
        # here would need an active context, which Python workers
        # (which re-instantiate the DataSource) don't have
        return Manifest(self.options["path"]).load()["schema"]

    def reader(self, schema: StructType) -> _CarbonReaderBase:
        # reader() runs driver-side: honor the session's pushdown conf.
        # When it is off (and register() couldn't turn it on), fall
        # back to the no-pushFilters reader — identical results, no
        # manifest pruning — instead of failing reader init with
        # DATA_SOURCE_PUSHDOWN_DISABLED.
        from pyspark.sql import SparkSession
        spark = SparkSession.getActiveSession()
        enabled = "false"
        if spark is not None:
            enabled = str(spark.conf.get(
                "spark.sql.python.filterPushdown.enabled", "false")).lower()
        cls = CarbonScanReader if enabled == "true" else _CarbonReaderBase
        return cls(self.options, schema)

    def streamReader(self, schema: StructType) -> CarbonStreamReader:
        return CarbonStreamReader(self.options, schema)


def register(spark) -> None:
    """Register the datasource AND enable Python filter pushdown —
    the conf defaults to false and is runtime-settable; without it
    Spark refuses to initialize any reader that overrides
    ``pushFilters`` (the engine's own session builder sets it, but an
    externally created session won't have)."""
    try:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    except Exception:
        pass  # immutable-at-runtime on some builds → reader() falls back
    spark.dataSource.register(CarbonDataSource)
