"""Spark-free SDK reader/writer over segment-managed tables.

Reference: sdk/sdk/src/main/java/org/apache/carbondata/sdk/file/ —
CarbonWriter.java (build rows → files without a cluster),
CarbonReader.java (iterate projected/filtered rows),
ArrowCarbonReader.java (Arrow out), PaginationCarbonReader.java
(offset/limit pages over cumulative file row ranges).

Ours is pyarrow end-to-end and commits through the SAME manifest as
the Spark engine, so SDK-written segments are immediately queryable by
``Table.read`` and vice versa.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Any, Iterator

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .catalog.manifest import Manifest, Segment, SegmentStatus
from .catalog.stats import harvest_file

_DDL_TO_ARROW = {
    "tinyint": pa.int8(), "smallint": pa.int16(), "int": pa.int32(),
    "integer": pa.int32(), "bigint": pa.int64(), "long": pa.int64(),
    "float": pa.float32(), "double": pa.float64(),
    "string": pa.string(), "varchar": pa.string(), "char": pa.string(),
    "boolean": pa.bool_(), "binary": pa.binary(),
    "date": pa.date32(), "timestamp": pa.timestamp("us"),
}


def _ddl_to_arrow_schema(schema_ddl: str) -> pa.Schema:
    fields = []
    for spec in schema_ddl.split(","):
        name, dtype = spec.strip().split(None, 1)
        dtype = dtype.strip().lower()
        if dtype.startswith("decimal"):
            p, s = dtype[dtype.index("(") + 1:-1].split(",")
            fields.append(pa.field(name, pa.decimal128(int(p), int(s))))
        else:
            fields.append(pa.field(name, _DDL_TO_ARROW[dtype]))
    return pa.schema(fields)


class SdkWriter:
    """CarbonWriter analogue: buffer rows (or accept Arrow tables),
    flush as one segment per ``close``/``flush_segment`` — all local,
    no SparkSession."""

    def __init__(self, table_dir: str, schema_ddl: str | None = None,
                 rows_per_file: int = 1 << 20):
        self.table_dir = os.path.abspath(table_dir)
        self.manifest = Manifest(self.table_dir)
        if not self.manifest.exists():
            if schema_ddl is None:
                raise ValueError("new table needs schema_ddl")
            os.makedirs(self.table_dir, exist_ok=True)
            self.manifest.init(schema_ddl, {})
        self.schema = _ddl_to_arrow_schema(self.manifest.load()["schema"])
        self.rows_per_file = rows_per_file
        self._buffer: list[dict] = []

    def write(self, row: dict[str, Any]) -> None:
        self._buffer.append(row)

    def write_arrow(self, tbl: pa.Table) -> int:
        """Write a whole Arrow table as one segment."""
        return self._commit(tbl.cast(self.schema))

    def flush_segment(self) -> int | None:
        if not self._buffer:
            return None
        tbl = pa.Table.from_pylist(self._buffer, schema=self.schema)
        self._buffer = []
        return self._commit(tbl)

    close = flush_segment

    def _commit(self, tbl: pa.Table) -> int:
        tmp = os.path.join(self.table_dir, f"_tmp_{uuid.uuid4().hex}")
        os.makedirs(tmp)
        rels = []
        for i in range(0, max(tbl.num_rows, 1), self.rows_per_file):
            rel = f"part-{i // self.rows_per_file:05d}.parquet"
            pq.write_table(tbl.slice(i, self.rows_per_file),
                           os.path.join(tmp, rel))
            rels.append(rel)
        committed = {}

        def mutate(doc: dict) -> None:
            seg_id = self.manifest.next_segment_id(doc)
            seg_dir = os.path.join(self.table_dir, f"segment_{seg_id}")
            os.makedirs(seg_dir, exist_ok=True)
            stats = []
            for rel in rels:
                dst_rel = os.path.join(f"segment_{seg_id}", rel)
                dst = os.path.join(self.table_dir, dst_rel)
                os.rename(os.path.join(tmp, rel), dst)
                stats.append(harvest_file(dst, dst_rel))
            doc["segments"].append(Segment(
                id=seg_id, status=SegmentStatus.SUCCESS, format="parquet",
                files=stats, load_time=time.time(), source="sdk").to_json())
            committed["id"] = seg_id

        self.manifest.update(mutate)
        os.rmdir(tmp)
        return committed["id"]


class SdkStageWriter:
    """Flink-SDK-writer analogue: write data files plus a ``.stage``
    metadata file into ``<table>/stage/`` WITHOUT touching the
    manifest — staged data is invisible to queries until
    ``INSERT INTO t STAGE`` commits it (reference
    CarbonInsertFromStageCommand.scala:71-183: external writers drop
    stage files, the command picks them up transactionally).

    Each ``commit()`` is one stage entry; a single INSERT STAGE may
    consume many entries from many concurrent writers.
    """

    def __init__(self, table_dir: str, schema_ddl: str | None = None):
        self.table_dir = os.path.abspath(table_dir)
        self.manifest = Manifest(self.table_dir)
        if not self.manifest.exists():
            if schema_ddl is None:
                raise ValueError("new table needs schema_ddl")
            os.makedirs(self.table_dir, exist_ok=True)
            self.manifest.init(schema_ddl, {})
        self.schema = _ddl_to_arrow_schema(self.manifest.load()["schema"])
        self.stage_dir = os.path.join(self.table_dir, "stage")
        os.makedirs(self.stage_dir, exist_ok=True)
        self._buffer: list[dict] = []

    def write(self, row: dict[str, Any]) -> None:
        self._buffer.append(row)

    def commit(self) -> str | None:
        """Flush buffered rows as one stage entry: data file first,
        ``.stage`` metadata last (the metadata file IS the commit
        marker — a crash in between leaves an orphan data file that
        ``DELETE FROM TABLE t STAGE`` garbage-collects)."""
        if not self._buffer:
            return None
        tbl = pa.Table.from_pylist(self._buffer, schema=self.schema)
        self._buffer = []
        token = uuid.uuid4().hex
        data_rel = f"{token}-part-00000.parquet"
        pq.write_table(tbl, os.path.join(self.stage_dir, data_rel))
        meta = {"files": [data_rel], "rows": tbl.num_rows,
                "create_time": time.time()}
        tmp = os.path.join(self.stage_dir, f"_{token}.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.rename(tmp, os.path.join(self.stage_dir, f"{token}.stage"))
        return token


class SdkReader:
    """CarbonReader/ArrowCarbonReader/PaginationCarbonReader analogue:
    projected + filtered reads, Arrow/pandas out, and offset/limit
    pagination that opens ONLY the files whose cumulative row range
    intersects the page (PaginationCarbonReader.java behavior)."""

    def __init__(self, table_dir: str, columns: list[str] | None = None,
                 filter_expr: pc.Expression | None = None):
        self.table_dir = os.path.abspath(table_dir)
        self.manifest = Manifest(self.table_dir)
        self.columns = columns
        self.filter_expr = filter_expr
        self._deltas = None     # lazy {rel path → deleted positions}

    def _delete_pos(self) -> dict:
        """Merge-on-read delete positions (catalog/deltas.py) — the
        SDK applies the same sidecars the Spark read path anti-joins,
        so a no-Spark reader never resurrects deleted rows."""
        if self._deltas is None:
            from .catalog.deltas import delete_positions
            self._deltas = delete_positions(self.table_dir,
                                            self.manifest.load())
        return self._deltas

    def _files(self) -> list[tuple[str, str, int]]:
        """(abs path, manifest-relative path, LIVE row count) per
        file — footer counts minus this file's deleted positions, so
        pagination offsets address surviving rows only."""
        dd = self._delete_pos()
        out = []
        for seg in self.manifest.queryable_segments():
            if seg.format != "parquet":
                raise ValueError("SDK reads parquet segments only")
            for f in seg.files:
                p = f.path if os.path.isabs(f.path) \
                    else os.path.join(self.table_dir, f.path)
                out.append((p, f.path, f.rows - len(dd.get(f.path, ()))))
        return out

    def _read_live(self, abs_path: str, rel: str) -> pa.Table:
        t = pq.read_table(abs_path, columns=self.columns)
        pos = self._delete_pos().get(rel)
        if pos is not None and len(pos):
            from .catalog.deltas import filter_batch
            t = filter_batch(t, pos, 0)
        return t

    def to_arrow(self) -> pa.Table:
        parts = []
        for p, rel, _ in self._files():
            t = self._read_live(p, rel)
            if self.filter_expr is not None:
                t = t.filter(self.filter_expr)
            parts.append(t)
        if not parts:
            return pa.table({})
        return pa.concat_tables(parts)

    def to_pandas(self):
        return self.to_arrow().to_pandas()

    def __iter__(self) -> Iterator[dict]:
        for p, rel, _ in self._files():
            t = self._read_live(p, rel)
            if self.filter_expr is not None:
                t = t.filter(self.filter_expr)
            yield from t.to_pylist()

    def total_rows(self) -> int:
        return sum(r for _, _, r in self._files())

    def read_page(self, offset: int, limit: int) -> pa.Table:
        """LIVE rows [offset, offset+limit) in manifest order,
        touching only the files whose surviving-row range intersects
        the page."""
        parts = []
        pos = 0
        need_lo, need_hi = offset, offset + limit
        for p, rel, rows in self._files():
            lo, hi = pos, pos + rows
            pos = hi
            if hi <= need_lo:
                continue
            if lo >= need_hi:
                break
            t = self._read_live(p, rel)
            start = max(need_lo - lo, 0)
            length = min(need_hi, hi) - (lo + start)
            parts.append(t.slice(start, length))
        if not parts:
            return pa.table({})
        return pa.concat_tables(parts)
