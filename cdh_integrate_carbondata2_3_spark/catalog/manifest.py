"""Segment manifest — the engine's ``tablestatus``.

The reference tracks loads as *segments* in a tablestatus file with
per-segment status (SUCCESS, MARKED_FOR_DELETE, STREAMING, …) and uses
driver-side min/max indexes for pruning
(reference: core/.../statusmanager/SegmentStatusManager.java,
core/.../index/Segment.java, docs/segment-management-on-carbondata.md).

Our manifest is a single JSON file swapped atomically via
write-tmp + os.replace; it stores per-file row counts and per-column
min/max (harvested from parquet footers at commit time) so the driver
can prune files *before* Spark lists them — the analogue of blocklet
min/max pruning (hadoop/.../CarbonInputFormat.java:540-681) — and can
answer count(*) from metadata (CarbonCountStar.scala:44-108).

Concurrency: single-writer lockfile (O_CREAT|O_EXCL with stale-lock
timeout), reader-safe because the JSON swap is atomic.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field
from typing import Any


class SegmentStatus:
    SUCCESS = "SUCCESS"
    MARKED_FOR_DELETE = "MARKED_FOR_DELETE"
    COMPACTED = "COMPACTED"
    STREAMING = "STREAMING"
    STREAMING_FINISH = "STREAMING_FINISH"
    INSERT_IN_PROGRESS = "INSERT_IN_PROGRESS"


QUERYABLE = {SegmentStatus.SUCCESS, SegmentStatus.STREAMING,
             SegmentStatus.STREAMING_FINISH}


@dataclass
class FileStat:
    path: str                       # relative to table dir
    rows: int
    bytes: int
    minmax: dict[str, list[Any]] = field(default_factory=dict)
    partition: dict[str, str] = field(default_factory=dict)

    def to_json(self) -> dict:
        return {"path": self.path, "rows": self.rows, "bytes": self.bytes,
                "minmax": self.minmax, "partition": self.partition}

    @staticmethod
    def from_json(d: dict) -> "FileStat":
        return FileStat(d["path"], d["rows"], d["bytes"],
                        d.get("minmax", {}), d.get("partition", {}))


@dataclass
class Segment:
    id: int
    status: str
    format: str                      # parquet | orc | csv | json
    files: list[FileStat]
    load_time: float
    source: str = "load"             # load | insert | compact | add_segment | stream
    external_path: str | None = None  # for ADD SEGMENT

    @property
    def rows(self) -> int:
        return sum(f.rows for f in self.files)

    @property
    def bytes(self) -> int:
        return sum(f.bytes for f in self.files)

    def to_json(self) -> dict:
        return {"id": self.id, "status": self.status, "format": self.format,
                "files": [f.to_json() for f in self.files],
                "load_time": self.load_time, "source": self.source,
                "external_path": self.external_path}

    @staticmethod
    def from_json(d: dict) -> "Segment":
        return Segment(d["id"], d["status"], d["format"],
                       [FileStat.from_json(f) for f in d["files"]],
                       d["load_time"], d.get("source", "load"),
                       d.get("external_path"))


class ManifestLock:
    """Single-writer lockfile (reference: core/.../locks/)."""

    def __init__(self, meta_dir: str, timeout: float = 30.0,
                 stale_after: float = 300.0):
        self.path = os.path.join(meta_dir, "tablestatus.lock")
        self.timeout = timeout
        self.stale_after = stale_after

    def __enter__(self):
        deadline = time.time() + self.timeout
        while True:
            try:
                fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, str(os.getpid()).encode())
                os.close(fd)
                return self
            except FileExistsError:
                try:
                    if time.time() - os.path.getmtime(self.path) > self.stale_after:
                        os.unlink(self.path)  # crashed writer
                        continue
                except FileNotFoundError:
                    continue
                if time.time() > deadline:
                    raise TimeoutError(f"could not acquire {self.path}")
                time.sleep(0.05)

    def __exit__(self, *exc):
        try:
            os.unlink(self.path)
        except FileNotFoundError:
            pass


class Manifest:
    """Table metadata + segment list with atomic commit."""

    def __init__(self, table_dir: str):
        self.table_dir = table_dir
        self.meta_dir = os.path.join(table_dir, "_meta")
        self.status_path = os.path.join(self.meta_dir, "tablestatus.json")
        # (mtime_ns, size) → parsed doc + Segment list. A 1e5-file
        # manifest is ~33 MB of JSON (~1 s to parse); queries vastly
        # outnumber commits, so re-parsing per scan is the first
        # driver-side wall at reference-index-server metadata volumes
        # (tools/bench_manifest_prune.py has the numbers). os.replace
        # updates mtime, so any commit — ours or another process's —
        # invalidates the key on the next stat.
        self._cache_key: tuple[int, int] | None = None
        self._cache_doc: dict | None = None
        self._cache_segs: list["Segment"] | None = None

    # -- io ----------------------------------------------------------------

    def exists(self) -> bool:
        return os.path.exists(self.status_path)

    def init(self, schema_ddl: str, properties: dict | None = None) -> None:
        os.makedirs(self.meta_dir, exist_ok=True)
        if self.exists():
            raise FileExistsError(f"table already exists at {self.table_dir}")
        self._write({"version": 0, "schema": schema_ddl,
                     "properties": properties or {}, "segments": []})

    def load(self, version: int | None = None, *,
             _use_cache: bool = True) -> dict:
        """Current manifest, or a historical version (time travel —
        reference keeps tablestatus history files for the same
        purpose). The current manifest is served from the stat-keyed
        parse cache; callers must treat the result as READ-ONLY (the
        one mutator, ``update``, bypasses the cache)."""
        if version is None and _use_cache:
            key = self._stat_key()
            if key == self._cache_key and self._cache_doc is not None:
                return self._cache_doc
            with open(self.status_path) as f:
                doc = json.load(f)
            self._cache_key, self._cache_doc = key, doc
            self._cache_segs = None
            return doc
        path = self.status_path if version is None else os.path.join(
            self.meta_dir, f"tablestatus.v{version}.json")
        if version is not None and not os.path.exists(path):
            raise FileNotFoundError(f"no manifest version {version}")
        with open(path) as f:
            return json.load(f)

    def _stat_key(self) -> tuple[int, int]:
        st = os.stat(self.status_path)
        return (st.st_mtime_ns, st.st_size)

    def versions(self) -> list[int]:
        out = []
        for f in os.listdir(self.meta_dir):
            if f.startswith("tablestatus.v") and f.endswith(".json"):
                out.append(int(f[len("tablestatus.v"):-len(".json")]))
        return sorted(out)

    def _write(self, doc: dict) -> None:
        tmp = os.path.join(self.meta_dir, f".tablestatus.{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as f:
            json.dump(doc, f, indent=1, default=str)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self.status_path)  # atomic swap
        # keep a bounded history for time-travel/debug (reference keeps
        # tablestatus history files)
        hist = os.path.join(self.meta_dir, f"tablestatus.v{doc['version']}.json")
        with open(hist, "w") as f:
            json.dump(doc, f, default=str)

    def update(self, mutate) -> dict:
        """Read-modify-write under the writer lock; ``mutate(doc)`` edits
        the manifest dict in place."""
        with ManifestLock(self.meta_dir):
            # fresh parse: the mutator edits this dict in place, so it
            # must never be the cached (shared, read-only) object
            doc = self.load(_use_cache=False)
            mutate(doc)
            doc["version"] += 1
            self._write(doc)
            self._cache_key = None      # next read re-stats + re-parses
            return doc

    # -- segment accessors -------------------------------------------------

    def segments(self, statuses: set[str] | None = None,
                 version: int | None = None) -> list[Segment]:
        if version is None:
            # reuse materialized Segment objects while the file is
            # unchanged — from_json over 1e5 FileStats costs ~0.4 s,
            # paid once per commit instead of once per query. Nothing
            # in the codebase mutates Segment/FileStat instances
            # (update() goes through raw dicts).
            doc = self.load()
            if self._cache_segs is None:
                self._cache_segs = [Segment.from_json(s)
                                    for s in doc["segments"]]
            segs = self._cache_segs
        else:
            segs = [Segment.from_json(s)
                    for s in self.load(version)["segments"]]
        if statuses is not None:
            segs = [s for s in segs if s.status in statuses]
        return list(segs) if statuses is None else segs

    def queryable_segments(self, segment_ids: list[int] | None = None,
                           version: int | None = None) -> list[Segment]:
        segs = self.segments(QUERYABLE, version)
        if segment_ids is not None:
            wanted = set(segment_ids)
            segs = [s for s in segs if s.id in wanted]
        return segs

    def next_segment_id(self, doc: dict | None = None) -> int:
        doc = doc or self.load()
        ids = [s["id"] for s in doc["segments"]]
        return max(ids) + 1 if ids else 0

    def properties(self) -> dict:
        return self.load().get("properties", {})

    def row_count(self, segment_ids: list[int] | None = None) -> int:
        """Metadata-only count(*) (CarbonCountStar analogue)."""
        return sum(s.rows for s in self.queryable_segments(segment_ids))
