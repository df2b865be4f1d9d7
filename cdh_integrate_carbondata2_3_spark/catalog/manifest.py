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

Metadata at 100× (the reference's distributed-index-server territory,
indexserver/IndexServer.scala): one JSON doc holding 1e5+ per-file
stats entries costs ~1 s to parse cold (tools/bench_manifest_prune.py).
Table property ``manifest.stats='parquet'`` switches per-file stats to
a columnar **parquet sidecar** (``filestats.v{N}.parquet``, typed
min/max columns) while the JSON keeps only O(segments) metadata —
smaller, faster to parse, and shaped so a future executor-side prune
can filter the stats table with Spark itself. Sidecars are versioned
and immutable; the JSON references its sidecar by name, so the
tmp+rename swap stays the only commit point and readers can never see
a torn pair. The property is re-read at every commit, so flipping it
migrates the table on the next write, either direction.
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


class ConcurrentModificationError(RuntimeError):
    """The manifest advanced past the version a writer's plan was
    computed from (optimistic concurrency — the reference's
    tablestatus + locks discipline, core/.../locks/). Callers
    re-snapshot, recompute, and retry."""

    def __init__(self, base: int, found: int):
        super().__init__(
            f"manifest advanced from version {base} to {found} while "
            f"the update was being computed; retry from a fresh snapshot")
        self.base = base
        self.found = found


def retry_on_conflict(attempt, attempts: int = 5):
    """Optimistic-concurrency driver loop: ``attempt()`` must read a
    fresh manifest snapshot, compute its mutation from it, and commit
    with ``update(..., base_version=<snapshot version>)``. When another
    writer lands in between, the commit raises
    :class:`ConcurrentModificationError` and the whole attempt —
    including the recompute — re-runs against the new state, so the
    loser can never clobber the winner's commit. Raises the last
    conflict after ``attempts`` tries (lock-starved pathological
    churn)."""
    for i in range(attempts):
        try:
            return attempt()
        except ConcurrentModificationError:
            if i == attempts - 1:
                raise


def version_token(status_path: str) -> int | None:
    """The manifest's monotonic version counter via a 64-byte prefix
    read — ``_write`` pins ``"version"`` as the first JSON key so no
    parse is needed. None (caller must not trust stat-only keys) when
    the prefix doesn't match or the file is unreadable."""
    import re
    try:
        with open(status_path, "rb") as f:
            head = f.read(64)
    except OSError:
        return None
    m = re.match(rb'\{\s*"version":\s*(\d+)', head)
    return int(m.group(1)) if m else None


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
        self._cache_attached: bool = False
        self._cache_segs: list["Segment"] | None = None
        self._cache_stats: tuple[str, Any] | None = None  # (ref, pa.Table)

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
             _use_cache: bool = True, _attach: bool = True) -> dict:
        """Current manifest, or a historical version (time travel —
        reference keeps tablestatus history files for the same
        purpose). The current manifest is served from the stat-keyed
        parse cache; callers must treat the result as READ-ONLY (the
        one mutator, ``update``, bypasses the cache).

        ``_attach=False`` skips re-inlining per-file stats from a
        parquet sidecar — for metadata-only consumers (segment status,
        properties, the vectorized prune path) that must stay
        O(segments) at index-server file counts."""
        if version is None and _use_cache:
            key = self._stat_key()
            if key != self._cache_key or self._cache_doc is None:
                with open(self.status_path) as f:
                    self._cache_doc = json.load(f)
                self._cache_key = key
                self._cache_attached = not self._cache_doc.get("files_ref")
                self._cache_segs = None
            if _attach and not self._cache_attached:
                self._attach_files(self._cache_doc)
                self._cache_attached = True
            return self._cache_doc
        path = self.status_path if version is None else os.path.join(
            self.meta_dir, f"tablestatus.v{version}.json")
        if version is not None and not os.path.exists(path):
            raise FileNotFoundError(f"no manifest version {version}")
        with open(path) as f:
            doc = json.load(f)
        return self._attach_files(doc) if _attach else doc

    def _stat_key(self) -> tuple[int, int, int | None]:
        # (mtime, size) alone is racy: two swaps of identical size
        # within one mtime tick (coarse-timestamp filesystems, fast
        # successive IUD+compaction) would serve the stale parse. The
        # version counter is bumped on EVERY update() and serialized
        # first, so a 64-byte prefix read disambiguates without a
        # JSON parse.
        st = os.stat(self.status_path)
        return (st.st_mtime_ns, st.st_size,
                version_token(self.status_path))

    def versions(self) -> list[int]:
        out = []
        for f in os.listdir(self.meta_dir):
            if f.startswith("tablestatus.v") and f.endswith(".json"):
                out.append(int(f[len("tablestatus.v"):-len(".json")]))
        return sorted(out)

    def _stats_format(self, doc: dict) -> str:
        return str(doc.get("properties", {})
                   .get("manifest.stats", "json")).lower()

    def _write(self, doc: dict) -> None:
        if self._stats_format(doc) == "parquet":
            # sidecar first: it is immutable and referenced by name, so
            # the JSON swap below stays the single commit point (a
            # crash in between leaves an unreferenced sidecar, never a
            # torn manifest)
            ref = f"filestats.v{doc['version']}.parquet"
            self._write_filestats(doc, ref)
            # "version" pinned first: version_token() reads it from the
            # file prefix without a JSON parse
            out = {"version": doc["version"], **doc, "files_ref": ref,
                   "segments": [{**s, "files": []}
                                for s in doc["segments"]]}
        else:
            out = {"version": doc["version"], **doc}
            out.pop("files_ref", None)
        tmp = os.path.join(self.meta_dir, f".tablestatus.{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as f:
            json.dump(out, f, indent=1, default=str)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self.status_path)  # atomic swap
        # keep a bounded history for time-travel/debug (reference keeps
        # tablestatus history files)
        hist = os.path.join(self.meta_dir, f"tablestatus.v{doc['version']}.json")
        with open(hist, "w") as f:
            json.dump(out, f, default=str)

    # -- parquet stats sidecar (manifest.stats='parquet') --------------------

    def _write_filestats(self, doc: dict, ref: str) -> None:
        """Flatten every segment's per-file stats into one typed arrow
        table: seg_id/path/rows/bytes plus ``min#col``/``max#col``
        (native types, so pruning comparisons survive the round trip)
        and ``pt#col`` partition values."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        flat = [(s["id"], f) for s in doc["segments"] for f in s["files"]]
        mm_names = sorted({c for _, f in flat for c in f.get("minmax", {})})
        pt_names = sorted({c for _, f in flat for c in f.get("partition", {})})
        data: dict[str, list] = {
            "seg_id": [sid for sid, _ in flat],
            "path": [f["path"] for _, f in flat],
            "rows": [f["rows"] for _, f in flat],
            "bytes": [f["bytes"] for _, f in flat],
        }
        for c in mm_names:
            pairs = [f.get("minmax", {}).get(c) for _, f in flat]
            data[f"min#{c}"] = [p[0] if p else None for p in pairs]
            data[f"max#{c}"] = [p[1] if p else None for p in pairs]
        for c in pt_names:
            data[f"pt#{c}"] = [f.get("partition", {}).get(c) for _, f in flat]

        def _arr(vals: list) -> "pa.Array":
            try:
                return pa.array(vals)
            except (pa.ArrowInvalid, pa.ArrowTypeError):
                # heterogeneous column (shouldn't happen for one table
                # schema) — stringify; pruning then skips it as
                # non-comparable, which is sound
                return pa.array([None if v is None else str(v)
                                 for v in vals])

        table = pa.table({k: _arr(v) for k, v in data.items()})
        tmp = os.path.join(self.meta_dir, f".{ref}.{uuid.uuid4().hex}.tmp")
        pq.write_table(table, tmp)
        os.replace(tmp, os.path.join(self.meta_dir, ref))

    def _attach_files(self, doc: dict) -> dict:
        """Inverse of _write_filestats: re-inline per-file stats from
        the referenced sidecar so every downstream consumer sees the
        same doc shape regardless of storage format. (Column-major zip
        loops: ~2× faster than row-major dict building at 1e5 files.)"""
        ref = doc.get("files_ref")
        if not ref:
            return doc
        t = self._stats_table(ref)
        files = self._rows_to_file_dicts(t)
        by_seg: dict[int, list[dict]] = {}
        for sid, f in zip(t["seg_id"].to_pylist(), files):
            by_seg.setdefault(sid, []).append(f)
        for s in doc["segments"]:
            s["files"] = by_seg.get(s["id"], [])
        return doc

    @staticmethod
    def _rows_to_file_dicts(t) -> list[dict]:
        d = {c: t[c].to_pylist() for c in t.column_names}
        files: list[dict] = [
            {"path": p, "rows": r, "bytes": b, "minmax": {}, "partition": {}}
            for p, r, b in zip(d["path"], d["rows"], d["bytes"])]
        for c in t.column_names:
            if c.startswith("min#"):
                name = c[4:]
                for f, mn, mx in zip(files, d[c], d["max#" + name]):
                    if mn is not None or mx is not None:
                        f["minmax"][name] = [mn, mx]
            elif c.startswith("pt#"):
                name = c[3:]
                for f, v in zip(files, d[c]):
                    if v is not None:
                        f["partition"][name] = v
        return files

    def _stats_table(self, ref: str):
        """The stats sidecar as a pyarrow table (cached by ref name —
        sidecars are immutable)."""
        if self._cache_stats and self._cache_stats[0] == ref:
            return self._cache_stats[1]
        import pyarrow.parquet as pq
        t = pq.read_table(os.path.join(self.meta_dir, ref))
        self._cache_stats = (ref, t)
        return t

    def pruned_filestats(
            self, predicates, segment_ids: list[int] | None = None,
            version: int | None = None,
    ) -> dict[int, list[FileStat]] | None:
        """Vectorized prune over the stats sidecar: evaluates the
        min/max + partition skip test as pyarrow compute over ALL
        files at once and materializes FileStats ONLY for survivors.
        Returns {segment_id: [FileStat...]} for queryable segments, or
        None when this manifest stores stats inline (JSON mode) — the
        caller then walks the classic prune_files path. This is what
        keeps the driver metadata path flat at reference-index-server
        file counts (see SCALE.md 'Driver metadata path')."""
        if not predicates:
            # nothing to prune — the classic path serves full scans
            # from the per-commit materialized cache (_cache_segs),
            # cheaper than re-materializing every call here
            return None
        doc = self.load(version, _attach=False)
        ref = doc.get("files_ref")
        if not ref:
            return None
        import pyarrow as pa
        import pyarrow.compute as pc
        from ..plans.pruning import arrow_prune_mask
        t = self._stats_table(ref)
        qids = [s["id"] for s in doc["segments"]
                if s["status"] in QUERYABLE
                and (segment_ids is None or s["id"] in set(segment_ids))]
        if t.num_rows == 0:
            return {sid: [] for sid in qids}
        mask = pc.is_in(t["seg_id"], value_set=pa.array(qids, pa.int64()))
        if predicates:
            mask = pc.and_(mask, arrow_prune_mask(t, predicates))
        surv = t.filter(mask)
        out: dict[int, list[FileStat]] = {sid: [] for sid in qids}
        for sid, f in zip(surv["seg_id"].to_pylist(),
                          self._rows_to_file_dicts(surv)):
            out[sid].append(FileStat.from_json(f))
        return out

    def gc_stats_sidecars(self) -> int:
        """Remove filestats sidecars referenced by NO manifest version
        (crash leftovers from a commit that died between sidecar write
        and JSON swap). History-referenced sidecars stay — time travel
        reads them. Called from CLEAN FILES.

        Runs UNDER the writer lock: a concurrent committer writes its
        sidecar BEFORE swapping the JSON, so an unlocked gc could
        snapshot refs, then delete the other writer's just-written
        (about-to-be-referenced) sidecar — bricking that commit. The
        lock serializes gc with _write, and refs are computed inside
        it, so any sidecar we delete can never become referenced."""
        with ManifestLock(self.meta_dir):
            refs = {self.load(_attach=False,
                              _use_cache=False).get("files_ref")}
            for v in self.versions():
                try:
                    refs.add(self.load(v, _attach=False).get("files_ref"))
                except FileNotFoundError:  # pragma: no cover
                    pass
            n = 0
            for f in os.listdir(self.meta_dir):
                if (f.startswith("filestats.") and f.endswith(".parquet")
                        and f not in refs):
                    os.unlink(os.path.join(self.meta_dir, f))
                    n += 1
            return n

    def queryable_segment_meta(
            self, segment_ids: list[int] | None = None,
            version: int | None = None) -> list[Segment]:
        """Queryable segments WITHOUT their file lists (files=[]) —
        O(segments) regardless of file count. Pair with
        pruned_filestats for the vectorized scan path."""
        doc = self.load(version, _attach=False)
        wanted = None if segment_ids is None else set(segment_ids)
        return [
            Segment(s["id"], s["status"], s["format"], [],
                    s["load_time"], s.get("source", "load"),
                    s.get("external_path"))
            for s in doc["segments"]
            if s["status"] in QUERYABLE
            and (wanted is None or s["id"] in wanted)
            # JSON mode docs (incl. pre-migration history) carry files
            # inline; strip-shaped docs have files==[] already
        ]

    def minmax_metadata(self, cols: list[str],
                        segment_ids: list[int] | None = None
                        ) -> dict[str, tuple] | None:
        """Exact table-level MIN/MAX per column from manifest stats —
        no data scan (the blocklet-min/max analogue of row_count's
        CarbonCountStar path; Iceberg answers the same aggregates from
        its manifests). Returns {col: (min, max)} or None when the
        metadata CANNOT answer exactly:

        - merge-on-read delete deltas pending (a deleted row may have
          held the extremum),
        - a queryable non-parquet FILE without harvested stats
          (footer-only ORC, statless csv/json; ADD SEGMENT
          stats='scan' harvests exact min/max and re-enables the
          metadata answer),
        - a non-empty file lacking stats for the column (all-null
          file, unharvestable logical type, schema-evolution era
          where the column didn't exist, or a partition column — its
          values live in the path, not the footer),
        - non-numeric stats (parquet string min/max may be truncated
          by writers — a sound BOUND for pruning, not an exact
          answer).

        An empty table answers {col: (None, None)} — SQL MIN/MAX over
        zero rows is NULL. None means "fall back to a scan"."""
        doc = self.load(_attach=False)
        if doc.get("delete_deltas"):
            return None
        # unknown column → let the scan path raise the proper
        # AnalysisException instead of answering NULL from metadata
        schema_cols = {p.split()[0].strip("`")
                       for p in doc.get("schema", "").split(",") if p.strip()}
        if schema_cols and not set(cols) <= schema_cols:
            return None
        wanted = None if segment_ids is None else set(segment_ids)
        segs = [s for s in doc["segments"] if s["status"] in QUERYABLE
                and (wanted is None or s["id"] in wanted)]
        # Non-parquet segments ARE answerable when their files carry
        # harvested stats (ADD SEGMENT stats='scan' computes exact
        # min/max from the data, r10) — no blanket format guard: the
        # per-file loop below bails to None on any file with a
        # missing or non-numeric column stat, which covers
        # footer-only ORC (rows harvested, no column stats) and
        # statless csv/json (rows=-1, no minmax) exactly.
        doc = self._attach_files(doc) if doc.get("files_ref") else doc
        by_id = {s["id"]: s for s in doc["segments"]}
        out: dict[str, list] = {}
        for s in segs:
            for f in by_id[s["id"]]["files"]:
                if f["rows"] == 0:
                    continue
                for c in cols:
                    mm = f.get("minmax", {}).get(c)
                    if (not mm
                            or not all(isinstance(v, (int, float))
                                       and not isinstance(v, bool)
                                       for v in mm)):
                        return None
                    if c not in out:
                        out[c] = [mm[0], mm[1]]
                    else:
                        cur = out[c]
                        cur[0] = min(cur[0], mm[0])
                        cur[1] = max(cur[1], mm[1])
        return {c: tuple(out[c]) if c in out else (None, None)
                for c in cols}

    def update(self, mutate, *, base_version: int | None = None) -> dict:
        """Read-modify-write under the writer lock; ``mutate(doc)`` edits
        the manifest dict in place.

        ``base_version`` is the optimistic-concurrency guard for
        writers whose mutation was COMPUTED from an earlier snapshot
        (CoW rewrites, compaction): pass the version the plan read,
        and the commit re-checks it under the lock —
        :class:`ConcurrentModificationError` if another writer landed
        in between, so a slow rewrite can never clobber a concurrent
        commit it didn't account for. Mutators that only read the
        in-lock doc (append a segment, flip a status) don't need it."""
        with ManifestLock(self.meta_dir):
            # fresh parse: the mutator edits this dict in place, so it
            # must never be the cached (shared, read-only) object
            doc = self.load(_use_cache=False)
            if base_version is not None and doc["version"] != base_version:
                raise ConcurrentModificationError(base_version,
                                                  doc["version"])
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
        """Metadata-only count(*) (CarbonCountStar analogue). In
        parquet-stats mode the sum runs as pyarrow compute — no
        per-file Python objects."""
        doc = self.load(_attach=False)
        ref = doc.get("files_ref")
        if ref:
            import pyarrow as pa
            import pyarrow.compute as pc
            t = self._stats_table(ref)
            if t.num_rows == 0:
                return 0
            qids = [s["id"] for s in doc["segments"]
                    if s["status"] in QUERYABLE
                    and (segment_ids is None or s["id"] in set(segment_ids))]
            mask = pc.is_in(t["seg_id"], value_set=pa.array(qids, pa.int64()))
            return pc.sum(t.filter(mask)["rows"]).as_py() or 0
        return sum(s.rows for s in self.queryable_segments(segment_ids))
