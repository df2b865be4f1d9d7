"""Merge-on-read UPDATE / DELETE via delete-delta sidecars.

The reference's native IUD design: DELETE writes per-block
delete-delta bitmaps and the query path subtracts them at read time;
accumulated deltas are merged by horizontal compaction
(reference: core/src/main/java/org/apache/carbondata/core/mutate/
CarbonUpdateUtil.java, DeleteDeltaBlockDetails;
integration/spark/.../mutation/HorizontalCompaction.scala;
DeleteExecution.scala:60-144 block/tupleId grouping).

Spark-first re-expression — tables with ``'iud.mode'='mor'``:

- **Tuple identity** is (table-relative file path, parquet
  ``_metadata.row_index``) — the columnar reader's stable in-file
  position, the exact analogue of the reference tupleId without any
  generated column materialized in the data.
- **DELETE** scans only what the manifest/min-max/index pruning
  leaves (deltas applied, so re-deleting is idempotent), and writes
  the matching (file, pos) pairs as a parquet sidecar under
  ``deletedelta/`` — O(deleted rows) bytes, versus copy-on-write's
  O(touched files) rewrite. The manifest swap is the commit point.
- **UPDATE** = delete delta for the old versions + a fresh segment
  with the updated rows, committed in ONE manifest swap.
- **Read** applies deltas centrally in ``Table.read`` as a
  broadcast anti-join on (file, pos) while the delta side is small
  (manifest row counts decide driver-side — no extra job), falling
  back to a shuffled anti-join for pathological delete volumes.
- **Horizontal compaction** consolidates the delta list to one
  sidecar (auto-triggered past ``horizontal_compaction_threshold``,
  default 4) and trims rows whose file left the queryable set —
  keeping the read-path join input minimal and the metadata-only
  count() subtraction exact.

At 100 TB the cost profile: a DELETE of k rows costs one pruned scan
+ k delta rows; every subsequent read pays one anti-join whose build
side is the live delta (usually broadcast); MAJOR compaction applies
deltas physically because its rewrite reads through ``Table.read``.

Writer model: like the CoW path (and the reference's table-status
lock), IUD assumes ONE writer per table at a time — the manifest
swap serializes commits, but two overlapping DELETEs that both
scanned the pre-delete state would record the same (file, pos) twice
(reads stay correct; the metadata count() over-subtracts until the
next horizontal compaction's distinct()). Serialize IUD externally,
as with every table format whose conflict resolution is the
commit lock.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import functions as F

from ..catalog.table import Table

DELTA_DIR = "deletedelta"


def _check_mor(table: Table) -> None:
    from .dml import _check_mutable
    _check_mutable(table)
    segs = table.manifest.queryable_segments()
    bad = {s.format for s in segs} - {"parquet"}
    if bad:
        raise ValueError(
            "merge-on-read IUD needs parquet segments (row positions "
            f"come from the parquet reader); table has {sorted(bad)} — "
            "use 'iud.mode'='cow'")
    if any(s.external_path for s in segs):
        # delta keys are table-relative paths; an external file's
        # path never re-derives from the reader's raw path, so its
        # deltas would silently miss at read time — reject instead
        raise ValueError(
            "merge-on-read IUD does not cover external (ADD SEGMENT) "
            "segments — compact them in or use 'iud.mode'='cow'")


# past this many distinct touched files the per-delta file list is
# dropped from the manifest (entry covers "any file") — keeps the
# driver-side JSON bounded for pathological corpus-wide deletes
MAX_DELTA_FILE_LIST = 20_000


def _write_delta(table: Table, hits) -> tuple[str, int, list | None] | None:
    """Write (file, pos) pairs as a delta sidecar; returns
    (relative path, row count, touched-file list | None) or None when
    nothing matched. Count and file list come from the written
    parquet (no second scan); sorting by (file, pos) gives the
    sidecar min/max locality and makes the file column
    dictionary-cheap to read back."""
    rel = os.path.join(DELTA_DIR, f"dd_{uuid.uuid4().hex}")
    out = os.path.join(table.table_dir, rel)
    # sortWithinPartitions, NOT a global sort (r12): scan tasks
    # already group rows by source file, so a per-partition
    # (file, pos) sort delivers the same per-file locality and
    # dictionary-cheap file column — while a global sort's range
    # exchange adds a SAMPLING job that re-runs the entire
    # scan+filter subtree before the real pass (guide §2.4: an
    # orderBy used only to make output nicer is an accidental
    # exchange). The sidecar is consumed by an order-insensitive
    # (file, pos) anti-join, so row order across files is free.
    (hits.select(F.col("__dd_f").alias("file"),
                 F.col("__dd_p").cast("bigint").alias("pos"))
     .sortWithinPartitions("file", "pos")
     .write.mode("overwrite").parquet(out))
    import pyarrow.parquet as pq
    parts = [os.path.join(out, f) for f in os.listdir(out)
             if f.endswith(".parquet") and not f.startswith(("_", "."))]
    n = sum(pq.read_metadata(p).num_rows for p in parts)
    if n == 0:
        import shutil
        shutil.rmtree(out, ignore_errors=True)
        return None
    # the touched-file list lets the read path anti-join ONLY the
    # files that actually carry deltas (reference: per-block delta
    # attribution) — targeted deletes then cost the clean files
    # nothing at all
    files: list | None = None
    if n <= 10_000_000:
        import pyarrow.compute as pc
        import pyarrow.parquet as pq2
        u = pc.unique(pq2.read_table(out, columns=["file"])
                      .column("file"))
        if len(u) <= MAX_DELTA_FILE_LIST:
            files = sorted(u.to_pylist())
    return rel, n, files


def _append_delta(doc: dict, rel: str, rows: int,
                  files: list | None) -> None:
    entry: dict = {"path": rel, "rows": int(rows)}
    if files is not None:
        entry["files"] = files
    doc.setdefault("delete_deltas", []).append(entry)


def _threshold(table: Table) -> int:
    return int(table.manifest.properties().get(
        "horizontal_compaction_threshold", 4))


# horizontal compaction merges driver-side below this many total
# delta rows (a (file, pos) pair is ~tens of bytes in arrow — 2M
# rows is well under 200 MB of driver memory); manifest row counts
# decide, so the gate costs no job
_DRIVER_MERGE_MAX_ROWS = 2_000_000


def _driver_merge_deltas(table: Table, deltas: list,
                         live: list) -> tuple[str, int, list | None] | None:
    """pyarrow merge of small delta sidecars: concat → keep rows
    whose file is still queryable → dedup (file, pos) → sort → write
    ONE sidecar file. Byte-for-byte the same artifact contract as
    the Spark path (parquet dir with `file`,`pos` columns + the
    manifest entry's rows/files fields)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    tabs = [pq.read_table(table._abs(d["path"]), columns=["file", "pos"])
            for d in deltas]
    t = pa.concat_tables(tabs)
    t = t.filter(pc.is_in(t.column("file"),
                          value_set=pa.array(live, pa.string())))
    # dedup on (file, pos), then sort for sidecar locality
    t = (t.group_by(["file", "pos"]).aggregate([])
         .sort_by([("file", "ascending"), ("pos", "ascending")]))
    n = t.num_rows
    if n == 0:
        return None
    rel = os.path.join(DELTA_DIR, f"dd_{uuid.uuid4().hex}")
    out = os.path.join(table.table_dir, rel)
    os.makedirs(out, exist_ok=True)
    pq.write_table(t, os.path.join(out, "part-00000-merged.parquet"))
    files: list | None = None
    u = pc.unique(t.column("file"))
    if len(u) <= MAX_DELTA_FILE_LIST:
        files = sorted(u.to_pylist())
    return rel, n, files


def delete_rows_mor(table: Table, condition: str, predicates=None) -> int:
    """DELETE FROM t WHERE condition, merge-on-read. Returns deleted
    row count. No data file is read beyond the pruned matching set
    and none is rewritten."""
    _check_mor(table)
    from ..catalog.manifest import retry_on_conflict

    def attempt() -> int:
        # the delta's (file, pos) keys are only valid against the
        # snapshot they were scanned from — a concurrent rewrite/
        # compaction invalidates them, so commit checks the version
        base = table.manifest.load(_attach=False)["version"]
        scan = table.read(predicates=predicates, with_rowpos=True)
        delta = _write_delta(table, scan.filter(F.expr(condition)))
        if delta is None:
            return 0
        rel, n, files = delta

        def mutate(doc: dict) -> None:
            _append_delta(doc, rel, n, files)

        try:
            table.manifest.update(mutate, base_version=base)
        except BaseException:
            import shutil
            shutil.rmtree(os.path.join(table.table_dir, rel),
                          ignore_errors=True)    # orphaned sidecar
            raise
        return n

    n = retry_on_conflict(attempt)
    if n == 0:
        return 0
    # NO MV invalidation here: dependent MVs detect the new delta
    # path (MVManager.show staleness) and the next refresh applies
    # the deletion ALGEBRAICALLY (mv/manager._aggregate_deleted)
    if len(table.manifest.load().get("delete_deltas", [])) > _threshold(table):
        horizontal_compact(table, force=True)
    return n


def update_rows_mor(table: Table, set_exprs: dict[str, str],
                    condition: str = "true", predicates=None) -> int:
    """UPDATE t SET col = expr, ... WHERE condition, merge-on-read:
    old row versions join the delete delta, updated rows land in a
    fresh segment — one atomic manifest swap commits both."""
    _check_mor(table)
    from ..catalog.manifest import retry_on_conflict

    def attempt() -> int:
        base = table.manifest.load(_attach=False)["version"]
        scan = table.read(predicates=predicates, with_rowpos=True)
        hits = scan.filter(F.expr(condition)).cache()
        try:
            delta = _write_delta(table, hits)
            if delta is None:
                return 0
            rel, n, files = delta
            fields = table._schema_struct().fields
            updated = hits.select(*[
                F.expr(set_exprs[f.name]).cast(f.dataType).alias(f.name)
                if f.name in set_exprs else F.col(f.name) for f in fields])
            from .dml import _replace_files
            try:
                _replace_files(table, [], updated, "update",
                               extra_mutate=lambda doc: _append_delta(
                                   doc, rel, n, files),
                               base_version=base)
            except BaseException:
                import shutil
                shutil.rmtree(os.path.join(table.table_dir, rel),
                              ignore_errors=True)    # orphaned sidecar
                raise
        finally:
            hits.unpersist()
        return n

    n = retry_on_conflict(attempt)
    if n == 0:
        return 0
    # MVs: the delta path + new segment both feed the incremental
    # refresh; no invalidation needed (see delete_rows_mor)
    if len(table.manifest.load().get("delete_deltas", [])) > _threshold(table):
        horizontal_compact(table, force=True)
    return n


# past this many TOTAL sidecar rows (from manifest counts — no read
# needed to decide) per-file dead counts come from a Spark aggregation
# over the sidecars instead of a driver pyarrow pass: driver memory
# stays O(touched files) (manifest-bounded) instead of O(delta rows),
# which a corpus-wide 10⁹-row DELETE would otherwise make a
# driver-memory event
MAX_DRIVER_DELTA_ROWS = 10_000_000


def _per_file_dead(table: Table, entries: list) -> dict[str, int]:
    """Per-file deleted-row counts across all delta sidecars. Small
    deltas: one driver pyarrow pass (cheaper than a Spark job). Past
    ``MAX_DRIVER_DELTA_ROWS``: a distributed groupBy whose collect is
    one row per TOUCHED FILE, never per delta row. Both paths sum
    duplicates identically (no distinct — matches the count()
    invariant's over-subtraction semantics until horizontal
    compaction dedupes)."""
    total = sum(int(e.get("rows", 0)) for e in entries)
    if total > MAX_DRIVER_DELTA_ROWS:
        dd = table.spark.read.parquet(
            *[table._abs(e["path"]) for e in entries])
        return {r["file"]: int(r["dead"]) for r in
                (dd.groupBy("file")
                 .agg(F.count(F.lit(1)).alias("dead"))).collect()}
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    per_file: dict[str, int] = {}
    for e in entries:
        t = pq.read_table(os.path.join(table.table_dir, e["path"]),
                          columns=["file"])
        vc = pc.value_counts(t.column("file"))
        for item in vc.to_pylist():
            per_file[item["values"]] = (per_file.get(item["values"], 0)
                                        + item["counts"])
    return per_file


def apply_deltas(table: Table, min_fraction: float = 0.3) -> int:
    """Targeted delta application — the policy real merge-on-read
    systems run between horizontal and major compaction: rewrite ONLY
    the files whose deleted-row fraction reached ``min_fraction``
    (their anti-join work is mostly waste by then), drop their delta
    rows, and leave lightly-deleted files alone. Bounds the read
    path's standing delete debt at O(min_fraction) per file without
    ever paying a full MAJOR compaction. Returns the number of files
    rewritten.

    Attribution cost: one pass over the delta sidecars for per-file
    deleted counts — driver pyarrow while the sidecars are small, a
    distributed aggregation past ``MAX_DRIVER_DELTA_ROWS``; executor
    cost: one CoW rewrite of just the chosen files through the
    delta-aware rescan."""
    from ..catalog.manifest import retry_on_conflict

    def attempt() -> int:
        doc = table.manifest.load()
        entries = doc.get("delete_deltas") or []
        if not entries:
            return 0
        per_file = _per_file_dead(table, entries)
        rows_of = {f.path: f.rows
                   for s in table.manifest.queryable_segments()
                   for f in s.files}
        chosen = [p for p, dead in per_file.items()
                  if p in rows_of and rows_of[p] > 0
                  and dead / rows_of[p] >= min_fraction]
        if not chosen:
            return 0
        from .dml import _replace_files, _scan_touched
        n_survivors = sum(rows_of[p] - per_file[p] for p in chosen)
        surviving = (_scan_touched(table, [table._abs(p) for p in chosen])
                     if n_survivors else None)
        _replace_files(table, [table._abs(p) for p in chosen],
                       surviving, "delta_apply",
                       base_version=doc["version"])
        # _replace_files already re-trimmed the deltas (files dropped)
        return len(chosen)

    return retry_on_conflict(attempt)


def horizontal_compact(table: Table, force: bool = False) -> None:
    """Consolidate all delete-delta sidecars into one, dropping rows
    whose file is no longer in a queryable segment (post data
    compaction / DELETE SEGMENT / MERGE rewrite) and duplicates.
    Reference HorizontalCompaction.scala — auto-run after IUD past a
    threshold; ours also restores the count() invariant after any
    file-dropping operation (Table._trim_deltas)."""
    from ..catalog.manifest import retry_on_conflict

    def attempt() -> None:
        doc = table.manifest.load()
        deltas = doc.get("delete_deltas") or []
        if not deltas or (len(deltas) < 2 and not force):
            return
        live = [f.path for s in table.manifest.queryable_segments()
                for f in s.files]
        total_rows = sum(int(d.get("rows", _DRIVER_MERGE_MAX_ROWS))
                         for d in deltas)
        if total_rows <= _DRIVER_MERGE_MAX_ROWS:
            # r12 size-adaptive fast path: the manifest already knows
            # every sidecar's exact row count, so small delta sets
            # (the common case — targeted deletes between
            # compactions) merge DRIVER-SIDE with pyarrow: read,
            # concat, live-filter, dedup, write one sidecar — zero
            # Spark jobs, same artifact. Past the bound the Spark
            # path below keeps memory flat (same gate discipline as
            # Table.read's broadcast-vs-shuffle delta join).
            merged = _driver_merge_deltas(table, deltas, live)
        else:
            dd = (table.spark.read.parquet(
                      *[table._abs(d["path"]) for d in deltas])
                  .distinct())
            live_df = table.spark.createDataFrame(
                [(p,) for p in live], "file string")
            dd = (dd.join(F.broadcast(live_df), "file", "left_semi")
                  .withColumnRenamed("file", "__dd_f")
                  .withColumnRenamed("pos", "__dd_p"))
            merged = _write_delta(table, dd)

        def mutate(d: dict) -> None:
            if merged:
                entry = {"path": merged[0], "rows": merged[1]}
                if merged[2] is not None:
                    entry["files"] = merged[2]
                d["delete_deltas"] = [entry]
            else:
                d.pop("delete_deltas", None)

        try:
            table.manifest.update(mutate, base_version=doc["version"])
        except BaseException:
            if merged:
                import shutil
                shutil.rmtree(os.path.join(table.table_dir, merged[0]),
                              ignore_errors=True)    # orphaned sidecar
            raise

    retry_on_conflict(attempt)
    # superseded sidecars stay on disk for time travel until CLEAN FILES

