"""Copy-on-write UPDATE / DELETE.

The reference implements IUD with delete-delta bitmaps + update deltas
sidecar files and later horizontal compaction
(reference: integration/spark/.../mutation/CarbonProjectForUpdateCommand
.scala:48-59, DeleteExecution.scala:60-144, HorizontalCompaction.scala).

Spark-first design: **copy-on-write** — find the files containing
matching rows via ``input_file_name()`` (the analogue of the
reference's tupleId/getBlockPaths implicit filters,
CarbonEnv.scala:83-85 + CarbonScanRDD.scala:728), rewrite only those
files, and swap the manifest atomically. No deltas → no horizontal
compaction; stale files are removed by CLEAN FILES.

At 100 TB the cost profile: touched-file discovery is a pushed-down
filter scan (manifest min/max prunes first); the rewrite reads and
writes only affected files.
"""

from __future__ import annotations

import os
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog.manifest import Segment, SegmentStatus
from ..catalog.table import Table


def _check_mutable(table: Table) -> None:
    """Reference blocks UPDATE/DELETE on streaming tables
    (StreamingTableStrategy.scala)."""
    if table.manifest.properties().get("streaming"):
        raise ValueError("UPDATE/DELETE not supported on streaming table")


def _norm_file(uri: str) -> str:
    p = urlparse(uri)
    return unquote(p.path) if p.scheme else uri


def _scan_touched(table: Table, touched: list[str]) -> DataFrame:
    """Rescan of the touched files for a CoW rewrite — through the
    FULL read path (``read(only_files=...)``), so the rewrite sees
    era-default fills and rename alignment (a raw parquet rescan
    silently materialized NULL where a pre-evolution file's era
    default applied) and never resurrects merge-on-read deleted
    rows."""
    return table.read(only_files=set(touched))


def read_with_file(table: Table, predicates=None) -> DataFrame:
    """``table.read()`` plus a ``_file`` column holding each row's
    absolute source file path. Plain scans use ``input_file_name()``
    (captured at scan time); a table carrying merge-on-read delete
    deltas has a join in its read plan — where Spark rejects
    input_file_name() — so the path is rebuilt from the rowpos
    metadata column instead."""
    if table.manifest.load().get("delete_deltas"):
        df = table.read(predicates=predicates, with_rowpos=True)
        prefix = os.path.abspath(table.table_dir) + os.sep
        return (df.withColumn("_file", F.concat(F.lit(prefix),
                                                F.col("__dd_f")))
                .drop("__dd_f", "__dd_p"))
    return table.read(predicates=predicates).withColumn(
        "_file", F.input_file_name())


def find_touched_files(table: Table, condition: str,
                       predicates=None) -> list[str]:
    """Files that contain at least one row matching ``condition``.
    Driver collects only file *names* (bounded by file count)."""
    rows = (read_with_file(table, predicates).filter(F.expr(condition))
            .select("_file").distinct().collect())
    return [_norm_file(r["_file"]) for r in rows]


def _replace_files(table: Table, touched_abs: list[str],
                   rewritten: DataFrame | None, source: str,
                   extra_mutate=None,
                   base_version: int | None = None) -> None:
    """Commit protocol shared by UPDATE/DELETE/MERGE: write rewritten
    rows (if any) as a new segment dir, then in ONE manifest swap drop
    the touched file entries and append the new segment.
    ``extra_mutate(doc)`` rides the same swap (the merge-on-read
    UPDATE path commits its delete-delta entry atomically with the
    updated-rows segment). ``base_version`` is the manifest version
    the caller's touched-file/rewrite plan was computed from — the
    commit aborts with ConcurrentModificationError if another writer
    landed in between (the caller recomputes and retries; a slow CoW
    rewrite can never clobber a concurrent commit)."""
    touched = set(touched_abs)

    new_files_info: list = []
    tmp = None
    if rewritten is not None:
        tmp = table._write_segment_files(rewritten)
        import glob
        for p in sorted(glob.glob(os.path.join(tmp, "**", "*"), recursive=True)):
            if os.path.isfile(p) and not os.path.basename(p).startswith(("_", ".")):
                new_files_info.append(os.path.relpath(p, tmp))

    from ..catalog.stats import harvest_file, partition_values_from_relpath

    def mutate(doc: dict) -> None:
        # drop touched files from their segments; record them as orphans
        # so CLEAN FILES can physically remove them later (readers that
        # already planned against the old manifest still see the files)
        for s in doc["segments"]:
            dropped = [f["path"] for f in s["files"]
                       if table._abs(f["path"]) in touched]
            if dropped:
                s["files"] = [f for f in s["files"]
                              if table._abs(f["path"]) not in touched]
                doc.setdefault("orphans", []).extend(dropped)
        doc["segments"] = [s for s in doc["segments"]
                           if s["files"] or s["status"] not in
                           (SegmentStatus.SUCCESS,)]
        if tmp is not None and new_files_info:
            seg_id = table.manifest.next_segment_id(doc)
            seg_dir = os.path.join(table.table_dir, f"segment_{seg_id}")
            os.makedirs(seg_dir, exist_ok=True)
            stats = []
            for rel in new_files_info:
                dst_rel = os.path.join(f"segment_{seg_id}", rel)
                dst = os.path.join(table.table_dir, dst_rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                os.rename(os.path.join(tmp, rel), dst)
                stats.append(harvest_file(dst, dst_rel,
                                          partition_values_from_relpath(rel)))
            import time as _time
            doc["segments"].append(Segment(
                id=seg_id, status=SegmentStatus.SUCCESS, format="parquet",
                files=stats, load_time=_time.time(), source=source).to_json())
        if extra_mutate is not None:
            extra_mutate(doc)

    try:
        table.manifest.update(mutate, base_version=base_version)
    finally:
        if tmp is not None:
            import shutil
            shutil.rmtree(tmp, ignore_errors=True)
    if touched_abs and table.manifest.load().get("delete_deltas"):
        # a rewrite dropped files a merge-on-read delta may reference
        # (MERGE on a mor table) — re-trim to keep count() exact
        table._trim_deltas()


def _is_mor(table: Table) -> bool:
    return str(table.manifest.properties().get(
        "iud.mode", "cow")).lower() == "mor"


def _invalidate_mvs(table: Table) -> None:
    """IUD changes data without necessarily adding a segment, so the
    MV segment-watermark staleness test alone can miss it — force
    every MV stale (reference: IUD sets the MV disabled/stale,
    MVManager status handling) so rewrite falls back to the source
    until the next (full) refresh."""
    from ..mv.manager import MVManager
    MVManager(table).invalidate_all()


def delete_rows(table: Table, condition: str, predicates=None) -> int:
    """DELETE FROM t WHERE condition. Returns deleted row count.
    (reference: parser CarbonSpark2SqlParser.scala:239-257,
    DeleteExecution.scala). Tables with ``'iud.mode'='mor'`` take the
    merge-on-read delta path (operators/mor.py) instead of
    copy-on-write."""
    if _is_mor(table):
        from .mor import delete_rows_mor
        return delete_rows_mor(table, condition, predicates)
    _check_mutable(table)
    from ..catalog.manifest import retry_on_conflict

    def attempt() -> int:
        # base snapshot FIRST: any commit landing after this point is
        # detected at swap time and the whole plan recomputes
        base = table.manifest.load(_attach=False)["version"]
        touched = find_touched_files(table, condition, predicates)
        if not touched:
            return 0
        scan = _scan_touched(table, touched)
        n_before = scan.count()
        keep = scan.filter(~F.expr(condition))
        n_kept = keep.count()
        _replace_files(table, touched, keep if n_kept else None, "delete",
                       base_version=base)
        _invalidate_mvs(table)
        return n_before - n_kept

    return retry_on_conflict(attempt)


def update_rows(table: Table, set_exprs: dict[str, str],
                condition: str = "true", predicates=None) -> int:
    """UPDATE t SET col = expr, ... WHERE condition. Returns updated
    row count. (reference: parser CarbonSpark2SqlParser.scala:259-300,
    CarbonProjectForUpdateCommand). ``'iud.mode'='mor'`` tables take
    the merge-on-read path."""
    if _is_mor(table):
        from .mor import update_rows_mor
        return update_rows_mor(table, set_exprs, condition, predicates)
    _check_mutable(table)
    from ..catalog.manifest import retry_on_conflict

    def attempt() -> int:
        base = table.manifest.load(_attach=False)["version"]
        touched = find_touched_files(table, condition, predicates)
        if not touched:
            return 0
        scan = _scan_touched(table, touched)
        cond = F.expr(condition)
        n_updated = scan.filter(cond).count()
        cols = []
        for name in scan.columns:
            if name in set_exprs:
                cols.append(F.when(cond, F.expr(set_exprs[name]))
                            .otherwise(F.col(name)).alias(name))
            else:
                cols.append(F.col(name))
        _replace_files(table, touched, scan.select(*cols), "update",
                       base_version=base)
        _invalidate_mvs(table)
        return n_updated

    return retry_on_conflict(attempt)
