"""MERGE INTO / UPSERT — the CDC/SCD operator.

Mirrors the reference's programmatic builder
(reference: integration/spark/.../merge/MergeDataSetBuilder.scala:39-127,
interfaces.scala:30-89 — WhenMatched/WhenNotMatched/
WhenNotMatchedAndExistsOnlyOnTarget + update/delete/insert actions,
CarbonMergeDataSetCommand.scala:85-215) and its keyed shorthand
(CarbonSession.scala:288-318 upsert/update/delete/insert).

Execution follows the target's 'iud.mode': copy-on-write (default,
operators/dml.py commit protocol) or merge-on-read ('mor' tables —
mutated rows join the delete delta, updated+inserted rows land in
one fresh segment, no file is rewritten; the reference's actual CDC
shape, DeleteExecution + insert). Copy-on-write:

1. Touched-file discovery: semi-join the target scan against the
   source on the merge condition — only files holding matched rows are
   rewritten (the analogue of the reference's CDC block pruning,
   CarbonMergeDataSetCommand.scala:215).
2. Rewrite: left-join touched-file rows with source, evaluate match
   clauses as a ``when()`` cascade (first matching clause wins —
   MergeProjection.scala semantics), apply update/delete.
3. Inserts: source anti-join target appended to the same new segment.
4. One atomic manifest swap.

Scale notes: the expensive join is keyed and AQE-planned; the
reference's "repartition source by target bucket columns"
(L173-182) corresponds to Spark hashing both sides on the join key.
A full-outer join is never needed — matched paths use inner/left,
insert paths use left_anti, as the reference does for keyed ops
(L144-158).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..catalog.table import Table
from .dml import _check_mutable, _norm_file, _replace_files


@dataclass
class _Action:
    kind: str                                  # update | delete | insert
    condition: Column | None
    assignments: dict[str, Column] | None = None


@dataclass
class MergeStats:
    updated: int = 0
    deleted: int = 0
    inserted: int = 0


class _ClauseBuilder:
    def __init__(self, parent: "MergeBuilder", bucket: str,
                 condition: Column | None):
        self._p = parent
        self._bucket = bucket
        self._cond = condition

    def update_expr(self, assignments: dict[str, str | Column]) -> "MergeBuilder":
        a = {k: (F.expr(v) if isinstance(v, str) else v)
             for k, v in assignments.items()}
        getattr(self._p, self._bucket).append(_Action("update", self._cond, a))
        return self._p

    def update_all(self) -> "MergeBuilder":
        a = {c: F.col(f"src.{c}") for c in self._p.source.columns
             if c in self._p.target_columns}
        getattr(self._p, self._bucket).append(_Action("update", self._cond, a))
        return self._p

    def delete(self) -> "MergeBuilder":
        getattr(self._p, self._bucket).append(_Action("delete", self._cond))
        return self._p

    def insert_expr(self, assignments: dict[str, str | Column]) -> "MergeBuilder":
        a = {k: (F.expr(v) if isinstance(v, str) else v)
             for k, v in assignments.items()}
        getattr(self._p, self._bucket).append(_Action("insert", self._cond, a))
        return self._p

    def insert_all(self) -> "MergeBuilder":
        a = {c: F.col(f"src.{c}") for c in self._p.target_columns
             if c in self._p.source.columns}
        getattr(self._p, self._bucket).append(_Action("insert", self._cond, a))
        return self._p


class MergeBuilder:
    """``merge(target, source, condition).when_matched()...execute()``"""

    def __init__(self, target: Table, source: DataFrame,
                 condition: str | Column, key_hint: str | None = None):
        _check_mutable(target)
        self.target = target
        self.source = source
        self.condition = F.expr(condition) if isinstance(condition, str) else condition
        self.matched: list[_Action] = []
        self.not_matched: list[_Action] = []
        self.not_matched_by_source: list[_Action] = []
        self.target_columns = target.read().columns
        self._history: tuple[Table, dict[str, Column]] | None = None
        # equi-key merges can pre-prune the matched-file scan with the
        # source's key min/max (reference CarbonMergeDataSetCommand
        # CDC block pruning, :215): target files whose key range can't
        # intersect the source never get read, let alone rewritten
        self.key_hint = key_hint

    # -- clause surface (reference MergeDataSetBuilder.scala) --------------

    def when_matched(self, condition: str | Column | None = None) -> _ClauseBuilder:
        c = F.expr(condition) if isinstance(condition, str) else condition
        return _ClauseBuilder(self, "matched", c)

    def when_not_matched(self, condition: str | Column | None = None) -> _ClauseBuilder:
        c = F.expr(condition) if isinstance(condition, str) else condition
        return _ClauseBuilder(self, "not_matched", c)

    def when_not_matched_and_exists_only_on_target(
            self, condition: str | Column | None = None) -> _ClauseBuilder:
        c = F.expr(condition) if isinstance(condition, str) else condition
        return _ClauseBuilder(self, "not_matched_by_source", c)

    def insert_history_table(self, history: Table,
                             extra: dict[str, Column] | None = None) -> "MergeBuilder":
        """SCD2-style: write pre-image of updated/deleted rows to a
        history table (reference InsertInHistoryTableAction,
        interfaces.scala:84, HistoryTableLoadHelper.scala)."""
        self._history = (history, extra or {})
        return self

    # -- execution ---------------------------------------------------------

    def execute(self) -> MergeStats:
        from ..catalog.manifest import retry_on_conflict
        from .dml import _is_mor
        if _is_mor(self.target):
            return retry_on_conflict(self._execute_mor)
        return retry_on_conflict(self._execute_cow)

    # -- shared clause machinery ------------------------------------------

    def _action_expr(self) -> Column:
        """First-matching-clause-wins action id (MergeProjection.scala
        semantics): m<i> = i-th matched clause, t<i> = i-th
        not-matched-by-source clause, else 'keep'."""
        is_matched = F.col("src._src_exists").isNotNull()
        cases = []
        for i, a in enumerate(self.matched):
            cond = is_matched & (a.condition if a.condition is not None else F.lit(True))
            cases.append((cond, F.lit(f"m{i}")))
        for i, a in enumerate(self.not_matched_by_source):
            cond = (~is_matched) & (a.condition if a.condition is not None else F.lit(True))
            cases.append((cond, F.lit(f"t{i}")))
        expr = None
        for cond, tag in cases:
            expr = F.when(cond, tag) if expr is None else expr.when(cond, tag)
        return expr.otherwise(F.lit("keep")) if expr is not None else F.lit("keep")

    def _guard_count_history(self, joined, stats: MergeStats) -> dict:
        """Duplicate-source guard, per-clause stats, SCD2 history
        pre-image — identical for both execution modes. Returns the
        per-action row counts."""
        dup = (joined.filter(F.col("_action").startswith("m"))
               .groupBy(*[F.col(f"tgt.{c}") for c in self.target_columns])
               .agg(F.count(F.lit(1)).alias("n")).filter("n > 1").limit(1).count())
        if dup:
            raise ValueError(
                "MERGE: multiple source rows match a single target row "
                "(dedupe the source on the join key)")

        counts = {r["_action"]: r["n"] for r in
                  joined.groupBy("_action").agg(F.count(F.lit(1)).alias("n")).collect()}
        for i, a in enumerate(self.matched):
            n = counts.get(f"m{i}", 0)
            if a.kind == "update":
                stats.updated += n
            else:
                stats.deleted += n
        for i, a in enumerate(self.not_matched_by_source):
            n = counts.get(f"t{i}", 0)
            if a.kind == "delete":
                stats.deleted += n
            elif a.kind == "update":
                stats.updated += n

        if self._history is not None:
            hist, extra = self._history
            pre = (joined.filter(F.col("_action") != "keep")
                   .select(*[F.col(f"tgt.{c}").alias(c) for c in self.target_columns])
                   .withColumn("operation_ts", F.lit(time.time()))
                   )
            for k, v in extra.items():
                pre = pre.withColumn(k, v)
            hist.insert(pre, source="merge_history")
        return counts

    def _out_cols(self) -> list[Column]:
        """Target columns with update assignments applied per action."""
        out_cols = []
        for cname in self.target_columns:
            col = F.col(f"tgt.{cname}")
            for i, a in enumerate(self.matched):
                if a.kind == "update" and cname in a.assignments:
                    col = F.when(F.col("_action") == f"m{i}",
                                 a.assignments[cname]).otherwise(col)
            for i, a in enumerate(self.not_matched_by_source):
                if a.kind == "update" and a.assignments and cname in a.assignments:
                    col = F.when(F.col("_action") == f"t{i}",
                                 a.assignments[cname]).otherwise(col)
            out_cols.append(col.alias(cname))
        return out_cols

    def _delete_tags(self) -> list[str]:
        tags = [f"m{i}" for i, a in enumerate(self.matched) if a.kind == "delete"]
        tags += [f"t{i}" for i, a in enumerate(self.not_matched_by_source)
                 if a.kind == "delete"]
        return tags

    def _insert_rows(self, src, tgt_all, stats: MergeStats):
        """Source rows with no target match, projected to the target
        schema per insert clause."""
        inserts = None
        if self.not_matched:
            only_src = src.join(tgt_all, self.condition, "left_anti")
            types = dict(zip(tgt_all.columns,
                             [f.dataType for f in tgt_all.schema]))
            for a in self.not_matched:
                rows = only_src.filter(a.condition) if a.condition is not None else only_src
                if a.kind != "insert":
                    continue
                proj = rows.select(*[
                    (a.assignments[c] if c in a.assignments
                     else F.lit(None)).cast(types[c]).alias(c)
                    for c in self.target_columns])
                inserts = proj if inserts is None else inserts.unionByName(proj)
                stats.inserted += rows.count()
        return inserts

    def _source_key_preds(self, src):
        """Equi-key merges pre-prune the target scan with the source
        key min/max (reference CDC block pruning, :215) — sound only
        when no clause targets unmatched TARGET rows."""
        if not self.key_hint or self.not_matched_by_source:
            return None
        mm = src.agg(F.min(self.key_hint).alias("lo"),
                     F.max(self.key_hint).alias("hi")).first()
        if mm["lo"] is None:
            return None
        return [(self.key_hint, "between", (mm["lo"], mm["hi"]))]

    # -- copy-on-write execution ------------------------------------------

    def _execute_cow(self) -> MergeStats:
        spark = self.target.spark
        # optimistic-concurrency base: the touched-file plan below is
        # computed from this snapshot; the commit verifies it
        base = self.target.manifest.load(_attach=False)["version"]
        # explicit existence marker — robust even if all source columns
        # are NULL for a row
        src = self.source.withColumn("_src_exists", F.lit(1)).alias("src")
        stats = MergeStats()

        # 1. touched files: which target files contain matched rows
        tgt_all = self.target.read().alias("tgt")
        need_match_scan = bool(self.matched) or bool(self.not_matched_by_source)
        touched: list[str] = []
        if need_match_scan:
            from .dml import read_with_file
            if self.not_matched_by_source:
                # clauses keyed on target-only rows can touch any file
                touched = sorted({
                    _norm_file(r["_file"]) for r in
                    read_with_file(self.target)
                    .select("_file").distinct().collect()})
            else:
                # capture file name at scan time — input_file_name() is
                # empty when evaluated above a join
                preds = self._source_key_preds(src)
                tgt_f = read_with_file(self.target, preds).alias("tgt")
                touched = sorted({
                    _norm_file(r["_file"]) for r in
                    (tgt_f.join(src, self.condition, "left_semi")
                     .select("_file").distinct().collect())})

        rewritten = None
        if touched:
            from .dml import _scan_touched
            scan = _scan_touched(self.target, touched).alias("tgt")
            joined = scan.join(src, self.condition, "left").cache()
            joined = joined.withColumn("_action", self._action_expr())
            self._guard_count_history(joined, stats)
            delete_tags = self._delete_tags()
            # surviving rows of the touched files with updates applied
            rewritten = (joined.filter(~F.col("_action").isin(delete_tags)
                                       if delete_tags else F.lit(True))
                         .select(*self._out_cols()))

        inserts = self._insert_rows(src, tgt_all, stats)

        # 3. commit
        if touched or inserts is not None:
            new_data = rewritten
            if inserts is not None:
                new_data = inserts if new_data is None else new_data.unionByName(inserts)
            _replace_files(self.target, touched, new_data, "merge",
                           base_version=base)
            if touched:
                # data changed in place — incremental MV state is void
                from .dml import _invalidate_mvs
                _invalidate_mvs(self.target)
        return stats

    # -- merge-on-read execution ------------------------------------------

    def _execute_mor(self) -> MergeStats:
        """MERGE on an 'iud.mode'='mor' table — the reference's CDC
        apply shape (DeleteExecution + insert, no file rewrite):
        every mutated target row (update or delete action) joins the
        delete delta by (file, row position); updated versions and
        insert-clause rows land together in ONE fresh segment; a
        single manifest swap commits delta + segment atomically.
        Untouched rows of touched files are never rewritten — the
        upsert cost is O(mutated + inserted rows), not O(touched
        files), which is the difference between a CDC stream you can
        afford at 100 TB and one you cannot."""
        from .mor import _append_delta, _threshold, _write_delta, horizontal_compact
        base = self.target.manifest.load(_attach=False)["version"]
        src = self.source.withColumn("_src_exists", F.lit(1)).alias("src")
        stats = MergeStats()
        tgt_all = self.target.read().alias("tgt")
        new_data = None
        delta = None
        cleanup = None
        if self.matched or self.not_matched_by_source:
            preds = self._source_key_preds(src)
            tgt = self.target.read(predicates=preds,
                                   with_rowpos=True).alias("tgt")
            joined = (tgt.join(src, self.condition, "left")
                      .withColumn("_action", self._action_expr()).cache())
            cleanup = joined   # cache lives until after the commit —
            # new_data is consumed by _replace_files below
            counts = self._guard_count_history(joined, stats)
            mutated = joined.filter(F.col("_action") != "keep")
            delta = _write_delta(self.target, mutated.select(
                F.col("tgt.__dd_f").alias("__dd_f"),
                F.col("tgt.__dd_p").alias("__dd_p")))
            delete_tags = self._delete_tags()
            n_upd = sum(n for tag, n in counts.items()
                        if tag != "keep" and tag not in delete_tags)
            if delta is not None and n_upd:
                new_data = (mutated.filter(
                    ~F.col("_action").isin(delete_tags)
                    if delete_tags else F.lit(True))
                    .select(*self._out_cols()))

        inserts = self._insert_rows(src, tgt_all, stats)
        if inserts is not None:
            new_data = (inserts if new_data is None
                        else new_data.unionByName(inserts))

        if new_data is not None or delta is not None:
            extra = ((lambda doc: _append_delta(doc, *delta))
                     if delta is not None else None)
            try:
                _replace_files(self.target, [], new_data, "merge",
                               extra_mutate=extra, base_version=base)
            except BaseException:
                if delta is not None:
                    import os as _os
                    import shutil as _shutil
                    _shutil.rmtree(
                        _os.path.join(self.target.table_dir, delta[0]),
                        ignore_errors=True)    # orphaned sidecar
                if cleanup is not None:
                    cleanup.unpersist()
                raise
            if (len(self.target.manifest.load().get("delete_deltas", []))
                    > _threshold(self.target)):
                horizontal_compact(self.target, force=True)
        if cleanup is not None:
            cleanup.unpersist()
        return stats


def merge(target: Table, source: DataFrame, condition: str | Column,
          key_hint: str | None = None) -> MergeBuilder:
    return MergeBuilder(target, source, condition, key_hint)


# -- keyed shorthand (reference CarbonSession.scala:288-318) ---------------

def _keyed(target: Table, source: DataFrame, key: str) -> MergeBuilder:
    return merge(target, source.dropDuplicates([key]),
                 f"tgt.{key} = src.{key}", key_hint=key)


def upsert(target: Table, source: DataFrame, key: str) -> MergeStats:
    return (_keyed(target, source, key)
            .when_matched().update_all()
            .when_not_matched().insert_all()
            .execute())


def update(target: Table, source: DataFrame, key: str) -> MergeStats:
    return (_keyed(target, source, key)
            .when_matched().update_all()
            .execute())


def delete(target: Table, source: DataFrame, key: str) -> MergeStats:
    return (_keyed(target, source, key)
            .when_matched().delete()
            .execute())


def insert(target: Table, source: DataFrame, key: str) -> MergeStats:
    return (_keyed(target, source, key)
            .when_not_matched().insert_all()
            .execute())
