"""MERGE INTO / UPSERT — the CDC/SCD operator.

Mirrors the reference's programmatic builder
(reference: integration/spark/.../merge/MergeDataSetBuilder.scala:39-127,
interfaces.scala:30-89 — WhenMatched/WhenNotMatched/
WhenNotMatchedAndExistsOnlyOnTarget + update/delete/insert actions,
CarbonMergeDataSetCommand.scala:85-215) and its keyed shorthand
(CarbonSession.scala:288-318 upsert/update/delete/insert).

Execution is copy-on-write (operators/dml.py commit protocol):

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
        spark = self.target.spark
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
                preds = None
                if self.key_hint:
                    mm = src.agg(
                        F.min(self.key_hint).alias("lo"),
                        F.max(self.key_hint).alias("hi")).first()
                    if mm["lo"] is not None:
                        preds = [(self.key_hint, "between",
                                  (mm["lo"], mm["hi"]))]
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

            is_matched = F.col("src._src_exists").isNotNull()

            # first-matching-clause-wins action id
            action = F.lit(None).cast("string")
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
            action = expr.otherwise(F.lit("keep")) if expr is not None else F.lit("keep")
            joined = joined.withColumn("_action", action)

            # duplicate-source guard: a target row must match ≤ 1 source row
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
                if a.kind == "delete":
                    stats.deleted += counts.get(f"t{i}", 0)

            # history pre-image of mutated rows
            if self._history is not None:
                hist, extra = self._history
                pre = (joined.filter(F.col("_action") != "keep")
                       .select(*[F.col(f"tgt.{c}").alias(c) for c in self.target_columns])
                       .withColumn("operation_ts", F.lit(time.time()))
                       )
                for k, v in extra.items():
                    pre = pre.withColumn(k, v)
                hist.insert(pre, source="merge_history")

            # build surviving rows with updates applied
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
            delete_tags = [f"m{i}" for i, a in enumerate(self.matched) if a.kind == "delete"]
            delete_tags += [f"t{i}" for i, a in enumerate(self.not_matched_by_source)
                            if a.kind == "delete"]
            rewritten = (joined.filter(~F.col("_action").isin(delete_tags)
                                       if delete_tags else F.lit(True))
                         .select(*out_cols))

        # 2. inserts (source rows with no target match)
        inserts = None
        if self.not_matched:
            only_src = src.join(tgt_all, self.condition, "left_anti")
            for a in self.not_matched:
                rows = only_src.filter(a.condition) if a.condition is not None else only_src
                if a.kind != "insert":
                    continue
                proj = rows.select(*[
                    (a.assignments[c] if c in a.assignments
                     else F.lit(None)).cast(dict(zip(tgt_all.columns,
                                                     [f.dataType for f in tgt_all.schema]))[c])
                    .alias(c)
                    for c in self.target_columns])
                inserts = proj if inserts is None else inserts.unionByName(proj)
                stats.inserted += rows.count()

        # 3. commit
        if touched or inserts is not None:
            new_data = rewritten
            if inserts is not None:
                new_data = inserts if new_data is None else new_data.unionByName(inserts)
            _replace_files(self.target, touched, new_data, "merge")
            if touched:
                # data changed in place — incremental MV state is void
                from .dml import _invalidate_mvs
                _invalidate_mvs(self.target)
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
