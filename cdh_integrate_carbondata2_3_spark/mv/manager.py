"""Materialized views with automatic query rewrite.

Reference parity (SURVEY.md §2.12, §4.1):
- CREATE/DROP/SHOW/REFRESH MATERIALIZED VIEW
  (integration/spark/.../command/view/CarbonCreateMVCommand.scala,
  CarbonRefreshMVCommand.scala)
- SPJG subsumption rewrite incl. GROUP BY rollup re-aggregation
  (mv/plan Modularizer/MVMatcher — ours is a spec matcher, scope
  deliberately bounded: fall back to direct execution on any doubt,
  as the reference does — MVRewriteRule.scala:56-67)
- AVG decomposed to SUM/COUNT for incremental correctness
  (MVRefresher.scala:194)
- timeseries granularity rollup (timeseries(col,'hour') →
  date_trunc; MVTimeGranularity.scala:25-35)
- incremental refresh by source-segment watermark: only segments
  loaded after the last refresh are scanned (MVRefresher.scala:61-200)

An MV is a segment-managed Table under ``<source>/_meta/mvs/<name>``
plus a spec JSON. Query entry is :meth:`MVManager.answer` — give it a
:class:`QuerySpec`; it answers from the best fresh MV or falls back to
the source scan.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..catalog.table import Table
from ..functions.timeseries import timeseries_bucket

# granularities that nest (rollup allowed along this chain; 'week'
# intentionally excluded — it doesn't nest in month/year)
_GRAN_CHAIN = ["second", "minute", "five_minute", "ten_minute",
               "fifteen_minute", "thirty_minute", "hour", "day",
               "month", "year"]

_SUPPORTED = {"sum", "count", "min", "max", "avg"}


@dataclass(frozen=True)
class AggSpec:
    fn: str                 # sum | count | min | max | avg
    col: str                # column name ('*' for count)

    def key(self) -> str:
        return f"{self.fn}_{self.col if self.col != '*' else 'all'}"


@dataclass
class QuerySpec:
    """A SPJG aggregate query over one table: optional filter (SQL
    string), group columns, aggregations {out_alias: AggSpec}, and an
    optional timeseries bucket (ts_col, granularity) added to the
    grouping. ``joins`` extends the shape to a star/snowflake of
    inner equi-joins off the fact table (the reference MVMatcher's
    join scope): each entry is ``(dim_table, fact_key, dim_key)``
    where ``fact_key`` is a column of the accumulated join tree and
    ``dim_key`` one of ``dim_table``; group/agg/filter columns may
    then reference dimension columns."""
    group_cols: list[str]
    aggs: dict[str, AggSpec]
    filter: str | None = None
    timeseries: tuple[str, str] | None = None
    ts_alias: str = "ts_bucket"
    joins: list[tuple["Table", str, str]] | None = None


@dataclass
class MVMeta:
    name: str
    group_cols: list[str]
    aggs: list[AggSpec]
    filter: str | None
    timeseries: list | None
    watermark: int
    deferred: bool = False
    # merge-on-read delete-delta sidecar paths already reflected in
    # the MV (incremental-view-maintenance state); a mismatch with
    # the source's current delta list marks the MV stale
    deltas: list | None = None
    # star/snowflake join spec: [[dim_table_dir, fact_key, dim_key]]
    # (dims addressed by table_dir so ``answer``/``refresh`` can
    # reopen them without an engine-level resolver)
    joins: list | None = None
    # {dim_table_dir: manifest fingerprint at (last) refresh} — any
    # dim mutation (load/IUD/compaction that changes visible rows)
    # changes the fingerprint and marks the MV stale; incremental
    # fact-side refresh is only sound while dims are unchanged
    dim_state: dict | None = None
    # dim table_dirs certified FK-LIKE at the last refresh (dim key
    # unique + join tree preserves the fact row count ⇒ every fact
    # row matched exactly one row of EVERY dim): a query joining only
    # a SUBSET of the MV's dims may then be answered from the MV
    # (reference MVMatcher join-arity subsumption). Currency is free:
    # dims changed since refresh ⇒ dim_state mismatch ⇒ MV stale ⇒
    # never consulted.
    fk_dims: list | None = None

    def to_json(self) -> dict:
        return {"name": self.name, "group_cols": self.group_cols,
                "aggs": [[a.fn, a.col] for a in self.aggs],
                "filter": self.filter, "timeseries": self.timeseries,
                "watermark": self.watermark, "deferred": self.deferred,
                "deltas": self.deltas, "joins": self.joins,
                "dim_state": self.dim_state, "fk_dims": self.fk_dims}

    @staticmethod
    def from_json(d: dict) -> "MVMeta":
        return MVMeta(d["name"], d["group_cols"],
                      [AggSpec(f, c) for f, c in d["aggs"]],
                      d["filter"], d.get("timeseries"), d["watermark"],
                      d.get("deferred", False), d.get("deltas"),
                      d.get("joins"), d.get("dim_state"),
                      d.get("fk_dims"))


def _canon_filter(f: str | None) -> str | None:
    return " ".join(f.lower().split()) if f else None


# fingerprint memo keyed by the manifest file's (mtime_ns, size,
# version counter): once a table has a join MV, every SPJG query
# re-fingerprints the joined dims on answer() — with the memo an
# unchanged dim costs one stat() + 64-byte prefix read instead of a
# manifest JSON load + sort. (mtime, size) alone is racy — two swaps
# of identical size within one mtime tick would serve a stale
# fingerprint and answer queries from a silently-stale MV — so the
# monotonic version counter (bumped on every manifest update) is
# folded in; an unreadable token disables caching for that stat.
_FP_CACHE: dict[str, tuple[tuple, str]] = {}


def _table_fingerprint(t: Table) -> str:
    """Stable digest of a table's VISIBLE state: queryable segment
    ids + file paths + merge-on-read delete-delta paths. Any load,
    IUD, restore, or compaction that changes what a scan returns
    changes the fingerprint (a pure metadata no-op like SHOW does
    not). Memoized on the manifest file's stat+version signature."""
    import hashlib

    from ..catalog.manifest import version_token
    sp = t.manifest.status_path
    try:
        st = os.stat(sp)
        ver = version_token(sp)
        sig = (st.st_mtime_ns, st.st_size, ver) if ver is not None else None
    except OSError:
        sig = None
    if sig is not None:
        hit = _FP_CACHE.get(sp)
        if hit is not None and hit[0] == sig:
            return hit[1]
    doc = t.manifest.load()
    segs = sorted((s.id, tuple(sorted(f.path for f in s.files)))
                  for s in t.manifest.queryable_segments())
    deltas = sorted(d["path"] for d in doc.get("delete_deltas", []))
    fp = hashlib.md5(repr((segs, deltas)).encode()).hexdigest()
    if sig is not None:
        _FP_CACHE[sp] = (sig, fp)
    return fp


# above this many dim rows the uniqueness probe goes through Spark
# (a dim that can't be read driver-side in one gulp shouldn't be)
_DRIVER_DIM_ROWS = 5_000_000


def _dim_key_unique_driver(d: Table, dk: str) -> bool | None:
    """Driver-side dim-key uniqueness probe: read ONLY the key column
    of a broadcast-scale dim with pyarrow and compare distinct vs
    non-null counts — no Spark job (~30 ms for a 150k-row dim vs a
    ~0.4 s cluster round-trip, the dominant FK-certificate cost at
    gate scale). Returns None when the dim can't be answered here —
    merge-on-read deltas pending (row positions matter), schema
    evolution eras (the key may be era-defaulted), non-parquet
    segments, partition-column keys (not in the footer), or a dim too
    big to slurp — and the caller falls back to one Spark job."""
    try:
        doc = d.manifest.load(_attach=False)
        if (doc.get("delete_deltas") or doc.get("schema_evolved")
                or doc.get("column_renames")):
            return None
        segs = d.manifest.queryable_segments()
        if any(s.format != "parquet" or s.external_path for s in segs):
            return None
        if sum(f.rows for s in segs for f in s.files) > _DRIVER_DIM_ROWS:
            return None
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        chunks = []
        for s in segs:
            for f in s.files:
                t = pq.read_table(d._abs(f.path), columns=[dk])
                chunks.extend(t.column(0).chunks)
        if not chunks:
            return True
        arr = pa.chunked_array(chunks)
        nn = len(arr) - arr.null_count
        nd = pc.count_distinct(arr.drop_null()).as_py()
        return nn == nd
    except Exception:
        return None     # any surprise → the exact Spark path decides


def _canon_joins(joins) -> list[list[str]]:
    """Canonical join spec — (dim table_dir, fact_key, dim_key)
    triples, order-insensitive (inner equi-joins commute)."""
    out = []
    for dim, fk, dk in joins or []:
        d = dim.table_dir if isinstance(dim, Table) else dim
        out.append([os.path.normpath(d), fk, dk])
    return sorted(out)


def _apply_joins(df: DataFrame, joins: list[tuple[Table, str, str]]
                 ) -> DataFrame:
    """Inner equi-join the dims onto the accumulated tree. The dim
    key is renamed to the fact key and joined USING, so exactly one
    key column survives and Catalyst sees a plain equi-join it can
    broadcast (small dims) or shuffle (large) on its own.

    Joins apply in DEPENDENCY order, not list order: a snowflake
    dim keyed on another dim's column (its fact_key only exists
    after that dim joins) waits until its key is present — the
    canonical spec is sorted for matching, which would otherwise
    break chains whose sorted order precedes their dependency."""
    pending = list(joins)
    while pending:
        ready = [j for j in pending if j[1] in df.columns]
        if not ready:
            missing = [(t.table_dir, fk, dk) for t, fk, dk in pending]
            raise ValueError(
                f"join MV: no pending join's fact_key exists in the "
                f"accumulated tree — unresolvable chain {missing}")
        for dim_t, fk, dk in ready:
            d = dim_t.read()
            if dk != fk:
                if fk in d.columns:
                    raise ValueError(
                        f"join MV: dim table already has a column named "
                        f"{fk!r}; cannot rename its key {dk!r} onto it")
                d = d.withColumnRenamed(dk, fk)
            df = df.join(d, on=fk)
            pending.remove((dim_t, fk, dk))
    return df


class MVManager:
    def __init__(self, source: Table):
        self.source = source
        self.mv_root = os.path.join(source.table_dir, "_meta", "mvs")

    # ------------------------------------------------------------------ DDL

    def create(self, name: str, group_cols: list[str],
               aggs: list[AggSpec], filter: str | None = None,
               timeseries: tuple[str, str] | None = None,
               deferred: bool = False,
               joins: list[tuple[Table, str, str]] | None = None) -> None:
        """CREATE MATERIALIZED VIEW [WITH DEFERRED REFRESH]. ``joins``
        extends the MV to a star/snowflake SPJG over inner equi-joins
        (reference MVMatcher join scope): each (dim_table, fact_key,
        dim_key) joins a dimension onto the fact; group/agg/filter
        columns may reference dim columns. The MV stays anchored to
        the FACT table (stored under its ``_meta/mvs``); dim state is
        fingerprinted so any dim mutation marks the MV stale."""
        if os.path.exists(self._meta_path(name)):
            raise FileExistsError(f"MV {name} exists")
        for a in aggs:
            if a.fn not in _SUPPORTED:
                raise ValueError(f"unsupported agg {a.fn}")
        if timeseries and timeseries[1] not in _GRAN_CHAIN + ["week"]:
            raise ValueError(f"unsupported granularity {timeseries[1]}")
        os.makedirs(self.mv_root, exist_ok=True)
        meta = MVMeta(name, group_cols, self._storage_aggs(aggs),
                      _canon_filter(filter), list(timeseries) if timeseries else None,
                      watermark=-1, deferred=deferred,
                      joins=_canon_joins(joins) or None)
        self._save(meta)
        if not deferred:
            self.refresh(name)

    def _join_tables(self, meta: MVMeta) -> list[tuple[Table, str, str]]:
        return [(Table.open(self.source.spark, d), fk, dk)
                for d, fk, dk in (meta.joins or [])]

    def has_mvs(self) -> bool:
        """Cheap existence probe (directory listing only) — the
        per-query rewrite guard, so tables WITHOUT MVs never pay
        manifest reads or dim fingerprints on the SQL hot path."""
        if not os.path.isdir(self.mv_root):
            return False
        return any(f.endswith(".json") and not f.endswith(".json.tmp")
                   for f in os.listdir(self.mv_root))

    def _dim_state_now(self, meta: MVMeta,
                       memo: dict[str, str] | None = None) -> dict[str, str]:
        """Fingerprint each joined dim's visible state. A dim whose
        table no longer exists (dropped/moved) fingerprints as
        '<missing>' — never raises, so the MV just reads as STALE
        (skipped by the rewrite) instead of crashing every SPJG
        query and SHOW MATERIALIZED VIEWS on the fact table.
        ``memo`` (dir → fingerprint) dedups work across the MVs of
        one show() pass when they share dims."""
        out: dict[str, str] = {}
        for d, _fk, _dk in (meta.joins or []):
            if memo is not None and d in memo:
                out[d] = memo[d]
                continue
            try:
                fp = _table_fingerprint(Table.open(self.source.spark, d))
            except Exception:
                fp = "<missing>"
            if memo is not None:
                memo[d] = fp
            out[d] = fp
        return out

    @staticmethod
    def _storage_aggs(aggs: list[AggSpec]) -> list[AggSpec]:
        """Decompose AVG into SUM+COUNT, always keep count(*)
        (reference MVRefresher.scala:194)."""
        out: set[AggSpec] = set()
        for a in aggs:
            if a.fn == "avg":
                out.add(AggSpec("sum", a.col))
                out.add(AggSpec("count", a.col))
            else:
                out.add(a)
        out.add(AggSpec("count", "*"))
        return sorted(out, key=lambda a: a.key())

    def drop(self, name: str) -> None:
        if os.path.exists(self._meta_path(name)):
            os.unlink(self._meta_path(name))
        shutil.rmtree(os.path.join(self.mv_root, name), ignore_errors=True)

    def show(self) -> list[dict]:
        out = []
        if not os.path.isdir(self.mv_root):
            return out
        src_wm = self._source_watermark()
        src_deltas = self._source_delta_paths()
        dim_memo: dict[str, str] = {}
        for f in sorted(os.listdir(self.mv_root)):
            if not f.endswith(".json") or f.endswith(".json.tmp"):
                continue
            with open(os.path.join(self.mv_root, f)) as fh:
                m = json.load(fh)
            # stale when segments advanced OR the source's
            # merge-on-read delete-delta set differs from what this
            # MV has applied (incremental-view-maintenance state)
            # OR any joined dimension's visible state changed since
            # the last refresh (join MVs; a DROPPED dim fingerprints
            # '<missing>' → stale, never an exception)
            stale = (m["watermark"] < src_wm
                     or set(m.get("deltas") or []) != src_deltas)
            if not stale and m.get("joins"):
                meta = MVMeta.from_json(m)
                stale = (self._dim_state_now(meta, dim_memo)
                         != (m.get("dim_state") or {}))
            m["stale"] = stale
            out.append(m)
        return out

    def _source_delta_paths(self) -> set[str]:
        return {d["path"] for d in
                self.source.manifest.load().get("delete_deltas", [])}

    # -------------------------------------------------------------- refresh

    def invalidate_all(self) -> None:
        """IUD on the source table invalidates every MV's incremental
        state: watermark drops to -1, so ``show()`` reports stale (the
        rewrite path skips it) and the next refresh is forced FULL.
        Reference behavior: IUD disables/marks-stale dependent MVs
        until refresh."""
        if not os.path.isdir(self.mv_root):
            return
        for f in os.listdir(self.mv_root):
            if f.endswith(".json"):
                meta = self._load(f[:-5])
                if meta.watermark >= 0:
                    meta.watermark = -1
                    self._save(meta)

    def refresh(self, name: str, incremental: bool = True) -> None:
        """REFRESH MATERIALIZED VIEW. Incremental maintenance:

        - segments loaded since the watermark are aggregated and
          merged by re-aggregation (valid because storage aggs are
          decomposed);
        - merge-on-read DELETEs are applied ALGEBRAICALLY: the delta
          sidecars not yet reflected identify exactly the deleted
          rows, whose (filtered, bucketed) negative partial
          aggregates merge the same way — classic incremental view
          maintenance (Gupta & Mumick; counting algorithm), possible
          precisely because sum/count are self-inverse and count(*)
          is always stored (zero-count groups drop after the merge).

        Falls back to a FULL rebuild when: the MV stores min/max
        (deletion not subtractable), the source schema evolved
        (resurrected delta rows read raw file eras), horizontal
        compaction rewrote delta history (applied paths no longer
        present), or the watermark was invalidated by a CoW rewrite."""
        meta = self._load(name)
        src_wm = self._source_watermark()
        src_doc = self.source.manifest.load()
        cur_deltas = {d["path"]: d for d in src_doc.get("delete_deltas", [])}
        applied = set(meta.deltas or [])
        new_delta_paths = [p for p in cur_deltas if p not in applied]
        mv_dir = os.path.join(self.mv_root, name)
        mv_exists = os.path.exists(os.path.join(mv_dir, "_meta", "tablestatus.json"))

        dim_state_now = self._dim_state_now(meta)
        full = (not incremental or not mv_exists or meta.watermark < 0
                # delta history rewritten (horizontal compaction /
                # trim) — per-row attribution of the merged sidecar
                # to "already applied" vs "new" is lost
                or bool(applied - set(cur_deltas))
                # a joined dimension changed: rows the MV already
                # reflects joined against the OLD dim state, so
                # fact-side increments can't reconcile them
                or dim_state_now != (meta.dim_state or {})
                or (new_delta_paths and (
                    any(a.fn in ("min", "max") for a in meta.aggs)
                    or src_doc.get("schema_evolved")
                    or src_doc.get("column_renames"))))
        dims_unchanged = dim_state_now == (meta.dim_state or {})
        if full:
            df = self._aggregate_source(meta, segments=None)
            if meta.joins and meta.filter is None:
                # unfiltered join MV: the certificate's count check
                # sums this frame's count(*) partials — cache the
                # group-count-sized result so the check reuses the
                # build's own aggregation instead of re-reading the MV
                df = df.cache()
            shutil.rmtree(mv_dir, ignore_errors=True)
            Table.create_as_select(self.source.spark, mv_dir, df)
            # dim uniqueness is reusable across a full rebuild when
            # the dims themselves are unchanged (fingerprint-stable)
            # and were certified before — only the count invariant
            # (fact side changed arbitrarily) needs re-proving
            try:
                new_fk = self._verify_fk_dims(
                    meta, mv_dir,
                    skip_uniqueness=dims_unchanged
                    and meta.fk_dims is not None,
                    built_agg=df)
            finally:
                if df.is_cached:
                    df.unpersist()
        else:
            new_segs = [s.id for s in self.source.manifest.queryable_segments()
                        if s.id > meta.watermark]
            parts = []
            inc_agg = None
            if new_segs:
                # read() applies ALL deltas, so rows of new segments
                # already deleted again never enter — the delta
                # subtraction below therefore scopes to files of
                # segments <= watermark (whose contributions the MV
                # still carries)
                inc_agg = self._aggregate_source(meta, segments=new_segs)
                if meta.joins and meta.fk_dims and meta.filter is None:
                    # the certificate's join-count rides the SAME
                    # aggregate (its count(*) partials sum to the
                    # joined row count) — cache the group-count-sized
                    # result so the check below costs a tiny cached
                    # scan, not a second join over the increment
                    inc_agg = inc_agg.cache()
                parts.append(inc_agg)
            if new_delta_paths:
                neg = self._aggregate_deleted(
                    meta, [cur_deltas[p] for p in new_delta_paths])
                if neg is not None:
                    parts.append(neg)
            if parts:
                mv_t = Table.open(self.source.spark, mv_dir)
                un = mv_t.read()
                for p in parts:
                    un = un.unionByName(p)
                merged = self._reaggregate(
                    un, meta, meta.group_cols, keep_storage_names=True)
                # a group whose every row was deleted vanishes, as it
                # would in the recomputed aggregate
                merged = merged.filter(
                    F.col(AggSpec("count", "*").key()) > 0)
                tmp_dir = mv_dir + ".new"
                shutil.rmtree(tmp_dir, ignore_errors=True)
                Table.create_as_select(self.source.spark, tmp_dir, merged)
                shutil.rmtree(mv_dir)
                os.rename(tmp_dir, mv_dir)
            # AFTER the merge so the cached increment aggregate is
            # already materialized when the certificate reads it
            try:
                new_fk = self._extend_fk_certificate(meta, new_segs,
                                                     inc_agg=inc_agg)
            finally:
                if inc_agg is not None and inc_agg.is_cached:
                    inc_agg.unpersist()
        meta.watermark = src_wm
        meta.deltas = sorted(cur_deltas)
        meta.dim_state = dim_state_now or None
        meta.fk_dims = new_fk
        self._save(meta)

    def _extend_fk_certificate(self, meta: MVMeta, new_segs: list[int],
                               inc_agg: DataFrame | None = None
                               ) -> list | None:
        """Incremental FK-certificate maintenance. The incremental
        path's preconditions guarantee the dims are UNCHANGED since
        the stored certificate (refresh() forces FULL otherwise), so
        dim-key uniqueness cannot have changed and is reused, never
        re-scanned. Deletes only REMOVE fact rows — every survivor
        still joins exactly one row per dim — so the cached
        certificate survives them; only NEW fact segments need the
        count-preservation invariant re-proved, scoped to exactly
        those segments (join-count(new segs) == row-count(new segs)),
        ANDed with the prior certificate. Old fact segments are never
        re-scanned (the reference's incremental-refresh discipline,
        MVRefresher.scala:61-200). An MV that was uncertified stays
        so until the next FULL refresh re-verifies from scratch."""
        if not meta.joins:
            return None
        prior = meta.fk_dims
        if prior is None or not new_segs:
            return prior
        try:
            # metadata-only when clean (Table.count scans only when
            # deltas make segment-scoped footer math inexact)
            n_new = self.source.count(segments=new_segs)
            if inc_agg is not None and meta.filter is None:
                # UNFILTERED join MV: the increment aggregate's
                # count(*) partials sum to exactly the joined row
                # count of the new segments — and the caller cached
                # that group-count-sized frame during the merge, so
                # this is a tiny cached scan, zero extra join work
                n_join = (inc_agg.agg(
                    F.sum(AggSpec("count", "*").key())).first()[0] or 0)
            else:
                # filtered MV: partials are post-filter, so the
                # count invariant needs its own join over the NEW
                # segments only (never the accumulated fact)
                joins = self._join_tables(meta)
                inc = self.source.read(segments=new_segs)
                n_join = _apply_joins(inc, joins).count()
            if int(n_join) != int(n_new):
                return None
            return prior
        except Exception:
            return None    # uncertifiable ⇒ subsumption just refuses

    def _verify_fk_dims(self, meta: MVMeta, mv_dir: str, *,
                        skip_uniqueness: bool = False,
                        built_agg: DataFrame | None = None) -> list | None:
        """FK-likeness certificate enabling join subsumption
        (_matches): certify the star's dims iff (a) every dim key is
        UNIQUE — so a fact row can match at most one row per dim, no
        duplication possible — and (b) the unfiltered join tree
        preserves the fact row count — with (a), total preservation
        means no fact row dropped either, so every fact row matched
        EXACTLY one row of every dim. Returns all dim dirs or None
        (all-or-nothing: with a non-unique dim in the tree, the count
        invariant can no longer isolate the other dims).

        Cost at FULL refresh only (incremental refreshes go through
        _extend_fk_certificate instead): one tiny aggregation per dim
        (dims are broadcast-scale by definition; skipped entirely via
        ``skip_uniqueness`` when the dims are fingerprint-unchanged
        since an existing certificate) + for (b) either a sum of the
        MV's stored count(*) partials (unfiltered MVs — the stored
        count invariant, no join re-run) or one joined count job
        (filtered MVs). The fact row count is metadata-only."""
        if not meta.joins:
            return None
        try:
            joins = self._join_tables(meta)
            if not skip_uniqueness:
                for d, _fk, dk in joins:
                    # non-null keys unique iff count(dk) ==
                    # count_distinct(dk) (NULL dim keys never
                    # inner-equi-join a fact row, so duplicates among
                    # them cannot fan anything out — exempt from the
                    # invariant). Dims are broadcast-scale by
                    # definition, so the probe runs DRIVER-SIDE over
                    # the key column with pyarrow (~30 ms) and only
                    # falls back to one Spark aggregation job when the
                    # dim can't be answered there (mor deltas, schema
                    # eras, non-parquet, > _DRIVER_DIM_ROWS).
                    u = _dim_key_unique_driver(d, dk)
                    if u is None:
                        r = d.read().agg(
                            F.count(dk).alias("nn"),
                            F.count_distinct(F.col(dk)).alias("nd")
                        ).first()
                        u = r["nn"] == r["nd"]
                    if not u:
                        return None
            n_fact = self.source.count()
            if meta.filter is None and built_agg is not None:
                # the caller just built (and cached) the full
                # aggregate — sum its partials directly instead of
                # re-opening the written MV table
                n_join = (built_agg.agg(
                    F.sum(AggSpec("count", "*").key())).first()[0] or 0)
            elif meta.filter is None:
                mv_t = Table.open(self.source.spark, mv_dir)
                n_join = (mv_t.read()
                          .agg(F.sum(AggSpec("count", "*").key()))
                          .first()[0] or 0)
            else:
                n_join = _apply_joins(self.source.read(), joins).count()
            if int(n_join) != int(n_fact):
                return None
            return [os.path.normpath(d.table_dir) for d, _fk, _dk in joins]
        except Exception:
            return None    # uncertifiable ⇒ subsumption just refuses

    def _aggregate_deleted(self, meta: MVMeta,
                           entries: list[dict]) -> DataFrame | None:
        """NEGATIVE partial aggregates of the rows the given delete-
        delta entries removed from segments the MV already reflects.
        The deltas identify the rows exactly by (file, position); the
        raw files are re-read (the normal read path would hide the
        deleted rows) and semi-joined against the sidecars."""
        src = self.source
        seg_of = {f.path: s.id for s in src.manifest.queryable_segments()
                  for f in s.files}
        scope: set[str] | None = set()
        for e in entries:
            fl = e.get("files")
            if fl is None:
                scope = None        # unbounded delta — scan all old files
                break
            scope.update(fl)
        old_files = [p for p, sid in seg_of.items()
                     if sid <= meta.watermark
                     and (scope is None or p in scope)]
        if not old_files:
            return None
        spark = src.spark
        prefix = src._raw_path_prefix()
        dd = spark.read.parquet(*[src._abs(e["path"]) for e in entries])
        fp = (F.concat(F.lit(prefix), F.col("file")) if prefix is not None
              else F.col("file"))
        dd = F.broadcast(dd.select(fp.alias("__dd_fp"),
                                   F.col("pos").alias("__dd_p")))
        scan = spark.read.parquet(*[src._abs(p) for p in old_files])
        key = (F.col("_metadata.file_path") if prefix is not None
               else src._rel_path_col())
        deleted = (scan.withColumns({
                       "__dd_fp": key,
                       "__dd_p": F.col("_metadata.row_index")})
                   .join(dd, ["__dd_fp", "__dd_p"], "left_semi")
                   .drop("__dd_fp", "__dd_p"))
        if meta.joins:
            # dims are unchanged on this path (refresh() forces full
            # otherwise), so the deleted fact rows join exactly the
            # dim rows their positive contributions joined
            deleted = _apply_joins(deleted, self._join_tables(meta))
        if meta.filter:
            deleted = deleted.filter(F.expr(meta.filter))
        keys: list[Column] = [F.col(c) for c in meta.group_cols]
        if meta.timeseries:
            col, gran = meta.timeseries
            keys.append(timeseries_bucket(F.col(col), gran).alias("ts_bucket"))
        exprs = []
        for a in meta.aggs:
            if a.fn == "count":
                e = F.count(F.lit(1)) if a.col == "*" else F.count(a.col)
            elif a.fn == "sum":
                e = F.sum(a.col)
            else:       # min/max guarded to the full-rebuild path
                raise AssertionError(f"non-subtractable agg {a.fn}")
            exprs.append((-e).alias(a.key()))
        return deleted.groupBy(*keys).agg(*exprs)

    def _aggregate_source(self, meta: MVMeta,
                          segments: list[int] | None) -> DataFrame:
        df = self.source.read(segments=segments)
        if meta.joins:
            # incremental soundness: this is only called with
            # segments != None when the dims are UNCHANGED since the
            # last refresh (refresh() forces full otherwise), so new
            # fact rows join the same dim state the MV reflects
            df = _apply_joins(df, self._join_tables(meta))
        if meta.filter:
            df = df.filter(F.expr(meta.filter))
        keys: list[Column] = [F.col(c) for c in meta.group_cols]
        if meta.timeseries:
            col, gran = meta.timeseries
            keys.append(timeseries_bucket(F.col(col), gran).alias("ts_bucket"))
        exprs = []
        for a in meta.aggs:
            if a.fn == "count":
                e = F.count(F.lit(1)) if a.col == "*" else F.count(a.col)
            else:
                e = getattr(F, a.fn)(a.col)
            exprs.append(e.alias(a.key()))
        return df.groupBy(*keys).agg(*exprs)

    def _reaggregate(self, df: DataFrame, meta: MVMeta,
                     group_cols: list[str],
                     keep_storage_names: bool) -> DataFrame:
        """Merge partial aggregates: sum→sum, count→sum, min→min, max→max."""
        keys = list(group_cols)
        if meta.timeseries:
            keys.append("ts_bucket")
        exprs = []
        for a in meta.aggs:
            k = a.key()
            merge_fn = {"sum": F.sum, "count": F.sum,
                        "min": F.min, "max": F.max}[a.fn]
            exprs.append(merge_fn(k).alias(k))
        return df.groupBy(*keys).agg(*exprs)

    # -------------------------------------------------------------- rewrite

    def answer(self, q: QuerySpec) -> tuple[DataFrame, str | None]:
        """Answer a query from the best matching *fresh* MV, else fall
        back to the source scan. Returns (df, mv_name|None)."""
        for m in self.show():
            meta = MVMeta.from_json(m)
            if m["stale"]:
                continue                       # unsound → skip (deferred MVs
            if self._matches(meta, q):         # are used only when fresh)
                return self._rewrite(meta, q), meta.name
        return self._direct(q), None

    def _matches(self, meta: MVMeta, q: QuerySpec) -> bool:
        # join trees match exactly (inner equi-joins commute, so
        # order-insensitive) — or the query joins a certified SUBSET
        # of the MV's dims (reference MVMatcher join-arity
        # subsumption): an unused dim is safe to ignore iff it was
        # FK-verified at refresh (every fact row matched exactly one
        # dim row), because then joining it neither dropped nor
        # duplicated any aggregated row
        qj, mj = _canon_joins(q.joins), (meta.joins or [])
        if qj != mj:
            if not self._subsumes(meta, q, qj, mj):
                return False
        if set(q.group_cols) - set(meta.group_cols):
            return False
        if _canon_filter(q.filter) != meta.filter:
            # allow query filter over query group cols applied on MV
            if q.filter is None:
                return False
            refs_ok = meta.filter is None and all(
                tok not in q.filter or tok in q.group_cols
                for tok in self._filter_identifiers(q.filter))
            if not refs_ok:
                return False
        if q.timeseries:
            if not meta.timeseries:
                return False
            if meta.timeseries[0] != q.timeseries[0]:
                return False
            mg, qg = meta.timeseries[1], q.timeseries[1]
            if mg not in _GRAN_CHAIN or qg not in _GRAN_CHAIN:
                return mg == qg
            if _GRAN_CHAIN.index(qg) < _GRAN_CHAIN.index(mg):
                return False                   # query finer than MV
        elif meta.timeseries:
            return False                       # MV bucketed, query not
        stored = {(a.fn, a.col) for a in meta.aggs}
        for a in q.aggs.values():
            if a.fn == "avg":
                if ("sum", a.col) not in stored or ("count", a.col) not in stored:
                    return False
            elif a.fn == "count" and a.col == "*":
                if ("count", "*") not in stored:
                    return False
            elif (a.fn, a.col) not in stored:
                return False
        return True

    def _subsumes(self, meta: MVMeta, q: QuerySpec,
                  qj: list, mj: list) -> bool:
        """True iff the query's join set is a strict subset of the
        MV's and every DROPPED dim is safe to ignore: FK-certified at
        the last refresh (see _verify_fk_dims; currency is implied —
        a changed dim stales the MV before answer() consults it),
        and NOTHING the query references depends on a dropped dim —
        neither a retained join's fact_key (a key supplied by a
        dropped dim's schema would change the join tree's shape) nor
        any group/agg/filter/timeseries column (the MV could answer
        such a query, but DIRECT execution of it would fail to
        resolve the column — the rewrite must not legitimize an
        invalid query)."""
        qset = {tuple(j) for j in qj}
        mset = {tuple(j) for j in mj}
        if not mj or not qset <= mset:
            return False
        dropped = [j for j in mj if tuple(j) not in qset]
        certified = set(meta.fk_dims or [])
        if any(os.path.normpath(d_dir) not in certified
               for d_dir, _fk, _dk in dropped):
            return False
        dropped_cols: set[str] = set()
        for d_dir, _fk, _dk in dropped:
            try:
                t = Table.open(self.source.spark, d_dir)
                dropped_cols |= {f.name for f in t._schema_struct().fields}
            except Exception:
                return False
        # conservative: any name collision between a column the query
        # touches and a dropped dim's columns refuses the rewrite
        # (falls back to direct execution, which resolves — or raises
        # — on its own authority)
        q_cols = set(q.group_cols) | {a.col for a in q.aggs.values()
                                      if a.col != "*"}
        if q.filter:
            q_cols |= set(self._filter_identifiers(q.filter))
        if q.timeseries:
            q_cols.add(q.timeseries[0])
        q_cols.update(fk for _d, fk, _dk in qj)
        return not (q_cols & dropped_cols)

    @staticmethod
    def _filter_identifiers(f: str) -> list[str]:
        import re
        return [t for t in re.findall(r"[A-Za-z_][A-Za-z0-9_]*", f)
                if t.lower() not in ("and", "or", "not", "in", "between",
                                     "like", "is", "null", "true", "false")]

    def _rewrite(self, meta: MVMeta, q: QuerySpec) -> DataFrame:
        mv_t = Table.open(self.source.spark, os.path.join(self.mv_root, meta.name))
        df = mv_t.read()
        if _canon_filter(q.filter) != meta.filter and q.filter:
            df = df.filter(F.expr(q.filter))
        keys = [F.col(c) for c in q.group_cols]
        if q.timeseries:
            keys.append(timeseries_bucket(F.col("ts_bucket"), q.timeseries[1])
                        .alias(q.ts_alias))
        exprs = []
        for alias, a in q.aggs.items():
            if a.fn == "avg":
                e = (F.sum(AggSpec("sum", a.col).key())
                     / F.sum(AggSpec("count", a.col).key()))
            elif a.fn == "count":
                e = F.sum(AggSpec("count", a.col).key())
            elif a.fn == "sum":
                e = F.sum(a.key())
            else:
                e = {"min": F.min, "max": F.max}[a.fn](a.key())
            exprs.append(e.alias(alias))
        return df.groupBy(*keys).agg(*exprs)

    def _direct(self, q: QuerySpec) -> DataFrame:
        df = self.source.read()
        if q.joins:
            df = _apply_joins(df, [
                (Table.open(self.source.spark, d) if not isinstance(d, Table)
                 else d, fk, dk) for d, fk, dk in q.joins])
        if q.filter:
            df = df.filter(F.expr(q.filter))
        keys = [F.col(c) for c in q.group_cols]
        if q.timeseries:
            keys.append(timeseries_bucket(F.col(q.timeseries[0]),
                                          q.timeseries[1]).alias(q.ts_alias))
        exprs = []
        for alias, a in q.aggs.items():
            if a.fn == "count":
                e = F.count(F.lit(1)) if a.col == "*" else F.count(a.col)
            else:
                e = getattr(F, a.fn)(a.col)
            exprs.append(e.alias(alias))
        return df.groupBy(*keys).agg(*exprs)

    # --------------------------------------------------------------- util

    def _source_watermark(self) -> int:
        return max((s.id for s in self.source.manifest.queryable_segments()),
                   default=-1)

    def _meta_path(self, name: str) -> str:
        return os.path.join(self.mv_root, f"{name}.json")

    def _save(self, meta: MVMeta) -> None:
        os.makedirs(self.mv_root, exist_ok=True)
        tmp = self._meta_path(meta.name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta.to_json(), f)
        os.replace(tmp, self._meta_path(meta.name))

    def _load(self, name: str) -> MVMeta:
        with open(self._meta_path(name)) as f:
            return MVMeta.from_json(json.load(f))
