"""Table-lifecycle queries — the segment/DML/MV feature set expressed
as oracle-checked queries, so the driver's correctness gate covers the
table format itself, not just the relational surface.

Each query builds a scratch segment-managed table under /tmp from the
driver's parquet (deterministic subsets), applies lifecycle operations
(copy-on-write DELETE/UPDATE, keyed MERGE, segment-scoped read,
compaction, schema evolution, MV rewrite), and returns an aggregate
whose oracle recomputes the same final state in pure SQL over the
source parquet.

Reference parity exercised end-to-end: mutation/ (UPDATE/DELETE),
merge/ (upsert), management/ (segments, compaction), view/ (MV
rewrite), schema/ (ALTER ADD COLUMNS) — SURVEY.md §2.10–§2.12.
"""

from __future__ import annotations

import os
import shutil
from concurrent.futures import ThreadPoolExecutor as _TPE

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog.table import Table
from ..mv.manager import AggSpec, MVManager, QuerySpec
from ..operators import dml, merge as merge_ops
from . import query

_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".scratch", "lifecycle")


def _scratch(name: str, sf_dir: str) -> str:
    tag = os.path.basename(sf_dir.rstrip("/"))
    d = os.path.join(_ROOT, tag, name)
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(os.path.dirname(d), exist_ok=True)
    return d


def _lineitem_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .filter(F.col("l_orderkey") < 1000)
            .select("l_orderkey", "l_linenumber", "l_returnflag",
                    F.col("l_quantity").cast("double").alias("qty")))


_SUBSET_SQL = """(SELECT l_orderkey, l_linenumber, l_returnflag,
                         CAST(l_quantity AS DOUBLE) AS qty
                  FROM lineitem WHERE l_orderkey < 1000)"""


@query("table_delete_cow", oracle=f"""
SELECT l_returnflag,
       COUNT(*) AS n_rows,
       CAST(SUM(qty) AS DOUBLE) AS sum_qty
FROM {_SUBSET_SQL} s
WHERE NOT (qty < 10)
GROUP BY l_returnflag
""")
def table_delete_cow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-on-write DELETE (reference DeleteExecution.scala): load a
    table, DELETE WHERE qty < 10, aggregate the survivors."""
    t = Table.create_as_select(spark, _scratch("del", sf_dir),
                               _lineitem_subset(spark, sf_dir))
    dml.delete_rows(t, "qty < 10")
    return (t.read().groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum("qty").cast("double").alias("sum_qty")))


@query("table_update_cow", oracle=f"""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN l_linenumber = 1 THEN qty + 100 ELSE qty END) AS DOUBLE)
         AS sum_qty
FROM {_SUBSET_SQL} s
GROUP BY l_returnflag
""")
def table_update_cow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-on-write UPDATE (reference CarbonProjectForUpdateCommand):
    UPDATE SET qty = qty + 100 WHERE l_linenumber = 1, then aggregate."""
    t = Table.create_as_select(spark, _scratch("upd", sf_dir),
                               _lineitem_subset(spark, sf_dir))
    dml.update_rows(t, {"qty": "qty + 100"}, "l_linenumber = 1")
    return (t.read().groupBy("l_returnflag")
            .agg(F.sum("qty").cast("double").alias("sum_qty")))


@query("table_delete_mor", oracle=f"""
SELECT l_returnflag,
       COUNT(*) AS n_rows,
       CAST(SUM(qty) AS DOUBLE) AS sum_qty
FROM {_SUBSET_SQL} s
WHERE NOT (qty < 10) AND NOT (l_linenumber = 7)
GROUP BY l_returnflag
""")
def table_delete_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read DELETE (reference delete-delta bitmaps +
    HorizontalCompaction.scala; operators/mor.py): two DELETEs on an
    'iud.mode'='mor' table write (file, row_index) delta sidecars —
    no data file is rewritten — and the second crosses the
    horizontal-compaction threshold, so the aggregate below reads
    through the consolidated delta anti-join. The count also checks
    the metadata-only count(*) subtraction."""
    from ..sql import Engine
    eng = Engine(spark, _scratch("delmor", sf_dir))
    _lineitem_subset(spark, sf_dir).createOrReplaceTempView("__mor_src")
    eng.sql("CREATE TABLE dm (l_orderkey BIGINT, l_linenumber INT, "
            "l_returnflag STRING, qty DOUBLE) "
            "TBLPROPERTIES('iud.mode'='mor',"
            "'horizontal_compaction_threshold'='1')")
    eng.sql("INSERT INTO dm SELECT * FROM __mor_src")
    eng.sql("DELETE FROM dm WHERE qty < 10")
    eng.sql("DELETE FROM dm WHERE l_linenumber = 7")
    t = eng.table("dm")
    assert len(t.manifest.load().get("delete_deltas", [])) == 1, \
        "horizontal compaction should have consolidated the deltas"
    return (t.read().groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum("qty").cast("double").alias("sum_qty")))


@query("table_update_mor", oracle=f"""
SELECT l_returnflag,
       COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN l_linenumber = 2 THEN qty * 3 ELSE qty END)
            AS DOUBLE) AS sum_qty
FROM {_SUBSET_SQL} s
GROUP BY l_returnflag
""")
def table_update_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read UPDATE (operators/mor.py): old row versions join
    a delete delta, updated rows land in a fresh segment — one atomic
    manifest swap — and the read path reassembles the current state
    via the (file, row_index) anti-join."""
    from ..sql import Engine
    eng = Engine(spark, _scratch("updmor", sf_dir))
    _lineitem_subset(spark, sf_dir).createOrReplaceTempView("__morU_src")
    eng.sql("CREATE TABLE um (l_orderkey BIGINT, l_linenumber INT, "
            "l_returnflag STRING, qty DOUBLE) "
            "TBLPROPERTIES('iud.mode'='mor')")
    eng.sql("INSERT INTO um SELECT * FROM __morU_src")
    eng.sql("UPDATE um SET qty = qty * 3 WHERE l_linenumber = 2")
    return (eng.table("um").read().groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum("qty").cast("double").alias("sum_qty")))


@query("table_merge_upsert", oracle="""
WITH t AS (SELECT o_orderkey AS k, CAST(o_totalprice AS DECIMAL(14,2)) AS p
           FROM orders WHERE o_orderkey < 500),
     s AS (SELECT o_orderkey AS k,
                  CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 2 AS DECIMAL(14,2)) AS p
           FROM orders WHERE o_orderkey >= 250 AND o_orderkey < 750),
     merged AS (
       SELECT COALESCE(s.k, t.k) AS k, COALESCE(s.p, t.p) AS p
       FROM t FULL OUTER JOIN s ON t.k = s.k)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(p) AS DOUBLE) AS sum_price
FROM merged
""")
def table_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed UPSERT (reference UpsertBuilder / scd-and-cdc-guide):
    overlapping keys updated from source, new keys inserted."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    tgt = (orders.filter(F.col("o_orderkey") < 500)
           .select(F.col("o_orderkey").alias("k"),
                   F.col("o_totalprice").cast("decimal(14,2)").alias("p")))
    src = (orders.filter((F.col("o_orderkey") >= 250) & (F.col("o_orderkey") < 750))
           .select(F.col("o_orderkey").alias("k"),
                   (F.col("o_totalprice").cast("decimal(14,2)") * 2)
                   .cast("decimal(14,2)").alias("p")))
    t = Table.create_as_select(spark, _scratch("ups", sf_dir), tgt)
    merge_ops.upsert(t, src, "k")
    return t.read().agg(F.count(F.lit(1)).alias("n_rows"),
                        F.sum("p").cast("double").alias("sum_price"))


@query("table_merge_upsert_mor", oracle="""
WITH t AS (SELECT o_orderkey AS k, CAST(o_totalprice AS DECIMAL(14,2)) AS p
           FROM orders WHERE o_orderkey < 500),
     s AS (SELECT o_orderkey AS k,
                  CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 2 AS DECIMAL(14,2)) AS p
           FROM orders WHERE o_orderkey >= 250 AND o_orderkey < 750),
     merged AS (
       SELECT COALESCE(s.k, t.k) AS k, COALESCE(s.p, t.p) AS p
       FROM t FULL OUTER JOIN s ON t.k = s.k)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(p) AS DOUBLE) AS sum_price
FROM merged
""")
def table_merge_upsert_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME keyed upsert as table_merge_upsert, executed on an
    'iud.mode'='mor' table — MergeBuilder._execute_mor: matched rows
    join the delete delta by (file, row position), updated + inserted
    rows land in ONE fresh segment, no data file is rewritten
    (asserted). This is the reference's actual CDC apply shape
    (DeleteExecution + insert) and the upsert you can afford at
    100 TB: cost is O(mutated + inserted rows), not O(touched
    files)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    tgt = (orders.filter(F.col("o_orderkey") < 500)
           .select(F.col("o_orderkey").alias("k"),
                   F.col("o_totalprice").cast("decimal(14,2)").alias("p")))
    src = (orders.filter((F.col("o_orderkey") >= 250) & (F.col("o_orderkey") < 750))
           .select(F.col("o_orderkey").alias("k"),
                   (F.col("o_totalprice").cast("decimal(14,2)") * 2)
                   .cast("decimal(14,2)").alias("p")))
    t = Table.create_as_select(spark, _scratch("upsmor", sf_dir), tgt,
                               properties={"iud.mode": "mor"})
    files_before = {f.path for s in t.manifest.queryable_segments()
                    for f in s.files}
    merge_ops.upsert(t, src, "k")
    files_after = {f.path for s in t.manifest.queryable_segments()
                   for f in s.files}
    assert files_before <= files_after, "mor merge must not rewrite files"
    assert t.manifest.load().get("delete_deltas"), "expected delete deltas"
    return t.read().agg(F.count(F.lit(1)).alias("n_rows"),
                        F.sum("p").cast("double").alias("sum_price"))


@query("table_segment_scoped", oracle=f"""
SELECT COUNT(*) AS n_rows, CAST(SUM(qty) AS DOUBLE) AS sum_qty
FROM {_SUBSET_SQL} s WHERE l_linenumber = 1
""")
def table_segment_scoped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-scoped read (reference insegment()/
    carbon.input.segments): two loads, query only the first segment."""
    sub = _lineitem_subset(spark, sf_dir)
    t = Table.create(spark, _scratch("seg", sf_dir),
                     "l_orderkey bigint, l_linenumber int, "
                     "l_returnflag string, qty double")
    t.insert(sub.filter(F.col("l_linenumber") == 1))     # segment 0
    t.insert(sub.filter(F.col("l_linenumber") != 1))     # segment 1
    return (t.read(segments=[0])
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum("qty").cast("double").alias("sum_qty")))


@query("table_compaction", oracle=f"""
SELECT COUNT(*) AS n_rows,
       COUNT(DISTINCT l_returnflag) AS n_flags,
       CAST(SUM(qty) AS DOUBLE) AS sum_qty
FROM {_SUBSET_SQL} s WHERE l_linenumber <= 3
""")
def table_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction (reference CarbonTableCompactor): three loads merged
    into one segment; results identical before/after."""
    sub = _lineitem_subset(spark, sf_dir)
    t = Table.create(spark, _scratch("cmp", sf_dir),
                     "l_orderkey bigint, l_linenumber int, "
                     "l_returnflag string, qty double")
    for ln in (1, 2, 3):
        t.insert(sub.filter(F.col("l_linenumber") == ln))
    t.compact("minor", minor_threshold=2)
    t.clean_files()
    assert len(t.manifest.queryable_segments()) == 1
    return (t.read()
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.countDistinct("l_returnflag").alias("n_flags"),
                 F.sum("qty").cast("double").alias("sum_qty")))


@query("table_schema_evolution", oracle="""
SELECT p_brand,
       COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN p_partkey < 100 THEN 5 ELSE p_size END) AS BIGINT)
         AS sum_sz
FROM part WHERE p_partkey < 200
GROUP BY p_brand
""")
def table_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALTER ADD COLUMNS with default (reference
    CarbonAlterTableAddColumnCommand): era-0 rows surface the default,
    era-1 rows carry real values."""
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    t = Table.create(spark, _scratch("evo", sf_dir),
                     "p_partkey bigint, p_brand string")
    t.insert(part.filter(F.col("p_partkey") < 100)
             .select("p_partkey", "p_brand"))
    t.add_column("sz", "bigint", default=5)
    t.insert(part.filter((F.col("p_partkey") >= 100) & (F.col("p_partkey") < 200))
             .select("p_partkey", "p_brand", F.col("p_size").cast("bigint")))
    return (t.read().groupBy("p_brand")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum("sz").alias("sum_sz")))


@query("table_mv_incremental_refresh", oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(ROUND(AVG(CAST(l_quantity AS DOUBLE)), 4) AS DOUBLE)
         AS avg_qty,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""")
def table_mv_incremental_refresh(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """MV INCREMENTAL refresh with AVG decomposition — the reference's
    subtle part (MVRefresher.scala:61-200; AVG rewritten to SUM/COUNT
    for incremental correctness at :194). A second segment loads
    AFTER the MV build; the refresh aggregates ONLY that delta and
    merges by re-aggregation of the decomposed partials (a naive
    avg-of-avgs would be wrong here because per-group sizes differ
    across the two segments). The oracle computes the FULL aggregate
    over all rows in DuckDB, so a green hash proves increment ≡
    rebuild. In-query asserts pin that the incremental branch (not a
    silent full rebuild) was reachable and taken: the MV existed with
    watermark 0 before the refresh and advanced to 1 after; the
    delta-only read is separately asserted in
    tests/test_mv.py::test_incremental_refresh_reads_only_new_segments."""
    li = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
          .select("l_orderkey", "l_returnflag", "l_linestatus",
                  F.col("l_quantity").cast("double").alias("qty")))
    seg0 = li.where(F.expr("l_orderkey % 3 != 0")).drop("l_orderkey")
    seg1 = li.where(F.expr("l_orderkey % 3 = 0")).drop("l_orderkey")
    t = Table.create_as_select(spark, _scratch("mv_inc", sf_dir), seg0)
    mgr = MVManager(t)
    mgr.create("mv_inc", ["l_returnflag", "l_linestatus"],
               [AggSpec("avg", "qty")])
    t.insert(seg1)                       # new segment AFTER the build
    meta = mgr._load("mv_inc")
    assert meta.watermark == 0, "MV should be built on segment 0 only"
    assert any(m["name"] == "mv_inc" and m["stale"] for m in mgr.show()), \
        "MV must be stale after the new load"
    mgr.refresh("mv_inc", incremental=True)
    assert mgr._load("mv_inc").watermark == 1, "watermark did not advance"
    df, mv_used = mgr.answer(QuerySpec(
        ["l_returnflag", "l_linestatus"],
        {"avg_qty": AggSpec("avg", "qty"),
         "n_rows": AggSpec("count", "*")}))
    assert mv_used == "mv_inc", "query was not answered from the MV"
    return df.select("l_returnflag", "l_linestatus",
                     F.round(F.col("avg_qty"), 4).cast("double")
                     .alias("avg_qty"),
                     "n_rows")


@query("table_mv_ivm_delete", oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(ROUND(AVG(CAST(l_quantity AS DOUBLE)), 4) AS DOUBLE)
         AS avg_qty,
       COUNT(*) AS n_rows
FROM lineitem
WHERE NOT (l_orderkey % 5 = 1)
GROUP BY l_returnflag, l_linestatus
""")
def table_mv_ivm_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance under merge-on-read DELETE
    (mv/manager._aggregate_deleted — the counting algorithm of Gupta
    & Mumick): after an 'iud.mode'='mor' DELETE plus a new segment
    load, REFRESH applies the deleted rows' NEGATIVE partial
    aggregates and the new segment's positives in one merge — no
    full rebuild (asserted by wrapping _aggregate_source). The
    oracle recomputes the post-delete aggregate from scratch in
    DuckDB, so a green hash proves subtract-and-merge ≡ rebuild —
    including AVG through its SUM/COUNT decomposition, where a
    stale count would skew the quotient."""
    li = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
          .select("l_orderkey", "l_returnflag", "l_linestatus",
                  F.col("l_quantity").cast("double").alias("qty")))
    t = Table.create_as_select(
        spark, _scratch("mv_ivm", sf_dir),
        li.where("l_orderkey % 3 != 0"),
        properties={"iud.mode": "mor"})
    mgr = MVManager(t)
    mgr.create("mvd", ["l_returnflag", "l_linestatus"],
               [AggSpec("avg", "qty")])
    t.insert(li.where("l_orderkey % 3 = 0"))         # new segment
    dml.delete_rows(t, "l_orderkey % 5 = 1")         # mor delta
    assert any(m["name"] == "mvd" and m["stale"] for m in mgr.show())

    full_calls = []
    # instance-level wrap (not the class attribute): gates must not
    # mutate process-global MVManager behavior for unrelated instances
    orig = mgr._aggregate_source
    mgr._aggregate_source = (
        lambda meta, segments: full_calls.append(segments)
        or orig(meta, segments))
    try:
        mgr.refresh("mvd", incremental=True)
    finally:
        del mgr._aggregate_source
    assert None not in full_calls, "IVM fell back to a full rebuild"
    df, mv_used = mgr.answer(QuerySpec(
        ["l_returnflag", "l_linestatus"],
        {"avg_qty": AggSpec("avg", "qty"),
         "n_rows": AggSpec("count", "*")}))
    assert mv_used == "mvd", "query was not answered from the MV"
    return df.select("l_returnflag", "l_linestatus",
                     F.round(F.col("avg_qty"), 4).cast("double")
                     .alias("avg_qty"),
                     "n_rows")


@query("table_mv_ivm_update", oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(ROUND(SUM(CASE WHEN l_orderkey % 5 = 1
                           THEN CAST(l_quantity AS DOUBLE) + 5
                           ELSE CAST(l_quantity AS DOUBLE) END), 4)
         AS DOUBLE) AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""")
def table_mv_ivm_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance under merge-on-read UPDATE: a mor
    UPDATE writes the OLD row versions as a delete delta and the NEW
    versions as a fresh segment, so one incremental refresh subtracts
    the deltas' negative partial aggregates and adds the new
    segment's positives in the same merge (mv/manager.refresh) —
    counts are invariant, sums shift by exactly the update amount,
    and no full rebuild runs (asserted by wrapping
    _aggregate_source). The oracle recomputes the post-update
    aggregate from scratch in DuckDB, so a green hash proves
    subtract-and-add ≡ rebuild. Reference: MVRefresher.scala:61-200
    incremental refresh; mutation/update + the counting algorithm of
    Gupta & Mumick for the IVM itself."""
    li = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
          .select("l_orderkey", "l_returnflag", "l_linestatus",
                  F.col("l_quantity").cast("double").alias("qty")))
    t = Table.create_as_select(
        spark, _scratch("mv_ivm_upd", sf_dir), li,
        properties={"iud.mode": "mor"})
    mgr = MVManager(t)
    mgr.create("mvu", ["l_returnflag", "l_linestatus"],
               [AggSpec("sum", "qty")])
    dml.update_rows(t, {"qty": "qty + 5"}, "l_orderkey % 5 = 1")
    assert any(m["name"] == "mvu" and m["stale"] for m in mgr.show())

    full_calls = []
    # instance-level wrap (not the class attribute): gates must not
    # mutate process-global MVManager behavior for unrelated instances
    orig = mgr._aggregate_source
    mgr._aggregate_source = (
        lambda meta, segments: full_calls.append(segments)
        or orig(meta, segments))
    try:
        mgr.refresh("mvu", incremental=True)
    finally:
        del mgr._aggregate_source
    assert None not in full_calls, "IVM fell back to a full rebuild"
    df, mv_used = mgr.answer(QuerySpec(
        ["l_returnflag", "l_linestatus"],
        {"sum_qty": AggSpec("sum", "qty"),
         "n_rows": AggSpec("count", "*")}))
    assert mv_used == "mvu", "query was not answered from the MV"
    return df.select("l_returnflag", "l_linestatus",
                     F.round(F.col("sum_qty"), 4).cast("double")
                     .alias("sum_qty"),
                     "n_rows")


@query("table_mv_join_rewrite", oracle="""
SELECT o.o_orderpriority,
       CAST(ROUND(SUM(CAST(l.l_quantity AS DOUBLE)), 4) AS DOUBLE)
         AS sum_qty,
       CAST(ROUND(AVG(CAST(l.l_quantity AS DOUBLE)), 4) AS DOUBLE)
         AS avg_qty,
       COUNT(*) AS n_rows
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
""")
def table_mv_join_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STAR-JOIN MV: created through the SQL surface (CREATE
    MATERIALIZED VIEW ... FROM fact JOIN dim ON ... GROUP BY), kept
    fresh INCREMENTALLY across a fact-side load that arrives after
    the build (the reference MVMatcher's join scope,
    mv/plan/MVMatcher + MVRefresher.scala:61-200 — new fact segments
    join the unchanged dim and merge by re-aggregation of the
    decomposed partials; any DIM mutation instead fingerprints the
    MV stale and forces a full rebuild, tested in tests/test_mv.py).
    The rollup query is answered FROM the MV (asserted), and the
    oracle recomputes the full join-aggregate from scratch in
    DuckDB, so a green hash proves increment ≡ rebuild through the
    join — including AVG via its SUM/COUNT decomposition."""
    from ..sql import Engine
    eng = Engine(spark, _scratch("mv_join", sf_dir))
    li = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
          .select("l_orderkey", F.col("l_quantity").cast("double")
                  .alias("qty")))
    (spark.read.parquet(f"{sf_dir}/orders.parquet")
     .select("o_orderkey", "o_orderpriority")
     .createOrReplaceTempView("__mvj_ord"))
    li.where("l_orderkey % 3 != 0").createOrReplaceTempView("__mvj_li0")
    li.where("l_orderkey % 3 = 0").createOrReplaceTempView("__mvj_li1")
    eng.sql("CREATE TABLE fact (l_orderkey BIGINT, qty DOUBLE)")
    eng.sql("CREATE TABLE dim (o_orderkey BIGINT, o_orderpriority STRING)")
    # fact and dim loads are independent tables — overlap them on a
    # 2-thread pool (guide §2.6; the table_mv_subsumed_rollup /
    # table_db_namespace pattern). The MV build below waits on both.
    with _TPE(max_workers=2) as pool:
        list(pool.map(eng.sql, ("INSERT INTO fact SELECT * FROM __mvj_li0",
                                "INSERT INTO dim SELECT * FROM __mvj_ord")))
    eng.sql("CREATE MATERIALIZED VIEW mvj AS "
            "SELECT o_orderpriority, SUM(qty) AS sq, AVG(qty) AS aq "
            "FROM fact JOIN dim ON fact.l_orderkey = dim.o_orderkey "
            "GROUP BY o_orderpriority")
    # fact-side load AFTER the build → incremental join refresh
    eng.sql("INSERT INTO fact SELECT * FROM __mvj_li1")
    mgr = MVManager(eng.table("fact"))
    assert any(m["name"] == "mvj" and m["stale"] for m in mgr.show()), \
        "MV must be stale after the fact load"
    full_calls = []
    # instance-level wrap — the SQL REFRESH surface is exercised in
    # tests/test_mv.py::test_join_mv_sql_surface; here the refresh
    # goes through mgr so the rebuild counter never mutates
    # process-global MVManager state
    orig = mgr._aggregate_source
    mgr._aggregate_source = (
        lambda meta, segments: full_calls.append(segments)
        or orig(meta, segments))
    try:
        mgr.refresh("mvj", incremental=True)
    finally:
        del mgr._aggregate_source
    assert None not in full_calls, \
        "fact-only load must refresh the join MV incrementally"
    df, mv_used = mgr.answer(QuerySpec(
        ["o_orderpriority"],
        {"sum_qty": AggSpec("sum", "qty"),
         "avg_qty": AggSpec("avg", "qty"),
         "n_rows": AggSpec("count", "*")},
        joins=[(eng.table("dim"), "l_orderkey", "o_orderkey")]))
    assert mv_used == "mvj", "join query was not answered from the MV"
    return df.select("o_orderpriority",
                     F.round(F.col("sum_qty"), 4).cast("double")
                     .alias("sum_qty"),
                     F.round(F.col("avg_qty"), 4).cast("double")
                     .alias("avg_qty"),
                     "n_rows")


@query("table_mv_subsumed_rollup", oracle="""
SELECT o.o_orderpriority,
       CAST(ROUND(SUM(CAST(l.l_quantity AS DOUBLE)), 4) AS DOUBLE)
         AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
""")
def table_mv_subsumed_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-ARITY SUBSUMPTION (reference MVMatcher join-arity cases,
    mv/plan/MVMatcher.scala): a fact+2-dim star MV answers a
    fact+1-dim query. Sound because the dropped dim (part) was
    FK-certified at refresh — dim key unique plus the join preserving
    the fact row count proves every fact row matched EXACTLY one part
    row, so the part join neither dropped nor duplicated anything the
    MV aggregated (mv/manager._verify_fk_dims / _subsumes). The
    rewrite is asserted to come from the MV and to never scan the
    fact table; the oracle recomputes the 1-dim join aggregate from
    scratch in DuckDB, so a green hash proves subsumption ≡ direct.
    (VERDICT r6 'Next round' item 6.)"""
    li = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
          .select("l_orderkey", "l_partkey",
                  F.col("l_quantity").cast("double").alias("qty")))
    # three independent CTAS loads (separate table dirs) — overlap
    # them so the dim loads back-fill the fact load's idle executors
    with _TPE(max_workers=2) as pool:
        f_o = pool.submit(
            Table.create_as_select, spark,
            _scratch("mv_sub_dimo", sf_dir),
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .select("o_orderkey", "o_orderpriority"))
        f_p = pool.submit(
            Table.create_as_select, spark,
            _scratch("mv_sub_dimp", sf_dir),
            spark.read.parquet(f"{sf_dir}/part.parquet")
            .select("p_partkey", "p_brand"))
        fact = Table.create_as_select(
            spark, _scratch("mv_sub_fact", sf_dir), li)
        dim_o, dim_p = f_o.result(), f_p.result()
    mgr = MVManager(fact)
    mgr.create("mv_sub", ["o_orderpriority", "p_brand"],
               [AggSpec("sum", "qty"), AggSpec("count", "*")],
               joins=[(dim_o, "l_orderkey", "o_orderkey"),
                      (dim_p, "l_partkey", "p_partkey")])
    meta = mgr._load("mv_sub")
    assert meta.fk_dims and len(meta.fk_dims) == 2, \
        "both dims must be FK-certified at refresh"
    df, mv_used = mgr.answer(QuerySpec(
        ["o_orderpriority"],
        {"sum_qty": AggSpec("sum", "qty"),
         "n_rows": AggSpec("count", "*")},
        joins=[(dim_o, "l_orderkey", "o_orderkey")]))
    assert mv_used == "mv_sub", \
        "1-dim query was not subsumed by the 2-dim MV"
    # the MV itself lives UNDER the fact dir (_meta/mvs/mv_sub/...),
    # so assert on the exact scanned files (plan text truncates
    # paths): every input is an MV partial, no fact data segment
    files = df.inputFiles()
    assert files and all("/mvs/mv_sub/" in f for f in files), \
        "subsumed rewrite must read ONLY the MV's stored partials"
    return df.select("o_orderpriority",
                     F.round(F.col("sum_qty"), 4).cast("double")
                     .alias("sum_qty"),
                     "n_rows")


@query("table_mv_rewrite", oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DOUBLE)) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""")
def table_mv_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MV auto-rewrite (reference MVRewriteRule): the aggregate is
    answered FROM THE MV (asserted), and must equal the direct result."""
    li = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
          .select("l_returnflag", "l_linestatus",
                  F.col("l_quantity").cast("double").alias("qty")))
    t = Table.create_as_select(spark, _scratch("mv", sf_dir), li)
    mgr = MVManager(t)
    mgr.create("mv_flag", ["l_returnflag", "l_linestatus"],
               [AggSpec("sum", "qty"), AggSpec("count", "*")])
    df, mv_used = mgr.answer(QuerySpec(
        ["l_returnflag", "l_linestatus"],
        {"sum_qty": AggSpec("sum", "qty"), "n_rows": AggSpec("count", "*")}))
    assert mv_used == "mv_flag", "query was not answered from the MV"
    return df.select("l_returnflag", "l_linestatus",
                     F.col("sum_qty").cast("double").alias("sum_qty"),
                     "n_rows")


@query("table_timetravel_diff", oracle="""
WITH o AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(o_totalprice AS DOUBLE) AS price
  FROM orders WHERE o_orderkey < 20000
), diff AS (
  SELECT 'insert' AS change, o_orderkey, o_orderstatus, price
  FROM o WHERE o_orderkey % 4 = 0 AND o_orderkey % 10 != 7
  UNION ALL
  SELECT 'delete', o_orderkey, o_orderstatus, price
  FROM o WHERE o_orderkey % 4 != 0 AND o_orderkey % 10 = 7)
SELECT change, o_orderstatus,
       COUNT(*) AS n_rows,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
       CAST(CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DECIMAL(18,2))
         AS DOUBLE) AS sum_price
FROM diff GROUP BY change, o_orderstatus
""")
def table_timetravel_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff via manifest time travel: the table's state at a
    pinned manifest version is read back with ``read(as_of=...)`` and
    multiset-diffed (exceptAll both ways) against the current state —
    the change-data-capture primitive the reference exposes through
    segment history + 'carbon.input.segments' time travel
    (management/CarbonShowSegmentsCommand + docs segment-management;
    our catalog/manifest.py versioned tablestatus). A mor DELETE sits
    between the snapshots, so the diff must see through delete
    deltas on the NEW side while the as_of read reconstructs the old
    delta-free state. The oracle recomputes both snapshots from the
    raw parquet and diffs them in SQL. exceptAll (not except) keeps
    duplicate multiplicity — the diff is exact CDC, not set-ish."""
    o = (spark.read.parquet(f"{sf_dir}/orders.parquet")
         .filter(F.col("o_orderkey") < 20000)
         .select("o_orderkey", "o_orderstatus",
                 F.col("o_totalprice").cast("double").alias("price")))
    t = Table.create_as_select(
        spark, _scratch("ttdiff", sf_dir),
        o.filter("o_orderkey % 4 != 0"),
        properties={"iud.mode": "mor"})
    v0 = t.manifest.load()["version"]
    t.insert(o.filter("o_orderkey % 4 = 0"))
    dml.delete_rows(t, "o_orderkey % 10 = 7")
    old = t.read(as_of=v0)
    new = t.read()
    diff = (new.exceptAll(old).withColumn("change", F.lit("insert"))
            .unionByName(
                old.exceptAll(new).withColumn("change", F.lit("delete"))))
    return (diff.groupBy("change", "o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum("o_orderkey").cast("bigint").alias("sum_keys"),
                 F.sum(F.col("price").cast("decimal(18,2)"))
                 .cast("decimal(18,2)").cast("double").alias("sum_price")))


@query("agg_minmax_metadata", oracle="""
SELECT CAST(MIN(l_orderkey) AS BIGINT) AS min_key,
       CAST(MAX(l_orderkey) AS BIGINT) AS max_key,
       CAST(MIN(CAST(l_quantity AS DOUBLE)) AS DOUBLE) AS min_qty,
       CAST(MAX(CAST(l_quantity AS DOUBLE)) AS DOUBLE) AS max_qty
FROM lineitem
""")
def agg_minmax_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only MIN/MAX: the engine answers bare MIN/MAX
    aggregates from the manifest's per-file min/max stats — zero data
    scan, the blocklet-min/max analogue of the CarbonCountStar
    driver-side count (reference CarbonCountStar.scala:44-108 +
    BlockletMinMaxIndex thrift). Two segments force a real fold over
    file stats; the in-gate plan assert pins that the result is a
    LocalTableScan (no file read). Guards fall back to a scan: mor
    deltas, non-parquet segments, missing/non-numeric stats
    (Manifest.minmax_metadata, tests/test_catalog.py)."""
    from ..sql import Engine

    li = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
          .select("l_orderkey",
                  F.col("l_quantity").cast("double").alias("qty")))
    eng = Engine(spark, _scratch("mmx", sf_dir))
    li.createOrReplaceTempView("__mmx_src")
    eng.sql("CREATE TABLE mmx (l_orderkey BIGINT, qty DOUBLE)")
    for par in (0, 1):
        eng.sql("INSERT INTO mmx SELECT * FROM __mmx_src "
                f"WHERE l_orderkey % 2 = {par}")
    df = eng.sql("SELECT MIN(l_orderkey) AS min_key, "
                 "MAX(l_orderkey) AS max_key, "
                 "MIN(qty) AS min_qty, MAX(qty) AS max_qty FROM mmx")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert ("LocalTableScan" in plan or "LocalRelation" in plan
            or "ExistingRDD" in plan), \
        "minmax did not take the metadata path"
    assert "FileScan" not in plan, "metadata minmax must not scan data"
    return df


@query("table_restore_version", oracle="""
SELECT o_orderstatus,
       COUNT(*) AS n_rows,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys
FROM orders
WHERE o_orderkey < 8000 AND o_orderkey % 3 = 0
GROUP BY o_orderstatus
""")
def table_restore_version(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESTORE to a historical manifest version (lakehouse rollback;
    composes the versioned-tablestatus history behind read(as_of=)):
    after a second load AND a delete mutate the table, restore rolls
    content back to the first snapshot — as a NEW version, so the
    mutated state stays reachable (asserted in-gate). The oracle
    recomputes the FIRST snapshot from raw parquet, so a green hash
    proves restore ≡ the historical state byte-for-byte."""
    o = (spark.read.parquet(f"{sf_dir}/orders.parquet")
         .filter(F.col("o_orderkey") < 8000)
         .select("o_orderkey", "o_orderstatus"))
    t = Table.create_as_select(
        spark, _scratch("restore", sf_dir),
        o.filter("o_orderkey % 3 = 0"))
    v1 = t.manifest.load()["version"]
    t.insert(o.filter("o_orderkey % 3 = 1"))
    dml.delete_rows(t, "o_orderkey % 10 = 0")
    mutated = t.read().count()
    t.restore(v1)
    assert t.manifest.load()["version"] > v1, "history must append"
    # the pre-restore state remains reachable through time travel
    assert t.read(as_of=t.manifest.load()["version"] - 1).count() == mutated
    return (t.read().groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum("o_orderkey").cast("bigint").alias("sum_keys")))


@query("table_db_namespace", oracle=f"""
WITH src AS {_SUBSET_SQL}
SELECT 'dba' AS db, COUNT(*) AS n_rows,
       CAST(ROUND(SUM(CASE WHEN l_orderkey < 100 THEN 0.0 ELSE qty END), 4)
            AS DOUBLE) AS sum_qty
FROM src
UNION ALL
SELECT 'dbb' AS db, COUNT(*) AS n_rows,
       CAST(ROUND(SUM(qty), 4) AS DOUBLE) AS sum_qty
FROM src WHERE l_linenumber <> 7
ORDER BY db
""")
def table_db_namespace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATABASE/SCHEMA qualification (VERDICT r7 missing item 1; the
    reference carries an optional db on every grammar production —
    CarbonSpark2SqlParser.scala:233-237 `ontable`, :412-417 `table` —
    resolved via CarbonEnv's current database): the SAME table name
    in two databases holds independent data; qualified DML hits only
    its own database (UPDATE in dba, DELETE in dbb), and a cross-db
    UNION query reads both through one SQL text. The oracle recomputes
    both databases' expected states from the shared source, so a green
    hash proves write isolation AND qualified read resolution."""
    from ..sql import Engine
    eng = Engine(spark, _scratch("dbns", sf_dir))
    src = _lineitem_subset(spark, sf_dir)
    src.createOrReplaceTempView("__dbns_src")
    eng.sql("CREATE DATABASE dba")
    eng.sql("CREATE DATABASE dbb")
    ddl = ("(l_orderkey BIGINT, l_linenumber INT, l_returnflag STRING, "
           "qty DOUBLE)")
    eng.sql(f"CREATE TABLE dba.t {ddl}")
    eng.sql(f"CREATE TABLE dbb.t {ddl}")
    # the two databases are INDEPENDENT by the gate's own thesis
    # (write isolation), so their loads — and then their DMLs —
    # overlap on a 2-thread pool (guide §2.6: submit independent
    # jobs concurrently so one load's task tail back-fills the
    # other's executors; same pattern as table_mv_subsumed_rollup's
    # dim loads). Statement order WITHIN each database is unchanged,
    # and the cross-db read runs after both pools drain.
    with _TPE(max_workers=2) as pool:
        list(pool.map(eng.sql, ("INSERT INTO dba.t SELECT * FROM __dbns_src",
                                "INSERT INTO dbb.t SELECT * FROM __dbns_src")))
    with _TPE(max_workers=2) as pool:
        list(pool.map(eng.sql, ("UPDATE dba.t SET qty = 0.0 WHERE l_orderkey < 100",
                                "DELETE FROM dbb.t WHERE l_linenumber = 7")))
    return eng.sql(
        "SELECT 'dba' AS db, COUNT(*) AS n_rows, "
        "CAST(ROUND(SUM(qty), 4) AS DOUBLE) AS sum_qty FROM dba.t "
        "UNION ALL "
        "SELECT 'dbb' AS db, COUNT(*) AS n_rows, "
        "CAST(ROUND(SUM(qty), 4) AS DOUBLE) AS sum_qty FROM dbb.t "
        "ORDER BY db")
