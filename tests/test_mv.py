"""MV create/rewrite/refresh tests — mirrors the reference's
view/rewrite suites (MVTpchTestCase q1/q6 shapes, view/timeseries)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdh_integrate_carbondata2_3_spark.catalog import Table
from cdh_integrate_carbondata2_3_spark.mv import AggSpec, MVManager, QuerySpec


@pytest.fixture()
def sales(spark, tmp_path):
    t = Table.create(spark, str(tmp_path / "sales"),
                     "id bigint, flag string, qty double, price double, ts timestamp")
    t.insert(spark.range(0, 1000).select(
        "id",
        F.when(F.col("id") % 3 == 0, "A").otherwise("B").alias("flag"),
        (F.col("id") % 7).cast("double").alias("qty"),
        (F.col("id") * 1.1).alias("price"),
        (F.lit("2024-01-01 00:00:00").cast("timestamp_ntz")
         + F.make_dt_interval(F.lit(0), F.lit(0), F.col("id").cast("int"), F.lit(0))
         ).alias("ts")))
    return t


def _rows(df, *cols):
    return {tuple(r[c] for c in cols) for r in df.collect()}


def test_exact_rewrite(spark, sales):
    mgr = MVManager(sales)
    mgr.create("mv1", ["flag"], [AggSpec("sum", "qty"), AggSpec("count", "*")])
    q = QuerySpec(group_cols=["flag"],
                  aggs={"total": AggSpec("sum", "qty"), "n": AggSpec("count", "*")})
    df, used = mgr.answer(q)
    assert used == "mv1"                         # rewritten
    direct = mgr._direct(q)
    assert _rows(df, "flag", "total", "n") == _rows(direct, "flag", "total", "n")


def test_rollup_rewrite(spark, sales):
    mgr = MVManager(sales)
    mgr.create("mv2", ["flag", "qty"], [AggSpec("sum", "price"),
                                        AggSpec("min", "price"),
                                        AggSpec("max", "price")])
    # coarser grouping than the MV → rollup re-aggregation
    q = QuerySpec(group_cols=["flag"],
                  aggs={"sp": AggSpec("sum", "price"),
                        "mn": AggSpec("min", "price"),
                        "mx": AggSpec("max", "price"),
                        "n": AggSpec("count", "*")})
    df, used = mgr.answer(q)
    assert used == "mv2"
    d = mgr._direct(q)
    got = {r["flag"]: (round(r["sp"], 4), r["mn"], r["mx"], r["n"]) for r in df.collect()}
    want = {r["flag"]: (round(r["sp"], 4), r["mn"], r["mx"], r["n"]) for r in d.collect()}
    assert got == want


def test_avg_decomposition(spark, sales):
    mgr = MVManager(sales)
    mgr.create("mv3", ["flag"], [AggSpec("avg", "price")])
    q = QuerySpec(group_cols=["flag"], aggs={"ap": AggSpec("avg", "price")})
    df, used = mgr.answer(q)
    assert used == "mv3"
    got = {r["flag"]: round(r["ap"], 6) for r in df.collect()}
    want = {r["flag"]: round(r["ap"], 6) for r in mgr._direct(q).collect()}
    assert got == want


def test_no_match_falls_back(spark, sales):
    mgr = MVManager(sales)
    mgr.create("mv4", ["flag"], [AggSpec("sum", "qty")])
    # agg not stored in MV → direct
    q = QuerySpec(group_cols=["flag"], aggs={"sp": AggSpec("sum", "price")})
    df, used = mgr.answer(q)
    assert used is None
    assert df.count() == 2
    # group col not in MV → direct
    q2 = QuerySpec(group_cols=["qty"], aggs={"sq": AggSpec("sum", "qty")})
    assert mgr.answer(q2)[1] is None


def test_stale_mv_not_used_until_refresh(spark, sales):
    mgr = MVManager(sales)
    mgr.create("mv5", ["flag"], [AggSpec("sum", "qty"), AggSpec("count", "*")])
    sales.insert(spark.range(1000, 1100).select(
        "id", F.lit("A").alias("flag"), F.lit(1.0).alias("qty"),
        F.lit(2.0).alias("price"),
        F.lit("2024-02-01 00:00:00").cast("timestamp_ntz").alias("ts")))
    q = QuerySpec(group_cols=["flag"],
                  aggs={"total": AggSpec("sum", "qty"), "n": AggSpec("count", "*")})
    df, used = mgr.answer(q)
    assert used is None                           # stale → sound fallback
    n_before = {r["flag"]: r["n"] for r in df.collect()}
    assert n_before["A"] == 334 + 100
    mgr.refresh("mv5")                            # incremental (new segment only)
    df2, used2 = mgr.answer(q)
    assert used2 == "mv5"
    assert {r["flag"]: r["n"] for r in df2.collect()} == n_before


def test_incremental_refresh_reads_only_new_segments(spark, sales):
    """refresh(incremental=True) must aggregate ONLY the segments
    loaded since the watermark (reference MVRefresher.scala:61-200),
    and the merged MV must equal a full rebuild — including AVG,
    whose correctness rests on the SUM/COUNT decomposition
    (MVRefresher.scala:194): per-group sizes differ across segments,
    so avg-of-avgs would be wrong here."""
    mgr = MVManager(sales)
    mgr.create("mv_inc", ["flag"], [AggSpec("avg", "qty")])
    sales.insert(spark.range(1000, 1100).select(
        "id", F.lit("A").alias("flag"), F.lit(99.0).alias("qty"),
        F.lit(2.0).alias("price"),
        F.lit("2024-02-01 00:00:00").cast("timestamp_ntz").alias("ts")))
    seen: list = []
    orig = mgr._aggregate_source

    def spy(meta, segments):
        seen.append(segments)
        return orig(meta, segments)

    mgr._aggregate_source = spy
    mgr.refresh("mv_inc", incremental=True)
    assert seen == [[1]], f"refresh read segments {seen}, not the delta"
    q = QuerySpec(group_cols=["flag"],
                  aggs={"a": AggSpec("avg", "qty"),
                        "n": AggSpec("count", "*")})
    df, used = mgr.answer(q)
    assert used == "mv_inc"
    direct = mgr._direct(q)
    got = {r["flag"]: (round(r["a"], 9), r["n"]) for r in df.collect()}
    want = {r["flag"]: (round(r["a"], 9), r["n"]) for r in direct.collect()}
    assert got == want


def test_timeseries_rollup(spark, sales):
    mgr = MVManager(sales)
    mgr.create("mv6", ["flag"], [AggSpec("sum", "qty"), AggSpec("count", "*")],
               timeseries=("ts", "minute"))
    # query at hour granularity → rolls up from minute buckets
    q = QuerySpec(group_cols=["flag"],
                  aggs={"total": AggSpec("sum", "qty"), "n": AggSpec("count", "*")},
                  timeseries=("ts", "hour"))
    df, used = mgr.answer(q)
    assert used == "mv6"
    d = mgr._direct(q)
    assert (_rows(df, "flag", "ts_bucket", "total", "n")
            == _rows(d, "flag", "ts_bucket", "total", "n"))
    # finer than MV → fallback
    qf = QuerySpec(group_cols=["flag"],
                   aggs={"n": AggSpec("count", "*")}, timeseries=("ts", "second"))
    assert mgr.answer(qf)[1] is None


def test_deferred_refresh(spark, sales):
    mgr = MVManager(sales)
    mgr.create("mv7", ["flag"], [AggSpec("count", "*")], deferred=True)
    q = QuerySpec(group_cols=["flag"], aggs={"n": AggSpec("count", "*")})
    assert mgr.answer(q)[1] is None               # not usable before refresh
    mgr.refresh("mv7")
    assert mgr.answer(q)[1] == "mv7"


def test_show_and_drop(spark, sales):
    mgr = MVManager(sales)
    mgr.create("mva", ["flag"], [AggSpec("count", "*")])
    mgr.create("mvb", ["flag"], [AggSpec("sum", "qty")])
    assert {m["name"] for m in mgr.show()} == {"mva", "mvb"}
    mgr.drop("mva")
    assert {m["name"] for m in mgr.show()} == {"mvb"}
