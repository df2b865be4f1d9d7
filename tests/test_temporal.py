"""As-of join and interval range join (operators/temporal.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from cdh_integrate_carbondata2_3_spark.operators.temporal import (
    asof_join,
    range_join,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _quotes(spark):
    return spark.createDataFrame(
        [("a", _ts("2024-01-01 10:00:00"), 1.0),
         ("a", _ts("2024-01-01 10:05:00"), 2.0),
         ("a", _ts("2024-01-01 10:10:00"), 3.0),
         ("b", _ts("2024-01-01 10:03:00"), 9.0)],
        "sym string, ts timestamp_ntz, px double")


def _trades(spark):
    return spark.createDataFrame(
        [("a", _ts("2024-01-01 09:59:00"), 10),   # before any quote
         ("a", _ts("2024-01-01 10:05:00"), 20),   # exact tie → inclusive
         ("a", _ts("2024-01-01 10:07:00"), 30),
         ("a", _ts("2024-01-01 11:00:00"), 40),
         ("b", _ts("2024-01-01 10:04:00"), 50),
         ("c", _ts("2024-01-01 10:00:00"), 60)],  # key with no quotes
        "sym string, ts timestamp_ntz, qty int")


def test_asof_backward(spark):
    out = asof_join(_trades(spark), _quotes(spark), on="sym")
    got = {r["qty"]: r["px"] for r in out.collect()}
    assert got == {10: None, 20: 2.0, 30: 2.0, 40: 3.0, 50: 9.0, 60: None}


def test_asof_forward(spark):
    out = asof_join(_trades(spark), _quotes(spark), on="sym",
                    direction="forward")
    got = {r["qty"]: r["px"] for r in out.collect()}
    # b's only quote (10:03) precedes trade 50 (10:04) → no forward match
    assert got == {10: 1.0, 20: 2.0, 30: 3.0, 40: None, 50: None, 60: None}


def test_asof_tolerance_nulls_far_matches(spark):
    out = asof_join(_trades(spark), _quotes(spark), on="sym",
                    tolerance="INTERVAL 3 MINUTES")
    got = {r["qty"]: r["px"] for r in out.collect()}
    # qty=40 is 50 min after the last quote → nulled by tolerance
    assert got == {10: None, 20: 2.0, 30: 2.0, 40: None, 50: 9.0, 60: None}
    mts = {r["qty"]: r["matched_ts"] for r in out.collect()}
    assert mts[40] is None and mts[20] == _ts("2024-01-01 10:05:00")


def test_asof_keeps_left_rows_and_columns(spark):
    out = asof_join(_trades(spark), _quotes(spark), on="sym")
    assert out.count() == 6
    assert set(out.columns) == {"sym", "ts", "qty", "px", "matched_ts"}


def test_asof_plan_single_key_shuffle_no_nested_loop(spark):
    plan = asof_join(_trades(spark), _quotes(spark), on="sym") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    # one exchange for the window partitioning (plus AQE reads)
    assert plan.count("Exchange hashpartitioning") == 1


def test_range_join_matches_naive_theta(spark):
    quotes, trades = _quotes(spark), _trades(spark)
    left = quotes.select(
        "sym", F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 6 MINUTES")).alias("w_end"), "px")
    got = range_join(left, trades, on="sym", start_col="w_start",
                     end_col="w_end", bucket_s=60)
    naive = (left.join(trades, "sym")
             .filter((F.col("ts") >= F.col("w_start"))
                     & (F.col("ts") < F.col("w_end"))))
    pairs = sorted((r["px"], r["qty"]) for r in got.collect())
    assert pairs == sorted((r["px"], r["qty"]) for r in naive.collect())
    assert pairs == [(1.0, 20), (2.0, 20), (2.0, 30), (9.0, 50)]


def test_range_join_end_exclusive_start_inclusive(spark):
    left = spark.createDataFrame(
        [("a", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 10:05:00"))],
        "k string, s timestamp_ntz, e timestamp_ntz")
    right = spark.createDataFrame(
        [("a", _ts("2024-01-01 10:00:00"), 1),
         ("a", _ts("2024-01-01 10:04:59"), 2),
         ("a", _ts("2024-01-01 10:05:00"), 3)],
        "k string, ts timestamp_ntz, v int")
    got = sorted(r["v"] for r in range_join(
        left, right, on="k", start_col="s", end_col="e",
        bucket_s=300).collect())
    assert got == [1, 2]


def test_range_join_plan_is_equi_join(spark):
    left = _quotes(spark).select(
        "sym", F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 6 MINUTES")).alias("w_end"))
    plan = range_join(left, _trades(spark), on="sym", start_col="w_start",
                      end_col="w_end", bucket_s=60) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
