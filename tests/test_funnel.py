"""Funnel operator semantics on hand-built event sequences: strict
ordering, greedy earliest-next, window cutoff, NULL propagation."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from cdh_integrate_carbondata2_3_spark.operators.funnel import (
    funnel_counts, funnel_times)

_T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, _T0 + dt.timedelta(hours=h), t) for u, h, t in rows],
        "user_id long, ts timestamp, event_type string")


def _steps():
    # built lazily: Column construction needs the JVM, which doesn't
    # exist at pytest collection time
    return [("a", F.col("event_type") == "a"),
            ("b", F.col("event_type") == "b"),
            ("c", F.col("event_type") == "c")]


def test_funnel_strict_order_and_null_propagation(spark):
    rows = [
        (1, 0, "a"), (1, 1, "b"), (1, 2, "c"),     # completes
        (2, 0, "b"), (2, 1, "a"), (2, 2, "c"),     # b BEFORE a → stops at a,c? b missing
        (3, 0, "a"), (3, 1, "c"), (3, 2, "b"),     # c before b → no c after b
        (4, 0, "b"), (4, 1, "c"),                  # never did a → absent
    ]
    t = {r["user_id"]: (r["t1"], r["t2"], r["t3"])
         for r in funnel_times(_ev(spark, rows), _steps()).collect()}
    assert set(t) == {1, 2, 3}
    assert all(v is not None for v in t[1])
    assert t[2][1] is None and t[2][2] is None    # no b after a
    assert t[3][1] is not None and t[3][2] is None  # b at +2, no c after


def test_funnel_greedy_earliest_next(spark):
    # user 1: a@0, b@1, b@5, c@3 — greedy takes b@1, so c@3 qualifies;
    # taking b@5 would have missed c. Greedy must complete.
    rows = [(1, 0, "a"), (1, 1, "b"), (1, 5, "b"), (1, 3, "c")]
    r = funnel_times(_ev(spark, rows), _steps()).collect()[0]
    assert r["t2"] == _T0 + dt.timedelta(hours=1)
    assert r["t3"] == _T0 + dt.timedelta(hours=3)


def test_funnel_window_cutoff(spark):
    rows = [(1, 0, "a"), (1, 1, "b"), (1, 2, "c"),
            (2, 0, "a"), (2, 1, "b"), (2, 50, "c")]   # c outside 24h
    t = {r["user_id"]: r["t3"]
         for r in funnel_times(_ev(spark, rows), _steps(),
                               within_hours=24).collect()}
    assert t[1] is not None and t[2] is None


def test_funnel_counts_and_conversion(spark):
    rows = [(1, 0, "a"), (1, 1, "b"), (1, 2, "c"),
            (2, 0, "a"), (2, 1, "b"),
            (3, 0, "a"),
            (4, 0, "a"), (4, 1, "b"), (4, 2, "c")]
    out = {r["step"]: (r["step_name"], r["n_users"], r["conversion"])
           for r in funnel_counts(_ev(spark, rows), _steps()).collect()}
    assert out[1] == ("a", 4, 1.0)
    assert out[2] == ("b", 3, 0.75)
    assert out[3] == ("c", 2, 0.5)


def test_funnel_empty_first_step(spark):
    rows = [(1, 0, "x")]
    out = funnel_counts(_ev(spark, rows), _steps()).collect()
    assert [(r["n_users"], r["conversion"]) for r in out] == \
        [(0, 0.0)] * 3
