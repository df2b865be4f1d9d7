"""frequent_pairs (operators/mining.py): brute-force parity, the
A-priori L1 pre-prune, and both hot-basket guard modes on a
degenerate 10⁴-pair basket."""

from __future__ import annotations

from itertools import combinations

import pytest
from pyspark.sql import functions as F

from cdh_integrate_carbondata2_3_spark.operators.mining import (
    frequent_pairs)


def _brute(rows, min_support=1):
    baskets = {}
    for b, i in rows:
        baskets.setdefault(b, set()).add(i)
    sup = {}
    for items in baskets.values():
        for a, b in combinations(sorted(items), 2):
            sup[(a, b)] = sup.get((a, b), 0) + 1
    return {k: v for k, v in sup.items() if v >= min_support}


ROWS = [(1, 10), (1, 20), (1, 30), (1, 10),          # dup item in basket
        (2, 10), (2, 20),
        (3, 10), (3, 20), (3, 40),
        (4, 40), (4, 50),
        (5, 60)]                                      # singleton basket


def test_matches_brute_force(spark):
    df = spark.createDataFrame(ROWS, "b int, i int")
    got = {(r["item_a"], r["item_b"]): r["support"]
           for r in frequent_pairs(df, "b", "i").collect()}
    assert got == _brute(ROWS)


def test_l1_prune_matches_filtered_brute_force(spark):
    df = spark.createDataFrame(ROWS, "b int, i int")
    got = {(r["item_a"], r["item_b"]): r["support"]
           for r in frequent_pairs(df, "b", "i",
                                   min_support=2).collect()}
    assert got == _brute(ROWS, min_support=2)
    # the prune must not create pairs either: supports agree exactly
    assert got == {(10, 20): 3}


def test_l1_prune_drops_rare_items_before_pairing(spark):
    # item 99 appears in one basket only — with min_support=2 it must
    # not survive to the pair stage even though it co-occurs
    rows = ROWS + [(1, 99), (2, 77), (3, 77)]
    df = spark.createDataFrame(rows, "b int, i int")
    got = {(r["item_a"], r["item_b"]): r["support"]
           for r in frequent_pairs(df, "b", "i",
                                   min_support=2).collect()}
    assert got == _brute(rows, min_support=2)
    assert not any(99 in p for p in got)


def test_oversize_basket_raises(spark):
    rows = [(1, i) for i in range(200)] + [(2, 1), (2, 2)]
    df = spark.createDataFrame(rows, "b int, i int")
    with pytest.raises(Exception, match="basket_cap"):
        frequent_pairs(df, "b", "i", basket_cap=50).collect()


def test_oversize_basket_truncates_deterministically(spark):
    rows = [(1, i) for i in range(200)] + [(2, 1), (2, 2)]
    df = spark.createDataFrame(rows, "b int, i int")
    got = frequent_pairs(df, "b", "i", basket_cap=50,
                         on_oversize="truncate")
    sup = {(r["item_a"], r["item_b"]): r["support"]
           for r in got.collect()}
    # kept: the 50 smallest items of basket 1 (0..49) -> C(50,2)
    # distinct pairs; basket 2's (1,2) merges into that set with
    # support 2
    assert len(sup) == 50 * 49 // 2
    assert (0, 49) in sup and sup[(1, 2)] == 2
    assert (0, 50) not in sup and (50, 51) not in sup


def test_normal_baskets_unaffected_by_guard(spark):
    df = spark.createDataFrame(ROWS, "b int, i int")
    base = {(r["item_a"], r["item_b"]): r["support"]
            for r in frequent_pairs(df, "b", "i").collect()}
    trunc = {(r["item_a"], r["item_b"]): r["support"]
             for r in frequent_pairs(df, "b", "i", basket_cap=3,
                                     on_oversize="truncate").collect()}
    assert base == trunc


def test_bad_args_rejected(spark):
    df = spark.createDataFrame(ROWS, "b int, i int")
    with pytest.raises(ValueError, match="on_oversize"):
        frequent_pairs(df, "b", "i", on_oversize="explode")
    with pytest.raises(ValueError, match="basket_cap"):
        frequent_pairs(df, "b", "i", basket_cap=1)


def test_no_unpartitioned_window_in_gate_plan(spark, sf_dir):
    """The gate's rank attaches AFTER an explicit limit: the executed
    plan must contain TakeOrderedAndProject and any Window must sit
    above the k-row slice (never over the full pair frame)."""
    from cdh_integrate_carbondata2_3_spark.queries import all_queries
    q = all_queries()["mine_frequent_pairs"]
    df = q.fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
