"""Salted join / two-phase agg (operators/skew.py): results must equal
the unsalted plans exactly; the salted agg's phase-1 must spread a hot
key across multiple partial groups."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdh_integrate_carbondata2_3_spark.operators.skew import (
    salted_agg, salted_join)


def _skewed(spark, n_hot=5000, n_tail=200):
    hot = spark.range(n_hot).select(
        F.lit(0).alias("k"), (F.col("id") % 97).alias("v"))
    tail = spark.range(n_tail).select(
        (F.col("id") % 50 + 1).alias("k"), F.col("id").alias("v"))
    return hot.unionByName(tail)


def test_salted_join_matches_plain_join(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(20)], "k bigint, name string")
    got = salted_join(big, small, ["k"], "inner", salt_n=8)
    want = big.join(small, ["k"])
    assert got.count() == want.count()
    assert got.groupBy("k").count().orderBy("k").collect() == \
        want.groupBy("k").count().orderBy("k").collect()
    assert sorted(got.columns) == sorted(want.columns)


def test_salted_left_join_preserves_unmatched(spark):
    big = _skewed(spark, n_hot=100, n_tail=100)
    small = spark.createDataFrame([(0, "zero")], "k bigint, name string")
    got = salted_join(big, small, ["k"], "left", salt_n=4)
    assert got.count() == big.count()
    assert got.filter(F.col("name").isNull()).count() == \
        big.filter(F.col("k") != 0).count()


def test_salted_agg_matches_plain_agg(spark):
    df = _skewed(spark)
    got = {(r["k"]): (r["sum_v"], r["count_v"], r["max_v"])
           for r in salted_agg(df, ["k"], {"v": "sum"}, salt_n=8)
           .join(salted_agg(df, ["k"], {"v": "count"}, salt_n=8), "k")
           .join(salted_agg(df, ["k"], {"v": "max"}, salt_n=8), "k")
           .collect()}
    want = {r["k"]: (r["s"], r["c"], r["m"])
            for r in df.groupBy("k").agg(
                F.sum("v").alias("s"), F.count("v").alias("c"),
                F.max("v").alias("m")).collect()}
    assert got == want


def test_salted_agg_phase1_spreads_hot_key(spark):
    df = _skewed(spark)
    from cdh_integrate_carbondata2_3_spark.operators import skew
    salted = df.withColumn("s", skew._row_salt(df, 8))
    n_partials = (salted.filter(F.col("k") == 0)
                  .select("s").distinct().count())
    assert n_partials > 1        # the hot key really splits


def test_salted_agg_rejects_nonalgebraic(spark):
    df = _skewed(spark, 10, 10)
    try:
        salted_agg(df, ["k"], {"v": "avg"})
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
