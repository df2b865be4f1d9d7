"""Heavy hitters (operators/heavyhitters.py): exactness vs full
groupBy on skewed data, the certificate failure mode, and the
bounded-memory per-partition summary."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdh_integrate_carbondata2_3_spark.operators.heavyhitters import (
    heavy_hitters)


def _zipf(spark, n=20000, keys=500):
    # key j appears ~ n/(j+1) times — heavy head, long tail
    return (spark.range(n)
            .select(F.concat(F.lit("k"), F.expr(
                f"cast(floor(sqrt(id % {keys * keys}) ) as int)"))
                .alias("key"))
            .repartition(8))


def test_exact_topk_matches_full_groupby(spark):
    df = _zipf(spark)
    got = [(r["key"], r["cnt"]) for r in
           heavy_hitters(df, "key", k=10, m=256).collect()]
    exp = [(r["key"], r["cnt"]) for r in
           (df.groupBy("key").agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("key")).limit(10)).collect()]
    assert got == exp


def test_certificate_rejects_undersized_m(spark):
    # near-uniform keys: no count can clear N/m for small m → the
    # function must refuse rather than return a maybe-wrong top-k
    df = spark.range(5000).select(
        F.concat(F.lit("u"), (F.col("id") % 2500)).alias("key"))
    with pytest.raises(ValueError, match="increase m"):
        heavy_hitters(df, "key", k=5, m=8)


def test_fewer_distinct_than_k_is_trivially_exact(spark):
    df = spark.range(100).select((F.col("id") % 3).alias("key"))
    got = {r["key"]: r["cnt"] for r in
           heavy_hitters(df, "key", k=10, m=64).collect()}
    assert got == {"0": 34, "1": 33, "2": 33}


def test_partition_summary_is_bounded(spark):
    """The per-partition MG summary never exceeds m keys even with
    every row distinct — the memory guarantee the full groupBy
    lacks."""
    from cdh_integrate_carbondata2_3_spark.operators.heavyhitters import (
        _mg_partition)
    import pandas as pd
    run = _mg_partition("key", m=16)
    batches = [pd.DataFrame({"key": [f"x{i}_{b}" for i in range(1000)]})
               for b in range(5)]
    out = list(run(iter(batches)))
    assert len(out) == 1 and len(out[0]) <= 16


def test_nulls_ignored(spark):
    df = spark.createDataFrame(
        [("a",)] * 5 + [(None,)] * 10 + [("b",)] * 3, "key string")
    got = [(r["key"], r["cnt"]) for r in
           heavy_hitters(df, "key", k=2, m=32).collect()]
    assert got == [("a", 5), ("b", 3)]
