"""Randomized SQL-equivalence fuzz: the engine's SELECT surface
(pre-parse → metadata fast paths → manifest pruning → delta-masked
read) must agree with vanilla Spark SQL over the same logical rows
for arbitrary filter/aggregate/order shapes.

The table carries TWO segments plus a DELETE delta, so random
predicates continuously exercise file pruning, the metadata-only
COUNT/MIN/MAX rewrites (and their delta guards), and the mor/CoW
read mask — any fast path that changes semantics shows up as a row
diff with the generating seed printed."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from cdh_integrate_carbondata2_3_spark.sql import Engine

_SEED = 0xC0FFEE
_N_QUERIES = 40
_DEL_PRED = "o_orderkey % 97 = 13"

_NUM_COLS = ["o_orderkey", "o_custkey"]
_STR_COLS = ["o_orderstatus", "o_orderpriority"]
_AGGS = ["COUNT(*)", "COUNT(o_orderpriority)", "MIN(o_totalprice)",
         "MAX(o_custkey)", "SUM(o_custkey)",
         "COUNT(DISTINCT o_orderstatus)", "MIN(o_orderpriority)",
         "MAX(o_orderkey)"]


def _rand_pred(rng: random.Random) -> str:
    kind = rng.randrange(6)
    if kind == 0:
        return (f"{rng.choice(_NUM_COLS)} "
                f"{rng.choice(['<', '<=', '>', '>=', '=', '!='])} "
                f"{rng.randrange(0, 3000)}")
    if kind == 1:
        lo = rng.randrange(0, 2000)
        return (f"{rng.choice(_NUM_COLS)} BETWEEN {lo} "
                f"AND {lo + rng.randrange(1, 2000)}")
    if kind == 2:
        return (f"o_orderstatus IN "
                f"({', '.join(repr(c) for c in rng.sample(['F', 'O', 'P'], rng.randrange(1, 3)))})")
    if kind == 3:
        return f"o_orderpriority LIKE '{rng.randrange(1, 6)}%'"
    if kind == 4:
        return f"{rng.choice(_STR_COLS)} IS NOT NULL"
    return f"o_custkey % {rng.randrange(2, 9)} = {rng.randrange(0, 2)}"


def _rand_query(rng: random.Random, table: str) -> str:
    where = ""
    if rng.random() < 0.8:
        preds = [_rand_pred(rng) for _ in range(rng.randrange(1, 3))]
        where = " WHERE " + f" {rng.choice(['AND', 'OR'])} ".join(preds)
    shape = rng.randrange(4)
    if shape == 0:                       # plain projection
        cols = rng.sample(_NUM_COLS + _STR_COLS, rng.randrange(1, 4))
        return (f"SELECT {', '.join(cols)} FROM {table}{where} "
                f"ORDER BY {', '.join(cols)}, o_orderkey LIMIT 200")
    if shape == 1:                       # global aggregate
        aggs = rng.sample(_AGGS, rng.randrange(1, 4))
        sel = ", ".join(f"{a} AS a{i}" for i, a in enumerate(aggs))
        return f"SELECT {sel} FROM {table}{where}"
    if shape == 2:                       # grouped aggregate
        g = rng.choice(_STR_COLS)
        aggs = rng.sample(_AGGS, rng.randrange(1, 3))
        sel = ", ".join(f"{a} AS a{i}" for i, a in enumerate(aggs))
        having = (f" HAVING COUNT(*) > {rng.randrange(0, 5)}"
                  if rng.random() < 0.4 else "")
        return (f"SELECT {g}, {sel} FROM {table}{where} "
                f"GROUP BY {g}{having}")
    return (f"SELECT COUNT(*) AS n FROM {table}{where}")


@pytest.fixture(scope="module")
def fuzz_table(spark, sf_dir, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("sqlfuzz"))
    eng = Engine(spark, wh)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    orders.where("o_orderkey % 2 = 0").createOrReplaceTempView("__fz0")
    orders.where("o_orderkey % 2 = 1").createOrReplaceTempView("__fz1")
    # types mirror the driver parquet exactly so engine rows and the
    # vanilla twin stringify identically
    eng.sql("CREATE TABLE fz (o_orderkey BIGINT, o_custkey BIGINT, "
            "o_orderstatus STRING, o_totalprice DOUBLE, "
            "o_orderdate TIMESTAMP, o_orderpriority STRING)")
    cols = ("o_orderkey, o_custkey, o_orderstatus, o_totalprice, "
            "o_orderdate, o_orderpriority")
    eng.sql(f"INSERT INTO fz SELECT {cols} FROM __fz0")
    eng.sql(f"INSERT INTO fz SELECT {cols} FROM __fz1")
    eng.sql(f"DELETE FROM fz WHERE {_DEL_PRED}")
    # the vanilla-Spark twin: same logical rows, no engine involved
    orders.where(f"NOT ({_DEL_PRED})").createOrReplaceTempView("fz_ref")
    return eng


def test_random_selects_match_vanilla_spark(spark, fuzz_table):
    rng = random.Random(_SEED)
    for i in range(_N_QUERIES):
        q = _rand_query(rng, "fz")
        got = sorted(map(str, fuzz_table.sql(q).collect()))
        want = sorted(map(str, spark.sql(q.replace("FROM fz", "FROM fz_ref")).collect()))
        assert got == want, f"seed={_SEED} query #{i}: {q}"


def test_metadata_fast_paths_under_fuzz_table(spark, fuzz_table):
    """The delta-masked table must still answer metadata-prone shapes
    exactly (COUNT(*) exact under deltas; MIN/MAX falls back to scan
    when deltas could bite)."""
    n = fuzz_table.sql("SELECT COUNT(*) AS n FROM fz").collect()[0]["n"]
    want = spark.sql("SELECT COUNT(*) AS n FROM fz_ref").collect()[0]["n"]
    assert n == want
    row = fuzz_table.sql(
        "SELECT MIN(o_orderkey) AS lo, MAX(o_orderkey) AS hi FROM fz"
    ).collect()[0]
    wrow = spark.sql(
        "SELECT MIN(o_orderkey) AS lo, MAX(o_orderkey) AS hi FROM fz_ref"
    ).collect()[0]
    assert (row["lo"], row["hi"]) == (wrow["lo"], wrow["hi"])
