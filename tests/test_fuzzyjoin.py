"""Edit-distance similarity join (operators/fuzzyjoin): deletion-
neighborhood blocking must be COMPLETE (exactly the edit-distance
join, nothing missed) and never plan a cross join."""

from __future__ import annotations

import random

import pytest

from cdh_integrate_carbondata2_3_spark.operators.fuzzyjoin import (
    editdist_join)


def _lev(a: str, b: str) -> int:
    d = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, d[0] = d[0], i
        for j, cb in enumerate(b, 1):
            prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                   prev + (ca != cb))
    return d[len(b)]


@pytest.mark.parametrize("edits", [1, 2])
def test_editdist_join_matches_bruteforce(spark, edits):
    rng = random.Random(41)
    ls = list({"".join(rng.choice("abc") for _ in range(rng.randint(0, 5)))
               for _ in range(50)})
    rs = list({"".join(rng.choice("abc") for _ in range(rng.randint(0, 5)))
               for _ in range(50)})
    L = spark.createDataFrame([(s,) for s in ls], "s string")
    R = spark.createDataFrame([(t,) for t in rs], "t string")
    got = sorted((r.l, r.r, r.dist)
                 for r in editdist_join(L, R, "s", "t",
                                        max_edits=edits).collect())
    want = sorted((a, b, _lev(a, b))
                  for a in ls for b in rs if _lev(a, b) <= edits)
    assert got == want


def test_editdist_join_no_cross_join(spark):
    L = spark.createDataFrame([("cat",), ("dog",)], "s string")
    R = spark.createDataFrame([("cta",), ("dogs",)], "t string")
    j = editdist_join(L, R, "s", "t", max_edits=1)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    got = {(r.l, r.r) for r in j.collect()}
    assert got == {("dog", "dogs")}


def test_editdist_join_uniq_cap_guards_quadratic_blocks(spark):
    # 60 strings sharing deletion variant 'xx' → a quadratic block;
    # the guard must raise rather than run it
    rows = [(f"x{c}x",) for c in "abcdefghijklmnopqrstuvwxyz"] \
        + [(f"{c}xx",) for c in "abcdefghijklmnopqrstuvwxyz"]
    L = spark.createDataFrame(rows, "s string")
    with pytest.raises(ValueError, match="uniq_cap"):
        editdist_join(L, L, "s", "s", max_edits=1, uniq_cap=10)


def test_editdist_join_rejects_bad_edits(spark):
    L = spark.createDataFrame([("a",)], "s string")
    with pytest.raises(ValueError, match="max_edits"):
        editdist_join(L, L, "s", "s", max_edits=3)
