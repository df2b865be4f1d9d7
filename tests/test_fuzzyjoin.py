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
    # 52 strings sharing deletion variant 'xx' → a quadratic block;
    # the guard must raise rather than run it. Since r6 the guard is
    # part of the lazy plan (assert_true riding the join's own
    # shuffle), so construction is job-free and the error surfaces at
    # execution
    rows = [(f"x{c}x",) for c in "abcdefghijklmnopqrstuvwxyz"] \
        + [(f"{c}xx",) for c in "abcdefghijklmnopqrstuvwxyz"]
    L = spark.createDataFrame(rows, "s string")
    j = editdist_join(L, L, "s", "s", max_edits=1, uniq_cap=10)
    with pytest.raises(Exception, match="uniq_cap"):
        j.collect()


def test_editdist_join_single_expansion_and_lazy(spark):
    """The deletion-neighborhood expansion appears exactly once per
    side in the physical plan (the guard's window count reuses the
    join's shuffle instead of running a separate counting pass), and
    constructing the join triggers no Spark job."""
    L = spark.createDataFrame([("cat",), ("dog",)], "s string")
    R = spark.createDataFrame([("cta",), ("dogs",)], "t string")
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    j = editdist_join(L, R, "s", "t", max_edits=1)
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before, "editdist_join construction ran a job"
    plan = j._jdf.queryExecution().executedPlan().toString()
    # one Generate (explode of the neighborhood) per side, not two
    assert plan.count("Generate explode") == 2, plan
    # the guard's window shares the join's exchange: exactly ONE
    # hash-shuffle of each EXPANDED side on __v (window + SMJ reuse
    # it; a separate counting pass would add two more)
    assert plan.count("Exchange hashpartitioning(__v") == 2, plan
    # total: 2 pre-expansion distincts + 2 on __v + 1 final distinct
    assert plan.count("Exchange hashpartitioning") == 5, plan


def test_editdist_join_rejects_bad_edits(spark):
    L = spark.createDataFrame([("a",)], "s string")
    with pytest.raises(ValueError, match="max_edits"):
        editdist_join(L, L, "s", "s", max_edits=3)


def test_sequence_similarity_matches_bruteforce(spark):
    """Length-band blocking is complete: exact parity with a
    brute-force cross join on random variable-length strings, for
    the default band and a caller-narrowed one."""
    import random
    from cdh_integrate_carbondata2_3_spark.operators.fuzzyjoin import (
        sequence_similarity_join)
    rng = random.Random(5)
    rows = [(i, "".join(rng.choice("abcd")
                        for _ in range(rng.randrange(3, 40))))
            for i in range(60)]
    # exact-duplicate trajectories exercise the distinct-first path's
    # dist-0 re-expansion (the replicated-corpus case)
    rows += [(100 + i, rows[i][1]) for i in range(6)]
    df = spark.createDataFrame(rows, "id bigint, s string")
    pdf = dict(rows)

    def brute(maxd):
        import itertools
        def lev(a, b):
            dp = list(range(len(b) + 1))
            for i, ca in enumerate(a, 1):
                prev, dp[0] = dp[0], i
                for j, cb in enumerate(b, 1):
                    prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                             prev + (ca != cb))
            return dp[len(b)]
        return {(a, b, lev(pdf[a], pdf[b]))
                for a, b in itertools.combinations(sorted(pdf), 2)
                if lev(pdf[a], pdf[b]) <= maxd}

    for maxd, band in ((6, None), (6, 2), (15, 4)):
        got = {(r["id_a"], r["id_b"], r["dist"]) for r in
               sequence_similarity_join(df, "id", "s", maxd,
                                        band=band).collect()}
        assert got == brute(maxd), (maxd, band)


def test_sequence_similarity_plan_has_no_cartesian(spark):
    from cdh_integrate_carbondata2_3_spark.operators.fuzzyjoin import (
        sequence_similarity_join)
    df = spark.range(100).selectExpr("id", "repeat('a', cast(id % 30 as int)) as s")
    plan = sequence_similarity_join(df, "id", "s", 5) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_sequence_similarity_rejects_bad_band(spark):
    from cdh_integrate_carbondata2_3_spark.operators.fuzzyjoin import (
        sequence_similarity_join)
    df = spark.createDataFrame([(1, "ab")], "id bigint, s string")
    for bad in (0, -2):
        with pytest.raises(ValueError, match="band must be >= 1"):
            sequence_similarity_join(df, "id", "s", 3, band=bad)
    with pytest.raises(ValueError, match="max_dist"):
        sequence_similarity_join(df, "id", "s", -1)


def test_seqsim_non_unique_ids_no_self_pairs(spark):
    """ADVICE r6: an id carrying two distinct sequences within
    max_dist must not produce a self-pair, and each unordered id
    pair appears ONCE with the minimum distance over its sequence
    combinations."""
    from cdh_integrate_carbondata2_3_spark.operators.fuzzyjoin import (
        sequence_similarity_join)
    rows = [(1, "abcde"), (1, "abcdx"),      # same id, two close seqs
            (2, "abcdy"), (3, "zzzzz")]
    df = spark.createDataFrame(rows, "id bigint, seq string")
    got = {(r["id_a"], r["id_b"]): r["dist"] for r in
           sequence_similarity_join(df, "id", "seq", max_dist=2)
           .collect()}
    assert all(a != b for a, b in got)            # no self-pairs
    # (1,2): min over {abcde~abcdy=1, abcdx~abcdy=1} = 1, one row
    assert got == {(1, 2): 1}
