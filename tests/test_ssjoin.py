"""Exact Jaccard similarity join (operators/ssjoin.py): brute-force
parity, prefix-filter completeness on crafted edge pairs, and the
no-cross-join plan guarantee."""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F

from cdh_integrate_carbondata2_3_spark.operators.ssjoin import (
    canonicalize, jaccard_join)


def _brute(rows, t):
    out = set()
    sets = {i: set(toks) for i, toks in rows}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if union and inter / union >= t:
            out.add((a, b))
    return out


def test_matches_brute_force_random(spark):
    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(60)]
    rows = [(i, rng.sample(vocab, rng.randint(3, 12)))
            for i in range(120)]
    df = spark.createDataFrame(rows, "id bigint, toks array<string>")
    for t in (0.5, 0.7, 0.9):
        got = {(r["id_l"], r["id_r"]) for r in
               jaccard_join(df, "id", "toks", t).collect()}
        assert got == _brute(rows, t), f"t={t}"


def test_exact_boundary_pairs(spark):
    rows = [
        (1, ["a", "b", "c", "d"]),
        (2, ["a", "b", "c", "e"]),     # jacc 3/5 = 0.6 with 1
        (3, ["a", "b", "c", "d"]),     # jacc 1.0 with 1
        (4, ["x", "y"]),               # disjoint
        (5, ["a", "b"]),               # jacc 2/4 = 0.5 with 1
    ]
    df = spark.createDataFrame(rows, "id bigint, toks array<string>")
    got = {(r["id_l"], r["id_r"]): r["jacc"] for r in
           jaccard_join(df, "id", "toks", 0.6).collect()}
    assert set(got) == {(1, 2), (1, 3), (2, 3)}
    assert got[(1, 3)] == 1.0 and got[(1, 2)] == 0.6
    # threshold exactly at a pair's score keeps it; just above drops
    assert {(r["id_l"], r["id_r"]) for r in
            jaccard_join(df, "id", "toks", 0.61).collect()} == {(1, 3)}


def test_duplicate_tokens_are_set_semantics(spark):
    rows = [(1, ["a", "a", "b"]), (2, ["b", "a"])]
    df = spark.createDataFrame(rows, "id bigint, toks array<string>")
    got = [(r["id_l"], r["id_r"], r["jacc"]) for r in
           jaccard_join(df, "id", "toks", 0.9).collect()]
    assert got == [(1, 2, 1.0)]


def test_plan_has_no_cross_join_and_no_python(spark):
    rows = [(i, [f"w{j}" for j in range(i % 5 + 2)]) for i in range(50)]
    df = spark.createDataFrame(rows, "id bigint, toks array<string>")
    out = jaccard_join(df, "id", "toks", 0.8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert "EvalPython" not in plan
    out.collect()


def test_canonical_order_is_rarest_first(spark):
    rows = [(1, ["common", "rare1"]), (2, ["common", "rare2"]),
            (3, ["common"])]
    df = spark.createDataFrame(rows, "id bigint, toks array<string>")
    c = {r["id"]: r["toks"] for r in
         canonicalize(df, "id", "toks").collect()}
    assert c[1] == ["rare1", "common"]
    assert c[2] == ["rare2", "common"]


def test_on_hot_lsh_completes_where_raise_fails(spark):
    """u³-style skew: a family of sets built entirely from a handful
    of frequent tokens drives every prefix bucket over the cap. The
    default mode raises (explicit quadratic-death guard); with
    on_hot='lsh' the hot buckets route through banded MinHash, the
    join COMPLETES under the same cap, and — because every candidate
    passes the same exact verification — every reported pair is a
    true >= t match, with near-full recall at this size."""
    import pytest
    rng = random.Random(7)
    hot_vocab = [f"h{i}" for i in range(8)]     # tiny hot vocabulary
    rows = [(i, rng.sample(hot_vocab, 6)) for i in range(300)]
    # plus a cold tail that the exact path still handles
    cold_vocab = [f"c{i}" for i in range(500)]
    rows += [(1000 + i, rng.sample(cold_vocab, 8)) for i in range(60)]
    df = spark.createDataFrame(rows, "id bigint, toks array<string>")
    t = 0.7
    with pytest.raises(Exception, match="bucket_cap"):
        jaccard_join(df, "id", "toks", t, bucket_cap=50).collect()
    # explicit lsh_rows=4: the hot family here is tiny (300 sets),
    # so the more-collision-permissive signature is affordable and
    # pushes recall at J=0.714 to ~0.99; the threshold-adaptive
    # default (rows=6 at τ=0.7) is for production-sized hot slices
    got = {(r["id_l"], r["id_r"]) for r in
           jaccard_join(df, "id", "toks", t, bucket_cap=50,
                        on_hot="lsh", lsh_rows=4).collect()}
    exp = _brute(rows, t)
    assert got <= exp, "LSH fallback reported a false positive"
    assert len(got) >= 0.9 * len(exp), \
        f"hot-slice recall too low: {len(got)}/{len(exp)}"


def test_on_hot_lsh_equals_exact_when_no_hot_buckets(spark):
    """With no bucket over the cap the LSH path contributes nothing:
    on_hot='lsh' must return exactly the exact-mode result."""
    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(80)]
    rows = [(i, rng.sample(vocab, rng.randint(4, 10)))
            for i in range(100)]
    df = spark.createDataFrame(rows, "id bigint, toks array<string>")
    a = {(r["id_l"], r["id_r"]) for r in
         jaccard_join(df, "id", "toks", 0.6).collect()}
    b = {(r["id_l"], r["id_r"]) for r in
         jaccard_join(df, "id", "toks", 0.6, on_hot="lsh").collect()}
    assert a == b == _brute(rows, 0.6)
