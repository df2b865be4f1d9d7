"""Skyline operator (operators/skyline.py): both execution paths
against the O(n²) dominance definition, duplicate handling, direction
flips, and the candidate-cap guard."""

from __future__ import annotations

import random

import pytest

from cdh_integrate_carbondata2_3_spark.operators.skyline import skyline


def _brute(rows, dirs):
    def key(r, i):
        return r[i] if dirs[i] == "max" else -r[i]

    out = []
    for p in rows:
        if not any(
                all(key(q, i) >= key(p, i) for i in range(len(dirs)))
                and any(key(q, i) > key(p, i) for i in range(len(dirs)))
                for q in rows):
            out.append(p)
    return sorted(out)


@pytest.mark.parametrize("seed", [7, 21, 99])
def test_skyline_matches_bruteforce(spark, seed):
    rng = random.Random(seed)
    d = rng.choice([2, 3, 4])
    n = rng.randint(1, 150)
    rows = [tuple(rng.randint(0, 8) for _ in range(d)) for _ in range(n)]
    dirs = [rng.choice(["max", "min"]) for _ in range(d)]
    cols = [f"c{i}" for i in range(d)]
    df = spark.createDataFrame(
        rows, ", ".join(f"{c} int" for c in cols)).repartition(5)
    got = sorted(tuple(r[c] for c in cols)
                 for r in skyline(df, cols, dirs).collect())
    assert got == _brute(rows, dirs)


def test_skyline_2d_keeps_exact_duplicates(spark):
    # equal points never dominate each other: both copies survive
    rows = [(5, 5), (5, 5), (4, 6), (1, 1)]
    df = spark.createDataFrame(rows, "a int, b int")
    got = sorted((r["a"], r["b"]) for r in skyline(df, ["a", "b"]).collect())
    assert got == [(4, 6), (5, 5), (5, 5)]


def test_skyline_nd_candidate_cap_raises(spark):
    # an anti-diagonal: EVERY point is on the frontier → candidates
    # exceed the cap and the guard raises instead of a silent OOM
    rows = [(i, 100 - i, 0) for i in range(50)]
    df = spark.createDataFrame(rows, "a int, b int, c int").repartition(4)
    with pytest.raises(Exception, match="max_candidates"):
        skyline(df, ["a", "b", "c"], max_candidates=10).collect()


def test_skyline_2d_continuous_bruteforce(spark):
    # continuous (float) criteria — the case where distinct pairs ≈ N
    # and the pre-r6 plan sorted the whole corpus on one task; the
    # local-frontier phase must not change the answer
    rng = random.Random(5)
    rows = [(rng.random(), rng.random()) for _ in range(500)]
    df = spark.createDataFrame(rows, "a double, b double").repartition(7)
    got = sorted((r["a"], r["b"])
                 for r in skyline(df, ["a", "b"]).collect())
    assert got == _brute(rows, ["max", "max"])


def test_skyline_2d_window_input_is_reduced_frontier(spark):
    """Plan assert (r5 verdict item 3): the 2-D path's global
    single-partition window must consume the phase-1 local-frontier
    MapInPandas output, never the raw corpus — i.e. every
    SinglePartition exchange in the plan sits above the frontier
    reduction. The final broadcast semi-join re-reads the corpus but
    shuffles nothing."""
    df = spark.createDataFrame(
        [(float(i), float(-i)) for i in range(100)],
        "a double, b double").repartition(4)
    plan = skyline(df, ["a", "b"])._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    lines = plan.splitlines()
    win = next(i for i, ln in enumerate(lines) if "Window" in ln)
    mip = next(i for i, ln in enumerate(lines) if "MapInPandas" in ln)
    single = next(i for i, ln in enumerate(lines)
                  if "SinglePartition" in ln)
    # tree prints root-first: Window above the SinglePartition
    # exchange above the MapInPandas frontier reduction
    assert win < single < mip, plan
    # and the corpus side of the semi-join is broadcast, not shuffled
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan


def test_skyline_validates_inputs(spark):
    df = spark.createDataFrame([(1, 2)], "a int, b int")
    with pytest.raises(ValueError, match=">= 2"):
        skyline(df, ["a"])
    with pytest.raises(ValueError, match="max|min"):
        skyline(df, ["a", "b"], ["max", "up"])
    with pytest.raises(ValueError, match="pair"):
        skyline(df, ["a", "b"], ["max"])


def test_nd_phase1_keeps_shuffle_boundary(spark):
    """The global pass must sit behind an Exchange (repartition), not
    a Coalesce: coalescing to 1 would merge phase 1 into the single
    final task and run the whole local-frontier scan serially
    (measured 17 s vs 2.6 s on 4.5 M rows × 3 criteria)."""
    df = spark.range(0, 5000).selectExpr(
        "id", "rand(1) as a", "rand(2) as b", "rand(3) as c")
    plan = skyline(df, ["a", "b", "c"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" in plan or "REPARTITION" in plan, plan
    assert "Coalesce" not in plan, plan


def test_null_and_nan_criteria_are_incomparable(spark):
    """NULL/NaN criterion rows are excluded from domination analysis
    and returned unconditionally — for BOTH the 2-D and n-d paths
    (pre-r6 they disagreed: n-d's semi-join silently dropped them)."""
    rows = [(1, 5.0, 5.0, 5.0), (2, None, 9.0, 9.0),
            (3, 1.0, 1.0, 1.0), (4, float("nan"), 0.0, 0.0)]
    df = spark.createDataFrame(
        rows, "id bigint, a double, b double, c double")
    got3 = {r["id"] for r in skyline(df, ["a", "b", "c"]).collect()}
    assert got3 == {1, 2, 4}          # 3 dominated by 1; 2 and 4 kept
    got2 = {r["id"] for r in skyline(df.select("id", "a", "b"),
                                     ["a", "b"]).collect()}
    assert got2 == {1, 2, 4}
