"""Enforce the _PLAN_ONLY honesty invariant: every whitelisted query
fn must launch ZERO Spark jobs during construction (so memoizing its
returned plan skips only py4j plan-building, never measured work),
and the memo must return the identical plan object within a session
while staying correct across sf_dirs."""

from __future__ import annotations

import pytest

from cdh_integrate_carbondata2_3_spark.queries import (
    _PLAN_MEMO, _PLAN_ONLY, all_queries)
from cdh_integrate_carbondata2_3_spark.sources.registry import (
    TPCH_TABLES, load_table)


def _job_count(spark) -> int:
    return spark._jsparkSession.sparkContext().statusStore() \
        .jobsList(None).size()


def test_plan_only_queries_launch_no_jobs_on_construction(spark, sf_dir):
    qs = all_queries()
    missing = _PLAN_ONLY - set(qs)
    assert not missing, f"_PLAN_ONLY names not registered: {missing}"
    # warm table plans: first load_table per table runs one schema-
    # inference job, which is registry-level, not query-level work
    for t in TPCH_TABLES:
        load_table(spark, sf_dir, t)
    offenders = {}
    for name in sorted(_PLAN_ONLY):
        # bypass run()'s memo — audit the raw fn every time
        fn = qs[name].fn.__wrapped__
        before = _job_count(spark)
        fn(spark, sf_dir)
        ran = _job_count(spark) - before
        if ran:
            offenders[name] = ran
    assert not offenders, (
        f"plan-only queries ran Spark jobs during construction: "
        f"{offenders} — remove them from _PLAN_ONLY")


def test_plan_memo_reuses_within_session_and_splits_on_sf(spark, sf_dir):
    qs = all_queries()
    run = qs["q6_forecast_revenue"].fn
    a = run(spark, sf_dir)
    b = run(spark, sf_dir)
    assert a is b, "memo must return the same plan for same (session, sf)"
    other = "/root/testdata/sf0.01"
    c = run(spark, other)
    assert c is not a, "different sf_dir must construct a fresh plan"
    # and the memoized plan still executes correctly after cache clears
    spark.catalog.clearCache()
    assert run(spark, sf_dir).count() == a.count()


def test_non_plan_only_queries_are_not_memoized(spark, sf_dir):
    qs = all_queries()
    name = "count_star_metadata"
    assert name not in _PLAN_ONLY
    run = qs[name].fn
    a = run(spark, sf_dir)
    before = dict(_PLAN_MEMO)
    b = run(spark, sf_dir)
    assert a is not b
    assert dict(_PLAN_MEMO) == before


@pytest.mark.parametrize("name", ["q1_pricing_summary",
                                  "dedup_exact_groups"])
def test_memoized_plan_recounts_fresh_each_action(spark, sf_dir, name):
    """The memo returns a PLAN: each action re-executes the full query
    (same count twice, and the plan has no InMemoryRelation unless the
    query itself cached one)."""
    run = all_queries()[name].fn
    df = run(spark, sf_dir)
    n1 = df.count()
    n2 = run(spark, sf_dir).count()
    assert n1 == n2 and n1 > 0
