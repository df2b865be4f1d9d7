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


def test_memo_hit_retracks_construction_caches(spark, sf_dir):
    """ADVICE r8: a memo hit after release_caches() (fired by any
    other query) must RE-REGISTER the caches the query built via
    cache_tracked during construction — otherwise re-runs silently
    execute uncached and measure differently from run one."""
    from cdh_integrate_carbondata2_3_spark import queries as Q
    qs = all_queries()
    # similarity_ann_ivf is the plan-only + cache_tracked example the
    # ADVICE named
    ivf = qs["similarity_ann_ivf"].fn
    ivf(spark, sf_dir)
    n_tracked = len(Q._TRACKED_CACHES)
    assert n_tracked > 0, "expected construction-time caches"
    # a DIFFERENT query releases them
    qs["q6_forecast_revenue"].fn(spark, sf_dir)
    assert len(Q._TRACKED_CACHES) == 0
    # memo HIT must re-track (and lazily re-persist) the same frames
    ivf(spark, sf_dir)
    assert len(Q._TRACKED_CACHES) == n_tracked
    for c in Q._TRACKED_CACHES:
        assert c.storageLevel.useMemory, "re-tracked frame not cached"


def test_memo_evicts_dead_sessions(spark, sf_dir):
    from cdh_integrate_carbondata2_3_spark import queries as Q

    class FakeDeadSession:
        @property
        def sparkContext(self):
            raise RuntimeError("stopped")

    key = ("dead", sf_dir, "q6_forecast_revenue")
    Q._PLAN_MEMO[key] = (FakeDeadSession(), None, ())
    # a memo MISS for a live session sweeps dead entries
    Q._PLAN_MEMO.pop((id(spark), sf_dir, "q6_forecast_revenue"), None)
    all_queries()["q6_forecast_revenue"].fn(spark, sf_dir)
    assert key not in Q._PLAN_MEMO
