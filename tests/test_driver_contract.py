"""Driver-contract guards: the per-round BENCH/CORRECTNESS machinery
dies on import-time or name-mismatch errors (round 2 lost its whole
bench run to one), so pin the cheap invariants here."""

from __future__ import annotations

import importlib
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_bench_headline_names_exist_in_registry():
    import bench
    from cdh_integrate_carbondata2_3_spark.queries import all_queries

    qs = all_queries()
    missing = [n for n in bench.HEADLINE if n not in qs]
    assert not missing, f"bench.HEADLINE references unknown queries: {missing}"


def test_spark_entry_contract_shape(spark):
    entry_mod = importlib.import_module("__spark_entry__")
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 120
    # every oracle key is a query; all callables
    assert set(oracles) <= set(qs)
    assert all(callable(f) for f in qs.values())
    df = entry_mod.entry(spark)
    assert df.columns and df.count() >= 0


def test_stamp_window_composition():
    """The driver stamps the FIRST 50 queries() entries per round.
    Every never-stamped gate must sit inside that window (a new gate
    outside it would ship unverified), and the rotation lists must
    only name registered queries."""
    import __spark_entry__ as entry
    from cdh_integrate_carbondata2_3_spark.queries import (
        _DEFER_TO_NEXT, _ROTATE_BACK_IN, _STAMPED_PRIOR_ROUNDS)
    qs = list(entry.queries())
    window = set(qs[:50])
    never = [n for n in qs
             if n not in _STAMPED_PRIOR_ROUNDS
             and n not in _ROTATE_BACK_IN
             and n not in _DEFER_TO_NEXT]
    missing = [n for n in never if n not in window]
    assert not missing, (
        f"never-stamped gates outside the 50-slot stamp window: "
        f"{missing}")
    registered = set(qs)
    for lst in (_ROTATE_BACK_IN, _DEFER_TO_NEXT):
        unknown = [n for n in lst if n not in registered]
        assert not unknown, f"rotation names not registered: {unknown}"
