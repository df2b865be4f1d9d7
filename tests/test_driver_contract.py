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
