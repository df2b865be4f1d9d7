"""Fast sanity checks for the declared query surface: every registry
entry runs at sf0.001 and produces a stable schema. Full value-level
verification against DuckDB is tools/check.py (the driver re-runs the
same comparison at sf0.01)."""

from __future__ import annotations

import duckdb
import pytest

from cdh_integrate_carbondata2_3_spark.queries import all_queries
from cdh_integrate_carbondata2_3_spark.sources.registry import TPCH_TABLES

QUERIES = all_queries()


def test_registry_nonempty():
    assert len(QUERIES) >= 40


def test_all_oracles_parse(sf_dir):
    """Every oracle must at least be valid DuckDB SQL."""
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    for name, q in QUERIES.items():
        if q.oracle is not None:
            con.execute(q.oracle).fetchone()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs(spark, sf_dir, name):
    df = QUERIES[name].fn(spark, sf_dir)
    assert df.columns, name
    assert df.count() >= 0


def test_phase_registry_records_lifecycle_builds(spark, sf_dir):
    """bench.py's per-phase split (VERDICT r10 next-round 7) relies on
    the phase registry: the two instrumented lifecycle gates must
    record their setup phases on every invocation, and reset must
    clear them."""
    from cdh_integrate_carbondata2_3_spark import queries as qreg

    qreg.reset_phases()
    QUERIES["table_hilbert_prune"].fn(spark, sf_dir).count()
    ph = qreg.phase_report()["table_hilbert_prune"]
    assert ph["build_s"] > 0
    qreg.reset_phases()
    QUERIES["table_mixed_compact"].fn(spark, sf_dir).count()
    ph = qreg.phase_report()["table_mixed_compact"]
    assert ph["build_s"] > 0 and ph["compact_s"] > 0
    qreg.reset_phases()
    assert qreg.phase_report() == {}
