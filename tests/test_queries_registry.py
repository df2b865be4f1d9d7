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
