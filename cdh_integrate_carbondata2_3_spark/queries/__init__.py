"""Query registry — the engine's declared operator surface.

Each query is a (spark, sf_dir) -> DataFrame callable plus (where
SQL-expressible) an ANSI-SQL oracle that DuckDB runs on the same
parquet for the driver's correctness gate. Column names are aliased
identically on both sides; aggregate values are computed in DECIMAL
(exact, order-independent) or rounded so both engines hash equal.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query {name!r}")
        REGISTRY[name] = Query(name, fn, oracle)
        return fn
    return deco


def all_queries() -> dict[str, Query]:
    # Import side-effect modules that populate REGISTRY.
    from . import relational, pipeline, geo_queries, dedup_extra  # noqa: F401
    from . import multimodal_queries, lifecycle_queries, subqueries  # noqa: F401
    from . import streaming_queries, lifecycle_extra, tpch_rest  # noqa: F401
    from . import udf_surface, sampling, temporal_queries  # noqa: F401
    return dict(REGISTRY)
