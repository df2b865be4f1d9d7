"""Skew mitigation: salted joins and two-phase aggregation.

AQE's skew-join handling (on by default in the session factory) splits
oversized SORT-MERGE partitions at runtime, but two shapes still die on
heavy-hitter keys at 100 TB:

- a shuffled hash/sort-merge join where ONE key holds >2 GB (AQE can
  split the partition, but every split still pairs with the full other
  side of that key) → ``salted_join`` spreads the hot key across
  ``salt_n`` reducers by salting the big side and replicating only the
  small side's matching rows salt_n ways;
- a high-cardinality groupBy where one key dominates → ``salted_agg``
  pre-aggregates on (key, salt) so the hot key's rows combine in
  salt_n parallel partials before the final (tiny) re-aggregation.

Salts are deterministic (hash of the row's columns, no RNG) so retries
and speculative tasks reproduce the same partitioning — the property
that keeps exactly-once sinks consistent.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt__"


def _row_salt(df: DataFrame, salt_n: int) -> Column:
    # deterministic per-row value: hash of every column. Identical rows
    # share a salt — harmless, they'd land together anyway.
    return F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(salt_n))


def salted_join(big: DataFrame, small: DataFrame, on: Sequence[str],
                how: str = "inner", salt_n: int = 16) -> DataFrame:
    """Equi-join where ``big`` carries skewed join keys and ``small``
    is too large to broadcast but far smaller than ``big``. The big
    side gets a deterministic salt in [0, salt_n); the small side is
    exploded ×salt_n so every (key, salt) pair finds its match — the
    hot key's rows now spread over salt_n reducers instead of one.

    Cost model: small side shuffles salt_n× its size; worth it when
    bytes(small)×salt_n ≪ bytes(big's hottest key). Supported hows:
    inner / left (the preserved side must be the salted big side)."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    on = list(on)
    b = big.withColumn(_SALT, _row_salt(big, salt_n))
    s = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(salt_n)])))
    return b.join(s, on + [_SALT], how).drop(_SALT)


def salted_agg(df: DataFrame, keys: Sequence[str],
               aggs: dict[str, str], salt_n: int = 16) -> DataFrame:
    """Two-phase aggregation for skewed group keys. ``aggs`` maps
    column → one of sum/count/min/max (the algebraic aggregates that
    re-combine losslessly). Phase 1 groups by (keys, salt) — the hot
    key combines in salt_n parallel partials; phase 2 re-combines the
    ≤ salt_n partial rows per key. Output columns: ``<agg>_<col>``."""
    _MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    _FIRST = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    bad = {a for a in aggs.values() if a not in _MERGE}
    if bad:
        raise ValueError(f"unsupported aggs {bad}; use sum/count/min/max")
    keys = list(keys)
    salted = df.withColumn(_SALT, _row_salt(df, salt_n))
    phase1 = salted.groupBy(*keys, _SALT).agg(*[
        _FIRST[a](c).alias(f"{a}_{c}") for c, a in aggs.items()])
    return phase1.groupBy(*keys).agg(*[
        _MERGE[a](f"{a}_{c}").alias(f"{a}_{c}") for c, a in aggs.items()])
