"""Bucket-map join: shuffle-free equi-join of co-bucketed tables.

Reference parity: CarbonDataSourceScan exposes bucketed scans as
``HashPartitioning`` so a join on the bucket columns skips both
exchanges (integration/spark/src/main/scala/org/apache/spark/sql/
execution/strategy/CarbonDataSourceScan.scala:69-87, bucketing info
from format/src/main/thrift/schema.thrift:171-176).

Spark-first formulation: both tables were loaded via
``repartition(n, bucket_cols)``, so file i on each side holds exactly
the rows with ``pmod(murmur3(cols), n) == i`` — the two sides are
co-partitioned by construction. We therefore join bucket-by-bucket
(the classic Hive *bucket map join*): for each bucket b, scan only
the b-files of each side and hash-join them with the smaller side
broadcast, then union the per-bucket results. The plan contains NO
shuffle exchange — only per-bucket BroadcastExchanges whose size is
``bytes(small side)/n``, which is exactly the knob the table designer
controls with ``bucket_number``.

Scale math (100 TB): a shuffle join of two 10 TB sides moves 20 TB
over the network twice (map write + reduce fetch). With n buckets the
bucket-map join moves only the build side once (10 TB / n per
broadcast, n broadcasts), the probe side streams from local scans,
and AQE never needs to re-plan skew because bucket membership is
fixed at write time. For n=1024 a 10 TB build side broadcasts 10 GB
per bucket — above Spark's default 8 GB broadcast cap, so size
``bucket_number`` to keep bytes/bucket under the cap; the operator
checks nothing at the driver (file sizes are in the manifest if the
caller wants to pre-validate) and Spark will fail loudly if a
broadcast exceeds the hard limit.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog.table import Table

_BROADCAST_RIGHT = {"inner", "left", "left_outer", "leftouter",
                    "left_semi", "leftsemi", "semi",
                    "left_anti", "leftanti", "anti", "cross"}
_BROADCAST_LEFT = {"right", "right_outer", "rightouter"}


def _bucket_spec(t: Table) -> tuple[list[str], int]:
    props = t.manifest.properties()
    cols = props.get("bucket_columns") or []
    n = int(props.get("bucket_number", 0) or 0)
    return list(cols), n


def bucketed_join(left: Table, right: Table, on: Sequence[str],
                  how: str = "inner") -> DataFrame:
    """Join two tables bucketed on ``on`` with equal bucket counts,
    without a shuffle exchange on either side.

    Falls back to a plain (shuffling) join when the tables are not
    co-bucketed on the join keys — the caller always gets a correct
    plan, just not always the co-located one.
    """
    on = list(on)
    lcols, ln = _bucket_spec(left)
    rcols, rn = _bucket_spec(right)
    co_bucketed = (ln > 0 and ln == rn and lcols == rcols
                   and set(lcols) <= set(on))
    if co_bucketed:
        try:
            return _bucket_map_join(left, right, on, how, ln)
        except ValueError:
            # un-bucketed legacy files present → co-location not
            # guaranteed; take the safe plan
            pass
    return left.read().join(right.read(), on=on, how=how)


def _bucket_map_join(left: Table, right: Table, on: list[str],
                     how: str, n: int) -> DataFrame:
    how_norm = how.replace("_", "").lower()
    parts: list[DataFrame] = []
    for b in range(n):
        lb = left.read(bucket_id=b)
        rb = right.read(bucket_id=b)
        if how_norm in {h.replace("_", "") for h in _BROADCAST_LEFT}:
            parts.append(F.broadcast(lb).join(rb, on=on, how=how))
        elif how_norm in {h.replace("_", "") for h in _BROADCAST_RIGHT}:
            parts.append(lb.join(F.broadcast(rb), on=on, how=how))
        else:
            # full outer: no broadcastable side — per-bucket SMJ still
            # shuffles only one bucket's rows at a time
            parts.append(lb.join(rb, on=on, how=how))
    return reduce(lambda a, c: a.unionByName(c), parts)
