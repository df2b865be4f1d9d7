"""Temporal join operators: as-of join and interval range join.

The reference has neither (SURVEY.md §2.3 marks range/as-of joins as
not present) — these are the event-stream / training-pipeline
extensions a timeseries workload needs on top of the relational
surface.

Scale design (the whole point of these formulations):

- ``asof_join``: union-tag + ``last(..., ignorenulls)`` running
  window. ONE hash shuffle on the join key, sort within partitions,
  zero candidate blow-up. The naive formulation (equi-join on key +
  ``r.ts <= l.ts`` theta filter + per-left max) materializes every
  (left, earlier-right) pair — quadratic per key — and a bare
  ``l.ts >= r.ts`` condition alone plans a BroadcastNestedLoopJoin.
  At 100 TB only the union+window shape survives; it also inherits
  AQE skew-split on the key shuffle.

- ``range_join``: point-in-interval equi-join via time bucketing.
  Both sides hash-shuffle on (key, bucket); the left side explodes
  each interval into the buckets it overlaps (≈ interval/width + 1
  rows), candidates are same-bucket collisions only, and the exact
  bounds are re-checked post-join JVM-side. Pick ``bucket_s`` near
  the typical interval width so the explode factor stays ~2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

__all__ = ["asof_join", "range_join"]

_ANCHOR = "TIMESTAMP '1970-01-01 00:00:00'"


def _epoch_s(col: str | Column) -> Column:
    """Whole seconds since a fixed anchor, timezone-independent for
    TIMESTAMP_NTZ and ANSI-safe (no timestamp→long cast)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_diff("SECOND", F.expr(_ANCHOR), c)


def asof_join(left: DataFrame, right: DataFrame, on: str | list[str],
              left_ts: str = "ts", right_ts: str = "ts",
              direction: str = "backward",
              tolerance: str | None = None,
              matched_ts: str = "matched_ts") -> DataFrame:
    """Left as-of join: for every left row, attach the payload of the
    single right row with the greatest ``right_ts <= left_ts``
    (``backward``) or smallest ``right_ts >= left_ts`` (``forward``)
    per key; unmatched left rows keep null payloads.

    ``right`` must be unique per (key, right_ts) for deterministic
    output — pre-aggregate ties (e.g. ``groupBy(key, ts).agg(max(id))``)
    before calling. ``tolerance`` is an INTERVAL literal string
    (e.g. ``"INTERVAL 30 MINUTES"``) bounding how far back/forward a
    match may be; matches outside it are nulled.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got {direction!r}")
    key = [on] if isinstance(on, str) else list(on)
    payload = [c for c in right.columns if c not in key + [right_ts]]
    left_rest = [c for c in left.columns if c not in key + [left_ts]]
    clash = set(payload) & set(left.columns)
    if clash:
        raise ValueError(f"right payload columns clash with left: {sorted(clash)}")

    r_side = right.select(
        *key, F.col(right_ts).alias("_t"), F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_rest],
        *payload)
    l_side = left.select(
        *key, F.col(left_ts).alias("_t"), F.lit(1).alias("_side"), *left_rest,
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in payload])

    # At equal timestamps the right row sorts first (side 0 < 1), so
    # the running last() sees it → inclusive <= / >= semantics.
    order = [F.col("_t").asc(), F.col("_side").asc()] if direction == "backward" \
        else [F.col("_t").desc(), F.col("_side").asc()]
    w = (W.partitionBy(*key).orderBy(*order)
         .rowsBetween(W.unboundedPreceding, W.currentRow))

    filled = (r_side.unionByName(l_side)
              .select(*key, "_t", "_side", *left_rest,
                      *[F.last(c, ignorenulls=True).over(w).alias(c)
                        for c in payload],
                      F.last(F.when(F.col("_side") == 0, F.col("_t")),
                             ignorenulls=True).over(w).alias(matched_ts)))
    out = filled.filter(F.col("_side") == 1)

    if tolerance is not None:
        tol = F.expr(tolerance)
        in_tol = (F.col(matched_ts) >= F.col("_t") - tol) if direction == "backward" \
            else (F.col(matched_ts) <= F.col("_t") + tol)
        out = out.select(
            *key, "_t", "_side", *left_rest,
            *[F.when(in_tol, F.col(c)).alias(c) for c in payload],
            F.when(in_tol, F.col(matched_ts)).alias(matched_ts))

    return out.select(*key, F.col("_t").alias(left_ts), *left_rest,
                      *payload, matched_ts)


def range_join(left: DataFrame, right: DataFrame, on: str | list[str],
               start_col: str, end_col: str, right_ts: str = "ts",
               bucket_s: int = 3600) -> DataFrame:
    """Inner point-in-interval join: pair every left interval
    ``[start_col, end_col)`` with the right rows whose ``right_ts``
    falls inside it, same key. Executed as an equi-join on
    (key, time-bucket) — shuffle-hash/sort-merge eligible, never a
    nested-loop — with the exact bound re-checked after the join.
    """
    key = [on] if isinstance(on, str) else list(on)
    clash = (set(right.columns) - set(key)) & set(left.columns)
    if clash:
        raise ValueError(f"column clash between sides: {sorted(clash)}")
    wlit = F.lit(float(bucket_s))

    l_binned = left.withColumn(
        "_bin",
        F.explode(F.sequence(F.floor(_epoch_s(start_col) / wlit),
                             F.floor(_epoch_s(end_col) / wlit))))
    r_binned = right.withColumn("_bin", F.floor(_epoch_s(right_ts) / wlit))

    return (l_binned.join(r_binned, key + ["_bin"])
            .filter((F.col(right_ts) >= F.col(start_col))
                    & (F.col(right_ts) < F.col(end_col)))
            .drop("_bin"))
