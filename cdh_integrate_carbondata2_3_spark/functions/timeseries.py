"""Timeseries granularity bucketing.

The reference registers a ``timeseries(col, 'hour')`` UDF used by
timeseries MVs (reference: integration/spark/.../view/MVFunctions.scala:28-32;
granularities SECOND..YEAR in MVTimeGranularity.scala:25-35).

Spark-first mapping: ``date_trunc`` — JVM-side, codegen'd, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# reference MVTimeGranularity.scala:25-35
GRANULARITIES = {
    "second": "second",
    "minute": "minute",
    "five_minute": None,   # handled specially below
    "ten_minute": None,
    "fifteen_minute": None,
    "thirty_minute": None,
    "hour": "hour",
    "day": "day",
    "week": "week",
    "month": "month",
    "year": "year",
}

_MINUTE_BUCKETS = {"five_minute": 5, "ten_minute": 10,
                   "fifteen_minute": 15, "thirty_minute": 30}


def timeseries_bucket(col: Column, granularity: str) -> Column:
    """Truncate a timestamp column to the given granularity bucket."""
    g = granularity.lower()
    if g in _MINUTE_BUCKETS:
        n = _MINUTE_BUCKETS[g]
        # floor minutes to the bucket: truncate to hour + floored minutes
        base = F.date_trunc("hour", col)
        mins = (F.minute(col) / n).cast("int") * n
        return base + F.make_dt_interval(F.lit(0), F.lit(0), mins, F.lit(0))
    if g not in GRANULARITIES or GRANULARITIES[g] is None:
        raise ValueError(f"unsupported granularity {granularity!r}")
    return F.date_trunc(GRANULARITIES[g], col)
