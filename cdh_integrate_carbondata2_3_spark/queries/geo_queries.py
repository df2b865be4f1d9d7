"""Geo/spatial query surface with DuckDB oracles.

Reference parity (SURVEY.md §2.8, §2.11): ``in_polygon`` filter with
geoid range-list pre-pruning, ``in_polygon_join`` broadcast polygon
join, and the z-order geoid generated column
(geo/.../InPolygonUDF.scala:27-32, GeoHashIndex.java:42-200,
spatial-index-guide.md:24-133).

The TPC-H-ish testdata has no coordinates, so each query derives a
deterministic lat/lng from ``c_custkey`` with pure integer/double
arithmetic that DuckDB reproduces bit-for-bit; the oracle SQL for the
polygon predicates and the bit-interleaved geoid is *generated from
the same constants* as the Spark column expressions, so the two
engines evaluate the identical IEEE-double formula.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query
from ..functions.geo import (
    DEFAULT_BITS,
    _METERS_PER_DEGREE,
    combine_range_lists,
    filter_in_polygon_range_list,
    in_polygon_convex_expr,
    in_polygon_join,
    in_polygon_join_range_list,
    in_polygon_list_expr,
    in_polyline_list_expr,
    latlng_to_geoid,
    polygon_to_ranges,
    range_list_semi_join,
    to_range_list_as_string,
)

# Derived point cloud: 0.1-degree grid with a 0.05 offset so points
# never sit exactly on the integer-coordinate polygon edges below.
_LAT_SQL = "((c_custkey * 37) % 1800) / 10.0 - 89.95"
_LNG_SQL = "((c_custkey * 91) % 3600) / 10.0 - 179.95"


def _derived_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    # load_table, not raw spark.read.parquet: the registry's plan
    # cache skips the per-call footer/schema job, which both speeds
    # construction and makes these gates plan-only-memoizable
    from ..sources.registry import load_table
    cust = load_table(spark, sf_dir, "customer")
    lat = ((F.col("c_custkey") * 37) % 1800) / 10.0 - 89.95
    lng = ((F.col("c_custkey") * 91) % 3600) / 10.0 - 179.95
    return cust.select("c_custkey", "c_nationkey", "c_mktsegment",
                       "c_acctbal", lat.alias("lat"), lng.alias("lng"))


# CCW convex polygon, integer vertices (lat, lng).
_CONVEX_POLY = [(-20.0, -30.0), (-20.0, 40.0), (25.0, 55.0),
                (45.0, 10.0), (30.0, -35.0)]

# General polygons for the broadcast join (one concave).
_JOIN_POLYS = {
    1: [(0.0, 0.0), (0.0, 60.0), (50.0, 60.0), (50.0, 0.0)],
    2: [(-60.0, -120.0), (-60.0, -40.0), (-10.0, -40.0),
        (-35.0, -80.0), (-10.0, -120.0)],          # concave
    3: [(10.0, 100.0), (60.0, 130.0), (70.0, 80.0)],
}


def _convex_sql(polygon: list[tuple[float, float]],
                lat_sql: str, lng_sql: str) -> str:
    """Same left-of-every-edge test as in_polygon_convex_expr."""
    conds = []
    n = len(polygon)
    for i in range(n):
        la1, ln1 = polygon[i]
        la2, ln2 = polygon[(i + 1) % n]
        conds.append(f"(({ln2 - ln1!r}) * (({lat_sql}) - ({la1!r}))"
                     f" - ({la2 - la1!r}) * (({lng_sql}) - ({ln1!r})) >= 0)")
    return " AND ".join(conds)


def _raycast_sql(polygon: list[tuple[float, float]],
                 lat_sql: str, lng_sql: str) -> str:
    """Even-odd ray cast as SQL — the same edge-crossing formula the
    pandas UDF evaluates (identical IEEE-double op order)."""
    terms = []
    n = len(polygon)
    for i in range(n):
        la1, ln1 = polygon[i]
        la2, ln2 = polygon[(i + 1) % n]
        denom = (la2 - la1) or 1e-300
        x = f"({ln1!r} + (({lat_sql}) - {la1!r}) / {denom!r} * {ln2 - ln1!r})"
        crosses = f"(({la1!r} > ({lat_sql})) <> ({la2!r} > ({lat_sql})))"
        terms.append(f"CASE WHEN {crosses} AND (({lng_sql}) < {x})"
                     " THEN 1 ELSE 0 END")
    return f"(({' + '.join(terms)}) % 2 = 1)"


def _geoid_sql(lat_sql: str, lng_sql: str, bits: int = DEFAULT_BITS) -> str:
    """Bit-interleaved z-order geoid — mirrors latlng_to_geoid exactly
    (quantize → trunc-cast → clamp → interleave)."""
    n = (1 << bits) - 1

    def quant(col_sql: str, lo: float, hi: float) -> str:
        q = f"TRUNC((({col_sql}) - ({lo!r})) / {hi - lo!r} * {n})::BIGINT"
        return f"LEAST(GREATEST({q}, 0), {n})"

    la = quant(lat_sql, -90.0, 90.0)
    ln = quant(lng_sql, -180.0, 180.0)
    parts = []
    for i in range(bits):
        parts.append(f"((({ln}) >> {i}) & 1) << {2 * i}")
        parts.append(f"((({la}) >> {i}) & 1) << {2 * i + 1}")
    return "(" + " | ".join(f"({p})" for p in parts) + ")"


@query(
    "geo_polygon_filter",
    oracle=f"""
    SELECT c_nationkey,
           count(*) AS n_points,
           CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_bal
    FROM customer
    WHERE {_convex_sql(_CONVEX_POLY, _LAT_SQL, _LNG_SQL)}
    GROUP BY c_nationkey
    """,
)
def geo_polygon_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN_POLYGON analogue over a computed (non-indexed) geoid: the
    engine plans the exact convex test directly — pure codegen'd column
    arithmetic, one pass, no joins. The quad-tree range-list pre-filter
    only pays when geoid is a STORED sort column whose manifest min/max
    can skip files (that path is geo_spatial_index_prune); bolting it
    onto an on-the-fly geoid adds a broadcast join for zero pruning,
    which is how the reference behaves too (no SPATIAL_INDEX property →
    plain UDF filter, GeoHashIndex.java:42)."""
    pts = _derived_points(spark, sf_dir)
    return (pts.filter(in_polygon_convex_expr(F.col("lat"), F.col("lng"),
                                              _CONVEX_POLY))
            .groupBy("c_nationkey")
            .agg(F.count("*").alias("n_points"),
                 F.sum(F.col("c_acctbal").cast("decimal(12,2)"))
                 .cast("decimal(18,2)").cast("double").alias("sum_bal")))


@query(
    "geo_polygon_join",
    oracle=" UNION ALL ".join(
        f"""SELECT {pid} AS poly_id, count(*) AS n_points
            FROM customer
            WHERE {_raycast_sql(poly, _LAT_SQL, _LNG_SQL)}"""
        for pid, poly in sorted(_JOIN_POLYS.items())),
)
def geo_polygon_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN_POLYGON_JOIN analogue: broadcast the (tiny) polygon side,
    keep (point, polygon) pairs where the point is inside — reference
    BroadCastPolygonFilterPushJoin (DMLStrategy.scala:77-170)."""
    pts = _derived_points(spark, sf_dir)
    polys = spark.createDataFrame(
        [(pid, ", ".join(f"{la} {ln}" for la, ln in poly))
         for pid, poly in sorted(_JOIN_POLYS.items())],
        "poly_id int, polygon string")
    pairs = in_polygon_join(pts, polys, "lat", "lng", "polygon")
    return pairs.groupBy("poly_id").agg(F.count("*").alias("n_points"))


def _polyline_sql(polylines: list[list[tuple[float, float]]],
                  buffer_m: float, lat_sql: str, lng_sql: str) -> str:
    """Point-within-buffer-of-any-segment, identical op order to
    in_polyline_list_expr (clamped projection + squared distance)."""
    buf2 = (buffer_m / _METERS_PER_DEGREE) ** 2
    conds = []
    for line in polylines:
        for (la1, ln1), (la2, ln2) in zip(line, line[1:]):
            dla, dln = la2 - la1, ln2 - ln1
            len2 = (dla * dla + dln * dln) or 1e-300
            t = (f"LEAST(GREATEST(((({lat_sql}) - ({la1!r})) * ({dla!r}) + "
                 f"(({lng_sql}) - ({ln1!r})) * ({dln!r})) / ({len2!r}), "
                 f"0.0), 1.0)")
            pla = f"(({la1!r}) + {t} * ({dla!r}))"
            pln = f"(({ln1!r}) + {t} * ({dln!r}))"
            conds.append(
                f"((({lat_sql}) - {pla}) * (({lat_sql}) - {pla}) + "
                f"(({lng_sql}) - {pln}) * (({lng_sql}) - {pln}) <= {buf2!r})")
    return "(" + " OR ".join(conds) + ")"


def _ranges_sql(ranges: list[tuple[int, int]], geoid_sql: str) -> str:
    if not ranges:
        return "FALSE"
    return "(" + " OR ".join(
        f"({geoid_sql} BETWEEN {lo} AND {hi})" for lo, hi in ranges) + ")"


# Second polygon for list ops: concave, overlapping _CONVEX_POLY.
_CONCAVE_POLY = [(-40.0, -10.0), (-40.0, 70.0), (20.0, 70.0),
                 (-10.0, 30.0), (20.0, -10.0)]

# Polylines for the buffer query (lat, lng vertices; ~2000 km buffer so
# both sf0.001's sparse grid and sf0.1's dense grid catch points).
_POLYLINES = [
    [(-30.0, -150.0), (0.0, -90.0), (40.0, -60.0)],
    [(10.0, 60.0), (35.0, 110.0)],
]
_BUFFER_M = 2_000_000.0


@query(
    "geo_polygon_list_filter",
    oracle=f"""
    SELECT 'OR' AS op, count(*) AS n_points
    FROM customer
    WHERE {_raycast_sql(_CONVEX_POLY, _LAT_SQL, _LNG_SQL)}
       OR {_raycast_sql(_CONCAVE_POLY, _LAT_SQL, _LNG_SQL)}
    UNION ALL
    SELECT 'AND' AS op, count(*) AS n_points
    FROM customer
    WHERE {_raycast_sql(_CONVEX_POLY, _LAT_SQL, _LNG_SQL)}
      AND {_raycast_sql(_CONCAVE_POLY, _LAT_SQL, _LNG_SQL)}
    """,
)
def geo_polygon_list_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN_POLYGON_LIST analogue: union and intersection of a convex and
    a concave polygon (docs spatial-index-guide.md polygon-list UDF),
    evaluated as one fused pure-column ray-cast per polygon — no UDF,
    no join, one scan per op."""
    pts = _derived_points(spark, sf_dir)
    polys = [_CONVEX_POLY, _CONCAVE_POLY]
    out = []
    for op in ("OR", "AND"):
        mask = in_polygon_list_expr(F.col("lat"), F.col("lng"), polys, op)
        out.append(pts.filter(mask).select(
            F.lit(op).alias("op"), F.lit(1).alias("one")))
    both = out[0].unionByName(out[1])
    return both.groupBy("op").agg(F.count("one").alias("n_points"))


@query(
    "geo_polyline_buffer",
    oracle=f"""
    SELECT c_mktsegment, count(*) AS n_points
    FROM customer
    WHERE {_polyline_sql(_POLYLINES, _BUFFER_M, _LAT_SQL, _LNG_SQL)}
    GROUP BY c_mktsegment
    """,
)
def geo_polyline_buffer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN_POLYLINE_LIST analogue: points within a meter buffer of any
    polyline segment (docs spatial-index-guide.md polyline-list UDF) —
    clamped point-to-segment projection as pure column arithmetic,
    identical IEEE formula on the oracle side."""
    pts = _derived_points(spark, sf_dir)
    mask = in_polyline_list_expr(F.col("lat"), F.col("lng"),
                                 _POLYLINES, _BUFFER_M)
    return (pts.filter(mask)
            .groupBy("c_mktsegment").agg(F.count("*").alias("n_points")))


_RL_A = polygon_to_ranges(_CONVEX_POLY, max_depth=6)
_RL_B = polygon_to_ranges(_CONCAVE_POLY, max_depth=6)


@query(
    "geo_range_list_ops",
    # geoid computed ONCE in a MATERIALIZED CTE: DuckDB inlines plain
    # CTEs/subqueries, so the ~4.4 KB bit-interleave expression was
    # re-evaluated inside all ~86 BETWEEN bounds — OOM at the 10×
    # replica (SCALE.md round-4 run); materialized: 0.4 s
    oracle=f"""
    WITH pts AS MATERIALIZED (
      SELECT {_geoid_sql(_LAT_SQL, _LNG_SQL)} AS g FROM customer
    )
    SELECT 'OR' AS op, count(*) AS n_points FROM pts
    WHERE {_ranges_sql(combine_range_lists([_RL_A, _RL_B], "OR"), "g")}
    UNION ALL
    SELECT 'AND' AS op, count(*) AS n_points FROM pts
    WHERE {_ranges_sql(combine_range_lists([_RL_A, _RL_B], "AND"), "g")}
    """,
)
def geo_range_list_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN_POLYGON_RANGE_LIST analogue: union/intersection of two
    quad-tree range lists applied to the stored z-order geoid — the
    range algebra runs driver-side (tiny), membership is the bucketed
    broadcast semi-join, never an O(#ranges) per-row disjunction."""
    pts = _derived_points(spark, sf_dir).withColumn(
        "geoid", latlng_to_geoid(F.col("lat"), F.col("lng")))
    out = []
    for op in ("OR", "AND"):
        hit = filter_in_polygon_range_list(pts, "geoid", [_RL_A, _RL_B], op)
        out.append(hit.select(F.lit(op).alias("op"), F.lit(1).alias("one")))
    both = out[0].unionByName(out[1])
    return both.groupBy("op").agg(F.count("one").alias("n_points"))


@query(
    "geo_polygon_join_range_list",
    # same CTE shape as geo_range_list_ops (OOM at 10× otherwise)
    oracle=f"""
    WITH pts AS MATERIALIZED (
      SELECT {_geoid_sql(_LAT_SQL, _LNG_SQL)} AS g FROM customer
    )
    """ + " UNION ALL ".join(
        f"""SELECT {pid} AS poly_id, count(*) AS n_points FROM pts
            WHERE {_ranges_sql(polygon_to_ranges(poly, max_depth=6), "g")}"""
        for pid, poly in ((1, _CONVEX_POLY), (2, _CONCAVE_POLY))),
)
def geo_polygon_join_range_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN_POLYGON_JOIN_RANGE_LIST analogue: the polygon side carries
    'lo,hi;...' range-list STRINGS (to_range_list_as_string output);
    they are parsed column-side (split/explode), broadcast, and probed
    with a range condition — the ranges are the join predicate
    (reference BroadCastPolygonFilterPushJoin range-list variant)."""
    pts = _derived_points(spark, sf_dir).withColumn(
        "geoid", latlng_to_geoid(F.col("lat"), F.col("lng")))
    polys = spark.createDataFrame(
        [(pid, to_range_list_as_string(poly, max_depth=6))
         for pid, poly in ((1, _CONVEX_POLY), (2, _CONCAVE_POLY))],
        "poly_id int, ranges string")
    pairs = in_polygon_join_range_list(pts, polys, "geoid", "ranges")
    return pairs.groupBy("poly_id").agg(F.count("*").alias("n_points"))


@query(
    "geo_zorder_geoid",
    oracle=f"""
    SELECT c_mktsegment,
           count(DISTINCT {_geoid_sql(_LAT_SQL, _LNG_SQL)}) AS n_cells,
           min({_geoid_sql(_LAT_SQL, _LNG_SQL)}) AS min_geoid,
           max({_geoid_sql(_LAT_SQL, _LNG_SQL)}) AS max_geoid
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def geo_zorder_geoid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LatLngToGeoId generated column (SPATIAL_INDEX analogue):
    bit-interleave as pure column arithmetic, validated value-exact
    against the oracle's identical interleave formula."""
    pts = _derived_points(spark, sf_dir).withColumn(
        "geoid", latlng_to_geoid(F.col("lat"), F.col("lng")))
    return (pts.groupBy("c_mktsegment")
            .agg(F.countDistinct("geoid").alias("n_cells"),
                 F.min("geoid").alias("min_geoid"),
                 F.max("geoid").alias("max_geoid")))


@query(
    "geo_spatial_index_prune",
    oracle=f"""
    SELECT c_nationkey, count(*) AS n_points
    FROM customer
    WHERE {_convex_sql(_CONVEX_POLY, _LAT_SQL, _LNG_SQL)}
    GROUP BY c_nationkey
    """,
)
def geo_spatial_index_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stored SPATIAL_INDEX path end-to-end (GeoHashIndex.java:
    42-200): geoid generated at load, table globally sorted on it, the
    polygon's quad-tree range list pushed as a manifest min/max 'ranges'
    predicate — the scan must touch FEWER files than a full scan (the
    assert), then exact convex refinement on the survivors."""
    import os
    from ..catalog.table import Table
    from .lifecycle_queries import _scratch

    pts = _derived_points(spark, sf_dir).withColumn(
        "geoid", latlng_to_geoid(F.col("lat"), F.col("lng")))
    t = Table.create(
        spark, os.path.join(_scratch("geo_sidx", sf_dir), "t"),
        "c_custkey bigint, c_nationkey int, lat double, lng double, "
        "geoid bigint",
        {"sort_columns": ["geoid"], "sort_scope": "global_sort",
         "global_sort_partitions": 8})
    t.insert(pts.select("c_custkey", "c_nationkey", "lat", "lng", "geoid"))

    ranges = polygon_to_ranges(_CONVEX_POLY, max_depth=8)
    pred = [("geoid", "ranges", ranges)]
    n_pruned = sum(map(len, t.scan_files(pred).values()))
    n_all = sum(map(len, t.scan_files().values()))
    assert n_pruned < n_all, \
        f"range-list pruning kept {n_pruned}/{n_all} files"
    return (t.read(predicates=pred)
            .filter(in_polygon_convex_expr(F.col("lat"), F.col("lng"),
                                           _CONVEX_POLY))
            .groupBy("c_nationkey")
            .agg(F.count("*").alias("n_points")))
