"""Geo/spatial surface: z-order geoids + polygon predicates.

Reference parity (SURVEY.md §2.8, §2.11):
- ``LatLngToGeoId / GeoIdToLatLng / GeoIdToGridXy / ToUpperLayerGeoId``
  UDFs (geo/.../GeoUtilUDFs.scala:28-33, impl GeoHashUtils.java):
  a z-order (bit-interleaved) cell id over a quantized lat/lng grid.
- ``SPATIAL_INDEX`` generated column: the geoid is computed at load
  time from sourcecolumns (GeoHashIndex.java:42-200) — ours is a
  column expression (JVM-side, codegen) usable in any select/load.
- ``in_polygon('lng1 lat1, ...')`` predicates + polygon join
  (InPolygonUDF.scala:27-32, spatial-index-guide.md:24-133): polygon →
  quad-tree decomposition into geoid ranges (QuadTreeCls.java) pushed
  as range filters, then exact point-in-polygon refinement.

Spark-first: geoid generation is pure column arithmetic (bit
interleave via shifts — whole-stage codegen); quad-tree range-list
construction is driver-side Python (tiny); the exact refinement is a
ray-cast built from column arithmetic for convex polygons and a
vectorized pandas_udf for the general case.
"""

from __future__ import annotations

from functools import reduce

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# grid: quantize lat/lng into 2^BITS cells per axis over the covered
# bounding box (reference uses gridSize meters over a region origin;
# ours normalizes to a [min,max] box — semantics equivalent)
DEFAULT_BITS = 16


def _quantize(col: Column, lo: float, hi: float, bits: int) -> Column:
    n = (1 << bits) - 1
    q = ((col - F.lit(lo)) / F.lit(hi - lo) * n)
    return F.least(F.greatest(q.cast("long"), F.lit(0)), F.lit(n))


def latlng_to_geoid(lat: Column, lng: Column,
                    lat_range: tuple[float, float] = (-90.0, 90.0),
                    lng_range: tuple[float, float] = (-180.0, 180.0),
                    bits: int = DEFAULT_BITS) -> Column:
    """Z-order geoid column expression (LatLngToGeoId analogue).
    Bit-interleaves quantized lat (odd bits) and lng (even bits)."""
    la = _quantize(lat, *lat_range, bits)
    ln = _quantize(lng, *lng_range, bits)
    parts = []
    for i in range(bits):
        parts.append(F.shiftleft(F.shiftright(ln, i).bitwiseAND(F.lit(1)), 2 * i))
        parts.append(F.shiftleft(F.shiftright(la, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return reduce(lambda a, b: a.bitwiseOR(b), parts).alias("geoid")


def geoid_to_grid_xy(geoid: int, bits: int = DEFAULT_BITS) -> tuple[int, int]:
    """GeoIdToGridXy analogue (driver-side)."""
    x = y = 0
    for i in range(bits):
        x |= ((geoid >> (2 * i)) & 1) << i
        y |= ((geoid >> (2 * i + 1)) & 1) << i
    return x, y


def grid_xy_to_geoid(x: int, y: int, bits: int = DEFAULT_BITS) -> int:
    g = 0
    for i in range(bits):
        g |= ((x >> i) & 1) << (2 * i)
        g |= ((y >> i) & 1) << (2 * i + 1)
    return g


def geoid_to_latlng(geoid: int,
                    lat_range: tuple[float, float] = (-90.0, 90.0),
                    lng_range: tuple[float, float] = (-180.0, 180.0),
                    bits: int = DEFAULT_BITS) -> tuple[float, float]:
    """GeoIdToLatLng analogue — cell-center coordinates (driver-side)."""
    x, y = geoid_to_grid_xy(geoid, bits)
    n = (1 << bits) - 1
    lng = lng_range[0] + (x + 0.5) / (n + 1) * (lng_range[1] - lng_range[0])
    lat = lat_range[0] + (y + 0.5) / (n + 1) * (lat_range[1] - lat_range[0])
    return lat, lng


def to_upper_layer_geoid(geoid: int) -> int:
    """ToUpperLayerGeoId analogue: parent cell in the quad-tree."""
    return geoid >> 2


# ------------------------------------------------------------- quad-tree

def polygon_to_ranges(polygon: list[tuple[float, float]],
                      lat_range: tuple[float, float] = (-90.0, 90.0),
                      lng_range: tuple[float, float] = (-180.0, 180.0),
                      bits: int = DEFAULT_BITS,
                      max_depth: int = 10) -> list[tuple[int, int]]:
    """ToRangeList analogue: decompose a polygon [(lat,lng)...] into
    inclusive z-order geoid ranges via quad-tree descent
    (reference QuadTreeCls.java). Sound: covers at least the polygon."""
    max_depth = min(max_depth, bits)      # can't descend below one cell
    lats = [p[0] for p in polygon]
    lngs = [p[1] for p in polygon]

    def cell_box(x: int, y: int, depth: int):
        span = 1 << (bits - depth)
        n = 1 << bits
        lo_lng = lng_range[0] + x * span / n * (lng_range[1] - lng_range[0])
        hi_lng = lng_range[0] + (x + 1) * span / n * (lng_range[1] - lng_range[0])
        lo_lat = lat_range[0] + y * span / n * (lat_range[1] - lat_range[0])
        hi_lat = lat_range[0] + (y + 1) * span / n * (lat_range[1] - lat_range[0])
        return lo_lat, hi_lat, lo_lng, hi_lng

    def box_rel(x: int, y: int, depth: int) -> str:
        lo_lat, hi_lat, lo_lng, hi_lng = cell_box(x, y, depth)
        if hi_lat < min(lats) or lo_lat > max(lats) \
                or hi_lng < min(lngs) or lo_lng > max(lngs):
            return "out"
        corners_in = sum(point_in_polygon(la, ln, polygon)
                         for la in (lo_lat, hi_lat) for ln in (lo_lng, hi_lng))
        if corners_in == 4:
            return "in"
        return "partial"

    ranges: list[tuple[int, int]] = []

    def descend(x: int, y: int, depth: int) -> None:
        rel = box_rel(x, y, depth)
        if rel == "out":
            return
        if rel == "in" or depth >= max_depth:
            side = 1 << (bits - depth)
            lo = grid_xy_to_geoid(x * side, y * side, bits)
            ranges.append((lo, lo + side * side - 1))
            return
        for dx in (0, 1):
            for dy in (0, 1):
                descend(x * 2 + dx, y * 2 + dy, depth + 1)

    descend(0, 0, 0)
    ranges.sort()
    merged: list[tuple[int, int]] = []
    for lo, hi in ranges:                       # coalesce adjacent ranges
        if merged and lo <= merged[-1][1] + 1:
            merged[-1] = (merged[-1][0], max(merged[-1][1], hi))
        else:
            merged.append((lo, hi))
    return merged


def ranges_union(lists: list[list[tuple[int, int]]]) -> list[tuple[int, int]]:
    """Union of inclusive range lists (reference PolygonRangeListExpression
    'OR' — spatial-index-guide.md range-list ops). Result is sorted and
    disjoint."""
    flat = sorted(r for lst in lists for r in lst)
    merged: list[tuple[int, int]] = []
    for lo, hi in flat:
        if merged and lo <= merged[-1][1] + 1:
            merged[-1] = (merged[-1][0], max(merged[-1][1], hi))
        else:
            merged.append((lo, hi))
    return merged


def ranges_intersect(a: list[tuple[int, int]],
                     b: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Intersection of two sorted disjoint inclusive range lists
    (reference range-list 'AND'). Two-pointer sweep, O(|a|+|b|)."""
    out: list[tuple[int, int]] = []
    i = j = 0
    while i < len(a) and j < len(b):
        lo = max(a[i][0], b[j][0])
        hi = min(a[i][1], b[j][1])
        if lo <= hi:
            out.append((lo, hi))
        if a[i][1] < b[j][1]:
            i += 1
        else:
            j += 1
    return out


def combine_range_lists(lists: list[list[tuple[int, int]]],
                        op: str = "OR") -> list[tuple[int, int]]:
    """IN_POLYGON_RANGE_LIST's opType: 'OR' = union, 'AND' =
    intersection of all lists (docs spatial-index-guide.md)."""
    if op.upper() == "OR":
        return ranges_union(lists)
    if op.upper() == "AND":
        out = ranges_union([lists[0]]) if lists else []
        for lst in lists[1:]:
            out = ranges_intersect(out, ranges_union([lst]))
        return out
    raise ValueError(f"unsupported range-list op {op!r} (OR|AND)")


def to_range_list(polygon: list[tuple[float, float]],
                  **kw) -> list[tuple[int, int]]:
    """ToRangeList analogue (GeoUtilUDFs.scala:28-33)."""
    return polygon_to_ranges(polygon, **kw)


def to_range_list_as_string(polygon: list[tuple[float, float]],
                            **kw) -> str:
    """ToRangeListAsString analogue: 'lo,hi;lo,hi;...'."""
    return ";".join(f"{lo},{hi}" for lo, hi in polygon_to_ranges(polygon, **kw))


def parse_range_list_string(s: str) -> list[tuple[int, int]]:
    return [(int(lo), int(hi))
            for lo, hi in (part.split(",") for part in s.split(";") if part)]


# --------------------------------------------------------- exact predicates

def range_list_semi_join(df: DataFrame, geoid_col: str,
                         ranges: list[tuple[int, int]],
                         bucket_depth: int = 8,
                         bits: int = DEFAULT_BITS) -> DataFrame:
    """Restrict ``df`` to rows whose geoid falls in one of the given
    DISJOINT quad-tree ranges, as a bucketed broadcast HASH join: one
    probe on ``geoid >> shift`` per row plus a residual BETWEEN, instead
    of a broadcast nested-loop join that evaluates every range predicate
    per row (O(#ranges) comparisons — the reference pushes range lists
    into its scan for the same reason, GeoHashIndex.java:187).

    Disjointness makes the inner join duplicate-free: at most one range
    contains any geoid, so no post-join distinct is needed.
    """
    shift = 2 * (bits - bucket_depth)
    rows = [(b, lo, hi)
            for lo, hi in ranges
            for b in range(lo >> shift, (hi >> shift) + 1)]
    rdf = df.sparkSession.createDataFrame(
        rows, "__b bigint, __lo bigint, __hi bigint")
    return (df.withColumn("__b", F.shiftright(F.col(geoid_col), shift))
            .join(F.broadcast(rdf), "__b")
            .filter(F.col(geoid_col).between(F.col("__lo"), F.col("__hi")))
            .drop("__b", "__lo", "__hi"))


def point_in_polygon(lat: float, lng: float,
                     polygon: list[tuple[float, float]]) -> bool:
    """Driver-side ray cast (even-odd rule)."""
    inside = False
    n = len(polygon)
    for i in range(n):
        la1, ln1 = polygon[i]
        la2, ln2 = polygon[(i + 1) % n]
        if (la1 > lat) != (la2 > lat):
            x = ln1 + (lat - la1) / (la2 - la1) * (ln2 - ln1)
            if lng < x:
                inside = not inside
    return inside


def in_polygon_convex_expr(lat: Column, lng: Column,
                           polygon: list[tuple[float, float]]) -> Column:
    """Exact membership for a CONVEX counter-clockwise polygon as pure
    column arithmetic (codegen'd — no UDF): the point is inside iff it
    lies left of every edge."""
    conds = []
    n = len(polygon)
    for i in range(n):
        la1, ln1 = polygon[i]
        la2, ln2 = polygon[(i + 1) % n]
        cross = (F.lit(ln2 - ln1) * (lat - F.lit(la1))
                 - F.lit(la2 - la1) * (lng - F.lit(ln1)))
        conds.append(cross >= 0)
    return reduce(lambda a, b: a & b, conds)


def in_polygon_expr(lat: Column, lng: Column,
                    polygon: list[tuple[float, float]]) -> Column:
    """Exact membership for a GENERAL (possibly concave) polygon as
    pure column arithmetic — the even-odd ray cast unrolled per edge
    (crossing count parity), whole-stage codegen'd, no UDF."""
    crossings = None
    n = len(polygon)
    for i in range(n):
        la1, ln1 = polygon[i]
        la2, ln2 = polygon[(i + 1) % n]
        denom = (la2 - la1) or 1e-300
        x = F.lit(ln1) + (lat - F.lit(la1)) / F.lit(denom) * F.lit(ln2 - ln1)
        crosses = (F.lit(la1) > lat) != (F.lit(la2) > lat)
        term = F.when(crosses & (lng < x), 1).otherwise(0)
        crossings = term if crossings is None else crossings + term
    return crossings % 2 == 1


def in_polygon_list_expr(lat: Column, lng: Column,
                         polygons: list[list[tuple[float, float]]],
                         op: str = "OR") -> Column:
    """IN_POLYGON_LIST analogue: membership in the union ('OR') or
    intersection ('AND') of several polygons
    (docs spatial-index-guide.md polygon-list UDF). Pure column
    arithmetic — one fused codegen stage, no UDF, no join."""
    exprs = [in_polygon_expr(lat, lng, p) for p in polygons]
    if op.upper() == "OR":
        return reduce(lambda a, b: a | b, exprs)
    if op.upper() == "AND":
        return reduce(lambda a, b: a & b, exprs)
    raise ValueError(f"unsupported polygon-list op {op!r} (OR|AND)")


_METERS_PER_DEGREE = 111320.0


def in_polyline_list_expr(lat: Column, lng: Column,
                          polylines: list[list[tuple[float, float]]],
                          buffer_m: float) -> Column:
    """IN_POLYLINE_LIST analogue: true when the point lies within
    ``buffer_m`` meters of any polyline segment (docs
    spatial-index-guide.md polyline-list UDF; the reference converts
    the buffer to a polygon — ours tests point-to-segment distance
    directly, same region). Planar small-angle model: degrees scaled
    by a constant meters-per-degree — deterministic and reproducible
    in plain SQL (the oracle uses the identical formula)."""
    buf_deg2 = (buffer_m / _METERS_PER_DEGREE) ** 2
    conds = []
    for line in polylines:
        for (la1, ln1), (la2, ln2) in zip(line, line[1:]):
            dla, dln = la2 - la1, ln2 - ln1
            len2 = (dla * dla + dln * dln) or 1e-300
            t = ((lat - F.lit(la1)) * F.lit(dla)
                 + (lng - F.lit(ln1)) * F.lit(dln)) / F.lit(len2)
            t = F.least(F.greatest(t, F.lit(0.0)), F.lit(1.0))
            pla = F.lit(la1) + t * F.lit(dla)
            pln = F.lit(ln1) + t * F.lit(dln)
            d2 = (lat - pla) * (lat - pla) + (lng - pln) * (lng - pln)
            conds.append(d2 <= F.lit(buf_deg2))
    return reduce(lambda a, b: a | b, conds)


def filter_in_polygon_range_list(df: DataFrame, geoid_col: str,
                                 range_lists: list[list[tuple[int, int]]],
                                 op: str = "OR") -> DataFrame:
    """IN_POLYGON_RANGE_LIST analogue: rows whose stored geoid falls in
    the union/intersection of the given range lists. The combined list
    is disjoint, so the bucketed broadcast semi-join is duplicate-free
    (see range_list_semi_join) and the same ranges can be pushed as a
    manifest 'ranges' predicate when the geoid is a sort column."""
    combined = combine_range_lists(range_lists, op)
    if not combined:
        return df.filter(F.lit(False))
    return range_list_semi_join(df, geoid_col, combined)


def in_polygon_join_range_list(points: DataFrame, polygons: DataFrame,
                               geoid_col: str, ranges_col: str) -> DataFrame:
    """IN_POLYGON_JOIN_RANGE_LIST analogue: join points to polygon rows
    whose pre-computed range list ('lo,hi;lo,hi;...' as produced by
    to_range_list_as_string) contains the point's geoid — the ranges
    ARE the predicate, no exact refinement (reference
    BroadCastPolygonRangeListFilterPushJoin, DMLStrategy.scala:77-170).

    The range strings are parsed COLUMN-side (split/explode — JVM
    built-ins), the exploded (polygon, lo, hi) side stays tiny and is
    broadcast; each point probes it with a range condition."""
    exploded = (polygons
                .withColumn("__r", F.explode(F.split(F.col(ranges_col), ";")))
                .withColumn("__lo", F.split("__r", ",")[0].cast("bigint"))
                .withColumn("__hi", F.split("__r", ",")[1].cast("bigint"))
                .drop("__r", ranges_col))
    cond = (F.col(geoid_col) >= F.col("__lo")) \
        & (F.col(geoid_col) <= F.col("__hi"))
    # disjoint quad-tree ranges → at most one range of a polygon matches
    # a geoid, so no dedup is needed after the join
    return (points.join(F.broadcast(exploded), cond, "inner")
            .drop("__lo", "__hi"))


def in_polygon_udf(polygon: list[tuple[float, float]]):
    """General-polygon membership as a vectorized pandas UDF."""

    @F.pandas_udf("boolean")
    def _inp(lat: pd.Series, lng: pd.Series) -> pd.Series:
        import numpy as np
        la = lat.to_numpy()
        ln = lng.to_numpy()
        inside = np.zeros(len(la), dtype=bool)
        n = len(polygon)
        for i in range(n):
            la1, ln1 = polygon[i]
            la2, ln2 = polygon[(i + 1) % n]
            denom = (la2 - la1) or 1e-300
            crosses = (la1 > la) != (la2 > la)
            x = ln1 + (la - la1) / denom * (ln2 - ln1)
            inside ^= crosses & (ln < x)
        return pd.Series(inside)

    return _inp


def filter_in_polygon(df: DataFrame, lat_col: str, lng_col: str,
                      polygon: list[tuple[float, float]],
                      geoid_col: str | None = None,
                      bits: int = DEFAULT_BITS,
                      lat_range: tuple[float, float] = (-90.0, 90.0),
                      lng_range: tuple[float, float] = (-180.0, 180.0)) -> DataFrame:
    """IN_POLYGON('...') analogue: geoid range-list pre-filter, then
    exact refinement.

    The pre-filter is a broadcast range SEMI-JOIN against the (tiny)
    range list rather than an OR-of-BETWEEN predicate: with hundreds of
    quad-tree ranges the disjunction blows up Catalyst (the geoid
    expression is inlined into every disjunct and constraint
    propagation goes exponential), while the semi-join evaluates the
    geoid once per row and scales to arbitrarily fine decompositions."""
    if geoid_col is not None:
        ranges = polygon_to_ranges(polygon, lat_range, lng_range, bits)
        rdf = df.sparkSession.createDataFrame(ranges, "__lo bigint, __hi bigint")
        df = df.join(F.broadcast(rdf),
                     (F.col(geoid_col) >= F.col("__lo"))
                     & (F.col(geoid_col) <= F.col("__hi")), "left_semi")
    return df.filter(in_polygon_udf(polygon)(F.col(lat_col), F.col(lng_col)))


def in_polygon_join(points: DataFrame, polygons: DataFrame,
                    lat_col: str, lng_col: str,
                    polygon_col: str) -> DataFrame:
    """IN_POLYGON_JOIN analogue: broadcast the polygon side and keep
    (point, polygon) pairs where the point falls inside
    (reference BroadCastPolygonFilterPushJoin, DMLStrategy.scala:77-170).
    ``polygon_col`` holds 'lat lng, lat lng, ...' strings.

    Each Arrow batch factorizes the polygon strings, parses every
    DISTINCT polygon once, and ray-casts its whole point group
    vectorized — for the many-points × few-polygons shape the
    per-row parse (and per-row Python ray cast) would dominate."""

    @F.pandas_udf("boolean")
    def _pip(lat: pd.Series, lng: pd.Series, poly: pd.Series) -> pd.Series:
        import numpy as np
        la_all, ln_all = lat.to_numpy(float), lng.to_numpy(float)
        out = np.zeros(len(la_all), dtype=bool)
        codes, uniques = pd.factorize(poly)
        for k, ps in enumerate(uniques):
            pts = [(float(a), float(b)) for a, b in
                   (pair.split() for pair in ps.split(","))]
            mask = codes == k
            la, ln = la_all[mask], ln_all[mask]
            inside = np.zeros(len(la), dtype=bool)
            n = len(pts)
            for i in range(n):
                la1, ln1 = pts[i]
                la2, ln2 = pts[(i + 1) % n]
                denom = (la2 - la1) or 1e-300
                crosses = (la1 > la) != (la2 > la)
                x = ln1 + (la - la1) / denom * (ln2 - ln1)
                inside ^= crosses & (ln < x)
            out[mask] = inside
        return pd.Series(out)

    joined = points.crossJoin(F.broadcast(polygons))
    return joined.filter(_pip(F.col(lat_col), F.col(lng_col), F.col(polygon_col)))
