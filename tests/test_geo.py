"""Geo tests — mirrors the reference's geo suite shape
(org/apache/carbondata/geo: geoid generation, polygon queries,
util UDFs)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from cdh_integrate_carbondata2_3_spark.functions import geo


def _points_df(spark, n=2000, seed=7):
    rnd = random.Random(seed)
    rows = [(i, rnd.uniform(0, 10), rnd.uniform(0, 10)) for i in range(n)]
    return spark.createDataFrame(rows, "id bigint, lat double, lng double")


TRI = [(1.0, 1.0), (1.0, 8.0), (8.0, 1.0)]          # ccw convex triangle
BOX = [(2.0, 2.0), (2.0, 6.0), (6.0, 6.0), (6.0, 2.0)]


def test_geoid_roundtrip():
    for lat, lng in [(0.0, 0.0), (45.5, -120.25), (-89.9, 179.9)]:
        # quantize via the column expr on a tiny df is overkill here;
        # use the pure helpers for the grid math
        x, y = geo.geoid_to_grid_xy(geo.grid_xy_to_geoid(12345, 54321))
        assert (x, y) == (12345, 54321)
    la, ln = geo.geoid_to_latlng(geo.grid_xy_to_geoid(0, 0))
    assert la < -89 and ln < -179
    assert geo.to_upper_layer_geoid(0b1111) == 0b11


def test_geoid_column_expr_matches_python(spark):
    df = _points_df(spark, 200).withColumn(
        "geoid", geo.latlng_to_geoid(F.col("lat"), F.col("lng"),
                                     (0.0, 10.0), (0.0, 10.0), bits=8))
    for r in df.limit(50).collect():
        n = (1 << 8) - 1
        qx = min(max(int(r["lng"] / 10 * n), 0), n)
        qy = min(max(int(r["lat"] / 10 * n), 0), n)
        assert r["geoid"] == geo.grid_xy_to_geoid(qx, qy, 8)


def test_point_in_polygon_raycast():
    assert geo.point_in_polygon(2.0, 2.0, TRI)
    assert not geo.point_in_polygon(7.9, 7.9, TRI)
    assert geo.point_in_polygon(3.0, 3.0, BOX)
    assert not geo.point_in_polygon(6.5, 3.0, BOX)


def test_polygon_ranges_cover(spark):
    ranges = geo.polygon_to_ranges(BOX, (0.0, 10.0), (0.0, 10.0),
                                   bits=8, max_depth=6)
    assert ranges
    # every point inside the polygon must fall in some range (soundness)
    df = (_points_df(spark, 500)
          .withColumn("geoid", geo.latlng_to_geoid(
              F.col("lat"), F.col("lng"), (0.0, 10.0), (0.0, 10.0), bits=8)))
    inside = [r for r in df.collect()
              if geo.point_in_polygon(r["lat"], r["lng"], BOX)]
    for r in inside:
        assert any(lo <= r["geoid"] <= hi for lo, hi in ranges), r


def test_filter_in_polygon_matches_bruteforce(spark):
    df = (_points_df(spark, 2000)
          .withColumn("geoid", geo.latlng_to_geoid(
              F.col("lat"), F.col("lng"), (0.0, 10.0), (0.0, 10.0), bits=8)))
    got = {r["id"] for r in geo.filter_in_polygon(
        df, "lat", "lng", BOX, geoid_col="geoid", bits=8,
        lat_range=(0.0, 10.0), lng_range=(0.0, 10.0)).collect()}
    want = {r["id"] for r in df.collect()
            if geo.point_in_polygon(r["lat"], r["lng"], BOX)}
    assert got == want


def test_convex_expr_matches_raycast(spark):
    df = _points_df(spark, 1000)
    got = {r["id"] for r in df.filter(
        geo.in_polygon_convex_expr(F.col("lat"), F.col("lng"), TRI)).collect()}
    want = {r["id"] for r in df.collect()
            if geo.point_in_polygon(r["lat"], r["lng"], TRI)}
    # edges: convex-expr includes boundary; ray-cast may exclude — allow
    # boundary-only differences
    assert want <= got
    extra = got - want
    for r in df.filter(F.col("id").isin(list(extra))).collect():
        on_edge = any(abs((ln2 - ln1) * (r["lat"] - la1)
                          - (la2 - la1) * (r["lng"] - ln1)) < 1e-9
                      for (la1, ln1), (la2, ln2) in
                      zip(TRI, TRI[1:] + TRI[:1]))
        assert on_edge


def test_in_polygon_join(spark):
    pts = _points_df(spark, 300)
    polys = spark.createDataFrame(
        [("tri", "1 1, 1 8, 8 1"), ("box", "2 2, 2 6, 6 6, 6 2")],
        "pname string, poly string")
    out = geo.in_polygon_join(pts, polys, "lat", "lng", "poly")
    rows = out.collect()
    by_poly = {}
    for r in rows:
        by_poly.setdefault(r["pname"], set()).add(r["id"])
    want_tri = {r["id"] for r in pts.collect()
                if geo.point_in_polygon(r["lat"], r["lng"], TRI)}
    want_box = {r["id"] for r in pts.collect()
                if geo.point_in_polygon(r["lat"], r["lng"], BOX)}
    assert by_poly.get("tri", set()) == want_tri
    assert by_poly.get("box", set()) == want_box


def test_range_list_algebra():
    a = [(0, 10), (20, 30)]
    b = [(5, 25), (40, 50)]
    assert geo.ranges_union([a, b]) == [(0, 30), (40, 50)]
    assert geo.ranges_intersect(a, b) == [(5, 10), (20, 25)]
    assert geo.combine_range_lists([a, b], "AND") == [(5, 10), (20, 25)]
    assert geo.combine_range_lists([a, b], "OR") == [(0, 30), (40, 50)]
    assert geo.ranges_intersect(a, [(100, 200)]) == []
    # adjacent ranges coalesce
    assert geo.ranges_union([[(0, 4)], [(5, 9)]]) == [(0, 9)]


def test_range_list_string_roundtrip():
    s = geo.to_range_list_as_string(TRI, max_depth=5)
    assert geo.parse_range_list_string(s) == geo.to_range_list(TRI, max_depth=5)


def test_in_polygon_expr_matches_raycast(spark):
    # concave polygon: pure-column ray cast vs driver ray cast
    concave = [(0.0, 0.0), (0.0, 9.0), (9.0, 9.0), (2.0, 5.0), (9.0, 0.0)]
    df = _points_df(spark).withColumn(
        "hit", geo.in_polygon_expr(F.col("lat"), F.col("lng"), concave))
    for r in df.collect():
        assert r["hit"] == geo.point_in_polygon(r["lat"], r["lng"], concave)


def test_in_polygon_list_expr(spark):
    df = _points_df(spark)
    n_or = df.filter(geo.in_polygon_list_expr(
        F.col("lat"), F.col("lng"), [TRI, BOX], "OR")).count()
    n_and = df.filter(geo.in_polygon_list_expr(
        F.col("lat"), F.col("lng"), [TRI, BOX], "AND")).count()
    n_tri = df.filter(geo.in_polygon_expr(F.col("lat"), F.col("lng"), TRI)).count()
    n_box = df.filter(geo.in_polygon_expr(F.col("lat"), F.col("lng"), BOX)).count()
    assert n_and <= min(n_tri, n_box) <= max(n_tri, n_box) <= n_or
    assert n_or == n_tri + n_box - n_and        # inclusion-exclusion


def test_in_polyline_list_expr(spark):
    # vertical segment lat 2..8 at lng 5, ~111km buffer = 1 degree
    line = [[(2.0, 5.0), (8.0, 5.0)]]
    df = _points_df(spark).withColumn(
        "hit", geo.in_polyline_list_expr(F.col("lat"), F.col("lng"),
                                         line, 111320.0))
    for r in df.collect():
        la, ln = r["lat"], r["lng"]
        t = max(0.0, min(1.0, (la - 2.0) / 6.0))
        d2 = (la - (2.0 + t * 6.0)) ** 2 + (ln - 5.0) ** 2
        assert r["hit"] == (d2 <= 1.0), (la, ln)


def test_filter_in_polygon_range_list(spark):
    df = _points_df(spark).withColumn(
        "geoid", geo.latlng_to_geoid(F.col("lat"), F.col("lng")))
    ra = geo.polygon_to_ranges(TRI, max_depth=7)
    rb = geo.polygon_to_ranges(BOX, max_depth=7)
    n_or = geo.filter_in_polygon_range_list(df, "geoid", [ra, rb], "OR").count()
    n_and = geo.filter_in_polygon_range_list(df, "geoid", [ra, rb], "AND").count()
    assert 0 < n_and < n_or
    # AND result ⊆ each single list's result
    n_a = geo.filter_in_polygon_range_list(df, "geoid", [ra], "OR").count()
    assert n_and <= n_a <= n_or


def test_in_polygon_join_range_list(spark):
    df = _points_df(spark).withColumn(
        "geoid", geo.latlng_to_geoid(F.col("lat"), F.col("lng")))
    polys = spark.createDataFrame(
        [(1, geo.to_range_list_as_string(TRI, max_depth=7)),
         (2, geo.to_range_list_as_string(BOX, max_depth=7))],
        "poly_id int, ranges string")
    pairs = geo.in_polygon_join_range_list(df, polys, "geoid", "ranges")
    counts = {r["poly_id"]: r["n"] for r in
              pairs.groupBy("poly_id").agg(F.count("*").alias("n")).collect()}
    # join counts equal the per-list filter counts (no dups, no losses)
    ra = geo.polygon_to_ranges(TRI, max_depth=7)
    rb = geo.polygon_to_ranges(BOX, max_depth=7)
    assert counts[1] == geo.filter_in_polygon_range_list(
        df, "geoid", [ra], "OR").count()
    assert counts[2] == geo.filter_in_polygon_range_list(
        df, "geoid", [rb], "OR").count()
