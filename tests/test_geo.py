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
