"""Count-Min sketch (operators/sketch.py): numpy reference parity,
mergeability, the one-sided no-undercount guarantee, and the eps·N
overcount bound."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from cdh_integrate_carbondata2_3_spark.operators.sketch import (
    cms_build, cms_eps, cms_estimate, cms_merge)

W, D = 64, 3


def _cells_dict(cells_df, group=None):
    out = {}
    for r in cells_df.collect():
        key = (tuple(r[g] for g in group) if group else ())
        out[key + (r["row"], r["col"])] = r["c"]
    return out


def test_build_matches_reference_hash_cells(spark):
    rows = [(i % 7,) for i in range(100)]
    df = spark.createDataFrame(rows, "item long")
    cells = cms_build(df, "item", width=W, depth=D)
    # reference: same xxhash64(item, row) % W computed THROUGH Spark
    # (pin the cell layout, not reimplement xxhash in Python)
    ref = (df.select("item",
                     *[F.pmod(F.xxhash64("item", F.lit(r)), F.lit(W))
                      .cast("int").alias(f"c{r}") for r in range(D)])
           .collect())
    want = Counter()
    for row in ref:
        for r in range(D):
            want[(r, row[f"c{r}"])] += 1
    got = _cells_dict(cells)
    assert got == {k: v for k, v in want.items()}


def test_estimates_never_undercount_and_bound(spark):
    import random
    random.seed(7)
    items = [random.randint(0, 500) for _ in range(3000)]
    true = Counter(items)
    df = spark.createDataFrame([(i,) for i in items], "item long")
    cells = cms_build(df, "item", width=W, depth=D)
    probes = spark.createDataFrame([(i,) for i in true], "item long")
    est = {r["item"]: r["est"] for r in
           cms_estimate(cells, probes, "item",
                        width=W, depth=D).collect()}
    n = len(items)
    over = 0
    for i, t in true.items():
        assert est[i] >= t, (i, est[i], t)       # deterministic bound
        if est[i] > t + cms_eps(W) * n:
            over += 1
    # eps·N bound holds w.p. 1 - e^-D per item; allow a small tail
    assert over <= max(2, int(0.1 * len(true))), over


def test_merge_equals_union_build(spark):
    a = spark.createDataFrame([(1, "g1") for _ in range(10)]
                              + [(2, "g1") for _ in range(5)],
                              "item long, g string")
    b = spark.createDataFrame([(1, "g2") for _ in range(7)],
                              "item long, g string")
    both = a.unionByName(b)
    fine = cms_build(both, "item", ["g"], width=W, depth=D)
    merged = cms_merge(fine, [])
    direct = cms_build(both, "item", width=W, depth=D)
    assert _cells_dict(merged) == _cells_dict(direct)
    probes = spark.createDataFrame([(1,), (2,)], "item long")
    est = {r["item"]: r["est"] for r in
           cms_estimate(merged, probes, "item",
                        width=W, depth=D).collect()}
    assert est[1] >= 17 and est[2] >= 5


def test_weighted_build(spark):
    df = spark.createDataFrame([(1, 10), (1, 5), (2, 3)],
                               "item long, w long")
    cells = cms_build(df, "item", width=W, depth=D, weight_col="w")
    probes = spark.createDataFrame([(1,), (2,)], "item long")
    est = {r["item"]: r["est"] for r in
           cms_estimate(cells, probes, "item",
                        width=W, depth=D).collect()}
    assert est[1] >= 15 and est[2] >= 3


def test_absent_item_estimates_zero_or_collision(spark):
    df = spark.createDataFrame([(1,)], "item long")
    cells = cms_build(df, "item", width=W, depth=D)
    probes = spark.createDataFrame([(999,)], "item long")
    est = cms_estimate(cells, probes, "item",
                       width=W, depth=D).collect()[0]["est"]
    assert est in (0, 1)    # 0 unless all D cells collide with item 1


def test_join_size_estimate_bounds(spark):
    import random
    from cdh_integrate_carbondata2_3_spark.operators.sketch import (
        cms_join_size)
    random.seed(3)
    ka = [random.randint(0, 200) for _ in range(1500)]
    kb = [random.randint(0, 200) for _ in range(900)]
    A = spark.createDataFrame([(k,) for k in ka], "k long")
    B = spark.createDataFrame([(k,) for k in kb], "k long")
    exact = A.join(B, "k").count()
    ca = cms_build(A, "k", width=256, depth=D)
    cb = cms_build(B, "k", width=256, depth=D)
    est = cms_join_size(ca, cb, depth=D).collect()[0]["est"]
    assert est >= exact                       # one-sided, always
    eps = 2.718281828 / 256
    assert est <= exact + eps * len(ka) * len(kb)


def test_join_size_disjoint_keys_is_zero(spark):
    from cdh_integrate_carbondata2_3_spark.operators.sketch import (
        cms_join_size)
    A = spark.createDataFrame([(i,) for i in range(50)], "k long")
    B = spark.createDataFrame([(i + 10_000,) for i in range(50)],
                              "k long")
    ca = cms_build(A, "k", width=1024, depth=D)
    cb = cms_build(B, "k", width=1024, depth=D)
    est = cms_join_size(ca, cb, depth=D).collect()[0]["est"]
    # with 1024 cells and 50 keys/side, at least one of D rows is
    # overwhelmingly likely collision-free -> min hits 0 (and the
    # estimate is small even if not)
    assert est <= 50


def test_join_size_rejects_mismatched_sketches(spark):
    """ADVICE r9: two CMS with different widths (or depths) stop
    colliding on (row, col), silently killing the no-undercount
    guarantee — cms_build frames self-describe via schema metadata
    and cms_join_size must refuse to combine them."""
    import pytest as _pt

    from cdh_integrate_carbondata2_3_spark.operators.sketch import (
        _cms_meta, cms_join_size)
    df = spark.createDataFrame([(i % 5,) for i in range(50)],
                               "item long")
    a = cms_build(df, "item", width=W, depth=D)
    assert _cms_meta(a) == {"cms_width": W, "cms_depth": D}
    # metadata survives a merge (the grouping attribute is reused)
    assert _cms_meta(cms_merge(a, [])) == {"cms_width": W,
                                           "cms_depth": D}
    b_wide = cms_build(df, "item", width=W * 2, depth=D)
    with _pt.raises(ValueError, match="cms_width"):
        cms_join_size(a, b_wide)
    b_deep = cms_build(df, "item", width=W, depth=D + 1)
    with _pt.raises(ValueError, match="cms_depth"):
        cms_join_size(a, b_deep)
    # explicit args must also agree with the embedded metadata
    with _pt.raises(ValueError, match="cms_width"):
        cms_join_size(a, cms_build(df, "item", width=W, depth=D),
                      width=W * 4)
    # matching sketches still work, depth picked up from metadata
    est = cms_join_size(
        a, cms_build(df, "item", width=W, depth=D)).first()["est"]
    assert est >= 5 * 10 * 10


def test_estimate_uses_build_metadata_for_hashing(spark):
    """cms_estimate must hash probes with the sketch's OWN
    width/depth (schema metadata) — probing a W=64 sketch with the
    2048 default used to silently break the no-undercount guarantee.
    Calling with no explicit params on a non-default sketch now
    works; an explicit conflicting value raises."""
    import pytest as _pt

    from cdh_integrate_carbondata2_3_spark.operators.sketch import (
        cms_estimate)
    df = spark.createDataFrame([(i % 5,) for i in range(60)],
                               "item long")
    cells = cms_build(df, "item", width=W, depth=D)   # W=64, not 2048
    probes = spark.createDataFrame([(k,) for k in range(5)],
                                   "item long")
    # defaults: metadata wins, estimates never undercount (true = 12)
    est = {r["item"]: r["est"]
           for r in cms_estimate(cells, probes, "item").collect()}
    assert all(v >= 12 for v in est.values()), est
    with _pt.raises(ValueError, match="cms_width"):
        cms_estimate(cells, probes, "item", width=W * 2)
    # ADVICE r10: explicitly passing the old global default (2048)
    # against a differently-built sketch must ALSO raise — None
    # defaults make "passed" always distinguishable from "omitted"
    with _pt.raises(ValueError, match="cms_width"):
        cms_estimate(cells, probes, "item", width=2048)
