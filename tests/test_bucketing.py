"""Hash-bucketed tables (reference schema.thrift BucketingInfo +
CarbonDataSourceScan HashPartitioning): bucketed loads, driver-side
bucket pruning on point lookups, soundness vs full scan."""

from __future__ import annotations

from cdh_integrate_carbondata2_3_spark.catalog.table import Table

N_BUCKETS = 8


def _mk(spark, tmp_path):
    t = Table.create(spark, str(tmp_path / "t"), "id bigint, v string",
                     {"bucket_columns": ["id"], "bucket_number": str(N_BUCKETS),
                      "sort_columns": ["id"]})
    t.insert(spark.createDataFrame(
        [(i, f"v{i}") for i in range(500)], "id bigint, v string"))
    return t


def test_bucketed_load_writes_bucket_files(spark, tmp_path):
    t = _mk(spark, tmp_path)
    segs = t.manifest.queryable_segments()
    buckets = {f.partition.get("__bucket__") for s in segs for f in s.files}
    assert buckets <= {str(i) for i in range(N_BUCKETS)}
    assert len(buckets) > 1


def test_point_lookup_prunes_to_one_bucket(spark, tmp_path):
    t = _mk(spark, tmp_path)
    all_files = sum(len(v) for v in t.scan_files().values())
    pruned = sum(len(v) for v in t.scan_files([("id", "=", 42)]).values())
    assert pruned < all_files
    # correctness: pruned read returns exactly the matching row
    rows = t.read(predicates=[("id", "=", 42)]).collect()
    assert [(r["id"], r["v"]) for r in rows] == [(42, "v42")]


def test_every_key_found_under_bucket_pruning(spark, tmp_path):
    t = _mk(spark, tmp_path)
    for k in (0, 1, 7, 99, 250, 499):
        rows = t.read(predicates=[("id", "=", k)]).collect()
        assert len(rows) == 1 and rows[0]["id"] == k


def test_non_equality_predicates_do_not_bucket_prune(spark, tmp_path):
    t = _mk(spark, tmp_path)
    got = {r["id"] for r in t.read(predicates=[("id", "<", 10)]).collect()}
    assert got == set(range(10))


def test_mixed_unbucketed_files_kept(spark, tmp_path):
    """Files without bucket info (e.g. loaded before bucketing was
    configured) must survive bucket pruning."""
    t = Table.create(spark, str(tmp_path / "t"), "id bigint, v string")
    t.insert(spark.createDataFrame([(1, "a")], "id bigint, v string"))

    def enable_buckets(doc):
        doc["properties"]["bucket_columns"] = ["id"]
        doc["properties"]["bucket_number"] = str(N_BUCKETS)
    t.manifest.update(enable_buckets)
    t.insert(spark.createDataFrame([(2, "b")], "id bigint, v string"))
    assert {r["id"] for r in t.read(predicates=[("id", "=", 1)]).collect()} == {1}
    assert {r["id"] for r in t.read(predicates=[("id", "=", 2)]).collect()} == {2}


# ---------------------------------------------------------------- join

def _mk_pair(spark, tmp_path, n=4):
    from cdh_integrate_carbondata2_3_spark.catalog.table import Table
    props = {"bucket_columns": ["id"], "bucket_number": str(n)}
    l = Table.create(spark, str(tmp_path / "l"), "id bigint, lv string", dict(props))
    r = Table.create(spark, str(tmp_path / "r"), "id bigint, rv string", dict(props))
    l.insert(spark.createDataFrame(
        [(i, f"l{i}") for i in range(200)], "id bigint, lv string"))
    r.insert(spark.createDataFrame(
        [(i, f"r{i}") for i in range(100, 300)], "id bigint, rv string"))
    return l, r


def test_bucket_map_join_correct_and_shuffle_free(spark, tmp_path):
    from cdh_integrate_carbondata2_3_spark.operators.bucketed import bucketed_join
    l, r = _mk_pair(spark, tmp_path)
    df = bucketed_join(l, r, ["id"], "inner")
    got = {(x["id"], x["lv"], x["rv"]) for x in df.collect()}
    assert got == {(i, f"l{i}", f"r{i}") for i in range(100, 200)}
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan
    assert "BroadcastExchange" in plan


def test_bucket_map_join_outer_variants(spark, tmp_path):
    from cdh_integrate_carbondata2_3_spark.operators.bucketed import bucketed_join
    l, r = _mk_pair(spark, tmp_path)
    assert bucketed_join(l, r, ["id"], "left").count() == 200
    assert bucketed_join(l, r, ["id"], "right").count() == 200
    assert bucketed_join(l, r, ["id"], "full").count() == 300
    assert bucketed_join(l, r, ["id"], "left_semi").count() == 100
    assert bucketed_join(l, r, ["id"], "left_anti").count() == 100
    # shuffle-free also holds for the one-side-preserved variants
    for how in ("left", "right", "left_semi", "left_anti"):
        plan = (bucketed_join(l, r, ["id"], how)
                ._jdf.queryExecution().executedPlan().toString())
        assert "Exchange hashpartitioning" not in plan, how


def test_bucket_join_fallback_when_not_cobucketed(spark, tmp_path):
    from cdh_integrate_carbondata2_3_spark.catalog.table import Table
    from cdh_integrate_carbondata2_3_spark.operators.bucketed import bucketed_join
    l, _ = _mk_pair(spark, tmp_path)
    plain = Table.create(spark, str(tmp_path / "p"), "id bigint, rv string")
    plain.insert(spark.createDataFrame(
        [(i, f"r{i}") for i in range(150, 250)], "id bigint, rv string"))
    df = bucketed_join(l, plain, ["id"], "inner")
    assert df.count() == 50


def test_compaction_preserves_bucketing(spark, tmp_path):
    """Compaction re-applies the table's load layout: the merged
    segment's files carry __bucket__ again, bucket-scoped reads stay
    valid (no ValueError → no silent fallback to a shuffling join),
    and the bucket-map join still matches a plain join."""
    from pyspark.sql import functions as F
    from cdh_integrate_carbondata2_3_spark.operators.bucketed import (
        bucketed_join)

    props = {"bucket_columns": ["id"], "bucket_number": "4"}
    l = Table.create(spark, str(tmp_path / "lc"), "id bigint, v string",
                     dict(props))
    r = Table.create(spark, str(tmp_path / "rc"), "id bigint, w string",
                     dict(props))
    for lo in (0, 100, 200, 300):        # 4 segments → minor compaction
        l.insert(spark.range(lo, lo + 100).select(
            F.col("id"), F.concat(F.lit("v"), F.col("id")).alias("v")))
        r.insert(spark.range(lo, lo + 100).select(
            F.col("id"), F.concat(F.lit("w"), F.col("id")).alias("w")))
    assert l.compact("minor") is not None
    segs = l.manifest.queryable_segments()
    assert all("__bucket__" in f.partition for s in segs for f in s.files), \
        "compacted files lost their bucket identity"
    # bucket-scoped read must not raise
    assert l.read(bucket_id=2).count() > 0
    df = bucketed_join(l, r, ["id"], "inner")
    assert "Exchange hashpartitioning" not in \
        df._jdf.queryExecution().executedPlan().toString()
    assert df.count() == 400
    got = {(x["id"], x["v"], x["w"]) for x in df.collect()}
    want = {(i, f"v{i}", f"w{i}") for i in range(400)}
    assert got == want


def test_compaction_preserves_zorder_pruning(spark, tmp_path):
    """A z-ordered table keeps multi-column min/max pruning after
    compaction (the rewrite re-applies sort_scope='zorder', not just
    a local sort on the raw columns)."""
    from pyspark.sql import functions as F

    t = Table.create(
        spark, str(tmp_path / "z"), "x bigint, y bigint, v string",
        {"sort_columns": ["x", "y"], "sort_scope": "zorder",
         "global_sort_partitions": "8"})
    for lo in (0, 1, 2, 3):              # 4 loads → minor compaction
        t.insert(spark.range(4000).select(
            ((F.col("id") * 7 + lo) % 200).alias("x"),
            ((F.col("id") * 13 + lo) % 200).alias("y"),
            F.lit("p").alias("v")))
    assert t.compact("minor") is not None
    all_files = sum(len(v) for v in t.scan_files().values())
    px = sum(len(v) for v in t.scan_files(
        [("x", "between", (10, 20))]).values())
    py = sum(len(v) for v in t.scan_files(
        [("y", "between", (10, 20))]).values())
    assert all_files > 1
    # BOTH z-columns must prune on the compacted layout
    assert px < all_files and py < all_files, (px, py, all_files)
    n = t.read(predicates=[("x", "between", (10, 20))]).count()
    assert n == t.read().filter("x between 10 and 20").count()


def test_in_list_prunes_to_bucket_union(spark, tmp_path):
    """`id IN (...)` on the bucket column prunes the scan to the
    union of the values' buckets — and stays correct (every key
    found). Past the combination cap the pruning disables itself."""
    t = _mk(spark, tmp_path)
    all_files = sum(len(v) for v in t.scan_files().values())
    pruned = sum(len(v) for v in
                 t.scan_files([("id", "in", [7, 42, 99])]).values())
    assert 0 < pruned < all_files
    rows = t.read(predicates=[("id", "in", [7, 42, 99])]).collect()
    assert sorted(r["id"] for r in rows) == [7, 42, 99]
    # over the cap: no bucket pruning, still correct
    big = list(range(200))
    assert t.read(predicates=[("id", "in", big)]).count() == 200
