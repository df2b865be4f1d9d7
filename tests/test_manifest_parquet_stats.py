"""manifest.stats='parquet' — the columnar file-stats sidecar that
keeps the driver metadata path O(segments) JSON + typed parquet stats
(the design answer to the reference's distributed index server,
indexserver/IndexServer.scala; see SCALE.md 'Driver metadata path')."""

import json
import os

import pytest

from cdh_integrate_carbondata2_3_spark.catalog.table import Table


def _mk(spark, path, props=None):
    t = Table.create(spark, str(path),
                     "id bigint, grp string, val double", props or {})
    t.insert(spark.createDataFrame(
        [(i, "a" if i < 50 else "b", float(i)) for i in range(100)],
        "id bigint, grp string, val double"))
    t.insert(spark.createDataFrame(
        [(i, "c", float(i)) for i in range(100, 200)],
        "id bigint, grp string, val double"))
    return t


def _file_stats(t):
    return sorted(
        (s.id, f.path, f.rows, f.bytes, json.dumps(f.minmax, sort_keys=True))
        for s in t.manifest.queryable_segments() for f in s.files)


def test_parquet_stats_roundtrip_equals_json(spark, tmp_path):
    tj = _mk(spark, tmp_path / "tj")
    tp = _mk(spark, tmp_path / "tp", {"manifest.stats": "parquet"})
    # JSON on disk holds no per-file entries; sidecar is referenced
    doc_raw = json.load(open(tp.manifest.status_path))
    assert doc_raw["files_ref"].endswith(".parquet")
    assert all(s["files"] == [] for s in doc_raw["segments"])
    assert os.path.exists(
        os.path.join(tp.manifest.meta_dir, doc_raw["files_ref"]))
    # reconstituted stats identical to the JSON-mode table's
    sj, sp = _file_stats(tj), _file_stats(tp)
    assert [x[2:] for x in sj] == [x[2:] for x in sp]
    # min/max values keep native types through the round trip
    f0 = tp.manifest.queryable_segments()[0].files[0]
    assert isinstance(f0.minmax["id"][0], int)
    assert isinstance(f0.minmax["val"][0], float)
    assert isinstance(f0.minmax["grp"][0], str)


def test_parquet_stats_pruning_and_count(spark, tmp_path):
    tp = _mk(spark, tmp_path / "t", {"manifest.stats": "parquet"})
    # metadata-only count(*)
    assert tp.manifest.row_count() == 200
    # min/max pruning works off the sidecar stats
    kept = tp.scan_files([("id", "<", 10)])
    n_kept = sum(len(v) for v in kept.values())
    n_all = sum(len(v) for v in tp.scan_files(None).values())
    assert 0 < n_kept < n_all
    assert tp.read([("id", "<", 10)]).filter("id < 10").count() == 10


def test_scan_identical_across_modes(spark, tmp_path):
    """The vectorized sidecar prune must keep exactly the files the
    classic per-file prune keeps, for every predicate shape."""
    tj = _mk(spark, tmp_path / "tj")
    tp = _mk(spark, tmp_path / "tp", {"manifest.stats": "parquet"})
    cases = [
        [("id", "<", 10)],
        [("grp", "=", "c")],
        [("id", "in", [5, 150])],
        [("val", ">=", 190.0)],
        [("id", "between", (40, 60))],
        [("id", ">", 120), ("grp", "=", "c")],
        [("grp", "!=", "zzz")],
        [("missing_col", "=", 1)],
    ]
    for preds in cases:
        nj = sum(len(v) for v in tj.scan_files(preds).values())
        np_ = sum(len(v) for v in tp.scan_files(preds).values())
        assert nj == np_, preds
        # pruning is a skip, not the filter — compare surviving rows
        assert (tj.read(preds, apply_predicates=False).count()
                == tp.read(preds, apply_predicates=False).count()), preds


def test_parquet_stats_time_travel(spark, tmp_path):
    tp = _mk(spark, tmp_path / "t", {"manifest.stats": "parquet"})
    v_after_first = tp.manifest.versions()[-2]
    old = tp.manifest.queryable_segments(version=v_after_first)
    assert sum(s.rows for s in old) == 100    # sidecar of v1 still readable
    assert tp.manifest.row_count() == 200


def test_property_flip_migrates_both_ways(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")                      # starts json
    assert "files_ref" not in json.load(open(t.manifest.status_path))
    before = _file_stats(t)
    t.set_properties({"manifest.stats": "parquet"})     # commit → migrate
    doc_raw = json.load(open(t.manifest.status_path))
    assert doc_raw.get("files_ref")
    assert _file_stats(t) == before
    t.set_properties({"manifest.stats": "json"})        # and back
    doc_raw = json.load(open(t.manifest.status_path))
    assert "files_ref" not in doc_raw
    assert doc_raw["segments"][0]["files"]              # re-inlined
    assert _file_stats(t) == before


def test_sidecar_gc_removes_only_unreferenced(spark, tmp_path):
    tp = _mk(spark, tmp_path / "t", {"manifest.stats": "parquet"})
    meta = tp.manifest.meta_dir
    # a crash between sidecar write and JSON swap leaves a stray
    stray = os.path.join(meta, "filestats.v999.parquet")
    open(stray, "wb").write(open(os.path.join(
        meta, json.load(open(tp.manifest.status_path))["files_ref"]),
        "rb").read())
    before = {f for f in os.listdir(meta) if f.startswith("filestats.")}
    assert tp.manifest.gc_stats_sidecars() == 1
    after = {f for f in os.listdir(meta) if f.startswith("filestats.")}
    assert before - after == {"filestats.v999.parquet"}
    # every remaining version (incl. history/time travel) still loads
    for v in tp.manifest.versions():
        tp.manifest.load(v)
    assert tp.manifest.row_count() == 200


def test_parquet_stats_compaction_and_delete(spark, tmp_path):
    tp = _mk(spark, tmp_path / "t", {"manifest.stats": "parquet"})
    tp.compact("MINOR")
    assert tp.manifest.row_count() == 200
    assert tp.read().count() == 200
    from cdh_integrate_carbondata2_3_spark.operators.dml import delete_rows
    delete_rows(tp, "id >= 150")
    assert tp.read().count() == 150


def test_parquet_stats_with_schema_evolution(spark, tmp_path):
    """Era defaults / rename lineage are orthogonal to stats storage —
    they must keep working when per-file stats live in the sidecar."""
    tp = _mk(spark, tmp_path / "t", {"manifest.stats": "parquet"})
    tp.add_column("tag", "string", default="none")
    tp.insert(spark.createDataFrame(
        [(900, "x", 1.0, "real")], "id bigint, grp string, val double, "
        "tag string"))
    got = tp.read()
    assert got.count() == 201
    assert got.filter("tag = 'none'").count() == 200   # era default fills
    tp.rename_column("tag", "label")
    assert tp.read().filter("label = 'real'").count() == 1
    # pruning still engages on the sidecar after evolution commits
    kept = sum(len(v) for v in tp.scan_files([("id", "=", 900)]).values())
    total = sum(len(v) for v in tp.scan_files(None).values())
    assert 0 < kept < total
