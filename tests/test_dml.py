"""UPDATE / DELETE / MERGE tests — mirrors the reference's iud/ and
merge/ suites (SURVEY.md §5; docs/scd-and-cdc-guide.md examples)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdh_integrate_carbondata2_3_spark.catalog import Table
from cdh_integrate_carbondata2_3_spark.operators import dml, merge as M


@pytest.fixture()
def table(spark, tmp_path):
    t = Table.create(spark, str(tmp_path / "t"),
                     "id bigint, qty int, price double, state string")
    for lo in (0, 100):
        t.insert(spark.range(lo, lo + 100).select(
            "id", (F.col("id") % 10).cast("int").alias("qty"),
            (F.col("id") * 1.5).alias("price"), F.lit("new").alias("state")))
    return t


def _src(spark, ids, state="upd"):
    return spark.createDataFrame(
        [(i, 99, 9.9, state) for i in ids],
        "id bigint, qty int, price double, state string")


def test_delete_rows(spark, table):
    n = dml.delete_rows(table, "id >= 150")
    assert n == 50
    assert table.read().count() == 150
    assert table.count() == 150                 # manifest counts updated
    assert table.read().filter("id >= 150").count() == 0


def test_delete_prunes_untouched_files(spark, table):
    before = sum(len(v) for v in table.scan_files().values())
    dml.delete_rows(table, "id = 5")
    # only files containing id=5 were rewritten; others untouched
    segs = {s.source for s in table.manifest.segments()}
    assert "delete" in segs
    assert table.read().count() == 199
    after_clean = table.clean_files()
    assert table.read().count() == 199
    _ = before, after_clean


def test_update_rows(spark, table):
    n = dml.update_rows(table, {"state": "'shipped'", "qty": "qty + 1"},
                        "id < 20")
    assert n == 20
    df = table.read()
    assert df.filter("state = 'shipped'").count() == 20
    assert df.filter("id = 3").select("qty").first()["qty"] == 4
    assert df.filter("id = 50").select("state").first()["state"] == "new"
    assert df.count() == 200


def test_update_blocked_on_streaming_table(spark, tmp_path):
    t = Table.create(spark, str(tmp_path / "s"), "id bigint",
                     {"streaming": True})
    t.insert(spark.range(5).select("id"))
    with pytest.raises(ValueError, match="streaming"):
        dml.update_rows(t, {"id": "id + 1"})


def test_merge_matched_update_and_insert(spark, table):
    src = _src(spark, [10, 11, 500, 501])
    stats = (M.merge(table, src, "tgt.id = src.id")
             .when_matched().update_all()
             .when_not_matched().insert_all()
             .execute())
    assert (stats.updated, stats.inserted, stats.deleted) == (2, 2, 0)
    df = table.read()
    assert df.count() == 202
    assert df.filter("id = 10").first()["state"] == "upd"
    assert df.filter("id = 500").first()["qty"] == 99


def test_merge_conditional_clauses(spark, table):
    src = _src(spark, [0, 1, 2, 3])
    stats = (M.merge(table, src, "tgt.id = src.id")
             .when_matched("tgt.id < 2").delete()
             .when_matched().update_expr({"state": "'kept'"})
             .execute())
    assert (stats.deleted, stats.updated) == (2, 2)
    df = table.read()
    assert df.count() == 198
    assert df.filter("state = 'kept'").count() == 2


def test_merge_not_matched_by_source_delete(spark, table):
    src = _src(spark, list(range(150)))      # 0..149 exist in source
    stats = (M.merge(table, src, "tgt.id = src.id")
             .when_not_matched_and_exists_only_on_target().delete()
             .execute())
    assert stats.deleted == 50
    assert table.read().count() == 150


def test_merge_duplicate_source_rejected(spark, table):
    src = _src(spark, [10, 10])
    with pytest.raises(ValueError, match="multiple source rows"):
        (M.merge(table, src, "tgt.id = src.id")
         .when_matched().update_all().execute())


def test_keyed_upsert_update_delete_insert(spark, table):
    assert M.upsert(table, _src(spark, [5, 300]), "id").inserted == 1
    assert table.read().count() == 201
    assert table.read().filter("id = 5").first()["state"] == "upd"

    assert M.update(table, _src(spark, [6, 999], "u2"), "id").updated == 1
    assert table.read().count() == 201          # update never inserts

    assert M.delete(table, _src(spark, [5, 6]), "id").deleted == 2
    assert table.read().count() == 199

    assert M.insert(table, _src(spark, [5, 7]), "id").inserted == 1
    assert table.read().count() == 200          # id=7 existed → skipped


def test_merge_history_table(spark, table, tmp_path):
    hist = Table.create(
        spark, str(tmp_path / "hist"),
        "id bigint, qty int, price double, state string, operation_ts double")
    (M.merge(table, _src(spark, [1, 2]), "tgt.id = src.id")
     .when_matched().update_all()
     .insert_history_table(hist)
     .execute())
    h = hist.read()
    assert h.count() == 2                        # pre-images captured
    assert h.filter("state = 'new'").count() == 2


def test_keyed_merge_prunes_matched_scan_by_key_range(spark, tmp_path, monkeypatch):
    """Keyed MERGE passes the source key min/max into the touched-file
    scan (CDC block pruning): the target read must receive a between
    predicate, and results stay exact."""
    from pyspark.sql import functions as F
    from cdh_integrate_carbondata2_3_spark.catalog.table import Table
    from cdh_integrate_carbondata2_3_spark.operators import merge as m

    t = Table.create(spark, str(tmp_path / "mt"), "k bigint, v string",
                     {"sort_columns": ["k"], "sort_scope": "global_sort",
                      "global_sort_partitions": "8"})
    t.insert(spark.range(800).select(F.col("id").alias("k"),
                                     F.concat(F.lit("v"), F.col("id")).alias("v")))
    seen = {}
    orig_read = Table.read

    def spy(self, predicates=None, **kw):
        if predicates:
            seen["preds"] = predicates
        return orig_read(self, predicates=predicates, **kw)

    monkeypatch.setattr(Table, "read", spy)
    src = spark.createDataFrame(
        [(100, "new100"), (101, "new101")], "k bigint, v string")
    stats = m.upsert(t, src, "k")
    assert stats.updated == 2
    assert seen["preds"] == [("k", "between", (100, 101))]
    got = {r["v"] for r in t.read([("k", "in", [100, 101, 102])]).collect()}
    assert got == {"new100", "new101", "v102"}


def test_sql_delete_prunes_files_with_simple_where(spark, tmp_path, monkeypatch):
    """DELETE ... WHERE k < 100 must reach find_touched_files with
    manifest-pruning predicates parsed from the WHERE."""
    from pyspark.sql import functions as F
    from cdh_integrate_carbondata2_3_spark.sql import Engine
    from cdh_integrate_carbondata2_3_spark.operators import dml as dml_mod

    eng = Engine(spark, str(tmp_path / "wh"))
    eng.sql("CREATE TABLE dt (k BIGINT, v STRING) TBLPROPERTIES ("
            "'sort_columns'='k', 'sort_scope'='global_sort', "
            "'global_sort_partitions'='6')")
    eng.table("dt").insert(spark.range(600).select(
        F.col("id").alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("v")))
    seen = {}
    orig = dml_mod.find_touched_files

    def spy(table, condition, predicates=None):
        seen["preds"] = predicates
        return orig(table, condition, predicates)

    monkeypatch.setattr(dml_mod, "find_touched_files", spy)
    eng.sql("DELETE FROM dt WHERE k < 100")
    assert seen["preds"] == [("k", "<", 100)]
    assert eng.table("dt").count() == 500
