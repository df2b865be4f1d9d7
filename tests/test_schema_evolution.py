"""Schema evolution — reference CarbonAlterTableAddColumnCommand /
DropColumnCommand / ColRenameDataTypeChangeCommand semantics:
metadata-only ALTERs, old data files never rewritten."""

from __future__ import annotations

import pytest

from cdh_integrate_carbondata2_3_spark.catalog.table import Table


def _mk(spark, tmp_path, rows=((1, "a"), (2, "b"))):
    t = Table.create(spark, str(tmp_path / "t"), "id bigint, name string")
    t.insert(spark.createDataFrame(list(rows), "id bigint, name string"))
    return t


def test_add_column_with_default(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.add_column("score", "int", default=7)
    # old files surface the default
    got = {(r["id"], r["score"]) for r in t.read().collect()}
    assert got == {(1, 7), (2, 7)}
    # new loads carry real values
    t.insert(spark.createDataFrame([(3, "c", 30)], "id bigint, name string, score int"))
    got = {(r["id"], r["score"]) for r in t.read().collect()}
    assert got == {(1, 7), (2, 7), (3, 30)}


def test_add_column_null_default(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.add_column("extra", "string")
    assert {r["extra"] for r in t.read().collect()} == {None}


def test_drop_column(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.drop_column("name")
    df = t.read()
    assert df.columns == ["id"]
    assert {r["id"] for r in df.collect()} == {1, 2}
    with pytest.raises(ValueError):
        t.drop_column("id")  # cannot drop last column


def test_rename_column_across_eras(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.rename_column("name", "title")
    # new-era load under the new name
    t.insert(spark.createDataFrame([(3, "c")], "id bigint, title string"))
    df = t.read()
    assert df.columns == ["id", "title"]
    got = {(r["id"], r["title"]) for r in df.collect()}
    assert got == {(1, "a"), (2, "b"), (3, "c")}


def test_rename_then_filter(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.rename_column("name", "title")
    rows = t.read(predicates=[("title", "=", "a")]).collect()
    assert [(r["id"], r["title"]) for r in rows] == [(1, "a")]


def test_change_type_widening(spark, tmp_path):
    t = Table.create(spark, str(tmp_path / "t"), "id int, v float")
    t.insert(spark.createDataFrame([(1, 1.5)], "id int, v float"))
    t.change_column_type("id", "bigint")
    t.change_column_type("v", "double")
    assert dict(t.read().dtypes) == {"id": "bigint", "v": "double"}
    with pytest.raises(ValueError):
        t.change_column_type("id", "int")  # narrowing rejected


def test_decimal_widening_rules(spark, tmp_path):
    from decimal import Decimal
    t = Table.create(spark, str(tmp_path / "t"), "id int, amt decimal(10,2)")
    t.insert(spark.createDataFrame([(1, Decimal("1.25"))],
                                   "id int, amt decimal(10,2)"))
    t.change_column_type("amt", "decimal(12,2)")
    with pytest.raises(ValueError):
        t.change_column_type("amt", "decimal(12,6)")  # integral digits shrink
    assert dict(t.read().dtypes)["amt"] == "decimal(12,2)"


def test_evolution_survives_compaction(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.add_column("score", "int", default=1)
    for i in range(3, 7):
        t.insert(spark.createDataFrame([(i, f"n{i}", i * 10)],
                                       "id bigint, name string, score int"))
    t.compact("minor", minor_threshold=2)
    got = {(r["id"], r["score"]) for r in t.read().collect()}
    assert got == {(1, 1), (2, 1), (3, 30), (4, 40), (5, 50), (6, 60)}
