"""Segment time travel over manifest history (reference keeps
tablestatus history; segment-scoped reads/`insegment` are the same
idea keyed by segment id — ours also supports whole-manifest
versions)."""

from __future__ import annotations

import pytest

from cdh_integrate_carbondata2_3_spark.catalog.table import Table
from cdh_integrate_carbondata2_3_spark.operators import dml


def test_read_as_of_version(spark, tmp_path):
    t = Table.create(spark, str(tmp_path / "t"), "id bigint, v string")
    t.insert(spark.createDataFrame([(1, "a")], "id bigint, v string"))  # v1
    t.insert(spark.createDataFrame([(2, "b")], "id bigint, v string"))  # v2
    assert {r["id"] for r in t.read(as_of=1).collect()} == {1}
    assert {r["id"] for r in t.read(as_of=2).collect()} == {1, 2}
    assert {r["id"] for r in t.read().collect()} == {1, 2}
    assert t.history() == [0, 1, 2]


def test_as_of_before_delete(spark, tmp_path):
    t = Table.create(spark, str(tmp_path / "t"), "id bigint, v string")
    t.insert(spark.createDataFrame(
        [(i, "x") for i in range(10)], "id bigint, v string"))   # v1
    dml.delete_rows(t, "id >= 5")                                # v2
    assert t.read().count() == 5
    assert t.read(as_of=1).count() == 10                         # pre-delete


def test_as_of_missing_version_raises(spark, tmp_path):
    t = Table.create(spark, str(tmp_path / "t"), "id bigint")
    with pytest.raises(FileNotFoundError):
        t.read(as_of=99)
