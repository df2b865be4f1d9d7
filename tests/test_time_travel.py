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


def test_restore_to_version(spark, tmp_path):
    """RESTORE rolls the table back to a historical manifest version
    as a NEW version (append-only history): content equals the old
    snapshot, later data disappears, and the restore itself can be
    restored away. Swept data files fail fast."""
    import pytest
    from pyspark.sql import functions as F
    from cdh_integrate_carbondata2_3_spark.catalog.table import Table

    t = Table.create(spark, str(tmp_path / "rst"), "id bigint, v double")
    t.insert(spark.range(10).select("id", (F.col("id") * 1.0).alias("v")))
    v1 = t.manifest.load()["version"]
    t.insert(spark.range(10, 20).select("id", (F.col("id") * 1.0).alias("v")))
    from cdh_integrate_carbondata2_3_spark.operators import dml
    dml.delete_rows(t, "id < 3")
    assert t.read().count() == 17

    t.restore(v1)
    assert t.read().count() == 10                 # snapshot content
    assert sorted(r["id"] for r in t.read().collect()) == list(range(10))
    v_after = t.manifest.load()["version"]
    assert v_after > v1                           # history is append-only

    # the pre-restore state is itself still restorable
    t.restore(v_after - 1)
    assert t.read().count() == 17

    # a version whose files were swept cannot be restored
    t.restore(v1)
    t.truncate()
    t.clean_files()
    with pytest.raises(FileNotFoundError):
        t.restore(v1)


def test_as_of_after_clean_files_fails_fast(spark, tmp_path):
    """VERDICT r9 next-round 8: CLEAN FILES vs time-travel reader.
    Once CLEAN FILES physically sweeps the data of a historical
    version, read(as_of=that_version) must raise a clear DRIVER-side
    engine error naming the swept segment — not a mid-scan executor
    FileNotFoundException — exactly the restore() contract."""
    from pyspark.sql import functions as F

    t = Table.create(spark, str(tmp_path / "ttc"), "id bigint",
                     {"carbon.clean.file.force.allowed": "true"})
    t.insert(spark.range(5).select("id"))                     # v1
    v1 = t.manifest.load()["version"]
    t.truncate()                                              # v2
    t.insert(spark.range(5, 9).select("id"))                  # v3
    # pre-sweep: v1 is still time-travelable
    assert t.read(as_of=v1).count() == 5
    t.clean_files(force=True)
    # current version unaffected
    assert t.read().count() == 4
    with pytest.raises(FileNotFoundError, match="CLEAN FILES"):
        t.read(as_of=v1)
