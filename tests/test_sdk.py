"""SDK reader/writer tests (reference sdk/sdk CarbonReader/Writer,
PaginationCarbonReader) — including Spark interop both directions."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from cdh_integrate_carbondata2_3_spark.catalog.table import Table
from cdh_integrate_carbondata2_3_spark.sdk import SdkReader, SdkWriter


def test_write_read_no_spark(tmp_path):
    w = SdkWriter(str(tmp_path / "t"), "id bigint, name string, v double")
    for i in range(10):
        w.write({"id": i, "name": f"n{i}", "v": i * 1.5})
    seg = w.close()
    assert seg == 0
    r = SdkReader(str(tmp_path / "t"))
    assert r.total_rows() == 10
    rows = list(r)
    assert rows[0] == {"id": 0, "name": "n0", "v": 0.0}


def test_projection_and_filter(tmp_path):
    w = SdkWriter(str(tmp_path / "t"), "id bigint, v double")
    w.write_arrow(pa.table({"id": list(range(100)),
                            "v": [float(i) for i in range(100)]}))
    r = SdkReader(str(tmp_path / "t"), columns=["id"],
                  filter_expr=pc.field("id") >= 90)
    t = r.to_arrow()
    assert t.column_names == ["id"] and t.num_rows == 10


def test_pagination_touches_only_needed_files(tmp_path):
    w = SdkWriter(str(tmp_path / "t"), "id bigint", rows_per_file=10)
    w.write_arrow(pa.table({"id": list(range(35))}))   # 4 files
    r = SdkReader(str(tmp_path / "t"))
    page = r.read_page(12, 10)
    assert page.column("id").to_pylist() == list(range(12, 22))
    assert r.read_page(30, 10).num_rows == 5           # tail clamp
    assert r.read_page(100, 5).num_rows == 0


def test_multi_segment_order(tmp_path):
    w = SdkWriter(str(tmp_path / "t"), "id bigint")
    w.write_arrow(pa.table({"id": [1, 2]}))
    w.write_arrow(pa.table({"id": [3, 4]}))
    r = SdkReader(str(tmp_path / "t"))
    assert [x["id"] for x in r] == [1, 2, 3, 4]
    assert r.read_page(1, 2).column("id").to_pylist() == [2, 3]


def test_sdk_write_spark_read(spark, tmp_path):
    w = SdkWriter(str(tmp_path / "t"), "id bigint, v double")
    w.write_arrow(pa.table({"id": [1, 2, 3], "v": [1.0, 2.0, 3.0]}))
    t = Table.open(spark, str(tmp_path / "t"))
    assert t.count() == 3
    assert {r["id"] for r in t.read().collect()} == {1, 2, 3}


def test_spark_write_sdk_read(spark, tmp_path):
    t = Table.create(spark, str(tmp_path / "t"), "id bigint, v double")
    t.insert(spark.createDataFrame([(1, 1.0), (2, 2.0)], "id bigint, v double"))
    r = SdkReader(str(tmp_path / "t"))
    assert sorted(x["id"] for x in r) == [1, 2]


def test_stage_writer_invisible_until_insert_stage(spark, tmp_path):
    from cdh_integrate_carbondata2_3_spark.sdk import SdkStageWriter
    t = Table.create(spark, str(tmp_path / "t"), "id bigint, v double")
    t.insert(spark.createDataFrame([(1, 1.0)], "id bigint, v double"))
    w = SdkStageWriter(str(tmp_path / "t"))
    w.write({"id": 2, "v": 2.0})
    w.commit()
    w.write({"id": 3, "v": 3.0})
    w.commit()
    assert t.count() == 1                       # staged data not visible
    seg = t.insert_stage()
    assert seg == 1
    assert sorted(r["id"] for r in t.read().collect()) == [1, 2, 3]
    assert t.insert_stage() is None             # stage drained


def test_insert_stage_batch_and_delete_stage_sql(spark, tmp_path):
    import os
    from cdh_integrate_carbondata2_3_spark.sdk import SdkStageWriter
    from cdh_integrate_carbondata2_3_spark.sql import Engine
    eng = Engine(spark, str(tmp_path / "wh"))
    eng.sql("CREATE TABLE st (id INT, v DOUBLE)")
    tdir = eng.table("st").table_dir
    w = SdkStageWriter(tdir)
    for i in range(3):
        w.write({"id": i, "v": float(i)})
        w.commit()
    eng.sql("INSERT INTO st STAGE OPTIONS('batch_file_count'='2')")
    assert eng.table("st").count() == 2         # only 2 oldest entries
    # orphan data file (writer died before metadata): GC'd by DELETE STAGE
    orphan = os.path.join(tdir, "stage", "deadbeef-part-00000.parquet")
    open(orphan, "wb").close()
    eng.sql("DELETE FROM TABLE st STAGE")
    assert not os.path.exists(orphan)
    eng.sql("INSERT INTO st STAGE")             # remaining entry intact
    assert eng.table("st").count() == 3
