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
