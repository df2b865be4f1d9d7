"""CLI inspector tests (reference tools/cli CarbonCli: DataSummary +
ScanBenchmark shapes)."""

from __future__ import annotations

import json

from cdh_integrate_carbondata2_3_spark import cli
from cdh_integrate_carbondata2_3_spark.catalog.table import Table


def _mk(spark, tmp_path):
    t = Table.create(spark, str(tmp_path / "t"), "id bigint, v double",
                     {"sort_columns": ["id"], "sort_scope": "local_sort"})
    t.insert(spark.createDataFrame([(i, i * 1.5) for i in range(100)],
                                   "id bigint, v double"))
    t.insert(spark.createDataFrame([(i, i * 2.5) for i in range(100, 150)],
                                   "id bigint, v double"))
    return t


def test_summary(spark, tmp_path):
    t = _mk(spark, tmp_path)
    s = cli.summary(t.table_dir)
    assert s["total_rows"] == 150
    assert len(s["segments"]) == 2
    assert s["properties"]["sort_scope"] == "local_sort"
    assert s["column_minmax"]["id"] == [0, 149]
    json.dumps(s, default=str)  # serializable


def test_bench(spark, tmp_path):
    t = _mk(spark, tmp_path)
    b = cli.bench(t.table_dir)
    assert b["rows"] == 150
    assert b["n_files"] == len(b["files"]) >= 2


def test_main_entry(spark, tmp_path, capsys):
    t = _mk(spark, tmp_path)
    assert cli.main(["summary", t.table_dir]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["total_rows"] == 150
    assert cli.main(["nope"]) == 2
