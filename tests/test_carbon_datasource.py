"""spark.read.format("carbon") Python DataSource
(sources/carbon_datasource.py)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql.datasource import GreaterThanOrEqual, In

from cdh_integrate_carbondata2_3_spark.catalog.table import Table
from cdh_integrate_carbondata2_3_spark.sources.carbon_datasource import (
    CarbonScanReader,
    register,
)


@pytest.fixture()
def tdir(spark, tmp_path):
    register(spark)
    d = str(tmp_path / "t")
    t = Table.create(spark, d, "id bigint, v double",
                     {"sort_columns": ["id"], "sort_scope": "global_sort"})
    t.insert(spark.range(0, 100).selectExpr("id", "id * 1.0 AS v"))
    t.insert(spark.range(100, 200).selectExpr("id", "id * 1.0 AS v"))
    return d


def test_read_format_carbon(spark, tdir):
    df = spark.read.format("carbon").load(tdir)
    assert df.count() == 200
    assert df.filter("id >= 150").count() == 50
    assert {f.name for f in df.schema.fields} == {"id", "v"}


def test_filter_pushdown_prunes_files(spark, tdir):
    df = spark.read.format("carbon").load(tdir)
    base = CarbonScanReader({"path": tdir}, df.schema)
    total = len(base.partitions())
    pruned = CarbonScanReader({"path": tdir}, df.schema)
    pruned.pushFilters([GreaterThanOrEqual(("id",), 150)])
    assert 0 < len(pruned.partitions()) < total
    inlist = CarbonScanReader({"path": tdir}, df.schema)
    inlist.pushFilters([In(("id",), (1, 2))])
    assert 0 < len(inlist.partitions()) < total


def test_segments_option_scopes_read(spark, tdir):
    df = (spark.read.format("carbon").option("segments", "0").load(tdir))
    assert df.count() == 100


def test_schema_evolution_default_and_rename(spark, tdir):
    t = Table.open(spark, tdir)
    t.add_column("tag", "string", default="x")
    t.insert(spark.sql("SELECT 999 AS id, 9.0 AS v, CAST(NULL AS STRING) AS tag"))
    t.rename_column("tag", "label")
    df = spark.read.format("carbon").load(tdir)
    assert df.columns == ["id", "v", "label"]
    # era default on pre-evolution files; explicit NULL preserved after
    assert df.filter("label = 'x'").count() == 200
    assert df.filter("id = 999").collect()[0]["label"] is None


def test_stream_read_tails_new_segments(spark, tmp_path):
    register(spark)
    d = str(tmp_path / "st")
    t = Table.create(spark, d, "id bigint")
    t.insert(spark.range(0, 10))
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")

    def drain():
        q = (spark.readStream.format("carbon").load(d)
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    drain()
    assert spark.read.parquet(out).count() == 10
    t.insert(spark.range(10, 25))
    drain()                      # resumes from checkpointed segment offset
    assert spark.read.parquet(out).count() == 25
