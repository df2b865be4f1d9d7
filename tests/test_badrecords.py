"""Bad-record handling on LOAD (reference docs/dml-of-carbondata.md
bad_records_action FORCE/IGNORE/FAIL/REDIRECT; badrecordloger suite)."""

from __future__ import annotations

import glob
import os

import pytest

from cdh_integrate_carbondata2_3_spark.catalog.table import Table

SCHEMA = "id int, v double"


def _csv(tmp_path, body: str) -> str:
    p = tmp_path / "in.csv"
    p.write_text("id,v\n" + body)
    return str(p)


def test_force_nulls_bad_cells(spark, tmp_path):
    t = Table.create(spark, str(tmp_path / "t"), SCHEMA)
    t.load_csv(_csv(tmp_path, "1,1.5\nxx,2.5\n3,zz\n"), schema=SCHEMA)
    rows = sorted([(r["id"], r["v"]) for r in t.read().collect()],
                  key=lambda x: (x[0] is None, x))
    assert (1, 1.5) in rows and len(rows) == 3
    assert any(r[0] is None for r in rows) and any(r[1] is None for r in rows)


def test_ignore_drops_bad_rows(spark, tmp_path):
    t = Table.create(spark, str(tmp_path / "t"), SCHEMA)
    t.load_csv(_csv(tmp_path, "1,1.5\nxx,2.5\n3,3.5\n"), schema=SCHEMA,
               bad_records_action="IGNORE")
    assert {r["id"] for r in t.read().collect()} == {1, 3}


def test_fail_aborts(spark, tmp_path):
    t = Table.create(spark, str(tmp_path / "t"), SCHEMA)
    with pytest.raises(Exception):
        t.load_csv(_csv(tmp_path, "1,1.5\nxx,2.5\n"), schema=SCHEMA,
                   bad_records_action="FAIL")


def test_redirect_quarantines(spark, tmp_path):
    t = Table.create(spark, str(tmp_path / "t"), SCHEMA)
    t.load_csv(_csv(tmp_path, "1,1.5\nxx,oops\n3,3.5\n"), schema=SCHEMA,
               bad_records_action="REDIRECT")
    assert {r["id"] for r in t.read().collect()} == {1, 3}
    quarantined = glob.glob(os.path.join(
        str(tmp_path / "t"), "_meta", "badrecords", "*", "part-*"))
    assert quarantined
    content = "".join(open(f).read() for f in quarantined)
    assert "xx" in content
