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


def test_load_csv_full_option_surface(spark, tmp_path):
    """docs/dml-of-carbondata.md LOAD options: QUOTECHAR, ESCAPECHAR,
    COMMENTCHAR, FILEHEADER (headerless file), SKIP_EMPTY_LINE,
    COMPLEX_DELIMITER_LEVEL_1 (array column from a delimited cell),
    and the per-load SORT_SCOPE / GLOBAL_SORT_PARTITIONS override."""
    from cdh_integrate_carbondata2_3_spark.sql import Engine

    eng = Engine(spark, str(tmp_path / "wh"))
    eng.sql("CREATE TABLE lt (id BIGINT, name STRING, "
            "tags ARRAY<INT>)")
    csv = tmp_path / "opt.csv"
    csv.write_text(
        "# a comment line\n"
        "1;'al;pha';7\00142\n"
        "2;'be''ta';9\n"
        "\n"
        "3;gamma;1\0012\0013\n")
    eng.sql(f"LOAD DATA INPATH '{csv}' INTO TABLE lt OPTIONS("
            "'DELIMITER'=';', 'QUOTECHAR'=\"'\", 'HEADER'='false', "
            "'COMMENTCHAR'='#', 'FILEHEADER'='id, name, tags', "
            "'SORT_SCOPE'='global_sort', 'GLOBAL_SORT_PARTITIONS'='1')")
    t = eng.table("lt")
    rows = {r["id"]: (r["name"], list(r["tags"]))
            for r in t.read().collect()}
    assert rows[1] == ("al;pha", [7, 42])        # quoted delimiter kept
    assert rows[2][1] == [9]
    assert rows[3] == ("gamma", [1, 2, 3])
    assert len(rows) == 3                         # comment+empty skipped
    # the per-load global_sort override produced ONE data file
    segs = t.manifest.queryable_segments()
    assert sum(len(s.files) for s in segs) == 1
    # table-level props untouched by the per-load override
    assert t.manifest.properties().get("sort_scope") is None


def test_load_csv_fileheader_arity_check(spark, tmp_path):
    from cdh_integrate_carbondata2_3_spark.catalog.table import Table

    t = Table.create(spark, str(tmp_path / "fh"), "a bigint, b string")
    csv = tmp_path / "x.csv"
    csv.write_text("1,foo\n")
    import pytest
    with pytest.raises(ValueError, match="FILEHEADER"):
        t.load_csv(str(csv), header=False, fileheader=["a", "b", "c"])


def test_load_csv_date_timestamp_formats(spark, tmp_path):
    from cdh_integrate_carbondata2_3_spark.catalog.table import Table
    import datetime

    t = Table.create(spark, str(tmp_path / "dt"), "id bigint, d date")
    csv = tmp_path / "d.csv"
    csv.write_text("id,d\n1,2020|01|31\n")
    t.load_csv(str(csv), schema="id bigint, d date",
               dateformat="yyyy|MM|dd")
    assert t.read().first()["d"] == datetime.date(2020, 1, 31)


def test_load_csv_skip_empty_line_false_refused(spark, tmp_path):
    import pytest
    from cdh_integrate_carbondata2_3_spark.catalog.table import Table

    t = Table.create(spark, str(tmp_path / "se"), "a bigint")
    csv = tmp_path / "y.csv"
    csv.write_text("a\n1\n")
    with pytest.raises(NotImplementedError):
        t.load_csv(str(csv), skip_empty_line=False)


def test_empty_data_bad_record_actions(spark, tmp_path):
    """IS_EMPTY_DATA_BAD_RECORD routes empty-string cells through the
    bad-record action: FORCE nulls them, IGNORE drops the row,
    REDIRECT quarantines it (custom BAD_RECORD_PATH honored), FAIL
    aborts."""
    import os
    import pytest
    from cdh_integrate_carbondata2_3_spark.catalog.table import Table

    csv = tmp_path / "e.csv"
    csv.write_text('id,name\n1,alpha\n2,""\n3,gamma\n')
    sch = "id bigint, name string"

    def mk(n):
        return Table.create(spark, str(tmp_path / n), sch)

    t = mk("force")
    t.load_csv(str(csv), schema=sch, is_empty_data_bad_record=True)
    rows = {r["id"]: r["name"] for r in t.read().collect()}
    assert rows == {1: "alpha", 2: None, 3: "gamma"}

    t2 = mk("ign")
    t2.load_csv(str(csv), schema=sch, bad_records_action="IGNORE",
                is_empty_data_bad_record=True)
    assert sorted(r["id"] for r in t2.read().collect()) == [1, 3]

    t3 = mk("redir")
    badp = str(tmp_path / "quarantine")
    t3.load_csv(str(csv), schema=sch, bad_records_action="REDIRECT",
                bad_record_path=badp, is_empty_data_bad_record=True)
    assert sorted(r["id"] for r in t3.read().collect()) == [1, 3]
    assert os.path.isdir(badp) and any(
        f.endswith(".txt") for f in os.listdir(badp))

    t4 = mk("fail")
    with pytest.raises(ValueError, match="empty cell"):
        t4.load_csv(str(csv), schema=sch, bad_records_action="FAIL",
                    is_empty_data_bad_record=True)

    # default: empty string is NOT a bad record
    t5 = mk("dflt")
    t5.load_csv(str(csv), schema=sch)
    assert t5.read().count() == 3
