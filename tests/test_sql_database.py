"""Database/schema qualification (VERDICT r7 missing item 1): every
engine command accepts db.table; databases map to warehouse
subdirectories ('default' = the warehouse root, so pre-database
warehouses work unchanged); USE switches the session database.
Reference: CarbonSpark2SqlParser.scala:233-237,412-417 (every grammar
production carries an optional db), CarbonEnv current-db resolution."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdh_integrate_carbondata2_3_spark.sql import Engine


@pytest.fixture()
def eng(spark, tmp_path):
    e = Engine(spark, str(tmp_path / "wh"))
    e.sql("CREATE DATABASE a")
    e.sql("CREATE DATABASE b")
    return e


def _mk(eng, name, rows=10, tag="x"):
    eng.sql(f"CREATE TABLE {name} (id BIGINT, v STRING)")
    eng.spark.range(0, rows).select(
        "id", F.lit(tag).alias("v")).createOrReplaceTempView("__dbsrc")
    eng.sql(f"INSERT INTO {name} SELECT * FROM __dbsrc")


def test_show_create_use_drop_databases(eng):
    assert [r[0] for r in eng.sql("SHOW DATABASES").collect()] == \
        ["default", "a", "b"]
    eng.sql("CREATE DATABASE IF NOT EXISTS a")      # idempotent
    eng.sql("USE a")
    assert eng._current_db == "a"
    with pytest.raises(ValueError, match="current"):
        eng.sql("DROP DATABASE a")
    with pytest.raises(ValueError, match="default"):
        eng.sql("DROP DATABASE default")
    eng.sql("USE default")
    eng.sql("DROP DATABASE a")
    assert [r[0] for r in eng.sql("SHOW DATABASES").collect()] == \
        ["default", "b"]
    with pytest.raises(FileNotFoundError):
        eng.sql("USE nope")


def test_same_name_tables_isolated_across_dbs(eng):
    _mk(eng, "a.t", 10, "A")
    _mk(eng, "b.t", 20, "B")
    _mk(eng, "t", 5, "D")
    assert eng.sql("SELECT COUNT(*) AS c FROM a.t").first()["c"] == 10
    assert eng.sql("SELECT COUNT(*) AS c FROM b.t").first()["c"] == 20
    assert eng.sql("SELECT COUNT(*) AS c FROM t").first()["c"] == 5
    # qualified DML stays in its database
    eng.sql("UPDATE a.t SET v = 'Z' WHERE id < 3")
    eng.sql("DELETE FROM b.t WHERE id >= 15")
    assert eng.sql("SELECT COUNT(*) AS c FROM a.t WHERE v = 'Z'") \
        .first()["c"] == 3
    assert eng.sql("SELECT COUNT(*) AS c FROM b.t").first()["c"] == 15
    assert eng.sql("SELECT COUNT(*) AS c FROM t WHERE v = 'D'") \
        .first()["c"] == 5
    # cross-db join in one statement
    n = eng.sql("SELECT COUNT(*) AS c FROM a.t x JOIN b.t y "
                "ON x.id = y.id").first()["c"]
    assert n == 10


def test_use_switches_bare_name_resolution(eng):
    _mk(eng, "a.t", 7, "A")
    _mk(eng, "t", 3, "D")
    eng.sql("USE a")
    assert eng.sql("SELECT COUNT(*) AS c FROM t").first()["c"] == 7
    assert eng.sql("SELECT COUNT(*) AS c FROM default.t").first()["c"] == 3
    assert [r[0] for r in eng.sql("SHOW TABLES").collect()] == ["t"]
    eng.sql("USE default")
    assert eng.sql("SELECT COUNT(*) AS c FROM t").first()["c"] == 3


def test_qualified_load_csv(eng, tmp_path):
    csv = tmp_path / "in.csv"
    csv.write_text("id,v\n1,x\n2,y\n")
    eng.sql("CREATE TABLE a.l (id BIGINT, v STRING)")
    eng.sql(f"LOAD DATA INPATH '{csv}' INTO TABLE a.l")
    assert eng.sql("SELECT COUNT(*) AS c FROM a.l").first()["c"] == 2


def test_qualified_merge_index_mv_segments(eng, spark):
    _mk(eng, "a.t", 10, "A")
    _mk(eng, "a.src", 4, "M")
    eng.sql("MERGE INTO a.t USING a.src ON a.t.id = a.src.id "
            "WHEN MATCHED THEN UPDATE SET v = 'M'")
    assert eng.sql("SELECT COUNT(*) AS c FROM a.t WHERE v = 'M'") \
        .first()["c"] == 4
    eng.sql("CREATE INDEX bi ON TABLE a.t (id) AS 'bloomfilter'")
    assert eng.sql("SHOW INDEXES ON TABLE a.t").first()["name"] == "bi"
    eng.sql("USE a")    # MV SPJG parser resolves bare names in the db
    eng.sql("CREATE MATERIALIZED VIEW mv1 AS "
            "SELECT v, COUNT(*) AS n FROM t GROUP BY v")
    rows = eng.sql("SHOW MATERIALIZED VIEWS ON TABLE t").collect()
    assert rows and rows[0]["name"] == "mv1" and not rows[0]["stale"]
    eng.sql("USE default")
    # qualified segment management + metadata fast paths
    segs = eng.sql("SHOW SEGMENTS ON a.t").collect()
    assert len(segs) >= 2                      # insert + merge commits
    eng.sql("SET carbon.input.segments.a.t = 0")
    seg0 = eng.table("a.t").manifest.row_count(segment_ids=[0])
    assert eng.sql("SELECT COUNT(*) AS c FROM a.t").first()["c"] == seg0
    eng.sql("SET carbon.input.segments.a.t = *")
    eng.sql("ALTER TABLE a.t COMPACT 'major'")
    assert eng.sql("SELECT COUNT(*) AS c FROM a.t").first()["c"] == 10


def test_qualified_ctas_rename_truncate_drop(eng):
    _mk(eng, "a.t", 6, "A")
    eng.sql("CREATE TABLE b.c AS SELECT id, v FROM a.t WHERE id < 4")
    assert eng.sql("SELECT COUNT(*) AS c FROM b.c").first()["c"] == 4
    eng.sql("ALTER TABLE b.c RENAME TO b.c2")
    assert eng.tables("b") == ["c2"]
    assert eng.sql("SELECT COUNT(*) AS c FROM b.c2").first()["c"] == 4
    eng.sql("TRUNCATE TABLE b.c2")
    assert eng.sql("SELECT COUNT(*) AS c FROM b.c2").first()["c"] == 0
    eng.sql("DROP TABLE b.c2")
    assert eng.tables("b") == []


def test_create_in_missing_db_refused(eng):
    with pytest.raises(FileNotFoundError, match="nodb"):
        eng.sql("CREATE TABLE nodb.t (id BIGINT)")
    with pytest.raises(ValueError, match="not empty"):
        _mk(eng, "a.t", 2, "A")
        eng.sql("DROP DATABASE a")
    eng.sql("DROP DATABASE a CASCADE")
    assert "a" not in eng.databases()


def test_string_literals_survive_qualify(eng):
    _mk(eng, "a.t", 3, "A")
    # a literal that LOOKS like a qualified ref must pass verbatim
    r = eng.sql("SELECT COUNT(*) AS c FROM a.t WHERE v <> 'from a.t'") \
        .first()["c"]
    assert r == 3
    # alias.column expressions are not rewritten
    r = eng.sql("SELECT t2.v AS w FROM a.t t2 WHERE t2.id = 1").first()["w"]
    assert r == "A"


def test_explain_dml_shows_pruning_without_executing(eng, spark):
    """EXPLAIN UPDATE/DELETE/MERGE (reference CarbonExplainCommand
    explains commands with ExplainCollector pruning info): reports the
    manifest file prune the mutation would use and must NOT execute."""
    eng.sql("CREATE TABLE p (id BIGINT, v STRING)")
    for lo in (0, 100, 200):        # 3 segments with disjoint id ranges
        spark.range(lo, lo + 100).select(
            "id", F.lit("x").alias("v")).createOrReplaceTempView("__ex")
        eng.sql("INSERT INTO p SELECT * FROM __ex")

    def report(sql):
        return {r["item"]: r["value"] for r in eng.sql(sql).collect()}

    r = report("EXPLAIN DELETE FROM p WHERE id = 5")
    assert r["command"] == "DELETE" and r["executed"] == "false"
    total, cand = int(r["files.total"]), int(r["files.candidate"])
    assert 0 < cand < total, r               # min/max skipped segments
    assert int(r["files.skipped"]) == total - cand
    assert eng.sql("SELECT COUNT(*) AS c FROM p").first()["c"] == 300

    r = report("EXPLAIN UPDATE p SET v = 'y' WHERE id = 250")
    assert r["command"] == "UPDATE" and int(r["files.candidate"]) < total
    assert eng.sql("SELECT COUNT(*) AS c FROM p WHERE v = 'y'") \
        .first()["c"] == 0                   # not executed

    eng.sql("CREATE TABLE psrc (id BIGINT, v STRING)")
    r = report("EXPLAIN MERGE INTO p USING psrc ON p.id = psrc.id "
               "WHEN MATCHED THEN UPDATE SET v = 'm'")
    assert r["command"] == "MERGE" and int(r["files.total"]) == total

    # participating index named when the predicate column is indexed
    eng.sql("CREATE INDEX pb ON TABLE p (id) AS 'bloomfilter'")
    r = report("EXPLAIN DELETE FROM p WHERE id = 5")
    assert "pb" in r["indexes.participating"]


def test_explain_merge_applies_source_key_prune(eng, spark):
    """EXPLAIN MERGE folds in the same source-key min/max prune the
    real MERGE performs (operators/merge._source_key_preds) when the
    source relation is resolvable — files.candidate must reflect the
    source's key range, not the full target."""
    eng.sql("CREATE TABLE mp (id BIGINT, v STRING)")
    for lo in (0, 100, 200):
        spark.range(lo, lo + 100).select(
            "id", F.lit("x").alias("v")).createOrReplaceTempView("__mx")
        eng.sql("INSERT INTO mp SELECT * FROM __mx")
    eng.sql("CREATE TABLE msrc (id BIGINT, v STRING)")
    spark.range(210, 240).select(
        "id", F.lit("s").alias("v")).createOrReplaceTempView("__ms")
    eng.sql("INSERT INTO msrc SELECT * FROM __ms")
    r = {row["item"]: row["value"] for row in eng.sql(
        "EXPLAIN MERGE INTO mp USING msrc ON mp.id = msrc.id "
        "WHEN MATCHED THEN UPDATE SET v = 'm'").collect()}
    total, cand = int(r["files.total"]), int(r["files.candidate"])
    assert 0 < cand < total, r       # only the 200..299 segment kept
    assert "between" in r["pushed_predicates"]
    assert r["executed"] == "false"
    # the mutation really did not run
    assert eng.sql("SELECT COUNT(*) AS c FROM mp WHERE v = 'm'") \
        .first()["c"] == 0


def test_table_names_with_view_separator_rejected(eng):
    """'__' is the db-qualified view separator (db.t -> 'db__t'): a
    default-db table literally named 'a__t' would collide with
    database a's table t in the temp-view namespace."""
    _mk(eng, "a.t", 3, "A")
    with pytest.raises(ValueError, match="__"):
        eng.sql("CREATE TABLE a__t (id BIGINT, v STRING)")
    with pytest.raises(ValueError, match="__"):
        eng.sql("CREATE TABLE b.x__y (id BIGINT, v STRING)")
    # CTAS and LIKE go through the same guard
    with pytest.raises(ValueError, match="__"):
        eng.sql("CREATE TABLE c__d LIKE a.t")


def test_mv_rewrite_on_qualified_table(eng):
    """The SPJG MV fast path accepts a db-qualified FROM without USE:
    the MV is created and consulted through the qualified name."""
    _mk(eng, "a.m", 12, "A")
    eng.sql("CREATE MATERIALIZED VIEW mvq AS "
            "SELECT v, COUNT(*) AS n FROM a.m GROUP BY v")
    rows = eng.sql("SHOW MATERIALIZED VIEWS ON TABLE a.m").collect()
    assert rows and rows[0]["name"] == "mvq"
    got = eng.sql("SELECT v, COUNT(*) AS n FROM a.m GROUP BY v").collect()
    assert [(r["v"], r["n"]) for r in got] == [("A", 12)]
    eng.sql("REFRESH MATERIALIZED VIEW mvq ON TABLE a.m")
    eng.sql("DROP MATERIALIZED VIEW mvq ON TABLE a.m")
    assert not eng.sql("SHOW MATERIALIZED VIEWS ON TABLE a.m").collect()


def test_explain_merge_is_plan_only(eng, spark):
    """ADVICE r9: EXPLAIN MERGE used to run a full source min/max
    aggregate (a scan-level Spark job) inside the 'static' explain.
    The bounds now come from the source table's manifest stats —
    explain must launch ZERO Spark jobs while still applying the
    source-key prune."""
    def jobs() -> int:
        return spark._jsparkSession.sparkContext().statusStore() \
            .jobsList(None).size()

    eng.sql("CREATE TABLE ep (id BIGINT, v STRING)")
    for lo in (0, 100, 200):
        spark.range(lo, lo + 100).select(
            "id", F.lit("x").alias("v")).createOrReplaceTempView("__ex")
        eng.sql("INSERT INTO ep SELECT * FROM __ex")
    eng.sql("CREATE TABLE esrc (id BIGINT, v STRING)")
    spark.range(205, 230).select(
        "id", F.lit("s").alias("v")).createOrReplaceTempView("__es")
    eng.sql("INSERT INTO esrc SELECT * FROM __es")
    before = jobs()
    out = eng.sql("EXPLAIN MERGE INTO ep USING esrc ON ep.id = esrc.id "
                  "WHEN MATCHED THEN UPDATE SET v = 'm'")
    assert jobs() == before, "EXPLAIN MERGE launched a Spark job"
    r = {row["item"]: row["value"] for row in out.collect()}
    total, cand = int(r["files.total"]), int(r["files.candidate"])
    assert 0 < cand < total, r          # prune still applied
    assert "between" in r["pushed_predicates"]
