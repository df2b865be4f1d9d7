"""Extended-SQL dispatcher tests — mirrors the reference's e2e SQL
suites (CarbonSpark2SqlParser surface exercised through SQL strings)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdh_integrate_carbondata2_3_spark.sql import Engine


@pytest.fixture()
def eng(spark, tmp_path):
    e = Engine(spark, str(tmp_path / "wh"))
    e.sql("CREATE TABLE src (id INT, grp STRING, amt DOUBLE) "
          "TBLPROPERTIES('sort_columns'='id', 'sort_scope'='local_sort')")
    e.sql("INSERT INTO src SELECT * FROM VALUES "
          "(1,'a',10.0),(2,'a',20.0),(3,'b',30.0),(4,'b',40.0) t(id,grp,amt)")
    return e


def test_create_insert_select(eng):
    rows = eng.sql("SELECT grp, sum(amt) AS s FROM src GROUP BY grp "
                   "ORDER BY grp").collect()
    assert [(r["grp"], r["s"]) for r in rows] == [("a", 30.0), ("b", 70.0)]


def test_count_star_metadata_path(eng):
    assert eng.sql("SELECT COUNT(*) FROM src").first()[0] == 4
    assert eng.sql("SELECT COUNT(*) AS n FROM src").first()["n"] == 4


def test_ctas_and_drop(eng):
    eng.sql("CREATE TABLE derived AS SELECT id, amt * 2 AS amt2 FROM src")
    assert eng.sql("SELECT COUNT(*) FROM derived").first()[0] == 4
    eng.sql("DROP TABLE derived")
    assert "derived" not in eng.tables()


def test_update_delete(eng):
    eng.sql("UPDATE src SET (amt) = (amt + 1) WHERE id = 1")
    assert eng.sql("SELECT amt FROM src WHERE id = 1").first()[0] == 11.0
    eng.sql("DELETE FROM src WHERE grp = 'b'")
    assert eng.sql("SELECT COUNT(*) FROM src").first()[0] == 2


def test_segment_management(eng):
    eng.sql("INSERT INTO src SELECT * FROM VALUES (9,'z',90.0) t(id,grp,amt)")
    segs = eng.sql("SHOW SEGMENTS FOR TABLE src").collect()
    assert len(segs) == 2
    eng.sql("DELETE FROM TABLE src WHERE SEGMENT.ID IN (1)")
    assert eng.sql("SELECT COUNT(*) FROM src").first()[0] == 4
    eng.sql("CLEAN FILES FOR TABLE src")
    assert len(eng.sql("SHOW SEGMENTS FOR TABLE src").collect()) == 1


def test_set_input_segments(eng):
    eng.sql("INSERT INTO src SELECT * FROM VALUES (9,'z',90.0) t(id,grp,amt)")
    eng.sql("SET carbon.input.segments.default.src = 1")
    assert eng.sql("SELECT COUNT(*) FROM src").first()[0] == 1
    rows = eng.sql("SELECT id FROM src").collect()
    assert [r["id"] for r in rows] == [9]
    # insegment() overrides the session scope
    assert eng.sql("SELECT COUNT(*) AS n FROM src "
                   "WHERE insegment('0')").first()["n"] == 4
    eng.sql("SET carbon.input.segments.default.src = *")
    assert eng.sql("SELECT COUNT(*) FROM src").first()[0] == 5


def test_compact_close_streaming_sql(eng, spark):
    from cdh_integrate_carbondata2_3_spark.streaming import (
        append_streaming_batch)
    eng.sql("CREATE TABLE stt (id INT) TBLPROPERTIES('streaming'='true')")
    append_streaming_batch(eng.table("stt"),
                           spark.range(5).select(F.col("id").cast("int")))
    assert any(s.status == "STREAMING"
               for s in eng.table("stt").manifest.segments())
    eng.sql("ALTER TABLE stt COMPACT 'CLOSE_STREAMING'")
    statuses = {s.status for s in eng.table("stt").manifest.segments()}
    assert "STREAMING" not in statuses and "STREAMING_FINISH" not in statuses
    assert eng.sql("SELECT COUNT(*) FROM stt").first()[0] == 5


def test_show_segments_variants(eng):
    eng.sql("INSERT INTO src SELECT * FROM VALUES (9,'z',90.0) t(id,grp,amt)")
    eng.sql("DELETE FROM TABLE src WHERE SEGMENT.ID IN (1)")
    # plain: only visible segments; HISTORY: includes marked-for-delete
    assert len(eng.sql("SHOW SEGMENTS ON src").collect()) == 1
    hist = eng.sql("SHOW HISTORY SEGMENTS ON src").collect()
    assert {r["status"] for r in hist} == {"SUCCESS", "MARKED_FOR_DELETE"}
    # LIMIT keeps the largest ids
    eng.sql("INSERT INTO src SELECT * FROM VALUES (10,'w',1.0) t(id,grp,amt)")
    top = eng.sql("SHOW SEGMENTS ON src LIMIT 1").collect()
    assert [r["id"] for r in top] == [2]
    # AS SELECT runs against the <table>_segments pseudo-view
    rows = eng.sql("SHOW SEGMENTS ON src AS "
                   "SELECT id, status FROM src_segments "
                   "WHERE status = 'SUCCESS' ORDER BY id").collect()
    assert [r["id"] for r in rows] == [0, 2]


def test_compaction_sql(eng):
    for i in range(3):
        eng.sql(f"INSERT INTO src SELECT * FROM VALUES ({10+i},'c',1.0) t(a,b,c)")
    eng.sql("ALTER TABLE src COMPACT 'minor'")
    segs = eng.sql("SHOW SEGMENTS FOR TABLE src").collect()
    assert any(s["source"] == "compact" for s in segs)
    assert eng.sql("SELECT COUNT(*) FROM src").first()[0] == 7


def test_alter_columns_sql(eng):
    eng.sql("ALTER TABLE src ADD COLUMNS (tag STRING) "
            "TBLPROPERTIES('DEFAULT.VALUE.tag'='none')")
    assert {r["tag"] for r in eng.sql("SELECT tag FROM src").collect()} == {"none"}
    eng.sql("ALTER TABLE src CHANGE tag label string")
    assert "label" in eng.sql("SELECT * FROM src").columns
    eng.sql("ALTER TABLE src DROP COLUMNS (label)")
    assert "label" not in eng.sql("SELECT * FROM src").columns
    eng.sql("ALTER TABLE src CHANGE id id bigint")
    assert dict(eng.sql("SELECT * FROM src").dtypes)["id"] == "bigint"


def test_index_sql(eng):
    eng.sql("CREATE INDEX si_grp ON TABLE src (grp) AS 'carbondata'")
    rows = eng.sql("SHOW INDEXES ON TABLE src").collect()
    assert rows and rows[0]["name"] == "si_grp"
    assert eng.sql("SELECT COUNT(*) FROM src").first()[0] == 4
    eng.sql("DROP INDEX si_grp ON TABLE src")
    assert not eng.sql("SHOW INDEXES ON TABLE src").collect()


def test_mv_sql_roundtrip(eng):
    eng.sql("CREATE MATERIALIZED VIEW mv1 AS "
            "SELECT grp, sum(amt) AS s FROM src GROUP BY grp")
    rows = eng.sql("SHOW MATERIALIZED VIEWS ON TABLE src").collect()
    assert rows[0]["name"] == "mv1" and not rows[0]["stale"]
    got = {(r["grp"], r["s"]) for r in
           eng.sql("SELECT grp, sum(amt) AS s FROM src GROUP BY grp").collect()}
    assert got == {("a", 30.0), ("b", 70.0)}
    eng.sql("DROP MATERIALIZED VIEW mv1 ON TABLE src")
    assert not eng.sql("SHOW MATERIALIZED VIEWS ON TABLE src").collect()


def test_create_table_like(eng):
    eng.sql("CREATE TABLE clone LIKE src")
    assert "clone" in eng.tables()
    assert eng.table("clone").schema_ddl() == eng.table("src").schema_ddl()
    assert eng.sql("SELECT COUNT(*) FROM clone").first()[0] == 0


def test_truncate_sql(eng):
    eng.sql("TRUNCATE TABLE src")
    assert eng.sql("SELECT COUNT(*) FROM src").first()[0] == 0


def test_load_data_sql(eng, tmp_path):
    csv = tmp_path / "in.csv"
    csv.write_text("id,grp,amt\n7,q,70.5\n8,q,80.5\n")
    eng.sql(f"LOAD DATA INPATH '{csv}' INTO TABLE src")
    assert eng.sql("SELECT COUNT(*) FROM src").first()[0] == 6


def test_describe(eng):
    plain = eng.sql("DESCRIBE src").collect()
    assert [r["col_name"] for r in plain][:3] == ["id", "grp", "amt"]
    fmt = eng.sql("DESC FORMATTED src").collect()
    assert any(r["col_name"] == "Location" for r in fmt)


def test_explain_has_pruning_info(eng):
    rows = eng.sql("EXPLAIN SELECT * FROM src WHERE id = 1").collect()
    items = {r["item"] for r in rows}
    assert "plan" in items and "table.src.total_files" in items


def test_fallthrough_plain_sql(eng):
    # window functions etc. — not extended syntax, plain Spark SQL
    rows = eng.sql(
        "SELECT id, row_number() OVER (PARTITION BY grp ORDER BY amt) rn "
        "FROM src").collect()
    assert {r["rn"] for r in rows} == {1, 2}


# ----------------------------------------------------------- UDF surface
# (CarbonEnv.scala:83-113: NI / text_match / insegment / timeseries)

def test_describe_column_and_short(eng):
    eng.sql("CREATE TABLE cx (id INT, "
            "meta STRUCT<author: STRING, tags: ARRAY<STRING>>, "
            "kv MAP<STRING, INT>)")
    rows = eng.sql("DESCRIBE COLUMN meta ON cx").collect()
    assert [(r["col_name"], r["data_type"]) for r in rows] == [
        ("author", "string"), ("tags", "array<string>")]
    rows = eng.sql("DESCRIBE COLUMN meta.tags ON cx").collect()
    assert rows[0]["data_type"] == "string"      # array element type
    rows = eng.sql("DESCRIBE COLUMN kv ON cx").collect()
    assert [(r["col_name"], r["data_type"]) for r in rows] == [
        ("key", "string"), ("value", "int")]
    rows = eng.sql("DESC SHORT cx").collect()
    assert [(r["col_name"], r["data_type"]) for r in rows] == [
        ("id", "int"), ("meta", "struct<...>"), ("kv", "map<...>")]
    with pytest.raises(ValueError):
        eng.sql("DESCRIBE COLUMN nope ON cx")


def test_carboncli_sql_passthrough(eng):
    rows = eng.sql("CARBONCLI FOR TABLE src OPTIONS('-cmd'='summary')") \
        .collect()
    d = {r["item"]: r["value"] for r in rows}
    assert "schema" in d and "segments" in d
    assert int(d["total_rows"]) == 4
    rows = eng.sql("CARBONCLI FOR TABLE src OPTIONS('-cmd'='benchmark')") \
        .collect()
    d = {r["item"]: r["value"] for r in rows}
    assert int(d["rows"]) == 4


def test_ni_hint_unwrapped(eng):
    # nested parens inside NI() must survive the unwrap
    rows = eng.sql("SELECT id FROM src WHERE NI(id = least(1, 2))").collect()
    assert [r["id"] for r in rows] == [1]


def test_text_match_rlike_fallback(eng):
    eng.sql("CREATE TABLE docs (id INT, body STRING)")
    eng.sql("INSERT INTO docs SELECT * FROM VALUES "
            "(1,'spark scan fast'),(2,'slow scan'),(3,'scanner x') t(id,body)")
    rows = eng.sql("SELECT id FROM docs WHERE text_match('body:scan') "
                   "ORDER BY id").collect()
    assert [r["id"] for r in rows] == [1, 2]            # token, not substring
    rows = eng.sql("SELECT id FROM docs WHERE text_match('body:scan*') "
                   "ORDER BY id").collect()
    assert [r["id"] for r in rows] == [1, 2, 3]          # wildcard
    rows = eng.sql("SELECT id FROM docs WHERE "
                   "text_match('body:scan* AND NOT body:slow')").collect()
    assert sorted(r["id"] for r in rows) == [1, 3]


def test_text_match_phrase_and_or(eng):
    eng.sql("CREATE TABLE pdocs (id INT, body STRING)")
    eng.sql("INSERT INTO pdocs SELECT * FROM VALUES "
            "(1,'spark scan fast'),(2,'fast scan spark'),(3,'scan slow x'),"
            "(4,'walk quick') t(id,body)")
    # quoted phrase: tokens must be adjacent and in order
    rows = eng.sql("SELECT id FROM pdocs WHERE "
                   "text_match('body:\"spark scan\"') ORDER BY id").collect()
    assert [r["id"] for r in rows] == [1]
    # OR of a phrase and a term
    rows = eng.sql(
        "SELECT id FROM pdocs WHERE "
        "text_match('body:\"scan slow\" OR body:quick') ORDER BY id").collect()
    assert [r["id"] for r in rows] == [3, 4]
    # AND binds tighter than OR
    rows = eng.sql(
        "SELECT id FROM pdocs WHERE "
        "text_match('body:fast AND body:spark OR body:quick') "
        "ORDER BY id").collect()
    assert [r["id"] for r in rows] == [1, 2, 4]
    # unsupported Lucene syntax raises explicitly, never mis-matches
    with pytest.raises(ValueError, match="unbalanced"):
        eng.sql("SELECT id FROM pdocs WHERE text_match('body:\"a b')")
    with pytest.raises(ValueError, match="maximum"):
        eng.sql("SELECT id FROM pdocs WHERE text_match('body:spark~5')")
    with pytest.raises(ValueError, match="wildcard"):
        eng.sql("SELECT id FROM pdocs WHERE text_match('body:spa*k~1')")


def test_text_match_grouping_and_occur(eng):
    eng.sql("CREATE TABLE gdocs (id INT, body STRING)")
    eng.sql("INSERT INTO gdocs SELECT * FROM VALUES "
            "(1,'spark scan fast'),(2,'fast walk'),(3,'spark walk'),"
            "(4,'quick brown fox') t(id,body)")
    # parenthesized grouping
    rows = eng.sql("SELECT id FROM gdocs WHERE "
                   "text_match('(body:scan OR body:walk) AND body:fast') "
                   "ORDER BY id").collect()
    assert [r["id"] for r in rows] == [1, 2]
    # implicit adjacency = Lucene default OR
    rows = eng.sql("SELECT id FROM gdocs WHERE "
                   "text_match('body:scan body:quick') ORDER BY id").collect()
    assert [r["id"] for r in rows] == [1, 4]
    # occur prefixes: +MUST, -MUST_NOT; plain terms optional when a
    # MUST exists (Lucene BooleanQuery bag)
    rows = eng.sql("SELECT id FROM gdocs WHERE "
                   "text_match('+body:spark body:quick -body:scan') "
                   "ORDER BY id").collect()
    assert [r["id"] for r in rows] == [3]
    # no MUST: at least one SHOULD must hit, minus the MUST_NOTs
    rows = eng.sql("SELECT id FROM gdocs WHERE "
                   "text_match('body:spark body:quick -body:scan') "
                   "ORDER BY id").collect()
    assert [r["id"] for r in rows] == [3, 4]
    # NOT over a group
    rows = eng.sql("SELECT id FROM gdocs WHERE "
                   "text_match('NOT (body:spark OR body:quick)')").collect()
    assert [r["id"] for r in rows] == [2]
    # pure-negative raises (Lucene: matches nothing)
    with pytest.raises(ValueError, match="pure-negative"):
        eng.sql("SELECT id FROM gdocs WHERE text_match('-body:spark')")
    with pytest.raises(ValueError, match="parenthes"):
        eng.sql("SELECT id FROM gdocs WHERE text_match('(body:a OR body:b')")


def test_text_match_range_terms(eng):
    """Lucene TermRangeQuery: field:[a TO b] inclusive, {a TO b}
    exclusive, mixed brackets per end; lexicographic token order."""
    eng.sql("CREATE TABLE rgdocs (id INT, body STRING)")
    eng.sql("INSERT INTO rgdocs SELECT * FROM VALUES "
            "(1,'apple pie'),(2,'banana split'),(3,'cherry cake'),"
            "(4,'zebra stripes') t(id,body)")
    rows = eng.sql("SELECT id FROM rgdocs WHERE "
                   "text_match('body:[banana TO cherry]') "
                   "ORDER BY id").collect()
    assert [r["id"] for r in rows] == [2, 3]
    # exclusive both ends
    rows = eng.sql("SELECT id FROM rgdocs WHERE "
                   "text_match('body:{banana TO cherry}') "
                   "ORDER BY id").collect()
    assert [r["id"] for r in rows] == [3]    # 'cake' in (banana, cherry)
    # mixed: include lo, exclude hi
    rows = eng.sql("SELECT id FROM rgdocs WHERE "
                   "text_match('body:[banana TO cherry}') "
                   "ORDER BY id").collect()
    assert [r["id"] for r in rows] == [2, 3]
    # composes with other terms
    rows = eng.sql("SELECT id FROM rgdocs WHERE "
                   "text_match('body:[a TO b] AND body:pie')").collect()
    assert [r["id"] for r in rows] == [1]


def test_text_match_regexp_terms(eng):
    """Lucene RegexpQuery: field:/re/ matches whole tokens against the
    regex (Lucene/brics dialect, translated to RLIKE)."""
    eng.sql("CREATE TABLE xdocs (id INT, body STRING)")
    eng.sql("INSERT INTO xdocs SELECT * FROM VALUES "
            "(1,'slow scan'),(2,'slowed down'),(3,'sled ride'),"
            "(4,'fast lane') t(id,body)")
    rows = eng.sql("SELECT id FROM xdocs WHERE "
                   "text_match('body:/sl(ow|ed)/') ORDER BY id").collect()
    assert [r["id"] for r in rows] == [1, 3]     # whole-token anchor
    rows = eng.sql("SELECT id FROM xdocs WHERE "
                   "text_match('body:/slow(ed)?/') ORDER BY id").collect()
    assert [r["id"] for r in rows] == [1, 2]
    # composes; a URL-ish term is NOT a regexp
    rows = eng.sql("SELECT id FROM xdocs WHERE "
                   "text_match('body:/sl.*/ AND body:ride')").collect()
    assert [r["id"] for r in rows] == [3]


def test_text_match_standard_analyzer(eng):
    """PROPERTIES('analyzer'='standard'): lowercase+whitespace analysis
    — queries match case-insensitively and the postings store
    lowercased tokens (Lucene StandardAnalyzer core behavior)."""
    eng.sql("CREATE TABLE adocs (id INT, body STRING)")
    eng.sql("INSERT INTO adocs SELECT * FROM VALUES "
            "(1,'Spark SCAN Fast'),(2,'spark walk'),(3,'WALK quick'),"
            "(4,'nothing here') t(id,body)")
    eng.sql("CREATE INDEX aidx ON TABLE adocs (body) AS 'lucene' "
            "PROPERTIES('analyzer'='standard')")
    rows = eng.sql("SELECT id FROM adocs WHERE text_match('body:SPARK') "
                   "ORDER BY id").collect()
    assert [r["id"] for r in rows] == [1, 2]
    # phrase, wildcard, fuzzy all case-insensitive
    rows = eng.sql("SELECT id FROM adocs WHERE "
                   "text_match('body:\"spark scan\"')").collect()
    assert [r["id"] for r in rows] == [1]
    rows = eng.sql("SELECT id FROM adocs WHERE text_match('body:Wal*') "
                   "ORDER BY id").collect()
    assert [r["id"] for r in rows] == [2, 3]
    rows = eng.sql("SELECT id FROM adocs WHERE text_match('body:SPORK~1') "
                   "ORDER BY id").collect()
    assert [r["id"] for r in rows] == [1, 2]
    # the postings prune still engages: absent term → zero files → 0 rows
    rows = eng.sql("SELECT id FROM adocs WHERE "
                   "text_match('body:zzznope')").collect()
    assert rows == []
    # without the property, matching stays case-sensitive
    eng.sql("CREATE TABLE cdocs (id INT, body STRING)")
    eng.sql("INSERT INTO cdocs SELECT * FROM VALUES "
            "(1,'Spark fast') t(id,body)")
    assert eng.sql("SELECT id FROM cdocs WHERE "
                   "text_match('body:spark')").collect() == []


def test_text_match_fuzzy(eng):
    eng.sql("CREATE TABLE fdocs (id INT, body STRING)")
    eng.sql("INSERT INTO fdocs SELECT * FROM VALUES "
            "(1,'spark scan fast'),(2,'spork fork'),(3,'walk quick'),"
            "(4,'sparkle dust') t(id,body)")
    # ~1: one substitution matches spork; sparkle is 2 inserts away
    rows = eng.sql("SELECT id FROM fdocs WHERE text_match('body:spark~1') "
                   "ORDER BY id").collect()
    assert [r["id"] for r in rows] == [1, 2]
    # bare ~ defaults to 2 edits (Lucene FuzzyQuery default)
    rows = eng.sql("SELECT id FROM fdocs WHERE text_match('body:spark~') "
                   "ORDER BY id").collect()
    assert [r["id"] for r in rows] == [1, 2, 4]
    # ~0 is exact token match
    rows = eng.sql("SELECT id FROM fdocs WHERE "
                   "text_match('body:spark~0')").collect()
    assert [r["id"] for r in rows] == [1]
    # fuzzy composes with AND
    rows = eng.sql("SELECT id FROM fdocs WHERE "
                   "text_match('body:spark~1 AND body:fork')").collect()
    assert [r["id"] for r in rows] == [2]


def test_text_match_sloppy_phrase(eng):
    eng.sql("CREATE TABLE sdocs (id INT, body STRING)")
    eng.sql("INSERT INTO sdocs SELECT * FROM VALUES "
            "(1,'spark scan fast'),(2,'spark quite very fast'),"
            "(3,'spark a b c fast'),(4,'fast spark') t(id,body)")
    # slop 0 == exact phrase
    rows = eng.sql("SELECT id FROM sdocs WHERE "
                   "text_match('body:\"spark fast\"~0')").collect()
    assert [r["id"] for r in rows] == []
    # shared slop budget (Lucene SloppyPhraseMatcher): slop 2 covers
    # two intervening tokens in order AND the reversed adjacent pair
    # (doc 4 — switching two words costs two moves)
    rows = eng.sql("SELECT id FROM sdocs WHERE "
                   "text_match('body:\"spark fast\"~1') ORDER BY id").collect()
    assert [r["id"] for r in rows] == [1]
    rows = eng.sql("SELECT id FROM sdocs WHERE "
                   "text_match('body:\"spark fast\"~2') ORDER BY id").collect()
    assert [r["id"] for r in rows] == [1, 2, 4]
    rows = eng.sql("SELECT id FROM sdocs WHERE "
                   "text_match('body:\"spark fast\"~3') ORDER BY id").collect()
    assert [r["id"] for r in rows] == [1, 2, 3, 4]


def test_fts_prune_predicate_shapes(eng):
    f = eng._fts_prune_predicates
    # single-field OR → union ("any") predicate
    assert f("SELECT * FROM t WHERE text_match('b:x OR b:y')") == \
        [("b", "text_match_any", ["x", "y"])]
    # OR across fields: per-field predicates intersect downstream, so
    # pruning must be declined
    assert f("SELECT * FROM t WHERE text_match('a:x OR b:y')") == []
    # text_match not a required conjunct → no pruning
    assert f("SELECT * FROM t WHERE text_match('b:x') OR id = 1") == []
    # phrase contributes its tokens as one space-joined term
    assert f("SELECT * FROM t WHERE text_match('b:\"x y\" AND b:z')") == \
        [("b", "text_match", ["x y", "z"])]
    # NOT anywhere inside → no pruning
    assert f("SELECT * FROM t WHERE text_match('b:x AND NOT b:y')") == []
    # fuzzy keeps a normalized term~N marker for dictionary expansion
    assert f("SELECT * FROM t WHERE text_match('b:x~1 AND b:z')") == \
        [("b", "text_match", ["x~1", "z"])]
    assert f("SELECT * FROM t WHERE text_match('b:x~')") == \
        [("b", "text_match", ["x~2"])]
    # sloppy phrase prunes by its tokens (sound: every token appears)
    assert f("SELECT * FROM t WHERE text_match('b:\"x y\"~2')") == \
        [("b", "text_match", ["x y"])]
    # ^boost is stripped before the postings lookup (soundness: the
    # caret is not part of the indexed token)
    assert f("SELECT * FROM t WHERE text_match('b:x^2 AND b:z')") == \
        [("b", "text_match", ["x", "z"])]
    # parens / occur prefixes → pruning declined (sound)
    assert f("SELECT * FROM t WHERE text_match('(b:x OR b:y) AND b:z')") == []
    assert f("SELECT * FROM t WHERE text_match('+b:x b:y')") == []
    # implicit adjacency = Lucene default OR → union pruning
    assert f("SELECT * FROM t WHERE text_match('b:x b:y')") == \
        [("b", "text_match_any", ["x", "y"])]
    # adjacency mixed with AND is still a monotone positive formula —
    # union over every term stays sound
    assert f("SELECT * FROM t WHERE text_match('b:x AND b:y b:z')") == \
        [("b", "text_match_any", ["x", "y", "z"])]


def test_text_match_with_limit(eng):
    eng.sql("CREATE TABLE docs (id INT, body STRING)")
    eng.sql("INSERT INTO docs SELECT * FROM VALUES "
            "(1,'spark scan fast'),(2,'slow scan'),(3,'scanner x') t(id,body)")
    # limit below match count → exactly N rows survive
    rows = eng.sql("SELECT id FROM docs WHERE "
                   "text_match_with_limit('body:scan*', 2)").collect()
    assert len(rows) == 2
    # limit above match count → all matches
    rows = eng.sql("SELECT id FROM docs WHERE "
                   "text_match_with_limit('body:scan', 10)").collect()
    assert sorted(r["id"] for r in rows) == [1, 2]
    # the cut feeds downstream operators (GROUP BY over the limited set)
    n = eng.sql("SELECT COUNT(*) AS n FROM docs WHERE "
                "text_match_with_limit('body:scan*', 2)").first()["n"]
    assert n == 2


def test_text_match_with_limit_ranks_by_bm25(eng):
    """The limit-N cut returns the N highest-BM25 hits (reference
    Lucene TopDocs), not an arbitrary N."""
    eng.sql("CREATE TABLE rdocs (id INT, body STRING)")
    eng.sql("INSERT INTO rdocs SELECT * FROM VALUES "
            "(1,'scan scan scan'),"                 # tf=3, short
            "(2,'scan walk walk walk walk walk'),"  # tf=1, long
            "(3,'scan scan walk'),"                 # tf=2
            "(4,'walk quick') t(id,body)")
    rows = eng.sql("SELECT id FROM rdocs WHERE "
                   "text_match_with_limit('body:scan', 2)").collect()
    assert sorted(r["id"] for r in rows) == [1, 3]   # top-2 by score
    rows = eng.sql("SELECT id FROM rdocs WHERE "
                   "text_match_with_limit('body:scan', 1)").collect()
    assert [r["id"] for r in rows] == [1]
    # wildcard-only query: nothing scorable → plain N cut, count holds
    rows = eng.sql("SELECT id FROM rdocs WHERE "
                   "text_match_with_limit('body:sc*', 2)").collect()
    assert len(rows) == 2
    # ^boost flips the ranking (Lucene BoostQuery scales scoring only)
    rows = eng.sql("SELECT id FROM rdocs WHERE "
                   "text_match_with_limit('body:scan body:walk^10', 2)"
                   ).collect()
    assert sorted(r["id"] for r in rows) == [2, 4]   # walk-heavy docs win
    # boost does not change the MATCH set
    rows = eng.sql("SELECT id FROM rdocs WHERE "
                   "text_match('body:scan^2') ORDER BY id").collect()
    assert [r["id"] for r in rows] == [1, 2, 3]
    # unsound composition must be rejected, not silently mis-limited
    with pytest.raises(ValueError, match="sole WHERE predicate"):
        eng.sql("SELECT id FROM docs WHERE "
                "text_match_with_limit('body:scan*', 2) OR id = 3")


def test_text_match_with_lucene_index(eng):
    eng.sql("CREATE TABLE ftd (id INT, body STRING)")
    eng.sql("INSERT INTO ftd SELECT * FROM VALUES "
            "(1,'alpha scan fast'),(2,'bravo scan') t(id,body)")
    eng.sql("INSERT INTO ftd SELECT * FROM VALUES "
            "(3,'charlie walk slow') t(id,body)")
    eng.sql("CREATE INDEX ft ON TABLE ftd (body) AS 'lucene'")
    assert any(r["type"] == "fts"
               for r in eng.sql("SHOW INDEXES ON ftd").collect())
    rows = eng.sql("SELECT id FROM ftd WHERE text_match('body:scan') "
                   "ORDER BY id").collect()
    assert [r["id"] for r in rows] == [1, 2]
    rows = eng.sql("SELECT id FROM ftd WHERE "
                   "text_match('body:alpha AND body:fast')").collect()
    assert [r["id"] for r in rows] == [1]
    # stale index must not hide a post-index load
    eng.sql("INSERT INTO ftd SELECT * FROM VALUES (4,'alpha late') t(id,body)")
    rows = eng.sql("SELECT id FROM ftd WHERE text_match('body:alpha') "
                   "ORDER BY id").collect()
    assert [r["id"] for r in rows] == [1, 4]
    eng.sql("REINDEX ON TABLE ftd")
    rows = eng.sql("SELECT id FROM ftd WHERE text_match('body:alpha') "
                   "ORDER BY id").collect()
    assert [r["id"] for r in rows] == [1, 4]
    eng.sql("REGISTER INDEX TABLE ft ON ftd")
    with pytest.raises(FileNotFoundError):
        eng.sql("REGISTER INDEX TABLE nope ON ftd")


def test_timeseries_rewrite(eng):
    eng.sql("CREATE TABLE tsx (ts TIMESTAMP, v INT)")
    eng.sql("INSERT INTO tsx SELECT * FROM VALUES "
            "(TIMESTAMP'2024-01-01 10:07:00', 1),"
            "(TIMESTAMP'2024-01-01 10:22:00', 2),"
            "(TIMESTAMP'2024-01-01 11:02:00', 4) t(ts, v)")
    rows = eng.sql("SELECT timeseries(ts,'hour') AS h, sum(v) AS s "
                   "FROM tsx GROUP BY 1 ORDER BY 1").collect()
    assert [r["s"] for r in rows] == [3, 4]
    rows = eng.sql("SELECT timeseries(ts,'fifteen_minute') AS b, sum(v) AS s "
                   "FROM tsx GROUP BY 1 ORDER BY 1").collect()
    assert [(str(r["b"])[-8:], r["s"]) for r in rows] == [
        ("10:00:00", 1), ("10:15:00", 2), ("11:00:00", 4)]


def test_insegment_scoped_query(eng):
    eng.sql("INSERT INTO src SELECT * FROM VALUES (9,'z',90.0) t(id,grp,amt)")
    all_rows = eng.sql("SELECT COUNT(*) AS n FROM src").first()["n"]
    seg0 = eng.sql("SELECT COUNT(*) AS n FROM src "
                   "WHERE insegment('0')").first()["n"]
    assert (all_rows, seg0) == (5, 4)


def test_update_with_subquery_rhs(eng):
    # SET (cols) = (SELECT ...) — uncorrelated, bound positionally
    # (reference CarbonSpark2SqlParser.scala:259-300)
    eng.sql("UPDATE src SET (grp, amt) = "
            "(SELECT 'mx', max(amt) * 2 FROM src) WHERE id = 1")
    row = eng.sql("SELECT grp, amt FROM src WHERE id = 1").first()
    assert (row["grp"], row["amt"]) == ("mx", 80.0)


def test_delete_with_subquery_where(eng):
    eng.sql("DELETE FROM src WHERE amt >= (SELECT avg(amt) FROM src)")
    assert eng.sql("SELECT COUNT(*) FROM src").first()[0] == 2


def test_show_tables_refresh_metacache(eng):
    assert [r["table_name"] for r in eng.sql("SHOW TABLES").collect()] == ["src"]
    eng.sql("REFRESH TABLE src")
    rows = eng.sql("SHOW METACACHE").collect()
    assert rows[0]["table"] == "src" and rows[0]["n_segments"] == 1 \
        and rows[0]["meta_bytes"] > 0
    eng.sql("CREATE INDEX si_g ON TABLE src (grp) AS 'carbondata'")
    row = eng.sql("SHOW METACACHE ON TABLE src").first()
    assert row["n_indexes"] == 1
    eng.sql("DROP METACACHE ON TABLE src")
    assert eng.sql("SELECT COUNT(*) FROM src").first()[0] == 4


def test_merge_into_sql(eng):
    # reference ANTLR MERGE grammar (CarbonSqlBase.g4:133-146)
    eng.sql("CREATE TABLE delta (id INT, grp STRING, amt DOUBLE)")
    eng.sql("INSERT INTO delta SELECT * FROM VALUES "
            "(1,'a',100.0),(3,'X',0.0),(9,'new',9.0) t(id,grp,amt)")
    res = eng.sql(
        "MERGE INTO src AS t USING delta AS d ON t.id = d.id "
        "WHEN MATCHED AND d.grp = 'X' THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET amt = d.amt, grp = t.grp "
        "WHEN NOT MATCHED THEN INSERT (id, grp, amt) "
        "VALUES (d.id, d.grp, d.amt)").first()
    assert (res["updated"], res["deleted"], res["inserted"]) == (1, 1, 1)
    rows = {r["id"]: (r["grp"], r["amt"]) for r in
            eng.sql("SELECT * FROM src").collect()}
    assert rows[1] == ("a", 100.0)      # updated amt, kept grp
    assert 3 not in rows                # deleted
    assert rows[9] == ("new", 9.0)      # inserted
    assert rows[2] == ("a", 20.0) and rows[4] == ("b", 40.0)


def test_merge_into_sql_update_star(eng):
    eng.sql("CREATE TABLE d2 (id INT, grp STRING, amt DOUBLE)")
    eng.sql("INSERT INTO d2 SELECT * FROM VALUES (2,'zz',222.0) t(id,grp,amt)")
    eng.sql("MERGE INTO src USING d2 ON src.id = d2.id "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *")
    row = eng.sql("SELECT grp, amt FROM src WHERE id = 2").first()
    assert (row["grp"], row["amt"]) == ("zz", 222.0)


def test_hive_partition_commands(eng, spark, tmp_path):
    eng.sql("CREATE TABLE pt (id INT, v DOUBLE, region STRING) "
            "TBLPROPERTIES('partition_by'='region')")
    eng.sql("INSERT INTO pt SELECT * FROM VALUES "
            "(1,1.0,'eu'),(2,2.0,'us'),(3,3.0,'eu') t(id,v,region)")
    parts = [r["partition"] for r in eng.sql("SHOW PARTITIONS pt").collect()]
    assert parts == ["region=eu", "region=us"]

    # ADD PARTITION LOCATION: external parquet without hive dirs; the
    # partition value comes from the manifest at read time
    ext = str(tmp_path / "ext_asia")
    spark.createDataFrame([(7, 7.0)], "id int, v double") \
        .write.parquet(ext)
    eng.sql(f"ALTER TABLE pt ADD PARTITION (region='asia') LOCATION '{ext}'")
    rows = {r["id"]: r["region"] for r in eng.sql("SELECT * FROM pt").collect()}
    assert rows[7] == "asia" and len(rows) == 4
    assert eng.sql("SELECT COUNT(*) AS n FROM pt WHERE region='asia'") \
        .first()["n"] == 1

    eng.sql("ALTER TABLE pt DROP PARTITION (region='eu')")
    left = sorted(r["id"] for r in eng.sql("SELECT * FROM pt").collect())
    assert left == [2, 7]
    parts = [r["partition"] for r in eng.sql("SHOW PARTITIONS pt").collect()]
    assert parts == ["region=asia", "region=us"]


def test_set_unset_tblproperties(eng):
    eng.sql("ALTER TABLE src SET TBLPROPERTIES('comment'='hi', 'x'='1')")
    props = eng.table("src").manifest.properties()
    assert props["comment"] == "hi" and props["x"] == "1"
    eng.sql("ALTER TABLE src UNSET TBLPROPERTIES('x')")
    props = eng.table("src").manifest.properties()
    assert "x" not in props and props["comment"] == "hi"


def test_show_create_table(eng):
    row = eng.sql("SHOW CREATE TABLE src").collect()[0]
    ddl = row["createtab_stmt"]
    assert ddl.startswith("CREATE TABLE src (")
    assert "id INT" in ddl and "sort_columns" in ddl


def test_rename_table(eng):
    eng.sql("ALTER TABLE src RENAME TO dst")
    assert "src" not in eng.tables() and "dst" in eng.tables()
    assert eng.sql("SELECT count(*) AS n FROM dst").collect()[0]["n"] == 4


def test_tm_limit_stats_unaffected_by_fts_pruning(eng):
    """Ranked text_match_with_limit must compute BM25 stats over the
    WHOLE corpus even when an FTS index prunes the scan (Lucene
    N/df/avgdl come from the full index)."""
    eng.sql("CREATE TABLE ldocs (id INT, body STRING)")
    eng.sql("INSERT INTO ldocs SELECT * FROM VALUES "
            "(1,'scan scan scan'),(2,'scan walk walk walk walk walk') "
            "t(id,body)")
    eng.sql("INSERT INTO ldocs SELECT * FROM VALUES "
            "(3,'scan scan walk'),(4,'walk quick') t(id,body)")
    before = [r["id"] for r in eng.sql(
        "SELECT id FROM ldocs WHERE "
        "text_match_with_limit('body:scan', 2)").collect()]
    eng.sql("CREATE INDEX lidx ON TABLE ldocs (body) AS 'lucene'")
    after = [r["id"] for r in eng.sql(
        "SELECT id FROM ldocs WHERE "
        "text_match_with_limit('body:scan', 2)").collect()]
    assert sorted(before) == sorted(after) == [1, 3]


def test_text_match_special_chars_literal(eng):
    """Regex metacharacters in terms/phrases match literally (the
    escaping must survive BOTH the regex engine and the SQL string
    literal layer)."""
    eng.sql("CREATE TABLE mdocs (id INT, body STRING)")
    eng.sql("INSERT INTO mdocs SELECT * FROM VALUES "
            "(1,'foo. bar'),(2,'food bar'),(3,'a+b c') t(id,body)")
    rows = eng.sql("SELECT id FROM mdocs WHERE "
                   "text_match('body:foo.')").collect()
    assert [r["id"] for r in rows] == [1]          # dot is literal
    rows = eng.sql("SELECT id FROM mdocs WHERE "
                   "text_match('body:\"foo. bar\"')").collect()
    assert [r["id"] for r in rows] == [1]
    rows = eng.sql("SELECT id FROM mdocs WHERE "
                   "text_match('body:a+b')").collect()
    assert [r["id"] for r in rows] == [3]          # plus is literal


def test_text_match_not_in_occur_bag(eng):
    """A NOT clause alongside +/- occur flags is a MUST_NOT — never a
    silently-dropped optional."""
    eng.sql("CREATE TABLE ndocs (id INT, body STRING)")
    eng.sql("INSERT INTO ndocs SELECT * FROM VALUES "
            "(1,'x y'),(2,'x z'),(3,'x') t(id,body)")
    rows = eng.sql("SELECT id FROM ndocs WHERE "
                   "text_match('+body:x NOT body:y') ORDER BY id").collect()
    assert [r["id"] for r in rows] == [2, 3]


def test_tm_limit_respects_segment_scope(eng):
    """text_match_with_limit must honor SET carbon.input.segments."""
    eng.sql("CREATE TABLE sdocs2 (id INT, body STRING)")
    eng.sql("INSERT INTO sdocs2 SELECT * FROM VALUES "
            "(1,'scan a'),(2,'scan b') t(id,body)")          # segment 0
    eng.sql("INSERT INTO sdocs2 SELECT * FROM VALUES "
            "(3,'scan c'),(4,'scan d') t(id,body)")          # segment 1
    eng.sql("SET carbon.input.segments.default.sdocs2 = 0")
    rows = eng.sql("SELECT id FROM sdocs2 WHERE "
                   "text_match_with_limit('body:scan', 10)").collect()
    assert sorted(r["id"] for r in rows) == [1, 2]
    eng.sql("SET carbon.input.segments.default.sdocs2 = *")
    rows = eng.sql("SELECT id FROM sdocs2 WHERE "
                   "text_match_with_limit('body:scan', 10)").collect()
    assert sorted(r["id"] for r in rows) == [1, 2, 3, 4]


def test_lucene_regex_dialect_translation():
    """_lucene_regex_to_java implements the brics RegExp dialect
    (what Lucene RegexpQuery parses): escapes are always literal,
    @/#/"..."/<n-m> and top-level & are operators, ~ and nested &
    raise. Semantics verified with Python's re (same core dialect as
    Java for the emitted constructs)."""
    import re as _re

    from cdh_integrate_carbondata2_3_spark.sql import _lucene_regex_to_java

    def matches(pat, s):
        return bool(_re.match("^(?:%s)$" % _lucene_regex_to_java(pat), s))

    # \x is the LITERAL x — never a Java class (\d = letter d)
    assert matches(r"\d", "d") and not matches(r"\d", "5")
    # quoted literal: operators inert inside "..."
    assert matches('"a.c"', "a.c") and not matches('"a.c"', "abc")
    # @ = any string; # = match nothing
    assert matches("a@", "aXYZ") and matches("@", "")
    assert not matches("x#y", "xy")
    # numeric interval: differing operand lengths accept leading 0s
    assert matches("<1-100>", "042") and not matches("<1-100>", "101")
    # equal operand lengths pin the width (brics makeInterval)
    assert matches("<01-10>", "05") and not matches("<01-10>", "5")
    # top-level intersection via lookahead
    assert matches("[a-z]+&.*lt.*", "filter")
    assert not matches("[a-z]+&.*lt.*", "fixer")
    # char classes are sanitized (& literal inside a class)
    assert matches("[a&b]", "&")
    # core operators unchanged
    assert matches("sl(ow|ed)", "sled") and matches("a{2,3}", "aaa")
    # unsupported syntax raises, never silently mis-parses
    import pytest as _pytest
    for bad in ("a~b", "(a&b)c", "<1-x>", '"unterminated', "[abc", "a\\"):
        with _pytest.raises(ValueError):
            _lucene_regex_to_java(bad)


def test_text_match_regexp_lucene_dialect(eng):
    """Engine-level: the regexp term uses the LUCENE dialect — \\f is
    the literal f, intervals match staged numeric tokens."""
    eng.sql("CREATE TABLE rdocs (id INT, body STRING)")
    eng.sql("INSERT INTO rdocs SELECT * FROM VALUES "
            "(1,'filter 7'),(2,'filter 151'),(3,'fast 9') t(id,body)")
    rows = eng.sql("SELECT id FROM rdocs WHERE "
                   "text_match('body:/\\filter/ AND body:/<5-150>/') "
                   "ORDER BY id").collect()
    assert [r["id"] for r in rows] == [1]


def test_minmax_metadata_path_and_guards(eng):
    """Bare MIN/MAX answers from manifest stats (no FileScan); every
    exactness guard falls back to a scan with the same answer."""
    df = eng.sql("SELECT MIN(id) AS a, MAX(id) AS b, MIN(amt) AS c, "
                 "MAX(amt) AS d FROM src")
    assert df.first() == (1, 4, 10.0, 40.0)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FileScan" not in plan

    # string column → stats non-numeric (possible writer truncation)
    # → scan fallback, still correct
    df2 = eng.sql("SELECT MIN(grp) AS g FROM src")
    assert df2.first()["g"] == "a"
    assert eng.table("src").manifest.minmax_metadata(["grp"]) is None

    # segment scoping applies to the metadata answer
    eng.sql("INSERT INTO src SELECT * FROM VALUES (99,'z',5.0) t(id,grp,amt)")
    eng.sql("SET carbon.input.segments.default.src = 1")
    assert eng.sql("SELECT MAX(id) AS m FROM src").first()["m"] == 99
    assert eng.sql("SELECT MIN(amt) AS m FROM src").first()["m"] == 5.0
    eng.sql("SET carbon.input.segments.default.src = *")
    assert eng.sql("SELECT MAX(id) AS m FROM src").first()["m"] == 99

    # schema evolution: new column absent from old files → fallback
    eng.sql("ALTER TABLE src ADD COLUMNS (bonus DOUBLE)")
    assert eng.table("src").manifest.minmax_metadata(["bonus"]) is None
    assert eng.sql("SELECT MAX(bonus) AS m FROM src").first()["m"] is None


def test_minmax_metadata_mor_delta_guard(spark, tmp_path):
    """A pending merge-on-read delete delta poisons the stats (the
    extremum may be deleted) → metadata path refuses, scan answers."""
    e = Engine(spark, str(tmp_path / "whm"))
    e.sql("CREATE TABLE m (id BIGINT, v DOUBLE) "
          "TBLPROPERTIES('iud.mode'='mor')")
    e.sql("INSERT INTO m SELECT * FROM VALUES "
          "(1, 1.0),(2, 2.0),(3, 99.0) t(id, v)")
    e.sql("DELETE FROM m WHERE v = 99.0")
    assert e.table("m").manifest.minmax_metadata(["v"]) is None
    assert e.sql("SELECT MAX(v) AS m FROM m").first()["m"] == 2.0
    # once targeted delta application rewrites the touched files, the
    # deltas are gone and the metadata path is valid again
    from cdh_integrate_carbondata2_3_spark.operators.mor import apply_deltas
    assert apply_deltas(e.table("m"), min_fraction=0.0) > 0
    mm = e.table("m").manifest.minmax_metadata(["v"])
    assert mm == {"v": (1.0, 2.0)}


def test_minmax_metadata_empty_table(spark, tmp_path):
    e = Engine(spark, str(tmp_path / "whe"))
    e.sql("CREATE TABLE et (id BIGINT, v DOUBLE)")
    assert e.table("et").manifest.minmax_metadata(["v"]) == {
        "v": (None, None)}
    assert e.sql("SELECT MIN(v) AS m FROM et").first()["m"] is None


def test_clean_files_trash_retention_and_force(spark, tmp_path):
    """CLEAN FILES parity with docs/clean-files.md: default moves
    cleaned segments to the table trash (recoverable within
    carbon.trash.retention.days), dryrun mutates nothing, force
    empties trash immediately but requires
    carbon.clean.file.force.allowed=true."""
    import os
    import pytest

    e = Engine(spark, str(tmp_path / "whc"))
    e.sql("CREATE TABLE ct (id BIGINT)")
    e.sql("INSERT INTO ct SELECT * FROM VALUES (1),(2) t(id)")
    e.sql("INSERT INTO ct SELECT * FROM VALUES (3) t(id)")
    e.sql("DELETE FROM TABLE ct WHERE SEGMENT.ID IN (0)")
    t = e.table("ct")

    rep = t.clean_files(dryrun=True)
    assert rep["would_clean_segments"] == [0] and rep["trash_bytes"] == 0
    assert len(t.manifest.load(_attach=False)["segments"]) == 2  # unchanged

    assert t.clean_files() == 1
    trash = os.path.join(t.table_dir, ".trash")
    assert os.path.isdir(trash) and len(os.listdir(trash)) == 1
    assert not os.path.isdir(os.path.join(t.table_dir, "segment_0"))
    assert e.sql("SELECT COUNT(*) FROM ct").first()[0] == 1

    # force without the allow property → refused
    with pytest.raises(PermissionError):
        t.clean_files(force=True)
    e.sql("ALTER TABLE ct SET TBLPROPERTIES("
          "'carbon.clean.file.force.allowed'='true')")
    e.sql("INSERT INTO ct SELECT * FROM VALUES (4) t(id)")
    e.sql("DELETE FROM TABLE ct WHERE SEGMENT.ID IN (1)")
    e.sql("CLEAN FILES FOR TABLE ct OPTIONS('force'='true')")
    assert not os.listdir(trash)                 # trash emptied
    assert e.sql("SELECT COUNT(*) FROM ct").first()[0] == 1

    # retention: entry younger than retention survives a normal clean
    e.sql("INSERT INTO ct SELECT * FROM VALUES (5) t(id)")
    e.sql("DELETE FROM TABLE ct WHERE SEGMENT.ID IN (2)")
    t.clean_files()
    assert len(os.listdir(trash)) == 1
    t.clean_files()                              # still within retention
    assert len(os.listdir(trash)) == 1


def test_clean_files_stale_inprogress(spark, tmp_path):
    """stale_inprogress sweeps crashed-writer INSERT_IN_PROGRESS
    segments past retention (immediately under force)."""
    from cdh_integrate_carbondata2_3_spark.catalog.manifest import (
        SegmentStatus)

    e = Engine(spark, str(tmp_path / "whs"))
    e.sql("CREATE TABLE st (id BIGINT) TBLPROPERTIES("
          "'carbon.clean.file.force.allowed'='true')")
    e.sql("INSERT INTO st SELECT * FROM VALUES (1) t(id)")
    t = e.table("st")

    def fake_iip(doc):
        doc["segments"].append({
            "id": 99, "status": SegmentStatus.INSERT_IN_PROGRESS,
            "format": "parquet", "files": [], "load_time": 0.0,
            "source": "insert", "external_path": None})
    t.manifest.update(fake_iip)

    assert t.clean_files() == 0                      # not without the option
    assert t.clean_files(stale_inprogress=True) == 1  # load_time 0 → stale
    assert all(s["id"] != 99 for s in
               t.manifest.load(_attach=False)["segments"])
    assert e.sql("SELECT COUNT(*) FROM st").first()[0] == 1


def test_minmax_metadata_unknown_column_raises(spark, tmp_path):
    """MIN/MAX over a nonexistent column must raise the normal
    AnalysisException, not answer NULL from metadata."""
    e = Engine(spark, str(tmp_path / "whu"))
    e.sql("CREATE TABLE u (id BIGINT)")
    e.sql("INSERT INTO u SELECT * FROM VALUES (1) t(id)")
    assert e.table("u").manifest.minmax_metadata(["nosuch"]) is None
    with pytest.raises(Exception, match="nosuch"):
        e.sql("SELECT MIN(nosuch) AS m FROM u").collect()
