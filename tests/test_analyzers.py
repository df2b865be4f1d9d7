"""'english' FTS analyzer: s-stemmer parity across Python / Spark SQL
/ DuckDB, stopword clause dropping, and analyzer-aware index pruning
(functions/analyzers.py, catalog/index.py, sql.py)."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from cdh_integrate_carbondata2_3_spark.catalog.table import Table
from cdh_integrate_carbondata2_3_spark.functions.analyzers import (
    ENGLISH_STOPWORDS, analyze_term, minimal_stem, stem_sql)
from cdh_integrate_carbondata2_3_spark.sql import Engine, _lucene_to_sql

# surface → expected stem (Harman s-stemmer rules)
STEM_CASES = {
    "dogs": "dog", "queries": "query", "ties": "ty", "makes": "make",
    "goes": "goes", "sees": "sees", "dies": "dy", "bus": "bus",
    "class": "class", "as": "as", "is": "is", "yes": "ye",
    "sorts": "sort", "windows": "window", "thes": "the", "s": "s",
    "joins": "join", "tables": "table", "its": "it", "houses": "house",
    "aes": "aes", "axes": "axe", "": "", "run": "run",
}


def test_minimal_stem_rules():
    for w, want in STEM_CASES.items():
        assert minimal_stem(w) == want, w


def test_stem_sql_matches_python_on_spark_and_duckdb(spark):
    words = sorted(set(STEM_CASES) - {""}) + [
        "values", "pass", "unless", "genius", "days", "keys", "tries"]
    # Spark SQL evaluation of the shared fragment
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got_spark = dict(df.select(
        "w", F.expr(stem_sql("w")).alias("s")).collect())
    # DuckDB evaluation of the SAME fragment
    con = duckdb.connect()
    got_duck = dict(con.execute(
        f"SELECT w, {stem_sql('w')} AS s FROM (SELECT unnest(?) AS w)",
        [words]).fetchall())
    con.close()
    for w in words:
        want = minimal_stem(w)
        assert got_spark[w] == want, f"spark {w}"
        assert got_duck[w] == want, f"duckdb {w}"


def test_analyze_term_drops_stopwords():
    assert analyze_term("The") is None
    assert analyze_term("WILL") is None
    assert analyze_term("Queries") == "query"
    for w in ENGLISH_STOPWORDS:
        assert analyze_term(w) is None


def test_lucene_to_sql_english_drops_stopword_clauses():
    sql = _lucene_to_sql("text:Sorts AND text:the", english=True)
    assert "sort" in sql and "the'" not in sql.split("NOT IN")[0]
    # all-stopword query = Lucene empty BooleanQuery: matches nothing
    assert _lucene_to_sql("text:the text:a", english=True) == "(1 = 0)"
    # exact phrase under english compiles (position-gapped)
    assert "element_at" in _lucene_to_sql('text:"slow filter"',
                                          english=True)
    # sloppy phrase under english: shared-budget window over
    # offset-adjusted positions (Lucene SloppyPhraseMatcher)
    assert "flatten" in _lucene_to_sql('text:"slow filter"~2',
                                       english=True)
    # repeated-term sloppy phrase: same shared-budget window path
    # with Hall-condition injectivity (no per-gap fallback since r6)
    rep = _lucene_to_sql('text:"slow slow"~2', english=True)
    assert "try_element_at" not in rep and ">= 2" in rep
    # fuzzy and range under english compile against the analyzed
    # stream (Lucene normalize(): lowercase, no stem, on the bounds)
    assert "levenshtein" in _lucene_to_sql("text:slow~1", english=True)
    assert "__s >= 'a'" in _lucene_to_sql("text:[a TO b]", english=True)
    # regexp under english runs the (Lucene-dialect) pattern over the
    # stems, un-analyzed — full term-type coverage under english
    assert "RLIKE" in _lucene_to_sql("text:/sor./", english=True)


@pytest.fixture()
def eng_table(spark, tmp_path):
    eng = Engine(spark, str(tmp_path / "wh"))
    t = Table.create(spark, os.path.join(eng.warehouse, "docs"),
                     "doc_id bigint, text string")
    t.insert(spark.createDataFrame(
        [(1, "the quick queries run fast"),
         (2, "slow sorts and big JOINS"),
         (3, "a window function"),
         (4, "QUERY sort join")], "doc_id bigint, text string"))
    eng.sql("CREATE INDEX fen ON TABLE docs (text) AS 'lucene' "
            "PROPERTIES('analyzer'='english')")
    return eng, t


def test_english_matching_and_stopwords(eng_table):
    eng, _ = eng_table
    # query-term stem: Queries→query matches docs 1 (queries) and 4
    got = {r.doc_id for r in eng.sql(
        "SELECT doc_id FROM docs WHERE text_match('text:Queries')"
    ).collect()}
    assert got == {1, 4}
    # corpus stem: sorts (doc 2) matched by singular query term
    got = {r.doc_id for r in eng.sql(
        "SELECT doc_id FROM docs WHERE text_match('text:sort')"
    ).collect()}
    assert got == {2, 4}
    # stopword clause dropped from the conjunction
    got = {r.doc_id for r in eng.sql(
        "SELECT doc_id FROM docs WHERE "
        "text_match('text:JOINS AND text:the')").collect()}
    assert got == {2, 4}
    # all-stopword query matches nothing
    assert eng.sql("SELECT doc_id FROM docs WHERE "
                   "text_match('text:the')").count() == 0


def test_english_wildcard_over_stemmed_terms(eng_table):
    eng, _ = eng_table
    # wildcard evaluated against stemmed dictionary: quer* hits the
    # stemmed 'query' tokens of docs 1 and 4
    got = {r.doc_id for r in eng.sql(
        "SELECT doc_id FROM docs WHERE text_match('text:quer*')"
    ).collect()}
    assert got == {1, 4}


def test_english_index_prunes_files(eng_table):
    eng, t = eng_table
    # postings hold stemmed tokens: 'Queries' must resolve via the
    # index (consulted) to a narrowed file set
    im = t.indexes
    preds = [("text", "text_match", ["Queries"])]
    files = im.candidate_files(preds)
    assert files is not None
    assert im.last_consulted == ["fen"]
    all_files = {t._abs(f.path)
                 for s in t.manifest.queryable_segments() for f in s.files}
    assert files and files <= all_files
    # a stopword term imposes NO pruning constraint (dropped clause)
    files_stop = im.candidate_files([("text", "text_match", ["the"])])
    assert files_stop == all_files


# ---------------------------------------------------------------- fuzzy/damerau

def test_dam_le_matches_duckdb_damerau():
    """catalog/index._dam_le (FuzzyQuery dictionary expansion) equals
    DuckDB's damerau_levenshtein at every threshold 0..3 on a dense
    small-alphabet sample (transposition-heavy by construction)."""
    import random

    from cdh_integrate_carbondata2_3_spark.catalog.index import _dam_le
    con = duckdb.connect()
    rng = random.Random(5)
    for _ in range(5000):
        a = "".join(rng.choice("abc") for _ in range(rng.randint(0, 6)))
        b = "".join(rng.choice("abc") for _ in range(rng.randint(0, 6)))
        k = rng.randint(0, 3)
        want = con.execute("SELECT damerau_levenshtein(?, ?)",
                           [a, b]).fetchone()[0] <= k
        assert _dam_le(a, b, k) == want, (a, b, k)
    con.close()


def test_dam_pred_sql_matches_duckdb_on_spark(spark):
    """The engine-portable decomposition (sql.py _dam_pred_sql:
    term-side disjoint-swap expansion + token-side one-swap scan +
    plain levenshtein) equals the unrestricted Damerau threshold for
    edits <= 2 — verified by running the emitted SQL in Spark against
    DuckDB's native damerau_levenshtein on the same tokens."""
    import random

    from cdh_integrate_carbondata2_3_spark.sql import _dam_pred_sql
    rng = random.Random(13)
    toks = ["".join(rng.choice("abc") for _ in range(rng.randint(0, 6)))
            for _ in range(1500)]
    df = spark.createDataFrame([(t,) for t in toks], "t string")
    con = duckdb.connect()
    for term, k in (("abca", 1), ("abca", 2), ("ba", 2), ("cabb", 2)):
        got = sorted(r["t"] for r in
                     df.filter(_dam_pred_sql("t", term, k)).collect())
        want = sorted(
            t for t in toks
            if con.execute("SELECT damerau_levenshtein(?, ?)",
                           [t, term]).fetchone()[0] <= k)
        assert got == want, (term, k)
    con.close()


def test_fuzzy_transpositions_default_and_optout(spark, tmp_path):
    """Damerau is the compile default (Lucene FuzzyQuery
    transpositions=true): 'lsow~1' matches 'slow'. The index property
    'fuzzy_transpositions'='false' restores plain Levenshtein for the
    table, and fuzzy index pruning stays sound either way (the
    dictionary expands with Damerau, a superset)."""
    eng = Engine(spark, str(tmp_path / "wh"))
    for tbl, prop in (("d1", ""), ("d2", ", 'fuzzy_transpositions'='false'")):
        eng.sql(f"CREATE TABLE {tbl} (id INT, body STRING)")
        eng.sql(f"INSERT INTO {tbl} SELECT * FROM VALUES "
                "(1,'slow scan'),(2,'salw walk'),(3,'other') t(id,b)")
        eng.sql(f"CREATE INDEX fz_{tbl} ON TABLE {tbl} (body) AS 'lucene' "
                f"PROPERTIES('analyzer'='standard'{prop})")
    # default: transposition is one edit → lsow~1 matches slow;
    # salw~? 'salw' vs 'lsow': not within 1
    got = {r["id"] for r in eng.sql(
        "SELECT id FROM d1 WHERE text_match('body:lsow~1')").collect()}
    assert got == {1}
    # opt-out: plain Levenshtein → lev(slow, lsow)=2 > 1, no match
    got = {r["id"] for r in eng.sql(
        "SELECT id FROM d2 WHERE text_match('body:lsow~1')").collect()}
    assert got == set()
    # but ~2 still reaches it under plain Levenshtein
    got = {r["id"] for r in eng.sql(
        "SELECT id FROM d2 WHERE text_match('body:lsow~2')").collect()}
    assert got == {1}


# -------------------------------------------------------------- english phrase

def test_english_phrase_position_gaps(spark, tmp_path):
    """Exact phrases under 'english' follow Lucene's StopFilter
    position gaps: a removed stopword still occupies its position, so
    '"quick the foxes"' needs stem 'fox' exactly two positions after
    'quick' (any one token between), while '"quick foxes"' needs
    adjacency; leading stopwords shift nothing (relative offsets);
    an all-stopword phrase matches nothing."""
    eng = Engine(spark, str(tmp_path / "wh"))
    eng.sql("CREATE TABLE pd (id INT, body STRING)")
    eng.sql("INSERT INTO pd SELECT * FROM VALUES "
            "(1,'the quick foxes run'),"
            "(2,'quick brown foxes'),"
            "(3,'quick foxes jump'),"
            "(4,'foxes quick'),"
            "(5,'quick and the foxes'),"
            "(6,'the and a to') t(id,b)")
    eng.sql("CREATE INDEX pen ON TABLE pd (body) AS 'lucene' "
            "PROPERTIES('analyzer'='english')")

    def ids(q):
        return sorted(r["id"] for r in eng.sql(
            f"SELECT id FROM pd WHERE text_match('{q}')").collect())

    assert ids('body:"quick foxes"') == [1, 3]
    assert ids('body:"quick the foxes"') == [2]
    assert ids('body:"the quick foxes"') == [1, 3]
    assert ids('body:"the and"') == []
    # sloppy phrase: one extra analyzed position reaches doc 2
    got = sorted(r["id"] for r in eng.sql(
        "SELECT id FROM pd WHERE "
        "text_match('body:\"quick foxes\"~1')").collect())
    assert got == [1, 2, 3]


# ------------------------------------------------------------------ porter

def test_porter_analyzer_end_to_end(spark, tmp_path):
    """'porter' analyzer: full Porter stems on both sides (corpus
    postings + query terms), stopword clause dropping, UDF refine,
    and index pruning against the stemmed dictionary."""
    eng = Engine(spark, str(tmp_path / "wh"))
    eng.sql("CREATE TABLE pr (id INT, body STRING)")
    eng.sql("INSERT INTO pr SELECT * FROM VALUES "
            "(1,'the motoring caresses'),(2,'motor cares'),"
            "(3,'relational databases'),(4,'relate to nothing') t(id,b)")
    eng.sql("CREATE INDEX ppt ON TABLE pr (body) AS 'lucene' "
            "PROPERTIES('analyzer'='porter')")

    def ids(q):
        return sorted(r["id"] for r in eng.sql(
            f"SELECT id FROM pr WHERE text_match('{q}')").collect())

    # motoring/motor both stem to 'motor'; relational/relate → 'relat'
    assert ids('body:Motoring') == [1, 2]
    assert ids('body:relational') == [3, 4]
    # stopword query term: clause dropped → all-stop query matches none
    assert ids('body:the') == []
    # conjunction with stemmed terms
    assert ids('body:caresses AND body:motors') == [1]
    # wildcard matches the stemmed dictionary (motor-): docs 1, 2
    assert ids('body:motor*') == [1, 2]
    # doc 3 'databases' stems to 'databas' → datab?s misses 'database'
    assert ids('body:datab*') == [3]
    # exact phrase: stems at adjacent positions — doc 2 only
    # ('motor cares' → motor@0, care@1; doc 1 has 'motoring caresses'
    # → motor@1, caress@2, so stem 'care' never follows 'motor')
    assert ids('body:"motoring cares"') == [2]
    # fuzzy: query normalized (lowercase, NOT stemmed) vs stems —
    # 'motoq' is one edit from stem 'motor', four from the surface
    # form 'motoring'
    assert ids('body:motoq~1') == [1, 2]
    # range over the stemmed dictionary: [cara TO carf] brackets
    # stems 'care' (cares) and 'caress' (caresses < 'carf')
    assert ids('body:[cara TO carf]') == [1, 2]
    # regexp over the stems, un-analyzed: /relat/ matches the stem
    # exactly (surface 'relational'/'relate' both miss)
    assert ids('body:/relat/') == [3, 4]
    # brics quoted literal inside the regexp survives the phrase lexer
    assert ids('body:/re"lat"/') == [3, 4]
    # postings hold Porter stems → pruning consults the index
    im = eng.table("pr").indexes
    files = im.candidate_files([("body", "text_match", ["Motoring"])])
    assert files is not None and im.last_consulted == ["ppt"]


def test_porter_phrase_stop_gaps(spark, tmp_path):
    """Phrase matching under 'porter' keeps Lucene's StopFilter
    position gaps: a removed stopword still occupies its position on
    BOTH the query and corpus side, and sloppy phrases stretch each
    inter-term hop by 0..slop positions."""
    eng = Engine(spark, str(tmp_path / "wh"))
    eng.sql("CREATE TABLE pg (id INT, body STRING)")
    eng.sql("INSERT INTO pg SELECT * FROM VALUES "
            "(1,'relational databases'),(2,'relate to databases'),"
            "(3,'relate from databases'),(4,'databases relate') t(id,b)")
    eng.sql("CREATE INDEX pgx ON TABLE pg (body) AS 'lucene' "
            "PROPERTIES('analyzer'='porter')")

    def ids(q):
        return sorted(r["id"] for r in eng.sql(
            f"SELECT id FROM pg WHERE text_match('{q}')").collect())

    # adjacent stems: doc 1 only (docs 2/3 have a token between —
    # stopword or not — and doc 4 is reversed)
    assert ids('body:"relate databases"') == [1]
    # query-side stopword gap: relat@0, stop@1, databas@2 — matches
    # the corpus stopword gap (doc 2) AND any single token in that
    # slot (doc 3: 'from' is not a stopword but fills the position,
    # exactly Lucene's PhraseQuery over gapped positions)
    assert ids('body:"relate to databases"') == [2, 3]
    # sloppy: shared budget — one move bridges the gapped docs
    assert ids('body:"relate databases"~1') == [1, 2, 3]
    # reordering costs 2 (Lucene: switching two words = two moves)
    assert ids('body:"relate databases"~2') == [1, 2, 3, 4]
    # exact reversed order matches only the reversed doc
    assert ids('body:"databases relate"') == [4]


def test_english_sloppy_phrase_shared_budget(spark, tmp_path):
    """Sloppy phrase under english follows Lucene's SHARED slop
    budget with reordering (SloppyPhraseMatcher): matchLength =
    max(pos-offset) - min(pos-offset) over the analyzed stream with
    stop-gap positions — two adjacent terms reversed cost 2."""
    eng = Engine(spark, str(tmp_path / "wh"))
    eng.sql("CREATE TABLE sp (id INT, body STRING)")
    eng.sql("INSERT INTO sp SELECT * FROM VALUES "
            "(1,'quick foxes jump'),(2,'quick brown foxes'),"
            "(3,'quick very brown foxes'),(4,'quick a b c foxes'),"
            "(5,'foxes quick') t(id,b)")
    eng.sql("CREATE INDEX fsp ON TABLE sp (body) AS 'lucene' "
            "PROPERTIES('analyzer'='english')")

    def ids(q):
        return sorted(r["id"] for r in eng.sql(
            f"SELECT id FROM sp WHERE text_match('{q}')").collect())

    assert ids('body:"quick foxes"') == [1]
    assert ids('body:"quick foxes"~1') == [1, 2]
    # reversed adjacent pair (doc 5) costs exactly 2 moves
    assert ids('body:"quick foxes"~2') == [1, 2, 3, 5]
    # doc 4: stopword 'a' holds its position → distance 3
    assert ids('body:"quick foxes"~3') == [1, 2, 3, 4, 5]


def test_gate_vocab_covers_corpus():
    """The porter gate oracles replay Porter stemming as a closed CASE
    dictionary over queries/udf_surface._DOC_VOCAB — this pins the
    synthetic documents corpus to that word list, so a testdata
    regeneration with new vocabulary fails HERE instead of silently
    degrading a gate oracle to its ELSE-identity arm."""
    import duckdb

    from cdh_integrate_carbondata2_3_spark.queries.udf_surface import (
        _DOC_VOCAB)
    con = duckdb.connect()
    for sf in ("0.001", "0.01"):
        toks = {r[0] for r in con.execute(
            "SELECT DISTINCT t FROM (SELECT unnest(string_split_regex("
            "lower(text), '\\s+')) AS t FROM read_parquet("
            f"'/root/testdata/sf{sf}/documents.parquet')) WHERE t <> ''"
        ).fetchall()}
        assert toks <= set(_DOC_VOCAB), sorted(toks - set(_DOC_VOCAB))


def test_python_damerau_matches_duckdb():
    """functions/analyzers.damerau_levenshtein (the porter fuzzy
    refine's distance) equals DuckDB's native damerau_levenshtein —
    the same cross-check the SQL decomposition (_dam_pred_sql) gets,
    so all three fuzzy paths agree."""
    import itertools
    import duckdb

    from cdh_integrate_carbondata2_3_spark.functions.analyzers import (
        damerau_levenshtein, levenshtein)
    con = duckdb.connect()
    words = ["", "a", "ab", "ba", "abc", "acb", "ca", "cadb", "sort",
             "sost", "sorts", "tros", "motor", "motoq", "abab", "baba",
             "aabb", "bbaa", "care", "caer", "cear"]
    for a, b in itertools.product(words, repeat=2):
        want = con.execute(
            "SELECT damerau_levenshtein(?, ?), levenshtein(?, ?)",
            [a, b, a, b]).fetchone()
        assert damerau_levenshtein(a, b) == want[0], (a, b)
        assert levenshtein(a, b) == want[1], (a, b)


def test_sloppy_window_matches_bruteforce(spark):
    """The shared-budget slop compiler (_slop_window_sql, whitespace
    analyzer) against a brute-force reference: enumerate every
    INJECTIVE assignment of query terms to token positions (repeated
    query terms may not reuse a position — Lucene SloppyPhraseMatcher
    repeat handling) and accept when max(pos-off) - min(pos-off) <=
    slop — on random small docs over a tiny alphabet, all slops 1..3,
    2- to 4-term phrases including repeated-term ones."""
    import itertools
    import random

    from cdh_integrate_carbondata2_3_spark.sql import _lucene_to_sql

    rng = random.Random(17)
    docs = [" ".join(rng.choice("abcd") for _ in range(rng.randint(0, 7)))
            for _ in range(300)]
    df = spark.createDataFrame([(i, d) for i, d in enumerate(docs)],
                               "id int, body string")
    df.createOrReplaceTempView("bf")

    def brute(doc, terms, slop):
        toks = doc.split()
        pools = [[p for p, t in enumerate(toks) if t == q] for q in terms]
        if any(not p for p in pools):
            return False
        for pick in itertools.product(*pools):
            if len(set(pick)) != len(pick):
                continue
            adj = [p - o for o, p in enumerate(pick)]
            if max(adj) - min(adj) <= slop:
                return True
        return False

    for phrase in ("a b", "b a", "a b c", "c a d",
                   "a a", "a b a", "a a b", "b a b a", "a a a"):
        terms = phrase.split()
        for slop in (1, 2, 3):
            sql = _lucene_to_sql(f'body:"{phrase}"~{slop}')
            got = {r.id for r in spark.sql(
                f"SELECT id FROM bf WHERE {sql}").collect()}
            want = {i for i, d in enumerate(docs)
                    if brute(d, terms, slop)}
            assert got == want, (phrase, slop, sorted(got ^ want))


def test_porter_phrase_match_bruteforce():
    """_porter_phrase_match (the Python twin the porter analyzer's
    Arrow UDF runs) against the same injective brute force, including
    repeated-term phrases and stop-gap (None) positions."""
    import itertools
    import random

    from cdh_integrate_carbondata2_3_spark.sql import _porter_phrase_match

    rng = random.Random(23)

    def brute(arr, offs, slop):
        pools = [[p for p, t in enumerate(arr) if t == s]
                 for _, s in offs]
        if any(not p for p in pools):
            return False
        for pick in itertools.product(*pools):
            if len(set(pick)) != len(pick):
                continue
            adj = [p - o for (o, _), p in zip(offs, pick)]
            if max(adj) - min(adj) <= slop:
                return True
        return False

    for phrase in ("a b", "a a", "a b a", "a a b", "b a b a"):
        toks = phrase.split()
        offs = [(o, t) for o, t in enumerate(toks)]
        for slop in (1, 2, 3):
            for _ in range(200):
                arr = [rng.choice(["a", "b", "c", None])
                       for _ in range(rng.randint(0, 8))]
                got = _porter_phrase_match(arr, offs, slop)
                want = brute(arr, offs, slop)
                assert got == want, (phrase, slop, arr)


# ---------------------------------------------------------------- brics

def test_brics_automaton_gate_pin():
    """The hand-pinned hit list in the table_fts_regexp_automaton
    oracle (slow/small/spark) still matches what the engine's brics
    evaluator computes over the fixed corpus vocabulary — the pin
    keeps the GATE independent of functions/brics.py; this test keeps
    the pin honest."""
    from cdh_integrate_carbondata2_3_spark.functions.brics import (
        brics_match)
    from cdh_integrate_carbondata2_3_spark.queries.udf_surface import (
        _DOC_VOCAB)
    assert sorted(
        w for w in _DOC_VOCAB
        if brics_match("s@&~(scan|sort|stream)", w)
    ) == ["slow", "small", "spark"]


def test_brics_rejects_inverted_interval():
    """{n,m} with n > m raises at compile on BOTH evaluator paths —
    Lucene's brics RegExp rejects it; the RLIKE translator path fails
    at Java-regex compile, and the span matcher must match that
    error surface instead of silently behaving as exactly-{n}."""
    import pytest as _pytest

    from cdh_integrate_carbondata2_3_spark.functions.brics import (
        BricsSyntaxError, brics_compile)
    with _pytest.raises(BricsSyntaxError):
        brics_compile("a{3,2}")
    # the well-ordered form still compiles
    brics_compile("a{2,3}")


def test_brics_matches_translator_on_translatable_patterns():
    """functions/brics.brics_match equals re.fullmatch of the
    translator's Java regex on every translatable pattern shape —
    the two parsers implement one grammar."""
    import re as _re

    from cdh_integrate_carbondata2_3_spark.functions.brics import (
        brics_match)
    from cdh_integrate_carbondata2_3_spark.sql import (
        _lucene_regex_to_java)
    patterns = [
        "abc", "a|bc", "a*b+c?", "a{2,3}", "a{2}", "[a-c]x", "[^ab]",
        ".", "..", "@", "a@b", '"li t"', "<5-150>", "<10-20>",
        r"\#a", "(a|b)c", "(ab)+", "a(bc|d)*e", "ab&a.", "a&b",
    ]
    tokens = ["", "a", "b", "ab", "abc", "ac", "abcc", "aa", "aaa",
              "aaaa", "li t", "007", "15", "150", "151", "4", "#a",
              "bc", "abcde", "adde", "x", "cx", "bx", "anything"]
    for pat in patterns:
        cre = _re.compile(f"^(?:{_lucene_regex_to_java(pat)})$")
        for tok in tokens:
            assert brics_match(pat, tok) == bool(cre.match(tok)), \
                (pat, tok)


def test_brics_intersection_and_complement():
    """The operators regexes cannot express: nested '&' requires both
    operands over the SAME span; '~' matches exactly the non-matches
    (including the empty string)."""
    from cdh_integrate_carbondata2_3_spark.functions.brics import (
        brics_match)
    assert brics_match("f(ab&a.)c", "fabc")
    assert not brics_match("f(ab&a.)c", "facc")
    assert brics_match("(a.&.b)*", "abab")
    assert brics_match("(a.&.b)*", "")
    assert not brics_match("(a.&.b)*", "aba")
    assert brics_match("~(abc)", "abd")
    assert brics_match("~(abc)", "")
    assert not brics_match("~(abc)", "abc")
    assert brics_match("a~(b)c", "ac")          # empty middle != "b"
    assert brics_match("a~(b)c", "axyc")
    assert not brics_match("a~(b)c", "abc")
    assert brics_match("<1-30>&.5", "15")
    assert not brics_match("<1-30>&.5", "35")
    assert brics_match("s@&~(scan|sort)", "slow")
    assert not brics_match("s@&~(scan|sort)", "sort")


def test_brics_fallback_end_to_end(spark, tmp_path):
    """text_match regexp terms with nested &/~ run through the brics
    UDF fallback on whitespace AND english analyzers (translatable
    regexps keep the RLIKE fast path — plan stays UDF-free)."""
    eng = Engine(spark, str(tmp_path / "wh"))
    eng.sql("CREATE TABLE bx (id INT, body STRING)")
    eng.sql("INSERT INTO bx SELECT * FROM VALUES "
            "(1,'merge filter 15'),(2,'Merge scan 35'),"
            "(3,'table sort 5'),(4,'merges relate') t(id,b)")

    def ids(q):
        return sorted(r["id"] for r in eng.sql(
            f"SELECT id FROM bx WHERE text_match('{q}')").collect())

    # whitespace (case-sensitive): token starts m AND ends e
    assert ids('body:/(m.*&.*e)/') == [1]
    assert ids('body:/(<1-30>&.5)/') == [1]
    assert ids('body:/~(merge)/') == [1, 2, 3, 4]  # some token != merge
    # translatable pattern still compiles to RLIKE (no UDF in plan)
    plan = eng.sql("SELECT id FROM bx WHERE text_match('body:/m.*e/')")
    assert "pythonUDF" not in plan._jdf.queryExecution().executedPlan() \
        .toString().lower().replace(" ", "")
    # english: stems (merges→merge) — nested & over analyzed tokens
    eng.sql("CREATE INDEX bxe ON TABLE bx (body) AS 'lucene' "
            "PROPERTIES('analyzer'='english')")
    assert ids('body:/(merg.*&.*e)/') == [1, 2, 4]


# ------------------------------------------- porter dictionary fast path

def test_porter_dict_fastpath_plan_and_parity(spark, tmp_path):
    """Porter dictionary fast path (sql.Engine._porter_fast): with a
    FRESH porter index whose surface→stem dictionary sidecar fits
    'dict_fastpath_max', every SQL-expressible term type compiles to
    pure Spark SQL — NO Python UDF in the executed plan — and returns
    exactly what the Arrow-UDF path ('dict_fastpath'='false') returns.
    Automaton-only regexps keep the UDF fallback; a stale index
    (segment loaded after the build) disables the fast path until
    REINDEX."""
    eng = Engine(spark, str(tmp_path / "wh"))
    for t, prop in (("pf", "'analyzer'='porter'"),
                    ("pu", "'analyzer'='porter',"
                           "'dict_fastpath'='false'")):
        eng.sql(f"CREATE TABLE {t} (id INT, body STRING)")
        eng.sql(f"INSERT INTO {t} SELECT * FROM VALUES "
                "(1,'the motoring caresses'),(2,'motor cares'),"
                "(3,'relational databases'),(4,'relate to nothing') "
                "t(id,b)")
        eng.sql(f"CREATE INDEX {t}x ON TABLE {t} (body) AS 'lucene' "
                f"PROPERTIES({prop})")

    def run(t, q):
        df = eng.sql(f"SELECT id FROM {t} WHERE text_match('{q}')")
        plan = df._jdf.queryExecution().executedPlan().toString()
        return sorted(r["id"] for r in df.collect()), plan

    for q in ('body:Motoring', 'body:caresses AND body:motors',
              'body:motor*', 'body:"motoring cares"',
              'body:"relate databases"~2', 'body:motoq~1',
              'body:[cara TO carf]', 'body:/relat/'):
        fast_ids, fast_plan = run("pf", q)
        udf_ids, udf_plan = run("pu", q)
        assert fast_ids == udf_ids, q
        assert "EvalPython" not in fast_plan, f"UDF leaked into {q}"
        assert "EvalPython" in udf_plan, f"opt-out ignored for {q}"
    # BM25-ranked limit: scoring tokenization also takes the
    # dictionary fast path (functions/text_rank._toks_porter_sql)
    def run_lim(t):
        df = eng.sql(f"SELECT id FROM {t} WHERE "
                     "text_match_with_limit('body:motoring', 3)")
        plan = df._jdf.queryExecution().executedPlan().toString()
        return sorted(r["id"] for r in df.collect()), plan
    fast_ids, fast_plan = run_lim("pf")
    udf_ids, _ = run_lim("pu")
    assert fast_ids == udf_ids == [1, 2]
    assert "EvalPython" not in fast_plan, "UDF leaked into ranked limit"
    # nested &: automaton-only — the brics/porter UDF fallback stays
    ids_, plan = run("pf", 'body:/(rel.*&.*t)/')
    assert ids_ == [3, 4] and "EvalPython" in plan
    # staleness: a segment loaded AFTER the build leaves the fast
    # path (its tokens are not in the dictionary) until REINDEX
    eng.sql("INSERT INTO pf SELECT * FROM VALUES "
            "(5,'motorized units') t(i,b)")
    ids_, plan = run("pf", 'body:units')
    assert ids_ == [5] and "EvalPython" in plan
    eng.sql("REINDEX ON pf")
    ids_, plan = run("pf", 'body:units')
    assert ids_ == [5] and "EvalPython" not in plan


def test_porter_dict_fastpath_cap(spark, tmp_path):
    """'dict_fastpath_max' below the vocabulary size keeps the UDF
    path — the cap is the caller's scale lever (a 100 TB corpus
    vocabulary would never fit a map literal)."""
    eng = Engine(spark, str(tmp_path / "wh"))
    eng.sql("CREATE TABLE pc (id INT, body STRING)")
    eng.sql("INSERT INTO pc SELECT * FROM VALUES "
            "(1,'motoring caresses'),(2,'motor cares') t(id,b)")
    eng.sql("CREATE INDEX pcx ON TABLE pc (body) AS 'lucene' "
            "PROPERTIES('analyzer'='porter','dict_fastpath_max'='2')")
    df = eng.sql("SELECT id FROM pc WHERE text_match('body:motoring')")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert sorted(r["id"] for r in df.collect()) == [1, 2]
    assert "EvalPython" in plan  # 4 distinct surfaces > cap of 2


def test_fts_multi_column_index_cross_field_queries(spark, tmp_path):
    """One Lucene index over TWO columns (reference
    LuceneFineGrainIndex supports multi-column index tables):
    cross-field AND/OR/NOT resolve each field against its own
    column's postings and refine predicates."""
    eng = Engine(spark, str(tmp_path / "wh"))
    eng.sql("CREATE TABLE mc (id INT, title STRING, body STRING)")
    eng.sql("INSERT INTO mc SELECT * FROM VALUES "
            "(1,'spark engine','fast scan query'),"
            "(2,'duck db','analytics query'),"
            "(3,'spark sql','slow sort merge'),"
            "(4,'carbon data','index spark') t(i,t,b)")
    eng.sql("CREATE INDEX mcx ON TABLE mc (title, body) AS 'lucene'")

    def ids(q):
        return sorted(r["id"] for r in eng.sql(
            f"SELECT id FROM mc WHERE text_match('{q}')").collect())

    assert ids("title:spark AND body:query") == [1]
    assert ids("title:spark OR body:analytics") == [1, 2, 3]
    assert ids("body:spark") == [4]          # same term, other field
    assert ids("title:spark AND NOT body:merge") == [1]
