"""Session-UDF surface in the correctness gate: text_match (Lucene
fallback), timeseries() granularity buckets, NI() hint, and
insegment() time travel — all routed through the engine's extended-SQL
entry point so the gate exercises the parser rewrites themselves.

Reference parity: CarbonEnv.scala:83-113 (UDF registration),
MVFunctions.scala:28-32 (timeseries), LuceneFineGrainIndex.java:204
(text_match), CarbonSpark2SqlParser / secondary-index-guide.md:159 (NI).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog.table import Table
from ..sql import Engine
from . import query
from .lifecycle_queries import _scratch


def _engine(spark: SparkSession, tag: str, sf_dir: str) -> Engine:
    return Engine(spark, _scratch(tag, sf_dir))


@query("udf_text_match", oracle=r"""
SELECT source, COUNT(*) AS n_docs
FROM documents
WHERE regexp_matches(text, '(^|\s)slow(\S*)($|\s)')
  AND NOT regexp_matches(text, '(^|\s)fast($|\s)')
GROUP BY source
""")
def udf_text_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text_match('text:slow* AND NOT text:fast') through the engine's
    SQL entry: the Lucene-ish query compiles to token-boundary RLIKE
    predicates evaluated JVM-side (full-text scoring out of scope)."""
    from ..sources.registry import load_table
    eng = _engine(spark, "udf_tm", sf_dir)
    t = Table.create(spark, os.path.join(eng.warehouse, "documents"),
                     "doc_id bigint, text string, source string")
    t.insert(load_table(spark, sf_dir, "documents")
             .select("doc_id", "text", "source"))
    return eng.sql(
        "SELECT source, COUNT(*) AS n_docs FROM documents "
        "WHERE text_match('text:slow* AND NOT text:fast') "
        "GROUP BY source")


@query("table_fts_phrase", oracle=r"""
SELECT source, COUNT(*) AS n_docs
FROM documents
WHERE regexp_matches(text, '(^|\s)slow\s+filter($|\s)')
   OR regexp_matches(text, '(^|\s)vector($|\s)')
GROUP BY source
""")
def table_fts_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quoted-phrase + OR text_match through the SQL surface with a
    Lucene-analogue postings index: text_match('text:"slow filter" OR
    text:vector') compiles to a phrase RLIKE (tokens in order,
    whitespace-separated) OR'd with a token RLIKE, and the postings
    index prunes files by UNION of per-branch sets — the phrase branch
    intersects its tokens' postings (reference phrase queries:
    LuceneFineGrainIndex.java:63-204; scoring/slop remain out of
    scope, documented in sql.py _lucene_to_sql)."""
    from ..sources.registry import load_table
    eng = _engine(spark, "fts_ph", sf_dir)
    t = Table.create(spark, os.path.join(eng.warehouse, "documents"),
                     "doc_id bigint, text string, source string")
    t.insert(load_table(spark, sf_dir, "documents")
             .select("doc_id", "text", "source"))
    eng.sql("CREATE INDEX ftp ON TABLE documents (text) AS 'lucene'")
    return eng.sql(
        "SELECT source, COUNT(*) AS n_docs FROM documents "
        "WHERE text_match('text:\"slow filter\" OR text:vector') "
        "GROUP BY source")


@query("table_fts_fuzzy", oracle=r"""
SELECT source, COUNT(*) AS n_docs
FROM documents
WHERE len(list_filter(string_split_regex(lower(text), '\s+'),
          t -> t <> '' AND damerau_levenshtein(t, 'slom') <= 1)) > 0
  AND regexp_matches(text, '(^|\s)filter($|\s)')
GROUP BY source
""")
def table_fts_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy text_match('text:slom~1 AND text:filter') through the SQL
    surface: the fuzzy term compiles to a JVM-side Damerau predicate
    (sql.py _dam_pred_sql — transposition costs ONE edit, Lucene
    FuzzyQuery's transpositions=true default) and the Lucene-analogue
    index prunes it by expanding 'slom'~1 against the distinct-token
    dictionary — Lucene's FuzzyQuery term expansion
    (LuceneFineGrainIndex.java:63-204). The oracle checks with
    DuckDB's native damerau_levenshtein, an independent
    implementation of the same distance."""
    from ..sources.registry import load_table
    eng = _engine(spark, "fts_fz", sf_dir)
    t = Table.create(spark, os.path.join(eng.warehouse, "documents"),
                     "doc_id bigint, text string, source string")
    t.insert(load_table(spark, sf_dir, "documents")
             .select("doc_id", "text", "source"))
    eng.sql("CREATE INDEX ftz ON TABLE documents (text) AS 'lucene'")
    return eng.sql(
        "SELECT source, COUNT(*) AS n_docs FROM documents "
        "WHERE text_match('text:slom~1 AND text:filter') "
        "GROUP BY source")


@query("table_fts_fuzzy_transpose", oracle=r"""
SELECT source, COUNT(*) AS n_docs
FROM documents
WHERE len(list_filter(string_split_regex(lower(text), '\s+'),
          t -> t <> '' AND damerau_levenshtein(t, 'lsow') <= 1)) > 0
  AND len(list_filter(string_split_regex(lower(text), '\s+'),
          t -> t <> '' AND damerau_levenshtein(t, 'fitler') <= 2)) > 0
GROUP BY source
""")
def table_fts_fuzzy_transpose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transposition-as-one-edit fuzzy: 'lsow~1' matches 'slow' (one
    adjacent swap; plain Levenshtein needs 2 edits and would miss it
    at ~1) and 'fitler~2' reaches 'filter'-family tokens through a
    swap plus one more edit. Compiled by sql.py _dam_pred_sql — the
    engine-portable decomposition (term-side disjoint-swap expansion +
    token-side one-swap scan + plain levenshtein) that equals the
    unrestricted Damerau distance for edits <= 2; the oracle replays
    it with DuckDB's native damerau_levenshtein. Reference: Lucene
    FuzzyQuery transpositions=true (LuceneFineGrainIndex.java fuzzy
    path); index pruning expands the term dictionary with the same
    distance (catalog/index.py _dam_le)."""
    from ..sources.registry import load_table
    eng = _engine(spark, "fts_tz", sf_dir)
    t = Table.create(spark, os.path.join(eng.warehouse, "documents"),
                     "doc_id bigint, text string, source string")
    t.insert(load_table(spark, sf_dir, "documents")
             .select("doc_id", "text", "source"))
    eng.sql("CREATE INDEX ftt ON TABLE documents (text) AS 'lucene'")
    return eng.sql(
        "SELECT source, COUNT(*) AS n_docs FROM documents "
        "WHERE text_match('text:lsow~1 AND text:fitler~2') "
        "GROUP BY source")


@query("table_fts_sloppy_phrase", oracle=r"""
WITH an AS (
  SELECT doc_id, source,
         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS a
  FROM documents
), pos AS (
  SELECT doc_id, source,
         list_filter(generate_series(1, len(a)), p -> a[p] = 'slow')
           AS a0,
         list_transform(list_filter(generate_series(1, len(a)),
             p -> a[p] = 'filter'), p -> p - 1) AS a1
  FROM an WHERE len(a) >= 2
)
SELECT source, COUNT(*) AS n_docs
FROM pos
WHERE len(list_filter(list_concat(a0, a1), w ->
          len(list_filter(a0, x -> x >= w AND x <= w + 2)) > 0
      AND len(list_filter(a1, x -> x >= w AND x <= w + 2)) > 0)) > 0
GROUP BY source
""")
def table_fts_sloppy_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sloppy-phrase text_match('text:"slow filter"~2') with Lucene's
    SHARED slop budget and reordering (sql.py _slop_window_sql —
    SloppyPhraseMatcher's matchLength over offset-adjusted positions:
    'filter slow' adjacent counts 2 moves and matches at ~2, which a
    per-gap in-order implementation misses). The oracle replays the
    same window check over 1-based token positions. Postings pruning
    still intersects the phrase's token file sets, sound because any
    sloppy match contains every token."""
    from ..sources.registry import load_table
    eng = _engine(spark, "fts_sl", sf_dir)
    t = Table.create(spark, os.path.join(eng.warehouse, "documents"),
                     "doc_id bigint, text string, source string")
    t.insert(load_table(spark, sf_dir, "documents")
             .select("doc_id", "text", "source"))
    eng.sql("CREATE INDEX fsl ON TABLE documents (text) AS 'lucene'")
    return eng.sql(
        "SELECT source, COUNT(*) AS n_docs FROM documents "
        "WHERE text_match('text:\"slow filter\"~2') "
        "GROUP BY source")


@query("table_fts_sloppy_repeat", oracle=r"""
WITH an AS (
  SELECT doc_id, source,
         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS a
  FROM documents
), pos AS (
  SELECT doc_id, source,
         list_filter(generate_series(1, len(a)), p -> a[p] = 'slow') AS ps,
         list_filter(generate_series(1, len(a)), p -> a[p] = 'filter') AS pf
  FROM an
)
SELECT source, COUNT(*) AS n_docs
FROM pos
WHERE len(list_filter(
        list_concat(list_concat(ps, list_transform(ps, p -> p - 2)),
                    list_transform(pf, p -> p - 1)), w ->
          len(list_filter(ps, x -> x >= w AND x <= w + 3)) > 0
      AND len(list_filter(ps, x -> x >= w + 2 AND x <= w + 5)) > 0
      AND len(list_filter(ps, x -> x >= w AND x <= w + 5)) >= 2
      AND len(list_filter(pf, x -> x >= w + 1 AND x <= w + 4)) > 0)) > 0
GROUP BY source
""")
def table_fts_sloppy_repeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REPEATED-term sloppy phrase text_match('text:"slow filter
    slow"~3') — Lucene SloppyPhraseMatcher repeat handling: the two
    'slow' query terms must map to DISTINCT token positions (an
    injective assignment with matchLength <= slop), which sql.py
    _slop_window_sql decides exactly via Hall's condition on
    consecutive same-term offset runs. At sf0.01 the injective answer
    (14 docs) differs sharply from the non-injective one (86 docs)
    and from the old per-gap in-order fallback, so this gate pins the
    repeat semantics. The oracle replays the identical Hall window
    check in DuckDB list lambdas over 1-based token positions.
    Reference: LuceneFineGrainIndex.java:63-204 (PhraseQuery surface;
    Lucene-core SloppyPhraseMatcher repeat groups)."""
    from ..sources.registry import load_table
    eng = _engine(spark, "fts_sr", sf_dir)
    t = Table.create(spark, os.path.join(eng.warehouse, "documents"),
                     "doc_id bigint, text string, source string")
    t.insert(load_table(spark, sf_dir, "documents")
             .select("doc_id", "text", "source"))
    eng.sql("CREATE INDEX fsr ON TABLE documents (text) AS 'lucene'")
    return eng.sql(
        "SELECT source, COUNT(*) AS n_docs FROM documents "
        "WHERE text_match('text:\"slow filter slow\"~3') "
        "GROUP BY source")


_BM25_SPARK_ORACLE = r"""
WITH tf AS (
  SELECT doc_id,
         size(filter(split(lower(text), '\\s+'),
              t -> t != '')) AS dl,
         size(filter(split(lower(text), '\\s+'),
              t -> t = 'vector')) AS tf0,
         size(filter(split(lower(text), '\\s+'),
              t -> t = 'slow')) AS tf1
  FROM documents
), stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(dl) AS DOUBLE) AS sumdl,
         CAST(SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
         CAST(SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1
  FROM tf
)
SELECT doc_id,
       CAST(ROUND(
         ln(1 + (n - df0 + 0.5) / (df0 + 0.5))
           * tf0 * 2.2 / (tf0 + 1.2 * (1 - 0.75 + 0.75 * dl / (sumdl / n)))
         + ln(1 + (n - df1 + 0.5) / (df1 + 0.5))
           * tf1 * 2.2 / (tf1 + 1.2 * (1 - 0.75 + 0.75 * dl / (sumdl / n))),
         4) AS DOUBLE) AS bm25
FROM tf CROSS JOIN stats
WHERE tf0 + tf1 > 0
ORDER BY bm25 DESC, doc_id
LIMIT 15
"""


@query("text_bm25_rank", spark_oracle=_BM25_SPARK_ORACLE, oracle=r"""
WITH tf AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(lower(text), '\s+'),
             t -> t <> '')) AS dl,
         len(list_filter(string_split_regex(lower(text), '\s+'),
             t -> t = 'vector')) AS tf0,
         len(list_filter(string_split_regex(lower(text), '\s+'),
             t -> t = 'slow')) AS tf1
  FROM documents
), stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(dl) AS DOUBLE) AS sumdl,
         CAST(SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
         CAST(SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1
  FROM tf
)
SELECT doc_id,
       CAST(ROUND(
         ln(1 + (n - df0 + 0.5) / (df0 + 0.5))
           * tf0 * 2.2 / (tf0 + 1.2 * (1 - 0.75 + 0.75 * dl / (sumdl / n)))
         + ln(1 + (n - df1 + 0.5) / (df1 + 0.5))
           * tf1 * 2.2 / (tf1 + 1.2 * (1 - 0.75 + 0.75 * dl / (sumdl / n))),
         4) AS DOUBLE) AS bm25
FROM tf, stats
WHERE tf0 + tf1 > 0
ORDER BY bm25 DESC, doc_id
LIMIT 15
""")
def text_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k ranking ['vector','slow'] over documents — the
    scoring half of the reference's Lucene index (Lucene
    BM25Similarity, k1=1.2 b=0.75). Corpus stats come from ONE
    single-row aggregate broadcast back; per-doc term frequencies are
    higher-order array functions in codegen — the corpus never
    shuffles (functions/text_rank.py)."""
    from ..functions.text_rank import bm25_topk
    from ..sources.registry import load_table
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return bm25_topk(docs, ["vector", "slow"], k=15)


@query("udf_text_match_limit", oracle=r"""
SELECT COUNT(*) AS n_matched
FROM (SELECT * FROM documents
      WHERE regexp_matches(text, '(^|\s)slow(\S*)($|\s)')
      LIMIT 25) t
""")
def udf_text_match_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text_match_with_limit('text:slow*', 25): the limit-N cut applies
    to the matched-row set before downstream operators (reference
    TEXT_MATCH_WITH_LIMIT, lucene-index-guide.md). COUNT keeps the gate
    deterministic — which 25 rows survive is engine-order-dependent on
    both sides, but the count is exactly min(25, matches)."""
    from ..sources.registry import load_table
    eng = _engine(spark, "udf_tml", sf_dir)
    t = Table.create(spark, os.path.join(eng.warehouse, "documents"),
                     "doc_id bigint, text string, source string")
    t.insert(load_table(spark, sf_dir, "documents")
             .select("doc_id", "text", "source"))
    return eng.sql(
        "SELECT COUNT(*) AS n_matched FROM documents "
        "WHERE text_match_with_limit('text:slow*', 25)")


@query("table_fts_boolean_group", oracle=r"""
SELECT source, COUNT(*) AS n_docs
FROM documents
WHERE ((regexp_matches(text, '(^|\s)slow($|\s)')
        OR regexp_matches(text, '(^|\s)vector($|\s)'))
       AND regexp_matches(text, '(^|\s)filter($|\s)'))
   OR (regexp_matches(text, '(^|\s)batch($|\s)')
       AND NOT regexp_matches(text, '(^|\s)fast($|\s)'))
GROUP BY source
""")
def table_fts_boolean_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parenthesized boolean text_match — '(slow OR vector) AND filter
    OR (batch AND NOT fast)' through the recursive group parser
    (Lucene grouped BooleanQuery, LuceneFineGrainIndex.java:63-204;
    sql.py _parse_group)."""
    from ..sources.registry import load_table
    eng = _engine(spark, "fts_bg", sf_dir)
    t = Table.create(spark, os.path.join(eng.warehouse, "documents"),
                     "doc_id bigint, text string, source string")
    t.insert(load_table(spark, sf_dir, "documents")
             .select("doc_id", "text", "source"))
    return eng.sql(
        "SELECT source, COUNT(*) AS n_docs FROM documents "
        "WHERE text_match('(text:slow OR text:vector) AND text:filter "
        "OR (text:batch AND NOT text:fast)') "
        "GROUP BY source")


@query("table_fts_range_term", oracle=r"""
SELECT source, COUNT(*) AS n_docs
FROM documents
WHERE len(list_filter(string_split_regex(trim(text), ' +'),
          t -> t <> '' AND t >= 'slow' AND t < 'spark')) > 0
GROUP BY source
""")
def table_fts_range_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lucene TermRangeQuery through the SQL surface:
    text_match('text:[slow TO spark}') keeps documents with ANY token
    lexicographically in [slow, spark) — classic string-ordered range
    semantics (sql.py _range_sql; numeric point ranges out of scope,
    pruning declines soundly on range terms)."""
    from ..sources.registry import load_table
    eng = _engine(spark, "fts_rg", sf_dir)
    t = Table.create(spark, os.path.join(eng.warehouse, "documents"),
                     "doc_id bigint, text string, source string")
    t.insert(load_table(spark, sf_dir, "documents")
             .select("doc_id", "text", "source"))
    return eng.sql(
        "SELECT source, COUNT(*) AS n_docs FROM documents "
        "WHERE text_match('text:[slow TO spark}') "
        "GROUP BY source")


@query("table_fts_standard_analyzer", oracle=r"""
SELECT source, COUNT(*) AS n_docs
FROM documents
WHERE regexp_matches(lower(text), '(^|\s)slow($|\s)')
  AND regexp_matches(lower(text), '(^|\s)filter($|\s)')
GROUP BY source
""")
def table_fts_standard_analyzer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'standard' analyzer (lowercase + whitespace — Lucene
    StandardAnalyzer core): text_match('text:SLOW AND text:Filter')
    matches case-insensitively because the index PROPERTIES select the
    analyzer; postings store lowercased tokens, queries compile
    against lower(text) (catalog/index.py, sql.py _term_sql)."""
    from ..sources.registry import load_table
    eng = _engine(spark, "fts_an", sf_dir)
    t = Table.create(spark, os.path.join(eng.warehouse, "documents"),
                     "doc_id bigint, text string, source string")
    t.insert(load_table(spark, sf_dir, "documents")
             .select("doc_id", "text", "source"))
    eng.sql("CREATE INDEX fan ON TABLE documents (text) AS 'lucene' "
            "PROPERTIES('analyzer'='standard')")
    return eng.sql(
        "SELECT source, COUNT(*) AS n_docs FROM documents "
        "WHERE text_match('text:SLOW AND text:Filter') "
        "GROUP BY source")


def _english_oracle() -> str:
    """Generated from the SAME stemmer/stop-list definitions the
    engine compiles with (functions/analyzers.py) — the two sides
    cannot drift apart. The gate corpus pluralizes each document's
    last token (trim(text) || 's') so CORPUS-side stemming is
    exercised, not just query-term stemming."""
    from ..functions.analyzers import stem_sql, stops_sql

    def has(term: str) -> str:
        return (f"len(list_filter(string_split_regex(lower(text), ' +'),"
                f" t -> t <> '' AND t NOT IN ({stops_sql()})"
                f" AND ({stem_sql('t')}) = '{term}')) > 0")

    return f"""
WITH d AS (
  SELECT doc_id, source, trim(text) || 's' AS text FROM documents
)
SELECT source, COUNT(*) AS n_docs
FROM d
WHERE {has('sort')}
  AND {has('query')}
GROUP BY source
"""


@query("table_fts_english_analyzer", oracle=_english_oracle())
def table_fts_english_analyzer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'english' analyzer (lowercase + classic stop set + minimal
    s-stemmer — Lucene EnglishAnalyzer's pipeline with the
    SQL-expressible stemmer, functions/analyzers.py):
    text_match('text:Sorts AND text:QUERIES AND text:The') matches
    documents whose ANALYZED tokens contain 'sort' and 'query' —
    'Sorts'→'sort' and 'QUERIES'→'query' by query-term stemming,
    corpus plurals (the staged table pluralizes each doc's last
    token) stem back the same way, and 'The' is a stopword whose
    clause Lucene's parser DROPS from the conjunction. Postings are
    stop-filtered + stemmed (catalog/index.py _build_fts), so index
    pruning and the RLIKE-free exists() refine see the same terms.
    Reference: LuceneFineGrainIndex.java:63-204 analyzer pipeline,
    docs/index/lucene-index-guide.md."""
    from ..sources.registry import load_table
    eng = _engine(spark, "fts_en", sf_dir)
    t = Table.create(spark, os.path.join(eng.warehouse, "documents"),
                     "doc_id bigint, text string, source string")
    t.insert(load_table(spark, sf_dir, "documents")
             .select("doc_id",
                     F.concat(F.trim(F.col("text")), F.lit("s"))
                     .alias("text"),
                     "source"))
    eng.sql("CREATE INDEX fen ON TABLE documents (text) AS 'lucene' "
            "PROPERTIES('analyzer'='english')")
    return eng.sql(
        "SELECT source, COUNT(*) AS n_docs FROM documents "
        "WHERE text_match('text:Sorts AND text:QUERIES AND text:The') "
        "GROUP BY source")


def _english_phrase_oracle() -> str:
    """Generated from the same analyzer definitions as the engine
    (functions/analyzers.py). The staged corpus rewrites every
    'slow filter' bigram to 'slow a filters' — a stopword GAP plus a
    corpus-side plural — and the oracle replays Lucene's gapped
    PhraseQuery: analyzed position p holds the stem (NULL for a
    stopword, which still occupies its position), and the phrase
    '"Slow the Filters"' analyzes to slow@0 / filter@2."""
    from ..functions.analyzers import stem_sql, stops_sql

    arr = (f"list_transform(list_filter(string_split_regex(lower(text),"
           f" ' +'), x -> x <> ''), t -> CASE WHEN t IN ({stops_sql()})"
           f" THEN NULL ELSE {stem_sql('t')} END)")
    return f"""
WITH staged AS (
  SELECT doc_id, source,
         replace(text, 'slow filter', 'slow a filters') AS text
  FROM documents
), analyzed AS (
  SELECT doc_id, source, {arr} AS a FROM staged
)
SELECT source, COUNT(*) AS n_docs
FROM analyzed
WHERE len(a) > 2 AND len(list_filter(generate_series(1, len(a) - 2),
      p -> a[p] = 'slow' AND a[p + 2] = 'filter')) > 0
GROUP BY source
"""


@query("table_fts_english_phrase", oracle=_english_phrase_oracle())
def table_fts_english_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase under the 'english' analyzer with Lucene's
    StopFilter position gaps (sql.py _english_phrase_sql):
    text_match('text:"Slow the Filters"') analyzes to slow@0 /
    filter@2 — 'the' is removed but holds its position — and the
    staged corpus ('slow filter' → 'slow a filters') matches because
    its own stopword 'a' gaps the same position and 'filters' stems
    back to 'filter'. A gap-less implementation (plain adjacency) or
    a stopword-collapsing one both return different sets. Reference:
    LuceneFineGrainIndex.java:63-204 analyzer pipeline +
    PhraseQuery's position-gapped matching."""
    from ..sources.registry import load_table
    eng = _engine(spark, "fts_ep", sf_dir)
    t = Table.create(spark, os.path.join(eng.warehouse, "documents"),
                     "doc_id bigint, text string, source string")
    t.insert(load_table(spark, sf_dir, "documents")
             .select("doc_id",
                     F.regexp_replace(F.col("text"), "slow filter",
                                      "slow a filters").alias("text"),
                     "source"))
    eng.sql("CREATE INDEX fep ON TABLE documents (text) AS 'lucene' "
            "PROPERTIES('analyzer'='english')")
    return eng.sql(
        "SELECT source, COUNT(*) AS n_docs FROM documents "
        "WHERE text_match('text:\"Slow the Filters\"') "
        "GROUP BY source")


@query("table_fts_regexp_dialect", oracle=r"""
SELECT source, COUNT(*) AS n_docs
FROM (SELECT doc_id, text || ' ' || CAST(doc_id % 200 AS VARCHAR) AS text,
             source
      FROM documents)
WHERE len(list_filter(string_split_regex(text, '\s+'),
          t -> t <> '' AND regexp_matches(t, '^(?:filter)$'))) > 0
  AND len(list_filter(string_split_regex(text, '\s+'),
          t -> t <> '' AND regexp_matches(t,
            '^(?:0*(?:[5-9]|[1-9][0-9]|1(?:[0-4][0-9]|50)))$'))) > 0
GROUP BY source
""")
def table_fts_regexp_dialect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lucene regexp dialect (sql.py _lucene_regex_to_java — the
    brics RegExp syntax Lucene's RegexpQuery parses):
    text_match('text:/\\filter/ AND text:/<5-150>/') — ``\\f`` is the
    LITERAL f (Java regex would read the form-feed escape and match
    nothing, so a pass proves the dialect translation runs), and
    ``<5-150>`` is the brics numeric interval (leading zeros accepted
    when operand lengths differ) over the staged numeric tokens
    (text || ' ' || doc_id % 200). The oracle replays both with
    hand-written equivalent RE2 regexes in DuckDB. Reference: Lucene
    RegExp.java via RegexpQuery, docs/index/lucene-index-guide.md."""
    from ..sources.registry import load_table
    eng = _engine(spark, "fts_rx", sf_dir)
    t = Table.create(spark, os.path.join(eng.warehouse, "documents"),
                     "doc_id bigint, text string, source string")
    t.insert(load_table(spark, sf_dir, "documents")
             .select("doc_id",
                     F.concat(F.col("text"), F.lit(" "),
                              (F.col("doc_id") % 200).cast("string"))
                     .alias("text"),
                     "source"))
    eng.sql("CREATE INDEX frx ON TABLE documents (text) AS 'lucene'")
    return eng.sql(
        "SELECT source, COUNT(*) AS n_docs FROM documents "
        "WHERE text_match('text:/\\filter/ AND text:/<5-150>/') "
        "GROUP BY source")


@query("table_fts_limit_ranked", oracle=r"""
WITH tf AS (
  SELECT doc_id, text, source,
         len(list_filter(string_split_regex(lower(text), '\s+'),
             t -> t <> '')) AS dl,
         len(list_filter(string_split_regex(lower(text), '\s+'),
             t -> t = 'vector')) AS tf0
  FROM documents
), stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(dl) AS DOUBLE) AS sumdl,
         CAST(SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0
  FROM tf
)
SELECT doc_id FROM (
  SELECT doc_id, text, source,
         ln(1 + (n - df0 + 0.5) / (df0 + 0.5))
           * tf0 * 2.2 / (tf0 + 1.2 * (1 - 0.75 + 0.75 * dl / (sumdl / n)))
           AS score
  FROM tf, stats
  WHERE regexp_matches(text, '(^|\s)vector($|\s)')
  ORDER BY score DESC, doc_id, text, source
  LIMIT 12
) t
""")
def table_fts_limit_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text_match_with_limit returns the N highest-BM25 hits (Lucene
    TopDocs semantics, LuceneFineGrainIndex.java:63-204) — the oracle
    recomputes the same Lucene BM25Similarity score in SQL and must
    select the SAME 12 documents. Tie-break = every table column, so
    the surviving set is engine-deterministic."""
    from ..sources.registry import load_table
    eng = _engine(spark, "fts_rk", sf_dir)
    t = Table.create(spark, os.path.join(eng.warehouse, "documents"),
                     "doc_id bigint, text string, source string")
    t.insert(load_table(spark, sf_dir, "documents")
             .select("doc_id", "text", "source"))
    return eng.sql(
        "SELECT doc_id FROM documents "
        "WHERE text_match_with_limit('text:vector', 12)")


def _english_range_oracle() -> str:
    from ..functions.analyzers import stem_sql, stops_sql
    return f"""
WITH staged AS (
  SELECT doc_id, source, trim(text) || 's' AS text FROM documents
), an AS (
  SELECT doc_id, source,
         list_transform(list_filter(string_split_regex(lower(text), ' +'),
             x -> x <> '' AND x NOT IN ({stops_sql()})),
             t -> {stem_sql('t')}) AS a
  FROM staged
)
SELECT source, COUNT(*) AS n_docs
FROM an
WHERE len(list_filter(a, s -> s >= 'sora' AND s <= 'sortr')) > 0
GROUP BY source
"""


@query("table_fts_english_range", oracle=_english_range_oracle())
def table_fts_english_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TermRangeQuery under the 'english' analyzer: the bounds are
    normalized (lowercase, NOT stemmed — Lucene's normalize()) and
    compared against the analyzed tokens, which are stems —
    '[SORA TO sortr]' brackets stem 'sort' while the surface plural
    'sorts' (the staged corpus pluralizes each doc's last token)
    sorts above 'sortr', so a surface-token range returns a
    different, smaller set (sql.py _range_sql english branch)."""
    from ..sources.registry import load_table
    eng = _engine(spark, "fts_er", sf_dir)
    t = Table.create(spark, os.path.join(eng.warehouse, "documents"),
                     "doc_id bigint, text string, source string")
    t.insert(load_table(spark, sf_dir, "documents")
             .select("doc_id",
                     F.concat(F.trim(F.col("text")), F.lit("s"))
                     .alias("text"),
                     "source"))
    eng.sql("CREATE INDEX fer ON TABLE documents (text) AS 'lucene' "
            "PROPERTIES('analyzer'='english')")
    return eng.sql(
        "SELECT source, COUNT(*) AS n_docs FROM documents "
        "WHERE text_match('text:[SORA TO sortr]') "
        "GROUP BY source")


def _english_fuzzy_oracle() -> str:
    """Fuzzy under english — Lucene FuzzyQuery normalizes the query
    term (lowercase, NOT stemmed) and expands it against the stemmed
    index terms; DuckDB replays with the shared stem fragment plus its
    native damerau_levenshtein."""
    from ..functions.analyzers import stem_sql, stops_sql
    return f"""
WITH an AS (
  SELECT doc_id, source,
         list_transform(list_filter(string_split_regex(lower(text), ' +'),
             x -> x <> '' AND x NOT IN ({stops_sql()})),
             t -> {stem_sql('t')}) AS a
  FROM documents
)
SELECT source, COUNT(*) AS n_docs
FROM an
WHERE len(list_filter(a, s -> damerau_levenshtein(s, 'sost') <= 1)) > 0
GROUP BY source
"""


@query("table_fts_english_fuzzy", oracle=_english_fuzzy_oracle())
def table_fts_english_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy term under the 'english' analyzer
    (sql.py _english_fuzzy_sql): text_match('text:Sost~1') lowercases
    the query term WITHOUT stemming it (Lucene's normalize() for
    multi-term queries) and matches analyzed corpus tokens — the
    corpus's 'sorts' stems to 'sort', one Damerau edit from 'sost',
    while the surface form 'sorts' is two away, so an implementation
    matching surface tokens (or stemming the query term) returns a
    different set. Oracle: the shared stem fragment + DuckDB's native
    damerau_levenshtein."""
    from ..sources.registry import load_table
    eng = _engine(spark, "fts_ef", sf_dir)
    t = Table.create(spark, os.path.join(eng.warehouse, "documents"),
                     "doc_id bigint, text string, source string")
    t.insert(load_table(spark, sf_dir, "documents")
             .select("doc_id", "text", "source"))
    eng.sql("CREATE INDEX fef ON TABLE documents (text) AS 'lucene' "
            "PROPERTIES('analyzer'='english')")
    return eng.sql(
        "SELECT source, COUNT(*) AS n_docs FROM documents "
        "WHERE text_match('text:Sost~1') "
        "GROUP BY source")


# The synthetic documents corpus draws every token from this fixed
# 31-word vocabulary (TESTDATA.md generator — stable across sf0.001/
# 0.01/0.1; pinned by tests/test_analyzers.py so drift fails a test
# loudly instead of silently degrading a gate oracle). The porter
# gate oracles replay Porter stemming as a closed CASE dictionary
# over it: the oracle then independently checks tokenization, stop
# gaps, positions, edit distance and BM25 arithmetic, while the
# stemmer itself is verified against Porter's published example
# vocabulary in tests/test_porter.py (functions/porter.stem_case_sql).
_DOC_VOCAB = (
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window")


def _porter_arr_sql(extra: tuple[str, ...] = ()) -> str:
    """Analyzed (stop-REMOVED) porter token array for a DuckDB oracle,
    stemming via the vocabulary CASE dictionary."""
    from ..functions.analyzers import stops_sql
    from ..functions.porter import stem_case_sql
    case = stem_case_sql("t", _DOC_VOCAB + tuple(extra))
    return (f"list_transform(list_filter(string_split_regex(lower(text),"
            f" '\\s+'), x -> x <> '' AND x NOT IN ({stops_sql()})), "
            f"t -> {case})")


def _porter_gap_sql(extra: tuple[str, ...] = ()) -> str:
    """Analyzed porter stream with Lucene stop-GAP positions (NULL
    holds a removed stopword's slot) for phrase oracles."""
    from ..functions.analyzers import stops_sql
    from ..functions.porter import stem_case_sql
    case = stem_case_sql("t", _DOC_VOCAB + tuple(extra))
    return (f"list_transform(list_filter(string_split_regex(lower(text),"
            f" '\\s+'), x -> x <> ''), t -> CASE WHEN t IN "
            f"({stops_sql()}) THEN NULL ELSE {case} END)")


def _porter_analyzer_oracle() -> str:
    extra = tuple(w + "ing" for w in _DOC_VOCAB)
    return f"""
WITH staged AS (
  SELECT doc_id, source, trim(text) || 'ing' AS text FROM documents
), an AS (
  SELECT doc_id, source, {_porter_arr_sql(extra)} AS a FROM staged
)
SELECT source, COUNT(*) AS n_docs
FROM an
WHERE len(list_filter(a, s -> s = 'merg')) > 0
  AND len(list_filter(a, s -> s = 'sort')) > 0
GROUP BY source
"""


@query("table_fts_porter_analyzer", oracle=_porter_analyzer_oracle())
def table_fts_porter_analyzer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'porter' analyzer (lowercase + classic stop set + FULL Porter
    stemmer — Lucene EnglishAnalyzer's actual PorterStemFilter,
    functions/porter.py): text_match('text:Merges AND text:Sorting')
    matches documents whose analyzed tokens contain stems 'merg' and
    'sort' — 'Merges'→'merg' (1a s-drop + 5a e-drop) and
    'Sorting'→'sort' (1b ing-drop) exercise rules beyond the
    s-stemmer's reach; the staged corpus suffixes '-ing' forms so
    corpus-side stemming is exercised too. Porter's measure
    conditions have no SQL form, so the refine predicate runs through
    the Arrow-batched __carbon_porter_match UDF; the oracle replays
    stemming as a closed CASE dictionary over the fixed corpus
    vocabulary (see _DOC_VOCAB). Reference: LuceneFineGrainIndex.java:
    63-204 analyzer pipeline (PorterStemFilter)."""
    from ..sources.registry import load_table
    eng = _engine(spark, "fts_po", sf_dir)
    t = Table.create(spark, os.path.join(eng.warehouse, "documents"),
                     "doc_id bigint, text string, source string")
    t.insert(load_table(spark, sf_dir, "documents")
             .select("doc_id",
                     F.concat(F.trim(F.col("text")), F.lit("ing"))
                     .alias("text"),
                     "source"))
    eng.sql("CREATE INDEX fpo ON TABLE documents (text) AS 'lucene' "
            "PROPERTIES('analyzer'='porter')")
    return eng.sql(
        "SELECT source, COUNT(*) AS n_docs FROM documents "
        "WHERE text_match('text:Merges AND text:Sorting') "
        "GROUP BY source")


def _porter_phrase_oracle() -> str:
    arr = _porter_gap_sql(("slowed", "filtering"))
    return f"""
WITH staged AS (
  SELECT doc_id, source,
         replace(text, 'slow filter', 'slowed a filtering') AS text
  FROM documents
), an AS (
  SELECT doc_id, source, {arr} AS a FROM staged
)
SELECT source, COUNT(*) AS n_docs
FROM an
WHERE len(a) > 2 AND len(list_filter(generate_series(1, len(a) - 2),
      p -> a[p] = 'slow' AND a[p + 2] = 'filter')) > 0
GROUP BY source
"""


@query("table_fts_porter_phrase", oracle=_porter_phrase_oracle())
def table_fts_porter_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase under the 'porter' analyzer with Lucene's
    StopFilter position gaps (sql.py __carbon_porter_phrase):
    '"Slowing the Filters"' analyzes to slow@0 / filter@2 — Porter
    strips -ing and the plural while 'the' holds its position — and
    the staged corpus ('slow filter' → 'slowed a filtering') matches
    only through THREE Porter rules the s-stemmer lacks (-ed, -ing on
    both sides). The oracle replays the gapped positions with the
    vocabulary stem dictionary."""
    from ..sources.registry import load_table
    eng = _engine(spark, "fts_pp", sf_dir)
    t = Table.create(spark, os.path.join(eng.warehouse, "documents"),
                     "doc_id bigint, text string, source string")
    t.insert(load_table(spark, sf_dir, "documents")
             .select("doc_id",
                     F.regexp_replace(F.col("text"), "slow filter",
                                      "slowed a filtering").alias("text"),
                     "source"))
    eng.sql("CREATE INDEX fpp ON TABLE documents (text) AS 'lucene' "
            "PROPERTIES('analyzer'='porter')")
    return eng.sql(
        "SELECT source, COUNT(*) AS n_docs FROM documents "
        "WHERE text_match('text:\"Slowing the Filters\"') "
        "GROUP BY source")


def _porter_fuzzy_range_oracle() -> str:
    arr = _porter_arr_sql(("sorting",))
    return f"""
WITH staged AS (
  SELECT doc_id, source, regexp_replace(text, 'sort', 'sorting', 'g')
           AS text
  FROM documents
), an AS (
  SELECT doc_id, source, {arr} AS a FROM staged
)
SELECT source, COUNT(*) AS n_docs
FROM an
WHERE len(list_filter(a, s -> damerau_levenshtein(s, 'sost') <= 1)) > 0
  AND len(list_filter(a, s -> s >= 'sora' AND s <= 'sortb')) > 0
GROUP BY source
"""


@query("table_fts_porter_fuzzy_range", oracle=_porter_fuzzy_range_oracle())
def table_fts_porter_fuzzy_range(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Fuzzy + range terms under the 'porter' analyzer (sql.py
    __carbon_porter_fuzzy/_range): the staged corpus rewrites every
    'sort' to 'sorting', whose PORTER stem is 'sort' again — so
    'Sost~1' (normalized lowercase, NOT stemmed — Lucene FuzzyQuery)
    is one Damerau edit from the stem but four from the surface form,
    and '[sora TO sortb]' brackets the stem while the surface
    'sorting' sorts above 'sortb'. An s-stemmer or surface-form
    implementation returns a different set for BOTH conjuncts. Oracle:
    DuckDB's native damerau_levenshtein + lexicographic bounds over
    the dictionary-stemmed array."""
    from ..sources.registry import load_table
    eng = _engine(spark, "fts_pf", sf_dir)
    t = Table.create(spark, os.path.join(eng.warehouse, "documents"),
                     "doc_id bigint, text string, source string")
    t.insert(load_table(spark, sf_dir, "documents")
             .select("doc_id",
                     F.regexp_replace(F.col("text"), "sort", "sorting")
                     .alias("text"),
                     "source"))
    eng.sql("CREATE INDEX fpf ON TABLE documents (text) AS 'lucene' "
            "PROPERTIES('analyzer'='porter')")
    return eng.sql(
        "SELECT source, COUNT(*) AS n_docs FROM documents "
        "WHERE text_match('text:Sost~1 AND text:[sora TO sortb]') "
        "GROUP BY source")


def _porter_regexp_oracle() -> str:
    arr = _porter_arr_sql(("merges",))
    return f"""
WITH staged AS (
  SELECT doc_id, source, regexp_replace(text, 'merge', 'merges', 'g')
           AS text
  FROM documents
), an AS (
  SELECT doc_id, source, {arr} AS a FROM staged
)
SELECT source, COUNT(*) AS n_docs
FROM an
WHERE len(list_filter(a, s -> regexp_matches(s, '^(?:m(?:er)g)$'))) > 0
GROUP BY source
"""


@query("table_fts_porter_regexp", oracle=_porter_regexp_oracle())
def table_fts_porter_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp term under the 'porter' analyzer (sql.py
    __carbon_porter_regexp): /m"er"g/ uses the brics quoted-literal
    syntax and runs UN-analyzed over the index terms — the stems — so
    it matches 'merg', the Porter stem of the staged 'merges'
    (1a s-drop + 5a e-drop), which neither the surface form nor the
    s-stem ('merge') equals. Oracle: the translated regex over the
    dictionary-stemmed array."""
    from ..sources.registry import load_table
    eng = _engine(spark, "fts_pr", sf_dir)
    t = Table.create(spark, os.path.join(eng.warehouse, "documents"),
                     "doc_id bigint, text string, source string")
    t.insert(load_table(spark, sf_dir, "documents")
             .select("doc_id",
                     F.regexp_replace(F.col("text"), "merge", "merges")
                     .alias("text"),
                     "source"))
    eng.sql("CREATE INDEX fprx ON TABLE documents (text) AS 'lucene' "
            "PROPERTIES('analyzer'='porter')")
    return eng.sql(
        "SELECT source, COUNT(*) AS n_docs FROM documents "
        "WHERE text_match('text:/m\"er\"g/') "
        "GROUP BY source")


def _brics_automaton_oracle() -> str:
    """Expected hits of /s@&~(scan|sort|stream)/ over the fixed
    31-word corpus vocabulary, HAND-PINNED as a literal (the s-words
    are scan, slow, small, sort, spark, stream; minus the complement
    leaves slow/small/spark) so the gate is fully independent of
    functions/brics.py — an automaton-evaluation bug now fails the
    gate instead of propagating into the oracle. The pin is guarded
    by tests/test_analyzers.py::test_brics_automaton_gate_pin — a
    vocabulary drift or brics_match disagreement fails the suite,
    kept out of this builder so it can't poison the oracle dict."""
    hits = ["slow", "small", "spark"]
    in_list = ", ".join(f"'{w}'" for w in hits)
    return f"""
SELECT source, COUNT(*) AS n_docs
FROM (SELECT doc_id, source,
             list_filter(string_split_regex(text, '\\s+'), x -> x <> '')
               AS a
      FROM documents)
WHERE len(list_filter(a, t -> t IN ({in_list}))) > 0
GROUP BY source
"""


@query("table_fts_regexp_automaton", oracle=_brics_automaton_oracle())
def table_fts_regexp_automaton(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Regexp terms with NESTED intersection and COMPLEMENT —
    /s@&~(scan|sort|stream)/ selects tokens starting with 's' that
    are not scan/sort/stream. Regular languages are closed under both
    operators but regexes are not, so the translator falls back to
    the Arrow-batched brics span matcher (sql.py _regex_sql →
    functions/brics.py), paid only by queries that use them. Lucene
    parses the same brics RegExp dialect into an automaton
    (RegexpQuery); the oracle embeds the matching vocabulary tokens
    as a precomputed IN-list."""
    from ..sources.registry import load_table
    eng = _engine(spark, "fts_ba", sf_dir)
    t = Table.create(spark, os.path.join(eng.warehouse, "documents"),
                     "doc_id bigint, text string, source string")
    t.insert(load_table(spark, sf_dir, "documents")
             .select("doc_id", "text", "source"))
    eng.sql("CREATE INDEX fba ON TABLE documents (text) AS 'lucene'")
    return eng.sql(
        "SELECT source, COUNT(*) AS n_docs FROM documents "
        "WHERE text_match('text:/(s@&~(scan|sort|stream))/') "
        "GROUP BY source")


def _porter_ranked_oracle() -> str:
    arr = _porter_arr_sql(("sorting",))
    return f"""
WITH staged AS (
  SELECT doc_id, source, regexp_replace(text, 'sort', 'sorting', 'g')
           AS text
  FROM documents
), an AS (
  SELECT doc_id, text, source, {arr} AS a FROM staged
), tf AS (
  SELECT doc_id, text, source, len(a) AS dl,
         len(list_filter(a, t -> t = 'sort')) AS tf0
  FROM an
), stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(dl) AS DOUBLE) AS sumdl,
         CAST(SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0
  FROM tf
)
SELECT doc_id FROM (
  SELECT doc_id, text, source,
         ln(1 + (n - df0 + 0.5) / (df0 + 0.5))
           * tf0 * 2.2 / (tf0 + 1.2 * (1 - 0.75 + 0.75 * dl / (sumdl / n)))
           AS score
  FROM tf, stats
  WHERE tf0 > 0
  ORDER BY score DESC, doc_id, text, source
  LIMIT 10
) t
"""


@query("table_fts_limit_ranked_porter", oracle=_porter_ranked_oracle())
def table_fts_limit_ranked_porter(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """text_match_with_limit under the 'porter' analyzer scores
    STEMMED tf (functions/text_rank.bm25_score porter=True — the
    token stream through one Arrow-batched UDF, stats and scoring
    JVM-side): the query term 'Sorts' stems to 'sort' and tf counts
    the staged 'sorting' tokens, which a surface-form ranking scores
    0 everywhere (nothing scorable → a different arbitrary-N set).
    The staged text here is the ONLY 'sort'-bearing form, so the
    top-10 is porter-determined. Oracle: same BM25 formula over the
    dictionary-stemmed array."""
    from ..sources.registry import load_table
    eng = _engine(spark, "fts_rp", sf_dir)
    t = Table.create(spark, os.path.join(eng.warehouse, "documents"),
                     "doc_id bigint, text string, source string")
    t.insert(load_table(spark, sf_dir, "documents")
             .select("doc_id",
                     F.regexp_replace(F.col("text"), "sort", "sorting")
                     .alias("text"),
                     "source"))
    eng.sql("CREATE INDEX frp ON TABLE documents (text) AS 'lucene' "
            "PROPERTIES('analyzer'='porter')")
    return eng.sql(
        "SELECT doc_id FROM documents "
        "WHERE text_match_with_limit('text:Sorts', 10)")


def _english_ranked_oracle() -> str:
    """BM25 over the ANALYZED stream (stemmed tf, post-stop dl) —
    generated from the shared analyzer fragments so both engines
    compute identical ints and therefore identical float scores."""
    from ..functions.analyzers import stem_sql, stops_sql
    return f"""
WITH an AS (
  SELECT doc_id, text, source,
         list_transform(list_filter(string_split_regex(lower(text), '\\s+'),
             x -> x <> '' AND x NOT IN ({stops_sql()})),
             t -> {stem_sql('t')}) AS a
  FROM documents
), tf AS (
  SELECT doc_id, text, source, len(a) AS dl,
         len(list_filter(a, t -> t = 'vector')) AS tf0
  FROM an
), stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(dl) AS DOUBLE) AS sumdl,
         CAST(SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0
  FROM tf
)
SELECT doc_id FROM (
  SELECT doc_id, text, source,
         ln(1 + (n - df0 + 0.5) / (df0 + 0.5))
           * tf0 * 2.2 / (tf0 + 1.2 * (1 - 0.75 + 0.75 * dl / (sumdl / n)))
           AS score
  FROM tf, stats
  WHERE tf0 > 0
  ORDER BY score DESC, doc_id, text, source
  LIMIT 10
) t
"""


@query("table_fts_limit_ranked_english", oracle=_english_ranked_oracle())
def table_fts_limit_ranked_english(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """text_match_with_limit under the 'english' analyzer scores
    ANALYZED terms against the analyzed token stream — the query term
    'Vectors' stems to 'vector', tf counts stems, and dl is the
    post-stop emitted token count (functions/text_rank.bm25_score
    english=True; Lucene's BM25 when the field analyzer is
    EnglishAnalyzer). A surface-form ranking (tf of literal 'Vectors',
    whitespace dl) selects a different top-10. Oracle: the same
    formula over the shared analyzer SQL fragments."""
    from ..sources.registry import load_table
    eng = _engine(spark, "fts_re", sf_dir)
    t = Table.create(spark, os.path.join(eng.warehouse, "documents"),
                     "doc_id bigint, text string, source string")
    t.insert(load_table(spark, sf_dir, "documents")
             .select("doc_id", "text", "source"))
    eng.sql("CREATE INDEX fre ON TABLE documents (text) AS 'lucene' "
            "PROPERTIES('analyzer'='english')")
    return eng.sql(
        "SELECT doc_id FROM documents "
        "WHERE text_match_with_limit('text:Vectors', 10)")


@query("udf_timeseries_rollup", oracle="""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_day,
       (date_trunc('hour', ts) + INTERVAL ((minute(ts) // 15) * 15) MINUTE)
         AS bucket_15m_sample,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(14,4))) AS DOUBLE) AS sum_value
FROM events
WHERE event_type = 'click'
GROUP BY 1, 2
""")
def udf_timeseries_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """timeseries(ts,'day') + timeseries(ts,'fifteen_minute') buckets
    via the SQL entry point (granularities per MVTimeGranularity.scala:
    25-35); both compile to date_trunc/interval arithmetic, no UDF."""
    from ..sources.registry import load_table
    eng = _engine(spark, "udf_ts", sf_dir)
    t = Table.create(spark, os.path.join(eng.warehouse, "events"),
                     "event_id bigint, ts timestamp, event_type string, "
                     "value double")
    t.insert(load_table(spark, sf_dir, "events")
             .select("event_id", "ts", "event_type", "value"))
    return eng.sql(
        "SELECT timeseries(ts, 'day') AS bucket_day, "
        "timeseries(ts, 'fifteen_minute') AS bucket_15m_sample, "
        "COUNT(*) AS n_events, "
        "CAST(SUM(CAST(value AS DECIMAL(14,4))) AS DOUBLE) AS sum_value "
        "FROM events WHERE NI(event_type = 'click') GROUP BY 1, 2")


@query("udf_insegment_travel", oracle="""
SELECT l_returnflag, COUNT(*) AS n_rows
FROM lineitem
WHERE l_orderkey < 500
GROUP BY l_returnflag
""")
def udf_insegment_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """insegment('0') restricts the scan to the first load: segment 1
    (the l_orderkey >= 500 half) must be invisible, so the result equals
    the oracle computed over only the first half."""
    li = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
          .select("l_orderkey", "l_returnflag"))
    eng = _engine(spark, "udf_seg", sf_dir)
    t = Table.create(spark, os.path.join(eng.warehouse, "li"),
                     "l_orderkey bigint, l_returnflag string")
    t.insert(li.filter(F.col("l_orderkey") < 500))          # segment 0
    t.insert(li.filter(F.col("l_orderkey") >= 500))         # segment 1
    return eng.sql(
        "SELECT l_returnflag, COUNT(*) AS n_rows FROM li "
        "WHERE insegment('0') GROUP BY l_returnflag")


@query("udf_grouped_agg_pandas", oracle="""
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n * n) AS BIGINT) AS sum_sq_tokens
FROM (SELECT lang, len(string_split_regex(trim(text), ' +')) AS n
      FROM documents)
GROUP BY lang
""")
def udf_grouped_agg_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDF surface (SURVEY §2.13): the per-group
    aggregate runs as an Arrow-batched pandas reduction on the
    executors — integer math (sum of squared token counts) so the
    result is order-independent and hash-comparable. The group-by
    shuffle and partial aggregation stay JVM-side; only the final
    per-group reduction crosses into pandas."""
    import pandas as pd
    from pyspark.sql.functions import PandasUDFType

    # module-level `from __future__ import annotations` stringifies
    # type hints, so the agg kind is declared explicitly
    @F.pandas_udf("bigint", PandasUDFType.GROUPED_AGG)
    def sum_sq(n):
        return int((pd.Series(n).astype("int64") ** 2).sum())

    @F.pandas_udf("bigint", PandasUDFType.GROUPED_AGG)
    def n_rows(n):
        return int(pd.Series(n).size)

    # Spark disallows mixing pandas and JVM aggregates in one agg —
    # both outputs come from the Arrow path
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ntok = F.size(F.split(F.trim(F.col("text")), " +"))
    return (d.select("lang", ntok.cast("bigint").alias("n"))
            .groupBy("lang")
            .agg(n_rows(F.col("n")).alias("n_docs"),
                 sum_sq(F.col("n")).alias("sum_sq_tokens")))


@query("udf_python_udtf", oracle="""
WITH t AS (
  SELECT doc_id, lang,
         len(string_split_regex(trim(text), ' +')) AS n
  FROM documents WHERE doc_id < 200
), chunks AS (
  SELECT doc_id, lang, i AS chunk_idx,
         CASE WHEN n - i * 20 > 20 THEN 20 ELSE n - i * 20 END AS n_words
  FROM t, unnest(generate_series(0, CAST(ceil(n / 20.0) AS INT) - 1)) AS u(i)
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(n_words) AS BIGINT) AS sum_words,
       CAST(MAX(n_words) AS BIGINT) AS max_chunk_words
FROM chunks GROUP BY lang
""")
def udf_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface (Spark 4 table functions): a chunking UDTF
    emits one row per 20-word window of each document via LATERAL —
    the 1→N user-defined shape UDFs can't express. Arrow-batched like
    pandas UDFs; the aggregate after the lateral join is JVM-side.
    The oracle replays the chunk arithmetic with generate_series."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, n_words int")
    class ChunkWords:
        def eval(self, text: str):
            n = len((text or "").split())
            i = 0
            while i * 20 < n:
                yield (i, min(20, n - i * 20))
                i += 1

    spark.udtf.register("__chunk_words__", ChunkWords)
    (spark.read.parquet(f"{sf_dir}/documents.parquet")
     .filter(F.col("doc_id") < 200)
     .select("doc_id", "lang", F.trim(F.col("text")).alias("text"))
     .createOrReplaceTempView("__udtf_docs__"))
    return spark.sql("""
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_chunks,
               CAST(SUM(c.n_words) AS BIGINT) AS sum_words,
               CAST(MAX(c.n_words) AS BIGINT) AS max_chunk_words
        FROM __udtf_docs__, LATERAL __chunk_words__(text) c
        GROUP BY lang""")
