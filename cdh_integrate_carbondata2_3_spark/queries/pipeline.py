"""LLM-training-data pipeline operators over ``documents`` / ``embeddings``:
deduplication (exact, MinHash+LSH), text analysis (token stats, language
heuristic, fingerprinting, quality), and embedding similarity search.

These go beyond the reference's own surface (its dedup example is
MERGE-insert-if-not-exists — reference examples/.../DedupExample.scala)
and are designed scale-first: everything is built-in-function DataFrame
ops (explode / groupBy / broadcast join), no Python UDF in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.registry import load_table
from . import query


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _md5(col) -> F.Column:
    return F.md5(col.cast("binary"))


def _tokens(df: DataFrame) -> DataFrame:
    """(doc_id, tok) distinct word set per document."""
    return (df.select("doc_id",
                      F.explode(F.split(F.trim(F.col("text")), " +")).alias("tok"))
            .distinct())


# ---------------------------------------------------------------------------
# Exact deduplication (hash-groupBy — shuffles only the 32-char digest+id)
# ---------------------------------------------------------------------------

@query("dedup_exact_groups", oracle="""
SELECT md5(text) AS fp, MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_copies
FROM documents GROUP BY md5(text)
""")
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate groups keyed by content digest."""
    return (_docs(spark, sf_dir)
            .groupBy(_md5(F.col("text")).alias("fp"))
            .agg(F.min("doc_id").alias("keeper_doc_id"),
                 F.count(F.lit(1)).alias("n_copies")))


@query("dedup_exact_survivors", oracle="""
SELECT doc_id, lang, source, n_chars FROM documents
WHERE doc_id IN (SELECT MIN(doc_id) FROM documents GROUP BY md5(text))
""")
def dedup_exact_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents surviving exact dedup (min doc_id per digest wins)."""
    d = _docs(spark, sf_dir)
    w = W.partitionBy(_md5(F.col("text"))).orderBy("doc_id")
    return (d.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("doc_id", "lang", "source", "n_chars"))


# ---------------------------------------------------------------------------
# MinHash + LSH near-duplicate detection
# (shingle → k minhashes → band → bucket-join → exact-jaccard verify)
# ---------------------------------------------------------------------------

# Shingle unit = word TRIGRAM: unigram token SETS are degenerate on a
# small-vocabulary corpus (every long doc converges to the full vocab
# → all pairs pass any threshold → quadratic output); order-sensitive
# trigrams separate true clone families (J≈1) from unrelated docs
# (J≈0) regardless of document length.
_N_HASHES = 16
_BANDS = (tuple(range(0, 8)), tuple(range(8, 16)))
_JACCARD_THRESHOLD = 0.6

# MinHash family: ONE md5 per shingle → 60-bit int x → 16 linear
# transforms (a_i·x + b_i) mod P. Replaces 16 md5-per-token (the old
# hot loop — measured 5.2s → ~3s at sf0.1). Constants sized so every
# intermediate fits signed 64-bit under Spark ANSI overflow checking:
# a_i < 2^16, x mod P < 2^31 → product < 2^47.
_MH_PRIME = 2147483647                      # 2^31 - 1
_MH_COEFFS = tuple((104729 * (i + 1) % 65521, 7919 * i + 13)
                   for i in range(_N_HASHES))
# 15 hex chars of md5 → bigint (60 bits, fits BIGINT in both engines)
_HEX15_SQL = "(" + " + ".join(
    f"(strpos('0123456789abcdef', substr(md5(sh), {p + 1}, 1)) - 1)"
    f" * {16 ** (14 - p)}" for p in range(15)) + ")"


_SHINGLE_SQL = """
  SELECT DISTINCT doc_id,
         unnest(list_transform(
             generate_series(1, len(string_split_regex(trim(text), ' +')) - 2),
             i -> string_split_regex(trim(text), ' +')[i] || ' ' ||
                  string_split_regex(trim(text), ' +')[i + 1] || ' ' ||
                  string_split_regex(trim(text), ' +')[i + 2])) AS sh
  FROM documents
"""


# Spark-parseable twin of the shingle CTE (tools/baseline_bench.py;
# semantics identical to _SHINGLE_SQL): explode a guarded index
# sequence instead of DuckDB's generate_series (sequence(1, n) runs
# DESCENDING when n < 1 under Spark semantics — short docs get an
# empty index array instead of an ANSI element_at error).
_SHINGLE_SPARK = """
  SELECT DISTINCT doc_id,
         concat_ws(' ', element_at(a, i), element_at(a, i + 1),
                   element_at(a, i + 2)) AS sh
  FROM (SELECT doc_id, split(trim(text), ' +') AS a FROM documents)
  LATERAL VIEW explode(if(size(a) >= 3, sequence(1, size(a) - 2),
                          cast(array() as array<int>))) AS i
"""
_HEX15_SPARK = "(" + " + ".join(
    f"(instr('0123456789abcdef', substr(md5(sh), {p + 1}, 1)) - 1)"
    f" * {16 ** (14 - p)}L" for p in range(15)) + ")"


def _minhash_spark_oracle() -> str:
    """Spark-SQL rendering of _minhash_sql_oracle (same CTE chain,
    same arithmetic) — used only as the plain-Spark baseline twin."""
    sig_cols = ", ".join(
        f"MIN(({a} * x + {b}) % {_MH_PRIME}) AS h{i}"
        for i, (a, b) in enumerate(_MH_COEFFS))
    band_exprs = ", ".join(
        "md5(" + " || '|' || ".join(f"CAST(h{i} AS STRING)" for i in band)
        + f") AS band{bi}"
        for bi, band in enumerate(_BANDS))
    band_union = "\nUNION\n".join(f"""
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b ON a.band{bi} = b.band{bi} AND a.doc_id < b.doc_id"""
                                    for bi in range(len(_BANDS)))
    return f"""
WITH toks AS ({_SHINGLE_SPARK}
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_tok FROM toks GROUP BY doc_id
), toksx AS (
  SELECT doc_id, {_HEX15_SPARK} % {_MH_PRIME} AS x FROM toks
), sigs AS (
  SELECT doc_id, {sig_cols} FROM toksx GROUP BY doc_id
), banded AS (
  SELECT doc_id, {band_exprs} FROM sigs
), cand AS ({band_union}
), inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
  FROM cand c
  JOIN toks ta ON ta.doc_id = c.doc_a
  JOIN toks tb ON tb.doc_id = c.doc_b AND tb.sh = ta.sh
  GROUP BY c.doc_a, c.doc_b
)
SELECT i.doc_a, i.doc_b,
       CAST(ROUND(CAST(i.n_common AS DOUBLE) / (sa.n_tok + sb.n_tok - i.n_common), 4) AS DOUBLE) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE CAST(i.n_common AS DOUBLE) / (sa.n_tok + sb.n_tok - i.n_common) >= {_JACCARD_THRESHOLD}
"""


def _minhash_sql_oracle() -> str:
    sig_cols = ", ".join(
        f"MIN(({a} * x + {b}) % {_MH_PRIME}) AS h{i}"
        for i, (a, b) in enumerate(_MH_COEFFS))
    band_exprs = ", ".join(
        "md5(" + " || '|' || ".join(f"CAST(h{i} AS VARCHAR)" for i in band)
        + f") AS band{bi}"
        for bi, band in enumerate(_BANDS))
    band_union = "\nUNION\n".join(f"""
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b ON a.band{bi} = b.band{bi} AND a.doc_id < b.doc_id"""
                                  for bi in range(len(_BANDS)))
    return f"""
WITH toks AS ({_SHINGLE_SQL}
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_tok FROM toks GROUP BY doc_id
), toksx AS (
  SELECT doc_id, {_HEX15_SQL} % {_MH_PRIME} AS x FROM toks
), sigs AS (
  SELECT doc_id, {sig_cols} FROM toksx GROUP BY doc_id
), banded AS (
  SELECT doc_id, {band_exprs} FROM sigs
), cand AS ({band_union}
), inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
  FROM cand c
  JOIN toks ta ON ta.doc_id = c.doc_a
  JOIN toks tb ON tb.doc_id = c.doc_b AND tb.sh = ta.sh
  GROUP BY c.doc_a, c.doc_b
)
SELECT i.doc_a, i.doc_b,
       CAST(ROUND(CAST(i.n_common AS DOUBLE) / (sa.n_tok + sb.n_tok - i.n_common), 4) AS DOUBLE) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE CAST(i.n_common AS DOUBLE) / (sa.n_tok + sb.n_tok - i.n_common) >= {_JACCARD_THRESHOLD}
"""


@query("dedup_minhash_lsh", oracle=_minhash_sql_oracle(),
       spark_oracle=_minhash_spark_oracle())
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs, verified with exact set Jaccard.

    Scale shape: the shingle set is per-document, so it is built
    ROW-LOCALLY (array_distinct over the trigram array — no explode,
    no shuffle); the 16 signature mins are array_min over transform —
    also narrow. The ONLY wide operations are the band-bucket
    self-join on 32-char digest keys and the tiny candidate-pair
    verify joins; the exact Jaccard is size(array_intersect) on the
    two cached per-doc sets instead of re-shuffling the exploded
    token relation. The O(n²) pair space is never materialized.
    """
    arr = F.col("arr")
    # sequence(1, n-2) runs DESCENDING when n < 3 and element_at then
    # hits an ANSI out-of-bounds — short docs get an empty shingle set
    tri = F.transform(
        F.when(F.size(arr) >= 3, F.sequence(F.lit(1), F.size(arr) - 2))
        .otherwise(F.array().cast("array<int>")),
        lambda i: F.concat_ws(" ", F.element_at(arr, i),
                              F.element_at(arr, i + 1),
                              F.element_at(arr, i + 2)))
    docsets = (_docs(spark, sf_dir)
               .select("doc_id",
                       F.split(F.trim(F.col("text")), " +").alias("arr"))
               .select("doc_id", F.array_distinct(tri).alias("shs"))
               .cache())
    # The row-local array_distinct makes the exploded relation already
    # duplicate-free per doc, so the signature aggregation needs ONE
    # wide shuffle with map-side partial mins (the previous plan paid
    # a global distinct shuffle first; an array_min-over-transform
    # variant avoids even this shuffle but loses whole-stage codegen —
    # higher-order functions are interpreted — and measures 2× slower).
    toks = docsets.select("doc_id", F.explode("shs").alias("sh"))
    # one md5 per shingle; 16 signature hashes are linear transforms of
    # its first 60 bits — integer codegen instead of 16 string digests
    x = (F.conv(F.substring(_md5(F.col("sh")), 1, 15), 16, 10)
         .cast("long") % _MH_PRIME)
    sigs = toks.select("doc_id", x.alias("x")).groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tok"),
        *[F.min((F.lit(a) * F.col("x") + F.lit(b)) % _MH_PRIME).alias(f"h{i}")
          for i, (a, b) in enumerate(_MH_COEFFS)])
    # bands stacked into (band_idx, bucket_key) rows → ONE self-join on
    # (bi, bk) instead of one join per band: same shuffle volume
    # (bands×n rows per side) but a single exchange+join stage rather
    # than 2×bands of them — measured 1.3s vs 2.1s at sf0.1
    bandkeys = sigs.select(
        "doc_id", "n_tok",
        F.explode(F.array(*[
            F.struct(F.lit(bi).alias("bi"),
                     _md5(F.concat_ws("|", *[F.col(f"h{i}").cast("string")
                                             for i in band])).alias("bk"))
            for bi, band in enumerate(_BANDS)])).alias("b")
        ).select("doc_id", "n_tok", "b.bi", "b.bk")
    a = bandkeys.select(F.col("doc_id").alias("doc_a"),
                        F.col("n_tok").alias("na"), "bi", "bk")
    b = bandkeys.select(F.col("doc_id").alias("doc_b"),
                        F.col("n_tok").alias("nb"), "bi", "bk")
    cand = (a.join(b, ["bi", "bk"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b", "na", "nb")
            .distinct())
    sa = docsets.select(F.col("doc_id").alias("doc_a"), F.col("shs").alias("sa"))
    sb = docsets.select(F.col("doc_id").alias("doc_b"), F.col("shs").alias("sb"))
    inter = (cand.join(sa, "doc_a").join(sb, "doc_b")
             .select("doc_a", "doc_b", "na", "nb",
                     F.size(F.array_intersect("sa", "sb")).alias("n_common")))
    jac = (F.col("n_common").cast("double")
           / (F.col("na") + F.col("nb") - F.col("n_common")))
    return (inter.filter(jac >= _JACCARD_THRESHOLD)
            .select("doc_a", "doc_b",
                    F.round(jac, 4).cast("double").alias("jaccard")))


# ---------------------------------------------------------------------------
# Text analysis (language-ID heuristic, token stats, quality, fingerprint)
# ---------------------------------------------------------------------------

@query("text_token_stats", oracle="""
SELECT doc_id,
       len(string_split_regex(trim(text), ' +')) AS n_tokens,
       LENGTH(text) AS len_chars,
       CAST(ROUND(CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
                  / len(string_split_regex(trim(text), ' +')), 3) AS DOUBLE) AS avg_token_len
FROM documents
""")
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting + average token length (JVM-side)."""
    d = _docs(spark, sf_dir)
    n_tok = F.size(F.split(F.trim(F.col("text")), " +"))
    return d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.length("text").alias("len_chars"),
        F.round(F.length(F.regexp_replace("text", " ", "")).cast("double") / n_tok, 3)
        .cast("double").alias("avg_token_len"))


@query("text_quality_score", oracle="""
SELECT doc_id,
       n_tokens,
       vowel_ratio,
       CASE WHEN n_tokens >= 40 AND vowel_ratio BETWEEN 0.2 AND 0.6 THEN 'high'
            WHEN n_tokens >= 15 THEN 'medium'
            ELSE 'low' END AS quality_band
FROM (
  SELECT doc_id,
         len(string_split_regex(trim(text), ' +')) AS n_tokens,
         CAST(ROUND(CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[aeiou]', '', 'g')) AS DOUBLE)
                    / LENGTH(text), 4) AS DOUBLE) AS vowel_ratio
  FROM documents) t
""")
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring from length + character-class ratios."""
    d = _docs(spark, sf_dir)
    n_tok = F.size(F.split(F.trim(F.col("text")), " +"))
    vowel_ratio = F.round(
        (F.length("text") - F.length(F.regexp_replace("text", "[aeiou]", "")))
        .cast("double") / F.length("text"), 4).cast("double")
    scored = d.select("doc_id", n_tok.alias("n_tokens"), vowel_ratio.alias("vowel_ratio"))
    return scored.select(
        "doc_id", "n_tokens", "vowel_ratio",
        F.when((F.col("n_tokens") >= 40)
               & F.col("vowel_ratio").between(0.2, 0.6), "high")
         .when(F.col("n_tokens") >= 15, "medium")
         .otherwise("low").alias("quality_band"))


@query("text_repetition_filters", oracle="""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS ws FROM documents
), words AS (
  SELECT doc_id, unnest(ws) AS w FROM toks
), wcount AS (
  SELECT doc_id, COUNT(*) AS n_words, COUNT(DISTINCT w) AS n_distinct
  FROM words GROUP BY doc_id
), topw AS (
  SELECT doc_id, MAX(c) AS top_w FROM (
    SELECT doc_id, w, COUNT(*) AS c FROM words GROUP BY doc_id, w)
  GROUP BY doc_id
), bg AS (
  SELECT t.doc_id, list_extract(ws, i) || ' ' || list_extract(ws, i + 1) AS g
  FROM toks t, unnest(range(1, len(ws))) AS r(i)
), topg AS (
  SELECT doc_id, MAX(c) AS top_g FROM (
    SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY doc_id, g)
  GROUP BY doc_id
)
SELECT w.doc_id, w.n_words, w.n_distinct,
       CAST(ROUND(CAST(t.top_w AS DOUBLE) / w.n_words, 4) AS DOUBLE)
         AS top_word_frac,
       CAST(ROUND(CAST(COALESCE(g.top_g, 0) AS DOUBLE)
                  / GREATEST(w.n_words - 1, 1), 4) AS DOUBLE)
         AS top_bigram_frac,
       CAST(ROUND(CAST(t.top_w AS DOUBLE) / w.n_words, 4) > 0.12
            OR CAST(ROUND(CAST(COALESCE(g.top_g, 0) AS DOUBLE)
                          / GREATEST(w.n_words - 1, 1), 4) AS DOUBLE) > 0.08
            AS BOOLEAN) AS is_repetitive
FROM wcount w JOIN topw t USING (doc_id) LEFT JOIN topg g USING (doc_id)
""")
def text_repetition_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals (top-word / top-bigram
    fraction) with ZERO shuffles: per-document sorted-array fold
    (functions/repetition.py) instead of the explode→groupBy
    every-token shuffle the oracle uses. The plan is scan+project —
    the shape that survives 100 TB."""
    from ..functions.repetition import (bigrams, distinct_count,
                                        max_run_count, tokens)
    d = _docs(spark, sf_dir)
    ws = tokens(F.col("text"))
    doc = d.select("doc_id", ws.alias("ws"))
    n = F.size("ws")
    top_w = F.round(max_run_count(F.col("ws")).cast("double") / n, 4) \
        .cast("double")
    top_g = F.round(max_run_count(bigrams(F.col("ws"))).cast("double")
                    / F.greatest(n - 1, F.lit(1)), 4).cast("double")
    return doc.select(
        "doc_id", n.alias("n_words"),
        distinct_count(F.col("ws")).alias("n_distinct"),
        top_w.alias("top_word_frac"), top_g.alias("top_bigram_frac"),
        ((top_w > 0.12) | (top_g > 0.08)).alias("is_repetitive"))


@query("text_lang_heuristic", oracle="""
SELECT lang,
       CASE WHEN ' ' || text || ' ' LIKE '% the %' THEN 'en' ELSE 'other' END AS pred_lang,
       COUNT(*) AS n_docs
FROM documents
GROUP BY 1, 2
""")
def text_lang_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic (stopword marker) vs the labeled lang col."""
    d = _docs(spark, sf_dir)
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    pred = F.when(padded.like("% the %"), "en").otherwise("other")
    return (d.select("lang", pred.alias("pred_lang"))
            .groupBy("lang", "pred_lang")
            .agg(F.count(F.lit(1)).alias("n_docs")))


# Spark twin: regexp_replace is global by default (no 'g' flag arg —
# Spark's 4th parameter is a start position, not flags)
@query("text_fingerprint", oracle="""
SELECT doc_id,
       md5(lower(regexp_replace(trim(text), ' +', ' ', 'g'))) AS fingerprint
FROM documents
""", spark_oracle="""
SELECT doc_id,
       md5(lower(regexp_replace(trim(text), ' +', ' '))) AS fingerprint
FROM documents
""")
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized content fingerprint (whitespace-collapse + casefold)."""
    d = _docs(spark, sf_dir)
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), " +", " "))
    return d.select("doc_id", _md5(norm).alias("fingerprint"))


# GPT-2-ish pretokenizer classes: letter runs, digit runs, single
# non-alphanumeric marks — the BPE-input segmentation (identical regex
# dialect subset in Spark's Java regex and DuckDB's RE2)
_BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


@query("text_bpe_tokens", oracle=f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_BPE_RE}')) AS INT) AS n_bpe,
       CAST(len(list_distinct(regexp_extract_all(text, '{_BPE_RE}'))) AS INT)
         AS n_unique_bpe,
       CAST(len(string_split_regex(trim(text), ' +')) AS INT) AS n_ws
FROM documents
""")
def text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style token counting next to the whitespace count
    (training-data cost estimation): regexp_extract_all with a
    pretokenizer-class regex, all JVM-side."""
    d = _docs(spark, sf_dir)
    toks = F.regexp_extract_all(F.col("text"), F.lit(_BPE_RE), 0)
    ws = F.split(F.trim(F.col("text")), " +")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_bpe"),
        F.size(F.array_distinct(toks)).alias("n_unique_bpe"),
        F.size(ws).alias("n_ws"))


@query("docs_by_source_stats", oracle="""
SELECT source, lang, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(ROUND(AVG(n_chars), 2) AS DOUBLE) AS avg_chars
FROM documents GROUP BY source, lang
""")
def docs_by_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (_docs(spark, sf_dir)
            .groupBy("source", "lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_chars").alias("total_chars"),
                 F.round(F.avg("n_chars"), 2).cast("double").alias("avg_chars")))


# ---------------------------------------------------------------------------
# Embedding similarity search (brute-force cosine top-k baseline; the
# scale paths are the LSH multi-probe and IVF inverted-list variants —
# queries/dedup_extra.py similarity_ann_lsh / similarity_ann_ivf,
# reusable operators in operators/similarity.py)
# ---------------------------------------------------------------------------

_N_QUERY_VECS = 10
_TOP_K = 5


_DOT_SPARK = ("aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
              "CAST(0.0 AS DOUBLE), (acc, z) -> acc + z)")


def _cosine_topk_spark_oracle() -> str:
    dbl = "transform(embedding, x -> CAST(x AS DOUBLE))"
    return f"""
WITH q AS (SELECT vec_id AS q_id, {dbl} AS qv FROM embeddings WHERE vec_id < {_N_QUERY_VECS}),
c AS (SELECT vec_id AS c_id, {dbl} AS cv FROM embeddings WHERE vec_id >= {_N_QUERY_VECS}),
scored AS (
  SELECT q_id, c_id,
         CAST(ROUND({_DOT_SPARK.format(a='qv', b='cv')} / (sqrt({_DOT_SPARK.format(a='qv', b='qv')}) * sqrt({_DOT_SPARK.format(a='cv', b='cv')})), 6) AS DOUBLE) AS cos_sim
  FROM q CROSS JOIN c
), ranked AS (
  SELECT q_id, c_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, c_id) AS rk
  FROM scored)
SELECT q_id, c_id, cos_sim, rk FROM ranked WHERE rk <= {_TOP_K}
"""


@query("similarity_cosine_topk",
       spark_oracle=_cosine_topk_spark_oracle(), oracle=f"""
WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < {_N_QUERY_VECS}),
c AS (SELECT vec_id AS c_id, embedding::DOUBLE[] AS cv FROM embeddings WHERE vec_id >= {_N_QUERY_VECS}),
scored AS (
  SELECT q_id, c_id,
         CAST(ROUND(list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6) AS DOUBLE) AS cos_sim
  FROM q, c
), ranked AS (
  SELECT q_id, c_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, c_id) AS rk
  FROM scored)
SELECT q_id, c_id, cos_sim, rk FROM ranked WHERE rk <= {_TOP_K}
""")
def similarity_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: broadcast the query set against the
    corpus; dot products via zip_with/aggregate (JVM-side, no UDF).
    Ranking uses ROUND(cos,6) with vec_id tiebreak so engine and oracle
    select identical neighbors."""
    emb = load_table(spark, sf_dir, "embeddings")
    to_double = lambda c: F.transform(F.col(c), lambda x: x.cast("double"))  # noqa: E731
    q = (emb.filter(F.col("vec_id") < _N_QUERY_VECS)
         .select(F.col("vec_id").alias("q_id"), to_double("embedding").alias("qv")))
    c = (emb.filter(F.col("vec_id") >= _N_QUERY_VECS)
         .select(F.col("vec_id").alias("c_id"), to_double("embedding").alias("cv")))

    def dot(a: str, b: str) -> F.Column:
        return F.aggregate(F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
                           F.lit(0.0), lambda acc, x: acc + x)

    scored = (c.crossJoin(F.broadcast(q))
              .select("q_id", "c_id",
                      F.round(dot("qv", "cv")
                              / (F.sqrt(dot("qv", "qv")) * F.sqrt(dot("cv", "cv"))), 6)
                      .cast("double").alias("cos_sim")))
    w = W.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("c_id"))
    return (scored.select("q_id", "c_id", "cos_sim",
                          F.row_number().over(w).alias("rk"))
            .filter(F.col("rk") <= _TOP_K))


@query("embeddings_label_stats", oracle="""
SELECT label, COUNT(*) AS n_vecs,
       CAST(ROUND(AVG(embedding[1]), 5) AS DOUBLE) AS avg_first_dim,
       CAST(ROUND(AVG(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 4) AS DOUBLE) AS avg_sq_norm
FROM embeddings GROUP BY label
""")
def embeddings_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-column aggregation surface (element access + fold)."""
    emb = load_table(spark, sf_dir, "embeddings")
    dv = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    sq_norm = F.aggregate(F.zip_with(dv, dv, lambda x, y: x * y),
                          F.lit(0.0), lambda acc, x: acc + x)
    return (emb.groupBy("label")
            .agg(F.count(F.lit(1)).alias("n_vecs"),
                 F.round(F.avg(F.col("embedding")[0].cast("double")), 5)
                 .cast("double").alias("avg_first_dim"),
                 F.round(F.avg(sq_norm), 4).cast("double").alias("avg_sq_norm")))


@query("agg_heavy_hitters", oracle="""
SELECT w AS key, COUNT(*) AS cnt
FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w
      FROM documents) t
WHERE w != ''
GROUP BY w
ORDER BY cnt DESC, w
LIMIT 10
""")
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT top-10 most frequent words WITHOUT shuffling the key
    space (operators/heavyhitters.py): per-partition Misra–Gries
    summaries (bounded memory, streaming over Arrow batches), a
    pigeonhole-sound candidate union, then one candidate-only exact
    aggregation. The function RAISES unless exactness is certified
    (k-th count > N/m or full mass coverage), so a green hash here
    proves summary → refine ≡ the oracle's full groupBy."""
    from ..operators.heavyhitters import heavy_hitters
    d = _docs(spark, sf_dir)
    words = d.select(F.explode(F.split(F.trim("text"), r"\s+"))
                     .alias("w")).filter("w != ''")
    return heavy_hitters(words, "w", k=10, m=256)
