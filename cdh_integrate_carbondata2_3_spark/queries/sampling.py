"""Deterministic sampling / chunking / curation operators for
training-data pipelines — beyond the reference's surface (SURVEY.md §7
watch-list), alongside the dedup family in ``pipeline.py``.

Everything here is *deterministic* (content/id-hash driven, no RNG) so
runs are reproducible and resumable at 100 TB: a re-run after a failed
stage selects exactly the same rows, and the DuckDB oracle can recompute
the selection bit-for-bit. All operators are pure built-in-function
DataFrame ops — the sampling predicates are map-side (no shuffle at
all), chunking is one generator-explode (no shuffle), and the shard /
funnel summaries aggregate on a handful of keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from . import query
from .pipeline import _docs

# md5 of the *decimal string* of doc_id — identical in Spark
# (md5(cast(cast(id as string) as binary))) and DuckDB
# (md5(CAST(id AS VARCHAR))), so both engines pick the same rows.


def _id_hash(col: str = "doc_id") -> F.Column:
    return F.md5(F.col(col).cast("string").cast("binary"))


_ID_HASH_SQL = "md5(CAST(doc_id AS VARCHAR))"
# Spark spelling of the same id hash (md5 of the decimal string)
_ID_HASH_SPARK = "md5(CAST(doc_id AS STRING))"


@query("sample_hash_bernoulli", oracle=f"""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE {_ID_HASH_SQL} < '1a'
""")
def sample_hash_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% deterministic Bernoulli sample: keep rows whose id-hash falls
    below a hex threshold ('1a'/'100' ≈ 10.2%). Map-side predicate only —
    at 100 TB this is a pure scan-filter, no shuffle, and the same rows
    survive on every re-run (unlike ``df.sample`` whose seed interacts
    with partitioning)."""
    return (_docs(spark, sf_dir)
            .filter(_id_hash() < "1a")
            .select("doc_id", "lang", "source", "n_chars"))


_STRAT_BODY = """
SELECT doc_id, lang, n_chars
FROM documents
WHERE {h} < CASE WHEN lang = 'en' THEN '8'
                 WHEN lang IN ('es', 'fr') THEN '4'
                 ELSE '1' END
"""


@query("sample_stratified_lang",
       oracle=_STRAT_BODY.format(h=_ID_HASH_SQL),
       spark_oracle=_STRAT_BODY.format(h=_ID_HASH_SPARK))
def sample_stratified_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling with per-stratum rates (en 50%, es/fr 25%,
    rest ~6%) — the standard language-rebalancing step of a pretraining
    mix. The rate table is inlined as a CASE expression (broadcast-free,
    whole-stage codegen); scale cost is identical to a plain filter."""
    threshold = (F.when(F.col("lang") == "en", F.lit("8"))
                 .when(F.col("lang").isin("es", "fr"), F.lit("4"))
                 .otherwise(F.lit("1")))
    return (_docs(spark, sf_dir)
            .filter(_id_hash() < threshold)
            .select("doc_id", "lang", "n_chars"))


@query("sample_reservoir_per_source", oracle=f"""
SELECT source, doc_id, rk FROM (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY {_ID_HASH_SQL}, doc_id) AS rk
  FROM documents) t
WHERE rk <= 5
""")
def sample_reservoir_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-group 'reservoir': the k docs with the
    smallest id-hash per source. One hash-partitioned window (single
    shuffle on source); because the order key is a uniform hash this is
    an unbiased uniform sample per group, yet reproducible. At scale,
    rank-k selection via window + early filter lets AQE collapse the
    post-filter tiny output."""
    w = W.partitionBy("source").orderBy(_id_hash(), "doc_id")
    return (_docs(spark, sf_dir)
            .select("source", "doc_id", F.row_number().over(w).alias("rk"))
            .filter(F.col("rk") <= 5))


_CHUNK = 64  # tokens per training chunk
# stride == chunk (non-overlapping); a doc with n tokens yields
# floor((n-1)/CHUNK)+1 chunks, the last one ragged.


@query("text_chunk_windows", oracle=f"""
SELECT doc_id,
       CAST(k AS INT) AS chunk_no,
       CAST(len(list_slice(toks, k * {_CHUNK} + 1, k * {_CHUNK} + {_CHUNK})) AS INT)
         AS n_tokens,
       md5(array_to_string(list_slice(toks, k * {_CHUNK} + 1,
                                      k * {_CHUNK} + {_CHUNK}), ' ')) AS chunk_digest
FROM (SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
      FROM documents) d,
     unnest(generate_series(0, CAST(floor((len(toks) - 1) / {_CHUNK}.0) AS BIGINT)))
       AS t(k)
""", spark_oracle=f"""
SELECT doc_id,
       CAST(k AS INT) AS chunk_no,
       CAST(size(slice(toks, k * {_CHUNK} + 1, {_CHUNK})) AS INT)
         AS n_tokens,
       md5(concat_ws(' ', slice(toks, k * {_CHUNK} + 1, {_CHUNK})))
         AS chunk_digest
FROM (SELECT doc_id, split(trim(text), ' +') AS toks
      FROM documents) d
LATERAL VIEW explode(sequence(0,
    CAST(floor((size(toks) - 1) / {_CHUNK}.0) AS INT))) t AS k
""")
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split each document into fixed-size token windows (context-window
    packing for LLM training). One narrow generator-explode per doc — no
    shuffle; emitting a digest instead of the chunk text keeps the
    output row ~50 bytes regardless of chunk size."""
    d = (_docs(spark, sf_dir)
         .select("doc_id", F.split(F.trim(F.col("text")), " +").alias("toks")))
    n_chunks_minus1 = F.floor((F.size("toks") - 1) / _CHUNK).cast("int")
    chunk = F.slice(F.col("toks"), F.col("chunk_no") * _CHUNK + 1, _CHUNK)
    return (d.select("doc_id", "toks",
                     F.explode(F.sequence(F.lit(0), n_chunks_minus1))
                     .alias("chunk_no"))
            .select("doc_id", "chunk_no",
                    F.size(chunk).alias("n_tokens"),
                    F.md5(F.concat_ws(" ", chunk).cast("binary"))
                    .alias("chunk_digest")))


_STOPWORDS = ("the", "a", "of", "and", "to", "in")
_STOP_SQL = ", ".join(f"'{s}'" for s in _STOPWORDS)


@query("quality_filter_funnel", oracle=f"""
WITH d AS (
  SELECT lang, n_chars,
         len(list_filter(string_split_regex(trim(text), ' +'),
                         t -> t IN ({_STOP_SQL})))
           / CAST(len(string_split_regex(trim(text), ' +')) AS DOUBLE) AS stop_ratio
  FROM documents)
SELECT '00_total' AS stage, COUNT(*) AS n_docs FROM d
UNION ALL
SELECT '10_lang', COUNT(*) FROM d WHERE lang IN ('en', 'es')
UNION ALL
SELECT '20_length', COUNT(*) FROM d
 WHERE lang IN ('en', 'es') AND n_chars BETWEEN 100 AND 450
UNION ALL
SELECT '30_stop_ratio', COUNT(*) FROM d
 WHERE lang IN ('en', 'es') AND n_chars BETWEEN 100 AND 450
   AND stop_ratio <= 0.06
""")
def quality_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-stage quality-filter funnel with per-stage survivor counts
    (the acceptance report every curation pipeline needs). Computed in
    ONE scan: each stage is a conditional count over the same pass —
    not four scans — so at 100 TB it costs exactly one read."""
    toks = F.split(F.trim(F.col("text")), " +")
    stop_ratio = (F.size(F.filter(toks, lambda t: t.isin(*_STOPWORDS)))
                  / F.size(toks).cast("double"))
    d = _docs(spark, sf_dir).select(
        "lang", "n_chars", stop_ratio.alias("stop_ratio"))
    lang_ok = F.col("lang").isin("en", "es")
    len_ok = lang_ok & F.col("n_chars").between(100, 450)
    ratio_ok = len_ok & (F.col("stop_ratio") <= 0.06)
    agg = d.agg(
        F.count(F.lit(1)).alias("00_total"),
        F.count_if(lang_ok).alias("10_lang"),
        F.count_if(len_ok).alias("20_length"),
        F.count_if(ratio_ok).alias("30_stop_ratio"))
    stack = F.explode(F.map_from_arrays(
        F.array(*[F.lit(c) for c in agg.columns]),
        F.array(*[F.col(f"`{c}`") for c in agg.columns])))
    return agg.select(stack.alias("stage", "n_docs"))


_N_SHARDS = 8


@query("sample_train_shards", oracle=f"""
SELECT CAST((strpos('0123456789abcdef', substr({_ID_HASH_SQL}, 1, 1)) - 1)
            % {_N_SHARDS} AS INT) AS shard_id,
       COUNT(*) AS n_docs,
       MIN(doc_id) AS min_doc,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY 1
""")
def sample_train_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic shard assignment for training-data ordering: shard
    = first hex nibble of the id-hash mod N. Pure map-side expression +
    an aggregate over N keys (partial agg collapses everything before
    the single tiny shuffle) — the write path would be
    ``.repartition(shard_id).write`` with identical cost shape."""
    shard = (F.conv(F.substring(_id_hash(), 1, 1), 16, 10)
             .cast("int") % _N_SHARDS)
    return (_docs(spark, sf_dir)
            .groupBy(shard.alias("shard_id"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min("doc_id").alias("min_doc"),
                 F.sum("n_chars").alias("total_chars")))


_W_HEX = ("(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), {p}, 1)) - 1)")
_W_U16_SQL = " + ".join(
    f"({_W_HEX.format(p=i + 1)}) * {16 ** (3 - i)}" for i in range(4))
_W_DENOM = 20_000     # weight scale: p(keep) = min(1, n_chars / 20000)


@query("sample_weighted_tokens", oracle=f"""
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_sampled,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc
FROM documents
WHERE ({_W_U16_SQL}) * {_W_DENOM} < n_chars * 65536
GROUP BY lang
""")
def sample_weighted_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic WEIGHTED Bernoulli sample: p(keep) proportional
    to document length (the token-budget-aware sampling a training mix
    uses — long docs carry more tokens, so equal-probability sampling
    under-weights them). The uniform draw is the first 16 bits of the
    id md5; the comparison is pure integer arithmetic
    (u16 * DENOM < n_chars * 2^16) so both engines decide identically
    with no float threshold. Map-side predicate only — a scan-filter
    at any scale, reproducible across reruns and partitionings."""
    d = _docs(spark, sf_dir)
    u16 = F.conv(F.substring(_id_hash(), 1, 4), 16, 10).cast("long")
    return (d.filter(u16 * _W_DENOM < F.col("n_chars") * 65536)
            .groupBy("lang")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_sampled"),
                 F.sum("n_chars").cast("bigint").alias("sum_chars"),
                 F.min("doc_id").cast("bigint").alias("min_doc")))


_TEMP_MIX_BODY = """
WITH counts AS (
  SELECT source, COUNT(*) AS n_s FROM documents GROUP BY source
), m AS (SELECT MIN(n_s) AS n_min FROM counts)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_sampled,
       CAST(MIN(d.doc_id) AS BIGINT) AS min_doc
FROM documents d, counts c, m
WHERE d.source = c.source
  AND ({u16}) * ({u16}) * c.n_s < m.n_min * 4294967296
GROUP BY d.source
"""

# Spark spelling of the first-4-hex-digits uniform: conv() instead of
# the DuckDB strpos ladder — the same u16 integer
_W_U16_SPARK = ("CAST(conv(substring(md5(CAST(d.doc_id AS STRING)), "
                "1, 4), 16, 10) AS BIGINT)")


@query("sample_temperature_mix",
       oracle=_TEMP_MIX_BODY.format(u16=_W_U16_SQL),
       spark_oracle=_TEMP_MIX_BODY.format(u16=_W_U16_SPARK))
def sample_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing (mT5-style, alpha = 0.5):
    p(keep | source s) = sqrt(n_min / n_s), so over-represented
    sources are downsampled toward the rarest one. The sqrt never
    materializes — the Bernoulli test is the integer comparison
    u16^2 * n_s < n_min * 2^32, so both engines decide identically.
    Shape at scale: one tiny per-source count agg broadcast back, then
    a map-side filter — the corpus itself never shuffles."""
    d = _docs(spark, sf_dir)
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    n_min = counts.agg(F.min("n_s").alias("n_min"))
    u16 = F.conv(F.substring(_id_hash(), 1, 4), 16, 10).cast("long")
    return (d.join(F.broadcast(counts), "source")
            .crossJoin(F.broadcast(n_min))
            .filter(u16 * u16 * F.col("n_s")
                    < F.col("n_min") * F.lit(4294967296))
            .groupBy("source")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_sampled"),
                 F.min("doc_id").cast("bigint").alias("min_doc")))


_BUDGET_CHARS = 30_000


@query("sample_token_budget", oracle=f"""
SELECT doc_id, source, n_chars, cum_chars
FROM (
  SELECT doc_id, source, n_chars,
         CAST(SUM(n_chars) OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS BIGINT)
           AS cum_chars
  FROM documents
) t
WHERE cum_chars <= {_BUDGET_CHARS}
""")
def sample_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus selection: per source, keep the longest
    documents while the running character total stays within budget —
    the 'fill each domain's token quota, best-first' step of a
    training-mix builder (quality score would replace n_chars in
    production; n_chars keeps the oracle exact). One shuffle by
    source; integer cumulative sums, so the cut is engine-exact. A
    skewed source partitions onto one task — mitigate with
    operators/skew.py salting when a single domain dominates."""
    d = _docs(spark, sf_dir)
    w = (W.partitionBy("source")
         .orderBy(F.desc("n_chars"), "doc_id")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    return (d.select("doc_id", "source", "n_chars",
                     F.sum("n_chars").over(w).alias("cum_chars"))
            .filter(F.col("cum_chars") <= _BUDGET_CHARS))


_PARETO_DOMINATES_2D = """q.n_tokens >= p.n_tokens AND q.n_uniq >= p.n_uniq
      AND (q.n_tokens > p.n_tokens OR q.n_uniq > p.n_uniq)"""


@query("select_pareto_skyline", oracle=f"""
WITH m AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(trim(text), ' +'),
             t -> t <> '')) AS n_tokens,
         len(list_distinct(list_filter(string_split_regex(trim(text), ' +'),
             t -> t <> ''))) AS n_uniq
  FROM documents
)
SELECT doc_id, n_tokens, n_uniq
FROM m p
WHERE NOT EXISTS (
  SELECT 1 FROM m q WHERE {_PARETO_DOMINATES_2D})
""")
def select_pareto_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto-optimal (skyline) document selection on two competing
    quality signals — token count and lexical diversity (distinct
    tokens), both maximized: keep documents no other document beats
    on BOTH axes. The frontier replaces a weighted-sum quality cutoff
    whose weights are arbitrary. 2-criteria fast path
    (operators/skyline.py): one window over DISTINCT criterion pairs
    (sorted (c1 DESC, c2 DESC), survive iff c2 beats the running max
    of strictly-earlier rows) + a semi-join back — fully declarative,
    one sort shuffle of the distinct pairs, no O(n²) dominance scan.
    The oracle IS the O(n²) NOT-EXISTS dominance definition, so a
    wrong frontier cannot hash-match. Published Spark integration:
    'Integration of Skyline Queries into Spark SQL' (EDBT 2023)."""
    from ..operators.skyline import skyline
    d = _docs(spark, sf_dir)
    toks = F.filter(F.split(F.trim(F.col("text")), " +"),
                    lambda t: t != F.lit(""))
    m = d.select("doc_id",
                 F.size(toks).alias("n_tokens"),
                 F.size(F.array_distinct(toks)).alias("n_uniq"))
    return skyline(m, ["n_tokens", "n_uniq"])


_PARETO3_SPARK_ORACLE = r"""
WITH m AS (
  SELECT doc_id,
         size(filter(split(trim(text), ' +'), t -> t != '')) AS n_tokens,
         size(array_distinct(filter(split(trim(text), ' +'),
              t -> t != ''))) AS n_uniq,
         length(regexp_replace(text, '\\s', '')) AS n_chars
  FROM documents
)
SELECT doc_id, n_tokens, n_uniq, n_chars
FROM m p
WHERE NOT EXISTS (
  SELECT 1 FROM m q
  WHERE q.n_tokens >= p.n_tokens AND q.n_uniq >= p.n_uniq
    AND q.n_chars <= p.n_chars
    AND (q.n_tokens > p.n_tokens OR q.n_uniq > p.n_uniq
         OR q.n_chars < p.n_chars))
"""


@query("select_pareto_multid", spark_oracle=_PARETO3_SPARK_ORACLE,
       oracle=f"""
WITH m AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(trim(text), ' +'),
             t -> t <> '')) AS n_tokens,
         len(list_distinct(list_filter(string_split_regex(trim(text), ' +'),
             t -> t <> ''))) AS n_uniq,
         length(regexp_replace(text, '\\s', '', 'g')) AS n_chars
  FROM documents
)
SELECT doc_id, n_tokens, n_uniq, n_chars
FROM m p
WHERE NOT EXISTS (
  SELECT 1 FROM m q
  WHERE q.n_tokens >= p.n_tokens AND q.n_uniq >= p.n_uniq
    AND q.n_chars <= p.n_chars
    AND (q.n_tokens > p.n_tokens OR q.n_uniq > p.n_uniq
         OR q.n_chars < p.n_chars))
""")
def select_pareto_multid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-criteria skyline with mixed directions — maximize tokens and
    lexical diversity, MINIMIZE total characters (prefer dense docs):
    the general-d two-phase path (operators/skyline.py _skyline_nd):
    per-Arrow-batch local frontiers (each a sound superset member
    filter), then one exact pass over the tiny candidate union.
    At 100 TB the corpus never concentrates — only the local
    frontiers do, with an explicit max_candidates guard instead of a
    silent OOM. Oracle: the O(n²) dominance definition with the
    direction flips inline."""
    from ..operators.skyline import skyline
    d = _docs(spark, sf_dir)
    toks = F.filter(F.split(F.trim(F.col("text")), " +"),
                    lambda t: t != F.lit(""))
    m = d.select("doc_id",
                 F.size(toks).alias("n_tokens"),
                 F.size(F.array_distinct(toks)).alias("n_uniq"),
                 F.length(F.regexp_replace(F.col("text"), r"\s", ""))
                 .alias("n_chars"))
    return skyline(m, ["n_tokens", "n_uniq", "n_chars"],
                   ["max", "max", "min"])


_ALLOC_BUDGET = 200


@query("sample_exact_allocation", oracle=f"""
WITH sizes AS (
  SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
), tot AS (SELECT SUM(n) AS t FROM sizes),
q AS (
  SELECT lang, n,
         CAST(FLOOR({_ALLOC_BUDGET}.0 * n / t) AS BIGINT) AS fq,
         ({_ALLOC_BUDGET}.0 * n / t)
           - FLOOR({_ALLOC_BUDGET}.0 * n / t) AS rem
  FROM sizes, tot
), lo AS (SELECT {_ALLOC_BUDGET} - SUM(fq) AS leftover FROM q),
quota AS (
  SELECT lang, fq + CASE WHEN
           ROW_NUMBER() OVER (ORDER BY rem DESC, lang) <= leftover
         THEN 1 ELSE 0 END AS quota
  FROM q, lo
), picked AS (
  SELECT d.doc_id, d.lang FROM (
    SELECT doc_id, lang,
           ROW_NUMBER() OVER (PARTITION BY lang
                              ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                       doc_id) AS rn
    FROM documents) d JOIN quota ON quota.lang = d.lang
  WHERE d.rn <= quota.quota)
SELECT doc_id, lang FROM picked
""")
def sample_exact_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-budget stratified selection via the largest-remainder
    method: a total budget of {B} rows is split across strata
    proportionally (floor quotas, then the leftover goes to the
    largest fractional remainders — the apportionment rule that
    guarantees ΣQuota == B exactly, unlike per-stratum Bernoulli
    whose total is only correct in expectation), and each stratum
    contributes its deterministic md5-ranked top-quota docs. The
    eval-set builder's contract: byte-stable across runs AND exactly
    B rows. Scale: sizes are one tiny groupBy; selection is one
    per-stratum window rank (shuffles by stratum, no global sort)."""
    d = _docs(spark, sf_dir).select("doc_id", "lang")
    sizes = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    tot = sizes.agg(F.sum("n").alias("t"))
    exact = (F.lit(float(_ALLOC_BUDGET)) * F.col("n") / F.col("t"))
    q = (sizes.crossJoin(F.broadcast(tot))
         .select("lang", "n", F.floor(exact).cast("bigint").alias("fq"),
                 (exact - F.floor(exact)).alias("rem")))
    lo = q.agg((F.lit(_ALLOC_BUDGET) - F.sum("fq")).alias("leftover"))
    # global window over the QUOTA frame — one row per language
    # (bounded by distinct strata, never corpus-sized)
    wq = W.orderBy(F.desc("rem"), F.asc("lang"))
    quota = (q.crossJoin(F.broadcast(lo))
             .select("lang",
                     (F.col("fq")
                      + F.when(F.row_number().over(wq)
                               <= F.col("leftover"), 1).otherwise(0))
                     .alias("quota")))
    wr = W.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.asc("doc_id"))
    return (d.select("doc_id", "lang", F.row_number().over(wr).alias("rn"))
            .join(F.broadcast(quota), "lang")
            .filter(F.col("rn") <= F.col("quota"))
            .select("doc_id", "lang"))


_HIST_BUCKETS = 8


@query("stats_equidepth_histogram", oracle=f"""
SELECT b AS bucket, COUNT(*) AS n_rows,
       CAST(MIN(p) AS DOUBLE) AS lo,
       CAST(MAX(p) AS DOUBLE) AS hi
FROM (SELECT CAST(o_totalprice AS DOUBLE) AS p,
             NTILE({_HIST_BUCKETS}) OVER (ORDER BY CAST(o_totalprice AS DOUBLE),
                                          o_orderkey) AS b
      FROM orders)
GROUP BY b
""")
def stats_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-height) histogram — the profiling primitive
    behind optimizer selectivity estimates and skew detection: k
    buckets of equal row count with their [lo, hi] value bounds. The
    tie-break column (o_orderkey) makes NTILE's assignment a total
    order, so both engines produce identical buckets bit-for-bit —
    without it, rows with equal values straddle bucket boundaries
    nondeterministically. Scale note: a global NTILE sorts one
    column; for 100 TB use approxQuantile bounds instead (the
    z-order writer's sketch path) — this operator is the EXACT
    variant for when bucket counts must be exact."""
    from ..sources.registry import load_table

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").cast("double").alias("p"), "o_orderkey")
    # global NTILE is THIS operator's exact semantics (docstring:
    # the 100 TB path is approxQuantile bounds; this is the exact
    # variant, matched bit-for-bit by the DuckDB oracle's NTILE)
    wb = W.orderBy(F.asc("p"), F.asc("o_orderkey"))
    return (o.select("p", F.ntile(_HIST_BUCKETS).over(wb).alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.min("p").cast("double").alias("lo"),
                 F.max("p").cast("double").alias("hi")))


# ---------------------------------------------------------------------------
# Weighted sampling WITHOUT replacement (round 9) — Efraimidis &
# Spirakis 2006 A-Res: draw u ~ U(0,1) per item, rank by the key
# ln(u)/w (equivalently u^(1/w)) and keep the k LARGEST per group.
# Inclusion probabilities are exactly the sequential weighted
# draw-without-replacement process; with the uniform derived from the
# id md5 the whole sample is deterministic and SQL-replayable — the
# corpus-mixing primitive for "pick k docs per stratum, long docs
# proportionally more likely, never twice".
# ---------------------------------------------------------------------------

_ES_K = 4             # docs kept per language
_ES_HEX12_SQL = "(" + " + ".join(
    f"({_W_HEX.format(p=i + 1)}) * {16 ** (11 - i)}" for i in range(12)
) + ")"
_ES_DENOM = float(16 ** 12)


def weighted_sample_wor(df, group_cols, weight_col, k, *,
                        id_col: str = "doc_id"):
    """k-per-group weighted sample without replacement (A-Res).
    ``u`` is the first 12 md5 hex digits of the id (+0.5 so ln never
    sees 0); key = ln(u)/w, top-k per group by (key desc, id). ONE
    group-partitioned window — single shuffle on the group key, no
    per-group state, reproducible across reruns/partitionings.
    Weights are floored at 1 so zero/NULL weights stay total."""
    u = ((F.conv(F.substring(_id_hash(id_col), 1, 12), 16, 10)
          .cast("double") + F.lit(0.5)) / F.lit(_ES_DENOM))
    w = F.greatest(F.col(weight_col).cast("double"), F.lit(1.0))
    key = F.log(u) / w
    win = W.partitionBy(*group_cols).orderBy(F.desc(key), id_col)
    return (df.withColumn("rk", F.row_number().over(win))
            .filter(F.col("rk") <= k))


_WOR_BODY = f"""
WITH keyed AS (
  SELECT lang, doc_id, n_chars,
         ln(({{h12}} + 0.5) / {16 ** 12}.0)
           / GREATEST(CAST(n_chars AS DOUBLE), 1.0) AS k
  FROM documents),
r AS (SELECT lang, doc_id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY k DESC, doc_id) AS rk
      FROM keyed)
SELECT lang, doc_id, n_chars, rk FROM r WHERE rk <= {_ES_K}
"""

# Spark spelling of the 12-hex-digit uniform (conv, exact ≤ 2^48)
_ES_HEX12_SPARK = ("CAST(conv(substring(md5(CAST(doc_id AS STRING)), "
                   "1, 12), 16, 10) AS DOUBLE)")


@query("sample_weighted_wor",
       oracle=_WOR_BODY.format(h12=_ES_HEX12_SQL),
       spark_oracle=_WOR_BODY.format(h12=_ES_HEX12_SPARK))
def sample_weighted_wor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Efraimidis–Spirakis weighted sampling WITHOUT replacement:
    the {_ES_K} docs per language, selection probability proportional
    to length but never repeating a doc — the missing sibling of the
    weighted Bernoulli (with-replacement-ish rate) and the uniform
    k-per-group reservoir. The oracle replays the identical
    ln(u)/w key (same md5-derived uniform, same floor, same
    tie-break), so a green hash pins the key arithmetic and the
    per-group walk."""
    d = _docs(spark, sf_dir)
    return (weighted_sample_wor(d, ["lang"], "n_chars", _ES_K)
            .select("lang", "doc_id", "n_chars", "rk"))
