"""Training-data pipeline operators, round 3: PII redaction,
benchmark decontamination, near-dup clustering (connected
components), and greedy sequence packing.

These extend the LLM-pipeline surface (SURVEY.md "beyond the
reference" mandate) the same way the dedup/sampling families do: each
operator is a production-shaped DataFrame pipeline over the
``documents`` table with a DuckDB oracle pinning the semantics.

The synthetic corpus contains no real PII, so the redaction query
first INJECTS deterministic PII (an email for doc_id % 3 == 0, a
phone number for doc_id % 4 == 0 — both derived from doc_id/source so
both engines build identical strings) and then redacts it; the
verified output counts redactions per language and checks the exact
byte shrinkage, so a regex that over- or under-matches fails the
hash."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from . import cache_tracked, query
from .pipeline import _docs

_EMAIL_RE = r"[a-z0-9]+@[a-z0-9]+\.com"
_PHONE_RE = r"\(555\) [0-9]{3}-[0-9]{4}"
# Spark string literals consume backslash escapes (DuckDB's don't) —
# double them so the regex reaching the engine is identical
_EMAIL_RE_SP = _EMAIL_RE.replace("\\", "\\\\")
_PHONE_RE_SP = _PHONE_RE.replace("\\", "\\\\")

_PACK_WINDOW = 256          # tokens per packed training sequence

_DECON_MOD = 10             # doc_id % MOD == 0 → benchmark member
_DECON_N = 5                # shared word-n-gram length


@query("text_pii_redact", oracle=f"""
WITH injected AS (
  SELECT doc_id, lang,
         trim(text)
         || CASE WHEN doc_id % 3 = 0
                 THEN ' contact user' || doc_id || '@' || source || '.com'
                 ELSE '' END
         || CASE WHEN doc_id % 4 = 0
                 THEN ' call (555) 010-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END AS t
  FROM documents
), red AS (
  SELECT doc_id, lang, t,
         regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                        '{_PHONE_RE}', '<PHONE>', 'g') AS r
  FROM injected
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN regexp_matches(t, '{_EMAIL_RE}') THEN 1 ELSE 0 END) AS BIGINT) AS n_email,
       CAST(SUM(CASE WHEN regexp_matches(t, '{_PHONE_RE}') THEN 1 ELSE 0 END) AS BIGINT) AS n_phone,
       CAST(SUM(len(t) - len(r)) AS BIGINT) AS len_delta
FROM red GROUP BY lang
""", spark_oracle=f"""
WITH injected AS (
  SELECT doc_id, lang,
         trim(text)
         || CASE WHEN doc_id % 3 = 0
                 THEN ' contact user' || CAST(doc_id AS STRING)
                      || '@' || source || '.com'
                 ELSE '' END
         || CASE WHEN doc_id % 4 = 0
                 THEN ' call (555) 010-' || lpad(CAST(doc_id % 10000 AS STRING), 4, '0')
                 ELSE '' END AS t
  FROM documents
), red AS (
  SELECT doc_id, lang, t,
         regexp_replace(regexp_replace(t, '{_EMAIL_RE_SP}', '<EMAIL>'),
                        '{_PHONE_RE_SP}', '<PHONE>') AS r
  FROM injected
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN t RLIKE '{_EMAIL_RE_SP}' THEN 1 ELSE 0 END) AS BIGINT) AS n_email,
       CAST(SUM(CASE WHEN t RLIKE '{_PHONE_RE_SP}' THEN 1 ELSE 0 END) AS BIGINT) AS n_phone,
       CAST(SUM(length(t) - length(r)) AS BIGINT) AS len_delta
FROM red GROUP BY lang
""")
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: regex-scrub emails and phone numbers to typed
    placeholders. Pure JVM regexp_replace in one projection — a scan
    +map at any scale. The verified aggregate counts matched docs per
    language and the exact byte delta of the rewrite."""
    d = _docs(spark, sf_dir)
    email = F.when(F.col("doc_id") % 3 == 0,
                   F.concat(F.lit(" contact user"), F.col("doc_id"),
                            F.lit("@"), F.col("source"), F.lit(".com"))
                   ).otherwise(F.lit(""))
    phone = F.when(F.col("doc_id") % 4 == 0,
                   F.concat(F.lit(" call (555) 010-"),
                            F.lpad((F.col("doc_id") % 10000).cast("string"),
                                   4, "0"))).otherwise(F.lit(""))
    t = F.concat(F.trim(F.col("text")), email, phone)
    inj = d.select("doc_id", "lang", t.alias("t"))
    r = F.regexp_replace(
        F.regexp_replace(F.col("t"), _EMAIL_RE, "<EMAIL>"),
        _PHONE_RE, "<PHONE>")
    red = inj.select("doc_id", "lang", "t", r.alias("r"))
    return (red.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("t").rlike(_EMAIL_RE).cast("long")).alias("n_email"),
        F.sum(F.col("t").rlike(_PHONE_RE).cast("long")).alias("n_phone"),
        F.sum(F.length("t") - F.length("r")).alias("len_delta")))


def _gram_expr_sql(n: int) -> str:
    return (f"list_transform(generate_series(1, len(ws) - {n - 1}), "
            f"i -> list_aggregate(ws[i:i+{n - 1}], 'string_agg', ' '))")


@query("text_decontaminate", oracle=f"""
WITH w AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS ws FROM documents
), g AS (
  SELECT DISTINCT doc_id, unnest({_gram_expr_sql(_DECON_N)}) AS g FROM w
), bench AS (
  SELECT DISTINCT g FROM g WHERE doc_id % {_DECON_MOD} = 0
)
SELECT a.doc_id, COUNT(DISTINCT a.g) AS n_shared
FROM g a JOIN bench b ON a.g = b.g
WHERE a.doc_id % {_DECON_MOD} != 0
GROUP BY a.doc_id
""")
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any
    word-{n}-gram with the held-out benchmark set (here: every
    doc_id % 10 == 0 doc stands in for the benchmark). Scale shape:
    the benchmark gram set is orders smaller than the corpus → build
    it distinct and broadcast-join the corpus gram stream against it;
    nothing quadratic, one aggregation by doc."""
    d = _docs(spark, sf_dir)
    arr = F.split(F.trim(F.col("text")), " +")
    grams_arr = F.transform(
        # sequence(1, n-(N-1)) descends when n < N → slice(arr, 0|-k)
        # is an ANSI error / wrong gram — short docs get no grams
        F.when(F.size(arr) >= _DECON_N,
               F.sequence(F.lit(1), F.size(arr) - (_DECON_N - 1)))
        .otherwise(F.array().cast("array<int>")),
        lambda i: F.concat_ws(" ", F.slice(arr, i, _DECON_N)))
    # explode each side from its own filtered scan: the benchmark set
    # only pays the gram explode for its ~1/MOD of the corpus (a full
    # explode then filter would shingle every doc twice)
    bench = (d.filter(F.col("doc_id") % _DECON_MOD == 0)
             .select(F.explode(F.array_distinct(grams_arr)).alias("g"))
             .distinct())
    g = (d.filter(F.col("doc_id") % _DECON_MOD != 0)
         .select("doc_id",
                 F.explode(F.array_distinct(grams_arr)).alias("g")))
    return (g.join(F.broadcast(bench), "g")
            .groupBy("doc_id")
            .agg(F.count_distinct("g").alias("n_shared")))


# shared recursive-closure body: grams → Jaccard edges → transitive
# closure → (node, comp) labels; composed by the components gates and
# the leakage-free split gate below
_CC_BODY = """
WITH RECURSIVE grams AS (
  SELECT DISTINCT doc_id, unnest(list_transform(
      generate_series(1, len(string_split_regex(trim(text), ' +')) - 1),
      i -> string_split_regex(trim(text), ' +')[i] || ' ' ||
           string_split_regex(trim(text), ' +')[i + 1])) AS g
  FROM documents
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_g FROM grams GROUP BY doc_id
), rare AS (
  SELECT g FROM grams GROUP BY g HAVING COUNT(*) <= 100
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM grams a JOIN rare r ON a.g = r.g
  JOIN grams b ON b.g = a.g AND a.doc_id < b.doc_id
), inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
  FROM cand c
  JOIN grams ga ON ga.doc_id = c.doc_a
  JOIN grams gb ON gb.doc_id = c.doc_b AND gb.g = ga.g
  GROUP BY c.doc_a, c.doc_b
), edges AS (
  SELECT i.doc_a, i.doc_b FROM inter i
  JOIN sizes sa ON sa.doc_id = i.doc_a
  JOIN sizes sb ON sb.doc_id = i.doc_b
  WHERE CAST(i.n_common AS DOUBLE) / (sa.n_g + sb.n_g - i.n_common) >= 0.5
), sym AS (
  SELECT doc_a AS u, doc_b AS v FROM edges
  UNION SELECT doc_b, doc_a FROM edges
), reach AS (
  SELECT u, v FROM sym
  UNION
  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u
), lab AS (
  SELECT u AS node, LEAST(u, MIN(v)) AS comp FROM reach GROUP BY u
)"""

def _cc_spark_body(rounds: int = 8) -> str:
    """Spark-parseable twin of _CC_BODY (tools/baseline_bench.py):
    the same bigram-Jaccard edge derivation in Spark SQL, then
    min-label propagation UNROLLED as chained non-recursive CTEs
    instead of DuckDB's recursive transitive closure — Spark 4's
    recursive CTEs are UNION ALL-only, which diverges on cycles.
    Near-dup components are quasi-cliques (diameter 2–4), so 8
    unrolled rounds reach the fixpoint with margin; hash-equality vs
    the engine is pinned per corpus in tests/test_spark_oracles.py,
    which would catch a wider-diameter corpus."""
    # Each round references the PREVIOUS label frame exactly ONCE —
    # a second reference makes Spark inline the CTE tree 2^rounds
    # times and the analyzer heap-OOMs. Self-loop edges fold "keep
    # own label" into the same single min-aggregation.
    labs = ["lab0 AS (SELECT node, node AS comp FROM nodes)"]
    for k in range(rounds):
        labs.append(f"""lab{k + 1} AS (
  SELECT s.u AS node, MIN(l.comp) AS comp
  FROM symx s JOIN lab{k} l ON l.node = s.v
  GROUP BY s.u)""")
    chain = ",\n".join(labs)
    return f"""
WITH grams AS (
  SELECT DISTINCT doc_id,
         concat_ws(' ', element_at(a, i), element_at(a, i + 1)) AS g
  FROM (SELECT doc_id, split(trim(text), ' +') AS a FROM documents)
  LATERAL VIEW explode(if(size(a) >= 2, sequence(1, size(a) - 1),
                          cast(array() as array<int>))) AS i
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_g FROM grams GROUP BY doc_id
), rare AS (
  SELECT g FROM grams GROUP BY g HAVING COUNT(*) <= 100
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM grams a JOIN rare r ON a.g = r.g
  JOIN grams b ON b.g = a.g AND a.doc_id < b.doc_id
), inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
  FROM cand c
  JOIN grams ga ON ga.doc_id = c.doc_a
  JOIN grams gb ON gb.doc_id = c.doc_b AND gb.g = ga.g
  GROUP BY c.doc_a, c.doc_b
), edges AS (
  SELECT i.doc_a, i.doc_b FROM inter i
  JOIN sizes sa ON sa.doc_id = i.doc_a
  JOIN sizes sb ON sb.doc_id = i.doc_b
  WHERE CAST(i.n_common AS DOUBLE) / (sa.n_g + sb.n_g - i.n_common) >= 0.5
), sym AS (
  SELECT doc_a AS u, doc_b AS v FROM edges
  UNION SELECT doc_b, doc_a FROM edges
), nodes AS (
  SELECT DISTINCT u AS node FROM sym
), symx AS (
  SELECT u, v FROM sym UNION ALL SELECT node, node FROM nodes
),
{chain},
lab AS (SELECT node, comp FROM lab{rounds})
"""


_CC_SPARK_ORACLE = _cc_spark_body() + """
SELECT comp AS component_id, COUNT(*) AS n_members
FROM lab GROUP BY comp
"""


_CC_ORACLE = _CC_BODY + """
SELECT comp AS component_id, COUNT(*) AS n_members
FROM lab GROUP BY comp
"""


@query("dedup_components", oracle=_CC_ORACLE,
       spark_oracle=_CC_SPARK_ORACLE)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering: bigram-Jaccard pairs (threshold 0.5) as
    edges → connected components via iterative min-label propagation
    (operators/graph.py) → component id + size. The oracle recomputes
    the same components with a recursive transitive closure — feasible
    for DuckDB on the small pair set, while the Spark side runs the
    O(diameter)-round distributed algorithm that survives 10⁹ edges."""
    from ..operators.dedup import ngram_jaccard_near_dups
    from ..operators.graph import connected_components

    edges = ngram_jaccard_near_dups(_docs(spark, sf_dir), "doc_id", "text",
                                    n=2, df_cap=100, threshold=0.5)
    comps = connected_components(edges, "id_a", "id_b")
    return (comps.groupBy(F.col("comp").alias("component_id"))
            .agg(F.count(F.lit(1)).alias("n_members")))


@query("dedup_components_star", oracle=_CC_ORACLE,
       spark_oracle=_CC_SPARK_ORACLE)
def dedup_components_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same clustering as dedup_components, run through the
    large-star/small-star algorithm (operators/graph.py, Kiveris et
    al.) — the O(log n)-round variant for high-diameter graphs. The
    shared oracle pins both algorithms to the same components."""
    from ..operators.dedup import ngram_jaccard_near_dups
    from ..operators.graph import connected_components

    edges = ngram_jaccard_near_dups(_docs(spark, sf_dir), "doc_id", "text",
                                    n=2, df_cap=100, threshold=0.5)
    comps = connected_components(edges, "id_a", "id_b", algorithm="star")
    return (comps.groupBy(F.col("comp").alias("component_id"))
            .agg(F.count(F.lit(1)).alias("n_members")))


@query("sample_split_leakage_free", oracle=_CC_BODY + """
, comp_map AS (
  SELECT d.doc_id, COALESCE(l.comp, d.doc_id) AS comp
  FROM documents d LEFT JOIN lab l ON l.node = d.doc_id
), assigned AS (
  SELECT doc_id, comp,
         CASE WHEN substr(md5(CAST(comp AS VARCHAR)), 1, 2) < 'cc'
                THEN 'train'
              WHEN substr(md5(CAST(comp AS VARCHAR)), 1, 2) < 'e6'
                THEN 'val'
              ELSE 'test' END AS split
  FROM comp_map
)
SELECT split, COUNT(*) AS n_docs, COUNT(DISTINCT comp) AS n_clusters
FROM assigned GROUP BY split
""")
def sample_split_leakage_free(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free train/val/test split: the split key is the
    near-dup COMPONENT id (bigram-Jaccard edges → connected
    components; a doc outside every component is its own singleton
    cluster), so near-duplicates can never straddle splits — the
    standard guard against eval contamination when duplicated
    documents would otherwise land in both train and test. Assignment
    is the engine's deterministic md5-of-decimal-string idiom
    (~80/10/10 by hex prefix), identical in both engines, and
    cluster-atomic BY CONSTRUCTION — which the oracle checks by
    recomputing components with a recursive closure and counting
    docs + distinct clusters per split."""
    from ..operators.dedup import ngram_jaccard_near_dups
    from ..operators.graph import connected_components

    d = _docs(spark, sf_dir)
    edges = ngram_jaccard_near_dups(d, "doc_id", "text",
                                    n=2, df_cap=100, threshold=0.5)
    comps = connected_components(edges, "id_a", "id_b") \
        .withColumnRenamed("node", "doc_id")
    m = (d.select("doc_id").join(comps, "doc_id", "left")
         .select("doc_id",
                 F.coalesce(F.col("comp"), F.col("doc_id")).alias("comp")))
    h = F.substring(
        F.md5(F.col("comp").cast("string").cast("binary")), 1, 2)
    return (m.withColumn("split",
                         F.when(h < "cc", "train")
                         .when(h < "e6", "val")
                         .otherwise("test"))
            .groupBy("split")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.count_distinct("comp").alias("n_clusters")))


@query("text_pack_sequences", oracle=f"""
WITH t AS (
  SELECT source, doc_id,
         len(string_split_regex(trim(text), ' +')) AS ntok
  FROM documents
), c AS (
  SELECT source, doc_id, ntok,
         SUM(ntok) OVER (PARTITION BY source ORDER BY doc_id) AS cum
  FROM t
)
SELECT source,
       CAST(FLOOR((cum - ntok) / {_PACK_WINDOW}.0) AS INT) AS bin,
       COUNT(*) AS n_docs,
       CAST(SUM(ntok) AS BIGINT) AS sum_tokens
FROM c GROUP BY source, bin
""", spark_oracle=f"""
WITH t AS (
  SELECT source, doc_id,
         size(split(trim(text), ' +')) AS ntok
  FROM documents
), c AS (
  SELECT source, doc_id, ntok,
         SUM(ntok) OVER (PARTITION BY source ORDER BY doc_id) AS cum
  FROM t
)
SELECT source,
       CAST(FLOOR((cum - ntok) / {_PACK_WINDOW}.0) AS INT) AS bin,
       COUNT(*) AS n_docs,
       CAST(SUM(ntok) AS BIGINT) AS sum_tokens
FROM c GROUP BY source, bin
""")
def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing: concatenate docs per source in doc_id
    order into {window}-token training sequences; a doc's bin is the
    window its first token lands in. One window-function pass (the
    partition key is the pack group), then a narrow groupBy — the
    standard streaming-concat packing shape, no Python in the loop."""
    d = _docs(spark, sf_dir)
    ntok = F.size(F.split(F.trim(F.col("text")), " +"))
    w = W.partitionBy("source").orderBy("doc_id")
    c = (d.select("source", "doc_id", ntok.alias("ntok"))
         .withColumn("cum", F.sum("ntok").over(w)))
    return (c.groupBy(
        "source",
        F.floor((F.col("cum") - F.col("ntok")) / _PACK_WINDOW)
        .cast("int").alias("bin"))
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("ntok").alias("sum_tokens")))


@query("embedding_quantize_int8", oracle="""
WITH v AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings
), q AS (
  SELECT vec_id, label,
         list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale,
         e
  FROM v
), err AS (
  SELECT vec_id, label, scale,
         CAST(ROUND(list_max(list_transform(e,
               x -> abs(round(x / scale) * scale - x))), 9)
              AS DECIMAL(18,9)) AS err_max,
         CAST(ROUND(list_sum(list_transform(e,
               x -> abs(round(x / scale) * scale - x))) / len(e), 9)
              AS DECIMAL(18,9)) AS err_mean,
         CAST((SELECT COUNT(*) FROM unnest(e) AS t(x)
               WHERE abs(round(x / scale)) > 127) AS BIGINT) AS n_clip
  FROM q
)
SELECT label,
       COUNT(*) AS n_vecs,
       CAST(SUM(err_mean) AS DOUBLE) AS sum_err_mean,
       CAST(MAX(err_max) AS DOUBLE) AS max_err,
       CAST(SUM(n_clip) AS BIGINT) AS n_clipped
FROM err GROUP BY label
""", spark_oracle="""
WITH v AS (
  SELECT vec_id, label,
         transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
), q AS (
  SELECT vec_id, label,
         array_max(transform(e, x -> abs(x))) / 127.0 AS scale,
         e
  FROM v
), err AS (
  SELECT vec_id, label, scale,
         CAST(ROUND(array_max(transform(e,
               x -> abs(round(x / scale) * scale - x))), 9)
              AS DECIMAL(18,9)) AS err_max,
         CAST(ROUND(aggregate(transform(e,
               x -> abs(round(x / scale) * scale - x)),
               CAST(0.0 AS DOUBLE), (a, x) -> a + x) / size(e), 9)
              AS DECIMAL(18,9)) AS err_mean,
         CAST(size(filter(e, x -> abs(round(x / scale)) > 127)) AS BIGINT)
           AS n_clip
  FROM q
)
SELECT label,
       COUNT(*) AS n_vecs,
       CAST(SUM(err_mean) AS DOUBLE) AS sum_err_mean,
       CAST(MAX(err_max) AS DOUBLE) AS max_err,
       CAST(SUM(n_clip) AS BIGINT) AS n_clipped
FROM err GROUP BY label
""")
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column: per-vector
    scale = max|x|/127, q = round(x/scale), with byte-exact
    reconstruction-error verification. All row-local array arithmetic
    (transform/aggregate over the array) — a scan+map at any scale;
    this is the storage-shrink step before ANN serving (4× smaller
    vectors, dot products on int8). Per-vector errors fold
    deterministically (index order), round to DECIMAL(18,9), and sum
    exactly, so both engines hash identical aggregates; n_clipped == 0
    proves the quantizer never leaves int8 range."""
    from ..sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    dv = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    v = emb.select("vec_id", "label", dv.alias("e"))
    scale = F.array_max(F.transform(F.col("e"), F.abs)) / F.lit(127.0)
    q = v.select("vec_id", "label", F.col("e"), scale.alias("scale"))
    elem_err = F.transform(
        F.col("e"),
        lambda x: F.abs(F.round(x / F.col("scale")) * F.col("scale") - x))
    err = q.select(
        "vec_id", "label", "scale",
        F.round(F.array_max(elem_err), 9)
         .cast("decimal(18,9)").alias("err_max"),
        F.round(F.aggregate(elem_err, F.lit(0.0), lambda a, x: a + x)
                / F.size("e"), 9).cast("decimal(18,9)").alias("err_mean"),
        F.size(F.filter(
            F.col("e"),
            lambda x: F.abs(F.round(x / F.col("scale"))) > 127))
         .cast("bigint").alias("n_clip"))
    return (err.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum("err_mean").cast("double").alias("sum_err_mean"),
        F.max("err_max").cast("double").alias("max_err"),
        F.sum("n_clip").cast("bigint").alias("n_clipped")))


_KM_SEEDS = (0, 80, 160, 240, 320, 400)
_KM_D2_SQL = ("list_sum(list_transform(generate_series(1, len({e})), "
              "i -> ({e}[i] - {c}[i]) * ({e}[i] - {c}[i])))")


_KM_D2_SPARK = ("aggregate(zip_with({e}, {c}, (x, y) -> "
                "(x - y) * (x - y)), CAST(0.0 AS DOUBLE), "
                "(acc, z) -> acc + z)")

_KMEANS_SPARK_ORACLE = f"""
WITH v AS (
  SELECT vec_id AS id,
         transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
), c0 AS (
  SELECT id AS cid, e AS ce FROM v
  WHERE id IN ({", ".join(str(s) for s in _KM_SEEDS)})
), a1 AS (
  SELECT id, e, cid AS cluster FROM (
    SELECT v.id, v.e, c.cid,
           ROW_NUMBER() OVER (PARTITION BY v.id ORDER BY
             {_KM_D2_SPARK.format(e='v.e', c='c.ce')}, c.cid) AS rn
    FROM v CROSS JOIN c0 c) WHERE rn = 1
), dims AS (
  SELECT cluster, x, i0 + 1 AS i
  FROM a1 LATERAL VIEW posexplode(e) AS i0, x
), c1 AS (
  SELECT cluster AS cid,
         transform(array_sort(collect_list(named_struct(
             'i', i, 'm', mval))), s -> s.m) AS ce
  FROM (SELECT cluster, i,
               ROUND(CAST(SUM(CAST(x AS DECIMAL(28,14))) AS DOUBLE)
                     / COUNT(*), 9) AS mval
        FROM dims GROUP BY cluster, i)
  GROUP BY cluster
), a2 AS (
  SELECT id, cid AS cluster FROM (
    SELECT v.id, c.cid,
           ROW_NUMBER() OVER (PARTITION BY v.id ORDER BY
             {_KM_D2_SPARK.format(e='v.e', c='c.ce')}, c.cid) AS rn
    FROM v CROSS JOIN c1 c) WHERE rn = 1
)
SELECT a2.cluster,
       COUNT(*) AS n_members,
       CAST(SUM(a2.id) AS BIGINT) AS sum_ids,
       CAST(ROUND(sqrt(aggregate(transform(c1.ce, x -> x * x),
                                 CAST(0.0 AS DOUBLE),
                                 (acc, z) -> acc + z)), 6)
            AS DOUBLE) AS centroid_norm
FROM a2 JOIN c1 ON c1.cid = a2.cluster
GROUP BY a2.cluster, c1.ce
"""


@query("similarity_kmeans_refine", spark_oracle=_KMEANS_SPARK_ORACLE,
       oracle=f"""
WITH v AS (
  SELECT vec_id AS id, embedding::DOUBLE[] AS e FROM embeddings
), c0 AS (
  SELECT id AS cid, e AS ce FROM v
  WHERE id IN ({", ".join(str(s) for s in _KM_SEEDS)})
), a1 AS (
  SELECT id, e, cid AS cluster FROM (
    SELECT v.id, v.e, c.cid,
           ROW_NUMBER() OVER (PARTITION BY v.id ORDER BY
             {_KM_D2_SQL.format(e='v.e', c='c.ce')}, c.cid) AS rn
    FROM v CROSS JOIN c0 c) WHERE rn = 1
), dims AS (
  SELECT cluster, unnest(e) AS x, generate_subscripts(e, 1) AS i
  FROM a1
), c1 AS (
  SELECT cluster AS cid,
         list(round(mval, 9) ORDER BY i) AS ce
  FROM (SELECT cluster, i,
               CAST(SUM(CAST(x AS DECIMAL(28,14))) AS DOUBLE) / COUNT(*) AS mval
        FROM dims GROUP BY cluster, i)
  GROUP BY cluster
), a2 AS (
  SELECT id, cid AS cluster FROM (
    SELECT v.id, c.cid,
           ROW_NUMBER() OVER (PARTITION BY v.id ORDER BY
             {_KM_D2_SQL.format(e='v.e', c='c.ce')}, c.cid) AS rn
    FROM v CROSS JOIN c1 c) WHERE rn = 1
)
SELECT a2.cluster,
       COUNT(*) AS n_members,
       CAST(SUM(a2.id) AS BIGINT) AS sum_ids,
       CAST(ROUND(sqrt(list_sum(list_transform(c1.ce, x -> x * x))), 6)
            AS DOUBLE) AS centroid_norm
FROM a2 JOIN c1 ON c1.cid = a2.cluster
GROUP BY a2.cluster, c1.ce
""")
def similarity_kmeans_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd's k-means round refining the IVF coarse quantizer:
    seed centroids are data vectors, one broadcast-argmin assignment,
    per-dim DECIMAL-exact mean update, reassignment against the
    refined centroids (operators/similarity.kmeans_refine). The oracle
    replays the identical iteration unrolled in SQL — possible only
    because the means round to 9 digits after an exact DECIMAL sum, so
    both engines feed bit-identical centroids into round 2. At cluster
    scale the corpus never shuffles: assignment is a broadcast argmin,
    the k×dim mean matrix is the only thing that moves."""
    from ..operators.similarity import kmeans_refine, sq_dist, dot  # noqa: F401
    from ..sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    dv = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    # r12: no cache — measured at sf0.1 (2000×64d) the columnar cache
    # fill costs MORE than re-running the element-cast decode per scan
    # (cold 15.3 s vs 7.3 s, warm neutral; guide §5: cache only when
    # recompute beats the memory/serialization cost), and
    # materialize_rounds=False composes the whole refine into ONE
    # Spark job exactly like the SQL twin (the r11 shape paid a
    # mid-query collect job boundary — half the gate's wall at this
    # corpus size). Cluster-scale callers (catalog/vector_index.py)
    # keep the defaults: driver-materialized rounds, corpus pass
    # running exactly once per round.
    v = emb.select(F.col("vec_id").alias("id"), dv.alias("e"))
    seeds = v.filter(F.col("id").isin(list(_KM_SEEDS))).select(
        F.col("id").alias("cid"), F.col("e").alias("ce"))
    assign, cent = kmeans_refine(v, seeds, iters=1,
                                 materialize_rounds=False)
    cnorm = F.round(F.sqrt(F.aggregate(
        F.transform(F.col("ce"), lambda x: x * x),
        F.lit(0.0), lambda a, x: a + x)), 6).cast("double")
    return (assign.groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("n_members"),
                 F.sum("id").cast("bigint").alias("sum_ids"))
            .join(cent.select(F.col("cid").alias("cluster"),
                              cnorm.alias("centroid_norm")), "cluster"))


_VX_K = 6
_VX_NPROBE = 2
_VX_TOPK = 5
_VX_NQ = 5
_VX_COS = ("list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a}))"
           " * sqrt(list_dot_product({b}, {b})))")


@query("table_vector_index_search", oracle=f"""
WITH v AS (
  SELECT vec_id AS id, embedding::DOUBLE[] AS e FROM embeddings
), c0 AS (
  SELECT id AS cid, e AS ce FROM v WHERE id < {_VX_K}
), a1 AS (
  SELECT id, e, cid AS cluster FROM (
    SELECT v.id, v.e, c.cid,
           ROW_NUMBER() OVER (PARTITION BY v.id ORDER BY
             {_KM_D2_SQL.format(e='v.e', c='c.ce')}, c.cid) AS rn
    FROM v CROSS JOIN c0 c) WHERE rn = 1
), dims AS (
  SELECT cluster, unnest(e) AS x, generate_subscripts(e, 1) AS i FROM a1
), c1 AS (
  SELECT cluster AS cid, list(round(mval, 9) ORDER BY i) AS ce
  FROM (SELECT cluster, i,
               CAST(SUM(CAST(x AS DECIMAL(28,14))) AS DOUBLE) / COUNT(*) AS mval
        FROM dims GROUP BY cluster, i)
  GROUP BY cluster
), a2 AS (
  SELECT id, cid AS list_id FROM (
    SELECT v.id, c.cid,
           ROW_NUMBER() OVER (PARTITION BY v.id ORDER BY
             {_KM_D2_SQL.format(e='v.e', c='c.ce')}, c.cid) AS rn
    FROM v CROSS JOIN c1 c) WHERE rn = 1
), q AS (
  SELECT id AS q_id, e AS qe FROM v WHERE id < {_VX_NQ}
), probes AS (
  SELECT q_id, qe, cid AS list_id FROM (
    SELECT q.q_id, q.qe, c.cid,
           ROW_NUMBER() OVER (PARTITION BY q.q_id ORDER BY
             {_KM_D2_SQL.format(e='q.qe', c='c.ce')}, c.cid) AS rn
    FROM q CROSS JOIN c1 c) WHERE rn <= {_VX_NPROBE}
), cand AS (
  SELECT p.q_id, p.qe, v.id AS c_id, v.e AS ce
  FROM probes p JOIN a2 ON a2.list_id = p.list_id
  JOIN v ON v.id = a2.id
  WHERE v.id != p.q_id
), scored AS (
  SELECT q_id, c_id,
         CAST(ROUND({_VX_COS.format(a='qe', b='ce')}, 6) AS DOUBLE) AS cos_sim
  FROM cand
)
SELECT q_id, c_id, cos_sim, rk FROM (
  SELECT q_id, c_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY q_id
                            ORDER BY cos_sim DESC, c_id) AS rk
  FROM scored) WHERE rk <= {_VX_TOPK}
""")
def table_vector_index_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-format ANN end-to-end: embeddings loaded into a managed
    table, CREATE VECTOR INDEX (k-means centroids + executor-written
    list-assignment sidecar — catalog/vector_index.py), probe-search
    reranked by exact cosine. The oracle replays centroid learning,
    assignment, probing, and rerank in SQL, so the whole persisted-ANN
    path — not just the search math — is pinned bit-for-bit."""
    import os as _os

    from ..catalog.table import Table
    from ..catalog.vector_index import VectorIndexManager
    from .lifecycle_queries import _scratch

    root = _scratch("vecidx", sf_dir)
    t = Table.create(spark, _os.path.join(root, "t"),
                     "vec_id bigint, embedding array<float>")
    t.insert(spark.read.parquet(f"{sf_dir}/embeddings.parquet")
             .select("vec_id", "embedding"))
    vm = VectorIndexManager(t)
    vm.create("vx", "vec_id", "embedding", k=_VX_K, iters=1)
    q = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
         .filter(F.col("vec_id") < _VX_NQ)
         .select(F.col("vec_id").alias("q_id"),
                 F.transform(F.col("embedding"),
                             lambda x: x.cast("double")).alias("qe")))
    res, stale = vm.search("vx", q, nprobe=_VX_NPROBE, topk=_VX_TOPK)
    assert not stale
    return res


@query("events_gap_fill", oracle="""
WITH e AS (
  SELECT event_type, date_trunc('hour', ts) AS h, value
  FROM events WHERE user_id % 50 = 0
), bounds AS (
  SELECT MIN(h) AS h0, MAX(h) AS h1 FROM e
), hours AS (
  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM bounds
), grid AS (
  SELECT t.event_type, hours.h
  FROM (SELECT DISTINCT event_type FROM e) t CROSS JOIN hours
), actual AS (
  SELECT event_type, h, COUNT(*) AS n,
         SUM(CAST(value AS DECIMAL(18,6))) AS sv
  FROM e GROUP BY event_type, h
)
SELECT g.event_type,
       CAST(g.h AS VARCHAR) AS hour,
       CAST(COALESCE(a.n, 0) AS BIGINT) AS n_events,
       CAST(ROUND(COALESCE(a.sv, 0), 4) AS DOUBLE) AS sum_value,
       CAST(SUM(COALESCE(a.n, 0)) OVER (
         PARTITION BY g.event_type ORDER BY g.h) AS BIGINT) AS cum_events
FROM grid g LEFT JOIN actual a
  ON a.event_type = g.event_type AND a.h = g.h
""", spark_oracle="""
WITH e AS (
  SELECT event_type, date_trunc('hour', ts) AS h, value
  FROM events WHERE user_id % 50 = 0
), bounds AS (
  SELECT MIN(h) AS h0, MAX(h) AS h1 FROM e
), hours AS (
  SELECT explode(sequence(h0, h1, INTERVAL 1 HOUR)) AS h FROM bounds
), grid AS (
  SELECT t.event_type, hours.h
  FROM (SELECT DISTINCT event_type FROM e) t CROSS JOIN hours
), actual AS (
  SELECT event_type, h, COUNT(*) AS n,
         SUM(CAST(value AS DECIMAL(18,6))) AS sv
  FROM e GROUP BY event_type, h
)
SELECT g.event_type,
       CAST(g.h AS STRING) AS hour,
       CAST(COALESCE(a.n, 0) AS BIGINT) AS n_events,
       CAST(ROUND(COALESCE(a.sv, 0), 4) AS DOUBLE) AS sum_value,
       CAST(SUM(COALESCE(a.n, 0)) OVER (
         PARTITION BY g.event_type ORDER BY g.h) AS BIGINT) AS cum_events
FROM grid g LEFT JOIN actual a
  ON a.event_type = g.event_type AND a.h = g.h
""")
def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: a dense (event_type × hour) grid over
    the observed range, zero-filled where no events landed, plus a
    running cumulative across the filled series — the densification
    step dashboards and window features need before interpolation.
    Scale shape: the hour spine is sequence()-generated (rows = range,
    not data), the grid is dims × spine (tiny) broadcast against the
    hourly partial aggregate; raw events are touched exactly once."""
    from ..sources.registry import load_table

    e = (load_table(spark, sf_dir, "events")
         .filter(F.col("user_id") % 50 == 0)
         .select("event_type",
                 F.date_trunc("hour", F.col("ts")).alias("h"), "value"))
    bounds = e.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    hours = bounds.select(F.explode(F.sequence(
        "h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("h"))
    grid = e.select("event_type").distinct().crossJoin(hours)
    actual = (e.groupBy("event_type", "h")
              .agg(F.count(F.lit(1)).alias("n"),
                   F.sum(F.col("value").cast("decimal(18,6)")).alias("sv")))
    w = W.partitionBy("event_type").orderBy("h")
    return (grid.join(actual, ["event_type", "h"], "left")
            .select("event_type",
                    F.col("h").cast("string").alias("hour"),
                    F.coalesce(F.col("n"), F.lit(0)).cast("bigint")
                    .alias("n_events"),
                    F.round(F.coalesce(F.col("sv"), F.lit(0)), 4)
                    .cast("double").alias("sum_value"),
                    F.sum(F.coalesce(F.col("n"), F.lit(0))).over(w)
                    .cast("bigint").alias("cum_events")))


@query("corpus_curation_pipeline", oracle="""
WITH scored AS (
  SELECT doc_id, lang, source, text,
         len(string_split_regex(trim(text), ' +')) AS n_tokens,
         md5(text) AS digest
  FROM documents
), kept AS (
  SELECT * FROM scored WHERE n_tokens >= 15
), survivors AS (
  SELECT * FROM kept
  WHERE doc_id IN (SELECT MIN(doc_id) FROM kept GROUP BY digest)
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       CAST((SELECT COUNT(*) FROM kept) -
            (SELECT COUNT(*) FROM survivors) AS BIGINT) AS n_deduped
FROM survivors GROUP BY lang
""")
def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation flow in ONE DAG — the shape a real
    training-data run takes: quality filter (min token count) → exact
    dedup keeping the lowest doc_id per content digest → per-language
    corpus stats with a global dedup-loss count. Each stage is an
    operator verified on its own elsewhere; this query pins their
    COMPOSITION (filter-before-dedup ordering, survivor rule, loss
    accounting). One scan, one digest groupBy, one final agg — the
    window-free survivor join keeps every stage a narrow shuffle."""
    d = _docs(spark, sf_dir)
    scored = d.select(
        "doc_id", "lang", "source",
        F.size(F.split(F.trim(F.col("text")), " +")).alias("n_tokens"),
        F.md5(F.col("text")).alias("digest"))
    kept = cache_tracked(scored.filter(F.col("n_tokens") >= 15))
    winners = (kept.groupBy("digest")
               .agg(F.min("doc_id").alias("doc_id"))
               .select("doc_id"))
    survivors = kept.join(winners, "doc_id")
    n_kept = kept.count()
    n_surv = survivors.count()
    return (survivors.groupBy("lang")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.sum("n_tokens").cast("bigint").alias("total_tokens"),
                 F.count_distinct("source").cast("bigint").alias("n_sources"))
            .withColumn("n_deduped", F.lit(n_kept - n_surv).cast("bigint")))


@query("events_gap_fill_locf", oracle="""
WITH e AS (
  SELECT event_type, date_trunc('hour', ts) AS h, value
  FROM events WHERE user_id % 100 = 0
), bounds AS (
  SELECT MIN(h) AS h0, MAX(h) AS h1 FROM e
), hours AS (
  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM bounds
), grid AS (
  SELECT t.event_type, hours.h
  FROM (SELECT DISTINCT event_type FROM e) t CROSS JOIN hours
), actual AS (
  SELECT event_type, h,
         CAST(ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                    / COUNT(*), 4) AS DOUBLE) AS avg_v
  FROM e GROUP BY event_type, h
)
SELECT g.event_type, CAST(g.h AS VARCHAR) AS hour,
       CAST(CASE WHEN a.avg_v IS NULL THEN 1 ELSE 0 END AS INT) AS is_gap,
       CAST(last_value(a.avg_v IGNORE NULLS) OVER (
         PARTITION BY g.event_type ORDER BY g.h
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE
       ) AS carried_v
FROM grid g LEFT JOIN actual a
  ON a.event_type = g.event_type AND a.h = g.h
""")
def events_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap filling with last-observation-carried-forward: the dense
    hourly grid's empty buckets inherit the most recent observed
    hourly mean (last_value IGNORE NULLS over an ordered frame) — the
    interpolation step after densification. The observed mean rounds
    from a DECIMAL-exact sum before the carry, so both engines carry
    bit-identical values through arbitrarily long gaps."""
    from ..sources.registry import load_table

    e = (load_table(spark, sf_dir, "events")
         .filter(F.col("user_id") % 100 == 0)
         .select("event_type",
                 F.date_trunc("hour", F.col("ts")).alias("h"), "value"))
    bounds = e.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    hours = bounds.select(F.explode(F.sequence(
        "h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("h"))
    grid = e.select("event_type").distinct().crossJoin(hours)
    actual = (e.groupBy("event_type", "h")
              .agg(F.round(
                  F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                  / F.count(F.lit(1)), 4).alias("avg_v")))
    w = (W.partitionBy("event_type").orderBy("h")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    return (grid.join(actual, ["event_type", "h"], "left")
            .select("event_type",
                    F.col("h").cast("string").alias("hour"),
                    F.when(F.col("avg_v").isNull(), 1).otherwise(0)
                    .cast("int").alias("is_gap"),
                    F.last("avg_v", ignorenulls=True).over(w)
                    .cast("double").alias("carried_v")))


@query("text_lm_oov_filter", oracle="""
WITH chars AS (
  SELECT doc_id, lower(trim(text)) AS s FROM documents
), tris AS (
  SELECT doc_id, unnest(list_transform(
      generate_series(1, length(s) - 2), i -> substr(s, i, 3))) AS tri
  FROM chars WHERE length(s) >= 3
), model AS (
  SELECT tri, COUNT(*) AS cnt FROM tris GROUP BY tri
), scored AS (
  SELECT t.doc_id,
         COUNT(*) AS n_tris,
         SUM(CASE WHEN m.cnt < 5 THEN 1 ELSE 0 END) AS n_rare
  FROM tris t JOIN model m ON t.tri = m.tri
  GROUP BY t.doc_id
)
SELECT doc_id, CAST(n_tris AS BIGINT) AS n_tris,
       CAST(n_rare AS BIGINT) AS n_rare,
       (n_rare * 20 > n_tris) AS low_quality
FROM scored
""")
def text_lm_oov_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filter — the CCNet/KenLM shape (Wenzek et
    al. 2020 filter web text by LM score) with the statistics drawn
    from the corpus itself: build a character-trigram frequency model
    (one groupBy over the exploded trigram stream — at 100 TB the
    model is alphabet³, KBs, broadcast back), then flag documents
    whose rare-trigram rate exceeds 5%. Outputs are INTEGERS
    (n_tris, n_rare) and an integer-comparison flag, so both engines
    hash identically — no float log-sum whose last-ulp could differ
    between libm implementations (the reason this gate scores OOV
    rate, not perplexity; the perplexity variant is the same plan
    with a log-sum on top)."""
    d = _docs(spark, sf_dir)
    s = F.lower(F.trim(F.col("text")))
    tris = (d.select("doc_id", s.alias("s"))
            .filter(F.length("s") >= 3)
            .select("doc_id", F.explode(F.expr(
                "transform(sequence(1, length(s) - 2), "
                "i -> substring(s, i, 3))")).alias("tri")))
    model = tris.groupBy("tri").agg(F.count(F.lit(1)).alias("cnt"))
    return (tris.join(F.broadcast(model), "tri")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_tris"),
                 F.sum((F.col("cnt") < 5).cast("bigint")).alias("n_rare"))
            .select("doc_id", "n_tris", "n_rare",
                    (F.col("n_rare") * 20 > F.col("n_tris"))
                    .alias("low_quality")))


_BPE_MERGES = 24            # bounded demo rank count
_BPE_MOD = 10               # doc_id % MOD == 0 → training subset


def _sql_lit(v) -> str:
    if isinstance(v, float):
        return f"CAST({v!r} AS DOUBLE)"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return repr(v)


def _pinned_oracle(pin: dict[int, list[tuple]], cols: str) -> str:
    """Corpus-keyed constant-table oracle for deterministic training
    gates (VERDICT r9 next-round 6): training is not SQL-expressible,
    but its output IS deterministic, so the oracle is a pinned VALUES
    table per known corpus — switched on SUM(n_chars) over documents
    so one SQL string is hash-checkable at every testdata sf. An
    unknown corpus matches no branch (0 rows → visible gate FAIL);
    re-pin with `python tools/pin_tokenizer_oracles.py`."""
    branches = []
    for sig, rows in pin.items():
        vals = ", ".join(
            "(" + ", ".join(_sql_lit(v) for v in r) + ")" for r in rows)
        branches.append(
            f"SELECT v.* FROM (VALUES {vals}) AS v({cols}) "
            f"WHERE (SELECT SUM(n_chars) FROM documents) = {sig}")
    return "\nUNION ALL\n".join(branches)


def _bpe_ranked(spark: SparkSession, sf_dir: str) -> list[tuple]:
    from ..operators.bpe import train_bpe
    d = _docs(spark, sf_dir).filter(F.col("doc_id") % _BPE_MOD == 0)
    merges = train_bpe(d, "text", _BPE_MERGES, batch=8)
    return [(i, a, b) for i, (a, b) in enumerate(merges)]


# pinned by tools/pin_tokenizer_oracles.py — see _pinned_oracle
_BPE_PIN = {
    153156: [(0, 'e', 'r'), (1, 'e', '</w>'), (2, 'o', 'r'), (3, 't', '</w>'), (4, 'i', 'n'), (5, 'er', '</w>'), (6, 'o', 'w'), (7, 'ow', '</w>'), (8, 'h', '</w>'), (9, 'a', 's'), (10, 'l', 'u'), (11, 'n', '</w>'), (12, 'g', '</w>'), (13, 'y', '</w>'), (14, 'a', 't'), (15, 'a', 'r'), (16, 'p', 'ar'), (17, 'a', '</w>'), (18, 's', 't'), (19, 'd', 'er</w>'), (20, 'or', 'der</w>'), (21, 'as', 'h</w>'), (22, 'h', 'ash</w>'), (23, 'or', 't</w>')],
    149174: [(0, 'e', 'r'), (1, 'e', '</w>'), (2, 'er', '</w>'), (3, 's', 't'), (4, 'o', 'r'), (5, 'o', 'w'), (6, 'ow', '</w>'), (7, 'n', '</w>'), (8, 'l', 'u'), (9, 'g', '</w>'), (10, 'a', 'r'), (11, 'p', 'ar'), (12, 't', '</w>'), (13, 'h', '</w>'), (14, 'a', '</w>'), (15, 'a', 't'), (16, 'i', 'n'), (17, 'y', '</w>'), (18, 'c', 'u'), (19, 'cu', 'st'), (20, 'cust', 'o'), (21, 'custo', 'm'), (22, 'custom', 'er</w>'), (23, 'c', 'o')],
    1485576: [(0, 'e', '</w>'), (1, 'e', 'r'), (2, 'er', '</w>'), (3, 's', 't'), (4, 'i', 'n'), (5, 'o', 'r'), (6, 'o', 'w'), (7, 'ow', '</w>'), (8, 'a', 'l'), (9, 'a', 'r'), (10, 'p', 'ar'), (11, 'a', 't'), (12, 'h', '</w>'), (13, 'g', '</w>'), (14, 'n', '</w>'), (15, 't', '</w>'), (16, 'a', '</w>'), (17, 'y', '</w>'), (18, 'f', 'i'), (19, 'fi', 'l'), (20, 'fil', 't'), (21, 'filt', 'er</w>'), (22, 'p', '</w>'), (23, 'u', 'p</w>')],
}

_UNI_PIN = {
    153156: [(0, 'order', -3.260442, '302b8a08f0ec4853646368ee1bbef6ae', 160), (1, 'hash', -3.277982, '302b8a08f0ec4853646368ee1bbef6ae', 160), (2, 'sort', -3.295839, '302b8a08f0ec4853646368ee1bbef6ae', 160), (3, 'line', -3.351409, '302b8a08f0ec4853646368ee1bbef6ae', 160), (4, 'value', -3.360979, '302b8a08f0ec4853646368ee1bbef6ae', 160), (5, 'window', -3.370641, '302b8a08f0ec4853646368ee1bbef6ae', 160), (6, 'column', -3.380397, '302b8a08f0ec4853646368ee1bbef6ae', 160), (7, 'part', -3.380397, '302b8a08f0ec4853646368ee1bbef6ae', 160), (8, 'row', -3.380397, '302b8a08f0ec4853646368ee1bbef6ae', 160), (9, 'agg', -3.380431, '302b8a08f0ec4853646368ee1bbef6ae', 160)],
    149174: [(0, 'column', -3.236929, '572b6f20b1b467a2b5529c8bd75d77fa', 160), (1, 'er', -3.264022, '572b6f20b1b467a2b5529c8bd75d77fa', 160), (2, 'custom', -3.264036, '572b6f20b1b467a2b5529c8bd75d77fa', 160), (3, 'order', -3.301475, '572b6f20b1b467a2b5529c8bd75d77fa', 160), (4, 'big', -3.350258, '572b6f20b1b467a2b5529c8bd75d77fa', 160), (5, 'window', -3.360308, '572b6f20b1b467a2b5529c8bd75d77fa', 160), (6, 'part', -3.380717, '572b6f20b1b467a2b5529c8bd75d77fa', 160), (7, 'the', -3.380717, '572b6f20b1b467a2b5529c8bd75d77fa', 160), (8, 'agg', -3.380755, '572b6f20b1b467a2b5529c8bd75d77fa', 160), (9, 'slow', -3.39108, '572b6f20b1b467a2b5529c8bd75d77fa', 160)],
    1485576: [(0, 'filter', -3.343772, '695a5cba494b84186ebb190fe014806e', 160), (1, 'vector', -3.387432, '695a5cba494b84186ebb190fe014806e', 160), (2, 'value', -3.398116, '695a5cba494b84186ebb190fe014806e', 160), (3, 'the', -3.398116, '695a5cba494b84186ebb190fe014806e', 160), (4, 'stream', -3.403501, '695a5cba494b84186ebb190fe014806e', 160), (5, 'batch', -3.408915, '695a5cba494b84186ebb190fe014806e', 160), (6, 'spark', -3.408915, '695a5cba494b84186ebb190fe014806e', 160), (7, 'group', -3.410002, '695a5cba494b84186ebb190fe014806e', 160), (8, 'window', -3.412178, '695a5cba494b84186ebb190fe014806e', 160), (9, 'small', -3.413268, '695a5cba494b84186ebb190fe014806e', 160)],
}


@query("text_bpe_train",
       oracle=_pinned_oracle(_BPE_PIN, "rank, lhs, rhs"))
def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training (operators/bpe.py, Sennrich
    et al. 2016): the corpus collapses to a word-count table in ONE
    pass, then each of the 24 merge rounds runs entirely JVM-side
    over that vocabulary state (pair explode → weighted count →
    argmax; greedy fold rewrite). Runs in batched mode (batch=8):
    rounds accept every head pair strictly above the round's safety
    bound — provably the same list as one-at-a-time training (see
    train_bpe's proof), so the output is unchanged while the
    rounds×latency axis shrinks. Deterministic — ties break
    lexicographically — so the ranked merge table is stable across
    runs and machines, and the oracle is a corpus-keyed PINNED
    constant table (_pinned_oracle): hash-checked, not rows-only.
    Exactness vs the canonical worked example stays pinned in
    tests/test_bpe.py."""
    return spark.createDataFrame(
        _bpe_ranked(spark, sf_dir),
        "rank int, lhs string, rhs string").orderBy("rank")


_UNI_VOCAB = 160            # target piece count (demo-scale)
_UNI_MAXLEN = 6             # longest candidate piece
_UNI_SEED = 600             # seed substring pool


def _unigram_ranked(spark: SparkSession, sf_dir: str) -> list[tuple]:
    import hashlib

    from ..operators.unigram import train_unigram
    d = _docs(spark, sf_dir).filter(F.col("doc_id") % _BPE_MOD == 0)
    vocab = train_unigram(d, "text", _UNI_VOCAB,
                          max_piece_len=_UNI_MAXLEN,
                          seed_size=_UNI_SEED, em_iters=1)
    rows = sorted(vocab.items(), key=lambda kv: (-kv[1], kv[0]))
    ranked = [(i, p, round(lp, 6)) for i, (p, lp) in enumerate(rows)]
    digest = hashlib.md5("\x1f".join(
        f"{i}:{p}:{lp:.6f}" for i, p, lp in ranked).encode()).hexdigest()
    return [(i, p, lp, digest, len(ranked)) for i, p, lp in ranked[:10]]


@query("text_unigram_train",
       oracle=_pinned_oracle(_UNI_PIN, "rank, piece, logp, vocab_md5, n_pieces"))
def text_unigram_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed unigram-LM tokenizer training
    (operators/unigram.py, Kudo 2018 — SentencePiece's other half
    next to BPE): the corpus collapses to the SAME word-count table
    BPE trains on, the seed substring pool is one array-HOF explode
    + groupBy, and each EM round is one Arrow-batched lattice
    forward-backward over the word table with a vocabulary-sized
    collect — no corpus pass after the first, no shuffle bigger
    than the vocabulary. Deterministic (frequency/probability ties
    break lexicographically); the lattice E-step, Viterbi encode,
    and distributed-vs-serial EM parity are pinned against full
    segmentation-enumeration references in tests/test_unigram.py
    Returns the top-10 vocabulary rows by probability plus an
    md5 digest of the ENTIRE ranked vocabulary (so the pinned
    constant-table oracle hash-checks the full training result from
    10 rows — _pinned_oracle; the old check was rows-only)."""
    return spark.createDataFrame(
        _unigram_ranked(spark, sf_dir),
        "rank int, piece string, logp double, "
        "vocab_md5 string, n_pieces int").orderBy("rank")


@query("ml_ols_fit_score", oracle=r"""
WITH feats AS (
    SELECT source,
           len(list_filter(string_split_regex(text, '\s+'),
                           t -> t <> '')) AS x,
           n_chars AS y
    FROM documents),
st AS (
    SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
           SUM(x * x) AS sxx, SUM(x * y) AS sxy
    FROM feats),
co AS (
    SELECT (n * sxy - sx * sy) / CAST(n * sxx - sx * sx AS DOUBLE) AS b1,
           (sy - (n * sxy - sx * sy)
                  / CAST(n * sxx - sx * sx AS DOUBLE) * sx)
             / CAST(n AS DOUBLE) AS b0
    FROM st)
SELECT f.source,
       COUNT(*) AS n_docs,
       CAST(ROUND(MAX(co.b1), 6) AS DOUBLE) AS slope,
       CAST(ROUND(SUM(co.b0 + co.b1 * f.x), 3) AS DOUBLE) AS sum_pred
FROM feats f, co
GROUP BY f.source
""")
def ml_ols_fit_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed least-squares fit + corpus scoring
    (operators/regression): y = n_chars regressed on token count in
    ONE sufficient-statistics pass (map-side partials, nothing
    corpus-sized shuffles — plan-asserted in tests/test_regression),
    solved on the driver, then the whole corpus scored by a
    coefficient-literal column expression (UDF-free, codegen). The
    oracle re-derives slope/intercept from the closed-form normal
    equations over exact integer sums and recomputes the per-source
    predicted-score sums, so a green hash proves the one-pass fit ≡
    textbook OLS and the scoring expression applies the same model.
    The pipeline role: fit a doc-quality regression on features, then
    score 100 TB as a free map."""
    from ..operators.regression import ridge_fit, ridge_score
    d = cache_tracked(
        _docs(spark, sf_dir).select(
            "source",
            # split on ALL whitespace and filter empties — the exact
            # tokenization the oracle uses (string_split_regex '\s+'
            # + list_filter), robust to tabs/newlines in documents
            F.size(F.filter(F.split(F.trim(F.col("text")), "\\s+"),
                            lambda t: t != "")).alias("x"),
            F.col("n_chars").alias("y")))
    model = ridge_fit(d, ["x"], "y")
    scored = ridge_score(d, model, out="pred")
    return (scored.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.round(F.lit(model["coef"]["x"]), 6).cast("double")
                 .alias("slope"),
                 F.round(F.sum("pred"), 3).cast("double")
                 .alias("sum_pred")))


@query("ml_logit_fit_calibrate", oracle=r"""
WITH f AS (
    SELECT doc_id,
           len(list_filter(string_split_regex(text, '\s+'),
                           t -> t <> '')) AS x,
           CASE WHEN n_chars + 23 * (doc_id % 13) > 450
                THEN 1 ELSE 0 END AS y
    FROM documents WHERE doc_id % 4 = 0),
b AS (
    SELECT y, NTILE(5) OVER (ORDER BY x, doc_id) AS bucket FROM f)
SELECT bucket, COUNT(*) AS n_docs,
       CAST(ROUND(AVG(CAST(y AS DOUBLE)), 4) AS DOUBLE) AS mean_label
FROM b GROUP BY bucket
""")
def ml_logit_fit_calibrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed IRLS logistic regression end-to-end
    (operators/regression.logit_fit — one weighted-Gram pass per
    Newton step, driver solve, codegen σ scoring): a length-based
    label with doc_id-noise overlap (non-separable by construction)
    is fit on the TRAIN split (doc_id % 4 != 0), then the HOLDOUT is
    scored through logit_score. In-gate asserts pin the optimality
    certificate (grad_norm ≈ 0 at the returned β — the score
    equations, so train Σp = Σy exactly) and per-bucket calibration
    on the holdout (|mean prob − mean label| bounded). The returned
    frame — holdout feature-quintile, doc count, mean label — is
    recomputed by DuckDB over the same deterministic NTILE order, so
    a green hash proves the splits/buckets/labels align exactly;
    the probabilities themselves are certified in-gate because no
    SQL oracle can re-derive the iteratively-fitted β.
    (VERDICT r6 'Next round' item 7.)"""
    from ..operators.regression import logit_fit, logit_score
    feats = cache_tracked(
        _docs(spark, sf_dir).select(
            "doc_id",
            F.size(F.filter(F.split(F.trim(F.col("text")), "\\s+"),
                            lambda t: t != "")).alias("x"),
            F.when(F.col("n_chars") + 23 * (F.col("doc_id") % 13) > 450,
                   1.0).otherwise(0.0).alias("y")))
    train = feats.filter("doc_id % 4 != 0")
    hold = feats.filter("doc_id % 4 = 0")
    model = logit_fit(train, ["x"], "y")
    # the score-equation gradient Σ(y−p)·x SCALES WITH N (float
    # accumulation over n rows), so the certificate is per-row —
    # an absolute 1e-6 bound held at sf0.01 but tripped on the
    # converged fit at 30× (n≈112k, grad≈5.7e-6)
    assert model["grad_norm"] < 1e-6 * max(1, model["n"]), \
        f"IRLS certificate failed: grad_norm={model['grad_norm']} " \
        f"over n={model['n']}"
    # score equation with intercept ⇒ Σ(y − p) = 0 on train
    tr = (logit_score(train, model, out="p")
          .agg(F.sum("p").alias("sp"), F.sum("y").alias("sy")).first())
    assert abs(tr["sp"] - tr["sy"]) < 1e-6 * max(1, model["n"]), \
        "train calibration broken"
    from pyspark.sql import Window
    # global window by design: the oracle's DuckDB NTILE needs the
    # same total order, and the frame is the HOLDOUT split (quarter
    # of the docs table — gate-scale, not operator code); a 100 TB
    # calibration would bucket by approxQuantile(p) instead
    w = Window.orderBy("x", "doc_id")
    scored = (logit_score(hold, model, out="p")
              .withColumn("bucket", F.ntile(5).over(w)))
    out = (scored.groupBy("bucket")
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.round(F.avg("y"), 4).cast("double").alias("mean_label"),
                F.avg("p").alias("__mean_p")))
    for r in out.collect():
        assert abs(r["__mean_p"] - r["mean_label"]) < 0.2, \
            f"holdout bucket {r['bucket']} miscalibrated: " \
            f"p̄={r['__mean_p']:.3f} ȳ={r['mean_label']:.3f}"
    return out.drop("__mean_p")


# ---------------------------------------------------------------------------
# MMR diverse selection — round 8
# ---------------------------------------------------------------------------

_MMR_K = 8
_MMR_LAM = 0.75      # 1 − λ = 0.25 exactly representable: both engines
                     # compute the identical IEEE score expression
_MMR_QID = 0         # query vector = this embedding row
_MMR_MOD = 3         # candidates: vec_id % MOD == 1


def _mmr_oracle(dialect: str = "duckdb") -> str:
    """The greedy MMR walk as chained CTEs: pick i joins picks 0..i−1
    back in to evaluate the redundancy penalty — the exact replay of
    the operator's k distributed argmax rounds. ``dialect`` renders
    the same query for DuckDB (the correctness oracle) or Spark SQL
    (the plain-Spark baseline twin — tools/baseline_bench.py)."""
    if dialect == "spark":
        def dot(a, b):
            return (f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
                    f"CAST(0.0 AS DOUBLE), (acc, z) -> acc + z)")
        dbl = "transform(embedding, x -> CAST(x AS DOUBLE))"
    else:
        def dot(a, b):
            return f"list_dot_product({a}, {b})"
        dbl = "embedding::DOUBLE[]"

    def cos(v, p):
        return (f"ROUND({dot(v, p)} / "
                f"(sqrt({dot(v, v)}) * "
                f"sqrt({dot(p, p)})), 6)")
    ctes = [f"""
p0 AS (SELECT r.vec_id, r.v,
              ROUND({_MMR_LAM} * r.rel - {1.0 - _MMR_LAM} * 0.0, 6)
                AS score
       FROM r ORDER BY score DESC, r.vec_id LIMIT 1)"""]
    for i in range(1, _MMR_K):
        prior = ", ".join(f"p{j}" for j in range(i))
        pens = [cos("r.v", f"p{j}.v") for j in range(i)]
        pen = pens[0] if i == 1 else f"GREATEST({', '.join(pens)})"
        not_in = ", ".join(f"p{j}.vec_id" for j in range(i))
        ctes.append(f"""
p{i} AS (SELECT r.vec_id, r.v,
              ROUND({_MMR_LAM} * r.rel - {1.0 - _MMR_LAM} * ({pen}), 6)
                AS score
         FROM r, {prior}
         WHERE r.vec_id NOT IN ({not_in})
         ORDER BY score DESC, r.vec_id LIMIT 1)""")
    unions = "\nUNION ALL\n".join(
        f"SELECT {i} AS rank, vec_id, score FROM p{i}"
        for i in range(_MMR_K))
    return f"""
WITH q AS (SELECT {dbl} AS qv FROM embeddings
           WHERE vec_id = {_MMR_QID}),
c AS (SELECT vec_id, {dbl} AS v FROM embeddings
      WHERE vec_id % {_MMR_MOD} = 1),
r AS (SELECT c.vec_id, c.v,
             {cos('c.v', 'q.qv')} AS rel
      FROM c, q),
{','.join(ctes)}
SELECT CAST(rank AS INT) AS rank, vec_id,
       CAST(score AS DOUBLE) AS score
FROM ({unions})
"""


@query("similarity_mmr_select", oracle=_mmr_oracle(),
       spark_oracle=_mmr_oracle("spark"))
def similarity_mmr_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance top-k
    (operators/similarity.mmr_select, Carbonell & Goldstein 1998):
    the diversity-aware selection step of retrieval and of
    training-data curation — each of the k rounds is ONE distributed
    TakeOrderedAndProject argmax over the candidate corpus, with the
    already-picked vectors folded back as literal arrays so the
    redundancy penalty runs JVM-side with zero self-joins. The
    oracle replays the identical greedy walk as chained CTEs
    (same ROUND(·,6) + id tie-break at every step), so a green hash
    proves the distributed argmax sequence equals the textbook
    algorithm — relevance decomposition, max-penalty, walk order and
    all."""
    from ..operators.similarity import mmr_select
    from ..sources.registry import load_table
    emb = load_table(spark, sf_dir, "embeddings")
    to_d = lambda c: F.transform(F.col(c), lambda x: x.cast("double"))  # noqa: E731
    qv = (emb.filter(F.col("vec_id") == _MMR_QID)
          .select(to_d("embedding")).first()[0])
    cand = cache_tracked(
        emb.filter(F.col("vec_id") % _MMR_MOD == 1)
        .select("vec_id", to_d("embedding").alias("e")))
    picks = mmr_select(cand, qv, _MMR_K, lam=_MMR_LAM,
                       id_col="vec_id", vec_col="e")
    return spark.createDataFrame(
        [(p["rank"], p["vec_id"], p["score"]) for p in picks],
        "rank int, vec_id bigint, score double")


# ---------------------------------------------------------------------------
# Hash-derived negative sampling — round 8
# ---------------------------------------------------------------------------

_NEG_K = 4            # negatives per anchor
_NEG_MOD = 17         # anchors: vec_id % MOD == 0

_NEG_HEX12_SQL = "(" + " + ".join(
    f"(strpos('0123456789abcdef', substr(h, {p + 1}, 1)) - 1)"
    f" * {16 ** (11 - p)}" for p in range(12)) + ")"


@query("sample_hard_negatives", oracle=f"""
WITH ids AS (SELECT vec_id,
                    ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS r
             FROM embeddings),
nn AS (SELECT COUNT(*) AS n FROM embeddings),
anch AS (SELECT vec_id AS a_id, label AS a_label FROM embeddings
         WHERE vec_id % {_NEG_MOD} = 0),
cand AS (
  SELECT a_id, a_label, j,
         {_NEG_HEX12_SQL} % nn.n AS neg_r
  FROM (SELECT a.a_id, a.a_label, u.j,
               md5(CAST(a.a_id AS VARCHAR) || '#'
                   || CAST(u.j AS VARCHAR)) AS h
        FROM anch a, UNNEST(range(1, {_NEG_K} + 1)) AS u(j)), nn),
pairs AS (
  SELECT c.a_label, e.label AS n_label
  FROM cand c
  JOIN ids i ON i.r = c.neg_r
  JOIN embeddings e ON e.vec_id = i.vec_id
  WHERE i.vec_id <> c.a_id)
SELECT a_label, n_label, COUNT(*) AS n_pairs
FROM pairs GROUP BY a_label, n_label
""", spark_oracle=f"""
WITH ids AS (SELECT vec_id,
                    ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS r
             FROM embeddings),
nn AS (SELECT COUNT(*) AS n FROM embeddings),
anch AS (SELECT vec_id AS a_id, label AS a_label FROM embeddings
         WHERE vec_id % {_NEG_MOD} = 0),
hashed AS (
  SELECT a.a_id, a.a_label, j,
         md5(CAST(a.a_id AS STRING) || '#' || CAST(j AS STRING)) AS h
  FROM anch a LATERAL VIEW explode(sequence(1, {_NEG_K})) u AS j),
cand AS (
  SELECT a_id, a_label, j,
         CAST(conv(substring(h, 1, 12), 16, 10) AS BIGINT) % nn.n AS neg_r
  FROM hashed, nn),
pairs AS (
  SELECT c.a_label, e.label AS n_label
  FROM cand c
  JOIN ids i ON i.r = c.neg_r
  JOIN embeddings e ON e.vec_id = i.vec_id
  WHERE i.vec_id <> c.a_id)
SELECT a_label, n_label, COUNT(*) AS n_pairs
FROM pairs GROUP BY a_label, n_label
""")
def sample_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-derived negative sampling for contrastive
    training pairs: each anchor gets k pseudo-random partners from
    md5(anchor#j) folded into the DENSE RANK space 0..n-1
    (operators/ranking) and mapped rank→id. Folding into ranks
    instead of the raw id span makes the derivation sparse-id-robust:
    after any filter/shard remap leaves gaps, raw-span folding lands
    mostly in holes and silently yields zero partners (the r8
    30×-probe footgun); rank folding yields exactly k per anchor
    minus deterministic self-collisions, on ANY id layout. NO cross
    join, no shuffle of the corpus — the rank map and the id→label
    projection are the only joined frames, both narrow. The rank map
    is the size-adaptive choice (r11): dense_ranks_lazy here — the
    whole derivation one lazy plan, zero construction jobs, since a
    single ordering task comfortably holds the gate corpora's
    distinct ids — and the two-phase checkpoint+offset dense_ranks
    when the id domain outgrows one task (both produce IDENTICAL
    ranks, pinned by test_dense_ranks_lazy_equals_two_phase). The
    oracle replays the same global-window ROW_NUMBER, so the
    label-pair matrix hash pins the whole derivation. The pipeline
    role: negative pairs for embedding/contrastive training at
    100 TB without materializing a candidate cross product."""
    from ..operators.ranking import dense_ranks_auto
    from ..sources.registry import load_table
    emb = load_table(spark, sf_dir, "embeddings")
    # auto gate (r12): lazy single-window while the distinct-id hint
    # fits one ordering task, two-phase past ~10⁷ — the per-call-site
    # choice VERDICT r11 flagged as a 100 TB copy-paste footgun now
    # lives behind one entry point (ranks identical either way,
    # pinned by test_dense_ranks_lazy_equals_two_phase)
    ranks, nf = dense_ranks_auto(emb, "vec_id", out="r",
                                 n_hint=1 << 20)
    anch = (emb.filter(F.col("vec_id") % _NEG_MOD == 0)
            .select(F.col("vec_id").alias("a_id"),
                    F.col("label").alias("a_label")))
    key = F.concat(F.col("a_id").cast("string"), F.lit("#"),
                   F.col("j").cast("string"))
    cand = (anch.select(
        "a_id", "a_label",
        F.explode(F.array(*[F.lit(j) for j in
                            range(1, _NEG_K + 1)])).alias("j"))
        .crossJoin(F.broadcast(nf))
        .select("a_id", "a_label",
                (F.conv(F.substring(F.md5(key.cast("binary")), 1, 12),
                        16, 10).cast("long") % F.col("n"))
                .alias("r")))
    lab = emb.select(F.col("vec_id").alias("neg_id"),
                     F.col("label").alias("n_label"))
    return (cand.join(ranks.withColumnRenamed("vec_id", "neg_id"), "r")
            .filter(F.col("neg_id") != F.col("a_id"))
            .join(lab, "neg_id")
            .groupBy("a_label", "n_label")
            .agg(F.count(F.lit(1)).alias("n_pairs")))
