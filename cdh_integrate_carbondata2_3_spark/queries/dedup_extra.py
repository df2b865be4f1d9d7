"""Near-duplicate detection + ANN similarity — the scale paths.

Completes the training-data-pipeline dedup family beyond
``pipeline.py`` (exact + MinHash/LSH): SimHash, word-n-gram Jaccard,
embedding-cosine near-dup, and multi-probe LSH approximate
nearest-neighbor search. The reference's own dedup surface is
MERGE-insert-if-not-exists (reference examples/.../DedupExample.scala);
these operators are the 100TB-scale generalizations.

Every operator is expressed twice from the *same Python constants*:
once as Spark column expressions and once as DuckDB oracle SQL, so the
driver's value-hash comparison pins the semantics bit-for-bit. All
hashing derives from md5 hex (identical in both engines); no
engine-specific ``hash()`` is used.

Scale notes (all operators):
- the O(n²) pair space is never materialized — candidates come from
  band/bucket collisions (SimHash bands, shingle inverted index,
  sign-buckets, LSH buckets) and only candidates are verified;
- bucket keys are small fixed-width values, so the self-join shuffles
  are narrow;
- everything is built-in-function DataFrame ops (explode / groupBy /
  join) — no Python UDF anywhere in these paths.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.registry import load_table
from . import cache_tracked, query
from .pipeline import _docs, _tokens

# ---------------------------------------------------------------------------
# SimHash near-dup: banded LSH over md5-derived sign bits. The gate
# constants are SIZED FROM the largest corpus any gate artifact runs
# (the 30× replica, tools/make_scale.py), not pinned at demo scale —
# the r4 lesson: a gate query is the artifact users copy, so its
# blocking must survive the biggest measured run. Occupancy math:
# operators/dedup.planes_for.
# ---------------------------------------------------------------------------

from ..operators.dedup import planes_for  # noqa: E402

# largest corpus a gate artifact touches: 30× replica of sf0.1
_GATE_MAX_DOCS = 150_000
_GATE_MAX_VECS = 60_000

_SIM_BANDS = 4
# band width sized so per-band buckets hold ~5 docs at the 30× corpus
# (hamming verify is cheap, so a small occupancy target is affordable):
# planes_for(150k, 5) = 15-bit bands → 32 768 buckets per band
_SIM_BITS = _SIM_BANDS * planes_for(_GATE_MAX_DOCS, 5)        # 60
# ham ≤ 2 of 60 ≈ the old ham ≤ 1 of 32 selectivity: this synthetic
# corpus has a tiny vocabulary, so token SETS collide heavily and
# looser thresholds flag ~half the pair space
_SIM_MAX_HAMMING = 2


def _hexval_sql(h: str, p: int) -> str:
    """Value 0..15 of 0-indexed hex char ``p`` of md5-hex expression ``h``."""
    return f"(strpos('0123456789abcdef', substr({h}, {p + 1}, 1)) - 1)"


def _simhash_oracle(bits: int = _SIM_BITS, bands: int = _SIM_BANDS,
                    max_hamming: int = _SIM_MAX_HAMMING) -> str:
    """DuckDB mirror of simhash_near_dups(bits, bands, max_hamming) —
    parameterized so the batch gate (60/4) and the streaming-parity
    gate (32/4: the per-row streaming signature form caps at 32 bits)
    generate from the same template. ``bits`` ≤ 62 (the packed CASE
    literals must fit a signed BIGINT on both engines)."""
    if not bits % bands == 0 or bits > 62:
        raise ValueError("bits must divide into bands and stay ≤ 62")
    w = bits // bands
    mask = (1 << w) - 1
    # per-token ±1 contribution for each signature bit
    contribs = ", ".join(
        f"(((({_hexval_sql('h', j // 4)}) >> {j % 4}) & 1) * 2 - 1) AS c{j}"
        for j in range(bits))
    sums = ", ".join(f"SUM(c{j}) AS s{j}" for j in range(bits))
    pack = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(bits))
    bands_sql = ", ".join(
        f"((sim >> {w * b}) & {mask}) AS band{b}" for b in range(bands))
    band_union = "\nUNION\n".join(
        f"""  SELECT a.doc_id AS doc_a, a.sim AS sim_a, b.doc_id AS doc_b, b.sim AS sim_b
  FROM banded a JOIN banded b ON a.band{b} = b.band{b} AND a.doc_id < b.doc_id"""
        for b in range(bands))
    return f"""
WITH toks AS (
  SELECT DISTINCT doc_id, unnest(string_split_regex(trim(text), ' +')) AS tok
  FROM documents
), bits AS (
  SELECT doc_id, {contribs}
  FROM (SELECT doc_id, md5(tok) AS h FROM toks)
), sums AS (
  SELECT doc_id, {sums} FROM bits GROUP BY doc_id
), sigs AS (
  SELECT doc_id, CAST({pack} AS BIGINT) AS sim FROM sums
), banded AS (
  SELECT doc_id, sim, {bands_sql} FROM sigs
), cand AS (
{band_union}
)
SELECT doc_a, doc_b, CAST(bit_count(xor(sim_a, sim_b)) AS INT) AS hamming
FROM cand
WHERE bit_count(xor(sim_a, sim_b)) <= {max_hamming}
"""


@query("dedup_simhash", oracle=_simhash_oracle())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 60-bit signature (sign of summed ±1 md5
    bit contributions over the distinct token set), 4×15-bit-band LSH
    candidates (32 768 buckets per band — sized for the 30× replica
    corpus via planes_for, NOT a demo constant), exact hamming verify.

    Delegates to the parameterized ``operators.dedup.simhash_near_dups``
    (production knobs: signature width ≤64, band count, hamming cap;
    bucket-occupancy sizing math in that module's docstring)."""
    from ..operators.dedup import simhash_near_dups

    toks = _tokens(_docs(spark, sf_dir))
    pairs = simhash_near_dups(toks, "doc_id", "tok", bits=_SIM_BITS,
                              bands=_SIM_BANDS, max_hamming=_SIM_MAX_HAMMING)
    return pairs.select(F.col("id_a").alias("doc_a"),
                        F.col("id_b").alias("doc_b"), "hamming")


# ---------------------------------------------------------------------------
# Word-bigram Jaccard near-dup: shingle inverted index (df-capped) for
# candidates, exact Jaccard verify.
# ---------------------------------------------------------------------------

_NGRAM_DF_CAP = 100      # shingles seen in more docs don't generate candidates
_NGRAM_THRESHOLD = 0.5


def _ngram_oracle() -> str:
    return f"""
WITH grams AS (
  SELECT DISTINCT doc_id, unnest(list_transform(
      generate_series(1, len(string_split_regex(trim(text), ' +')) - 1),
      i -> string_split_regex(trim(text), ' +')[i] || ' ' ||
           string_split_regex(trim(text), ' +')[i + 1])) AS g
  FROM documents
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_g FROM grams GROUP BY doc_id
), rare AS (
  SELECT g FROM grams GROUP BY g HAVING COUNT(*) <= {_NGRAM_DF_CAP}
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
)
SELECT i.doc_a, i.doc_b,
       CAST(ROUND(CAST(i.n_common AS DOUBLE) / (sa.n_g + sb.n_g - i.n_common), 4) AS DOUBLE) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE CAST(i.n_common AS DOUBLE) / (sa.n_g + sb.n_g - i.n_common) >= {_NGRAM_THRESHOLD}
"""


@query("dedup_ngram_jaccard", oracle=_ngram_oracle())
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-bigram Jaccard near-dup pairs via a df-capped shingle
    inverted index (the df cap is the scale knob: frequent shingles
    produce quadratic candidate blowup and almost no signal, exactly
    the stop-shingle rule used by large-scale dedup pipelines)."""
    from ..operators.dedup import ngram_jaccard_near_dups

    pairs = ngram_jaccard_near_dups(_docs(spark, sf_dir), "doc_id", "text",
                                    n=2, df_cap=_NGRAM_DF_CAP,
                                    threshold=_NGRAM_THRESHOLD)
    return pairs.select(F.col("id_a").alias("doc_a"),
                        F.col("id_b").alias("doc_b"), "jaccard")


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup: sign-bucket blocking + exact cosine verify.
# ---------------------------------------------------------------------------

_COS_THRESHOLD = 0.40
# blocking planes sized for the largest gate corpus (30× replica,
# 60k vectors) at ~256 occupancy: planes_for(60_000, 256) = 8 →
# 256 sign buckets. The r4 curve measured the old demo constant
# (3 planes, 8 buckets) at 22.4× wall for 10× data — quadratic per
# bucket — and 18× recovery with the sized count (SCALE.md).
_SIGN_DIMS = planes_for(_GATE_MAX_VECS, 256)                  # 8


def _emb_near_oracle() -> str:
    bucket = " + ".join(
        f"(CASE WHEN embedding[{d + 1}] > 0 THEN {1 << d} ELSE 0 END)"
        for d in range(_SIGN_DIMS))
    return f"""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS e, ({bucket}) AS bk FROM embeddings
), pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         list_dot_product(a.e, b.e)
           / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) AS cos
  FROM v a JOIN v b ON a.bk = b.bk AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, CAST(ROUND(cos, 6) AS DOUBLE) AS cos_sim
FROM pairs WHERE cos >= {_COS_THRESHOLD}
"""


@query("dedup_embedding_near", oracle=_emb_near_oracle())
def dedup_embedding_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: block on the sign pattern of the
    leading dims (2^k buckets — random-hyperplane LSH with axis-aligned
    planes), verify exact cosine within buckets. Recall/cost tradeoff
    is the bucket count; the pair space is quadratic only per bucket."""
    from ..operators.dedup import cosine_near_dups

    emb = load_table(spark, sf_dir, "embeddings")
    dv = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    v = emb.select("vec_id", dv.alias("e"))
    pairs = cosine_near_dups(v, "vec_id", "e", threshold=_COS_THRESHOLD,
                             planes=_SIGN_DIMS, axis_aligned=True)
    return pairs.select(F.col("id_a").alias("vec_a"),
                        F.col("id_b").alias("vec_b"), "cos_sim")


# ---------------------------------------------------------------------------
# Multi-probe LSH ANN: random-hyperplane signatures (deterministic
# integer weights), flip-1 probe expansion, exact-cosine rerank.
# ---------------------------------------------------------------------------

_ANN_PLANES = 4
_ANN_DIM = 64
_ANN_QUERY_VECS = 10
_ANN_TOP_K = 5

# one cosine/dot template per dialect, shared by the whole ANN family
# (and re-exported to hardening.py's SemDeDup/hybrid-rerank oracles)
_COS_SQL = ("list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a}))"
            " * sqrt(list_dot_product({b}, {b})))")
_DOT_SPARK_T = ("aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
                "CAST(0.0 AS DOUBLE), (acc, z) -> acc + z)")
_COS_SPARK = (_DOT_SPARK_T.format(a="{a}", b="{b}")
              + " / (sqrt(" + _DOT_SPARK_T.format(a="{a}", b="{a}")
              + ") * sqrt(" + _DOT_SPARK_T.format(a="{b}", b="{b}") + "))")


def _plane_weights(i: int) -> list[int]:
    """Deterministic pseudo-random hyperplane ±-ish integer weights —
    reproducible in SQL as literals, no RNG."""
    return [((i * 37 + j * 91) % 19) - 9 for j in range(_ANN_DIM)]


def _dot_literal(vec: str, weights: list[int], dialect: str) -> str:
    """dot(vec, literal weight array) in either SQL dialect."""
    if dialect == "spark":
        arr = ", ".join(f"{w}.0D" for w in weights)
        return (f"aggregate(zip_with({vec}, array({arr}), "
                "(x, y) -> x * y), CAST(0.0 AS DOUBLE), "
                "(acc, z) -> acc + z)")
    arr = ", ".join(f"{w}.0" for w in weights)
    return f"list_dot_product({vec}, [{arr}])"


def _ann_oracle(dialect: str = "duckdb") -> str:
    sig = " + ".join(f"p{i}" for i in range(_ANN_PLANES))
    proj_cols = ", ".join(
        f"(CASE WHEN {_dot_literal('e', _plane_weights(i), dialect)}"
        f" > 0 THEN {1 << i} ELSE 0 END) AS p{i}"
        for i in range(_ANN_PLANES))
    flips = ", ".join(str(f) for f in [0] + [1 << i for i in range(_ANN_PLANES)])
    if dialect == "spark":
        dbl = "transform(embedding, x -> CAST(x AS DOUBLE))"
        cos = _COS_SPARK
        probe_src = (f"FROM sigs LATERAL VIEW explode(array({flips}))"
                     " t AS f")
        xor = "(sig ^ f)"
    else:
        dbl = "embedding::DOUBLE[]"
        cos = _COS_SQL
        probe_src = f"FROM sigs, unnest([{flips}]) AS t(f)"
        xor = "xor(sig, f)"
    cos_qc = cos.format(a="qe", b="ce")
    return f"""
WITH v AS (
  SELECT vec_id, {dbl} AS e FROM embeddings
), sigs AS (
  SELECT vec_id, e, ({sig}) AS sig
  FROM (SELECT vec_id, e, {proj_cols} FROM v)
), q AS (
  SELECT vec_id AS q_id, e AS qe, {xor} AS probe
  {probe_src}
  WHERE vec_id < {_ANN_QUERY_VECS}
), c AS (
  SELECT vec_id AS c_id, e AS ce, sig FROM sigs WHERE vec_id >= {_ANN_QUERY_VECS}
), cand AS (
  SELECT DISTINCT q_id, c_id, qe, ce FROM q JOIN c ON c.sig = q.probe
), scored AS (
  SELECT q_id, c_id,
         CAST(ROUND({cos_qc}, 6) AS DOUBLE) AS cos_sim
  FROM cand
), ranked AS (
  SELECT q_id, c_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, c_id) AS rk
  FROM scored)
SELECT q_id, c_id, cos_sim, rk FROM ranked WHERE rk <= {_ANN_TOP_K}
"""


@query("similarity_ann_lsh", oracle=_ann_oracle(),
       spark_oracle=_ann_oracle("spark"))
def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k cosine neighbors via multi-probe
    random-hyperplane LSH: 2^planes buckets, query probes its own
    bucket plus every flip-1 neighbor bucket, candidates reranked by
    exact cosine. The scale path for ``similarity_cosine_topk``'s
    brute force — candidate count is corpus/2^planes × probes instead
    of the full corpus."""
    from ..operators.dedup import ann_lsh_topk

    emb = load_table(spark, sf_dir, "embeddings")
    dv = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    v = emb.select("vec_id", dv.alias("e"))
    return ann_lsh_topk(v.filter(F.col("vec_id") >= _ANN_QUERY_VECS),
                        v.filter(F.col("vec_id") < _ANN_QUERY_VECS),
                        "vec_id", "e", planes=_ANN_PLANES, dim=_ANN_DIM,
                        k=_ANN_TOP_K, flip_radius=1)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse-quantizer lists + nprobe search —
# the partition-pruning scale path next to the LSH multi-probe variant.
# ---------------------------------------------------------------------------

_IVF_CENTROID_IDS = (20, 80, 140, 200, 260, 320, 380, 440)
_IVF_NPROBE = 2
_IVF_TOP_K = 5
_IVF_QUERY_VECS = 10


def _ivf_oracle(dialect: str = "duckdb") -> str:
    ids = ", ".join(str(i) for i in _IVF_CENTROID_IDS)
    cos = _COS_SPARK if dialect == "spark" else _COS_SQL
    dbl = ("transform(embedding, x -> CAST(x AS DOUBLE))"
           if dialect == "spark" else "embedding::DOUBLE[]")
    cos_ct = cos.format(a="c.e", b="t.ce")
    cos_qt = cos.format(a="q.qe", b="t.ce")
    cos_qc = cos.format(a="cand.qe", b="cand.ce")
    return f"""
WITH v AS (
  SELECT vec_id, {dbl} AS e FROM embeddings
), cent AS (
  SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id IN ({ids})
), corpus AS (
  SELECT vec_id AS id, e FROM v WHERE vec_id >= {_IVF_QUERY_VECS}
), assigned AS (
  SELECT id, e, cid AS list_id FROM (
    SELECT c.id, c.e, t.cid,
           ROW_NUMBER() OVER (PARTITION BY c.id
                              ORDER BY {cos_ct} DESC, t.cid) AS rn
    FROM corpus c CROSS JOIN cent t)
  WHERE rn = 1
), q AS (
  SELECT vec_id AS q_id, e AS qe FROM v WHERE vec_id < {_IVF_QUERY_VECS}
), probes AS (
  SELECT q_id, qe, cid AS list_id FROM (
    SELECT q.q_id, q.qe, t.cid,
           ROW_NUMBER() OVER (PARTITION BY q.q_id
                              ORDER BY {cos_qt} DESC, t.cid) AS rn
    FROM q CROSS JOIN cent t)
  WHERE rn <= {_IVF_NPROBE}
), cand AS (
  SELECT p.q_id, p.qe, a.id AS c_id, a.e AS ce
  FROM probes p JOIN assigned a ON a.list_id = p.list_id
), scored AS (
  SELECT q_id, c_id,
         CAST(ROUND({cos_qc}, 6) AS DOUBLE) AS cos_sim
  FROM cand
), ranked AS (
  SELECT q_id, c_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY q_id
                            ORDER BY cos_sim DESC, c_id) AS rk
  FROM scored)
SELECT q_id, c_id, cos_sim, rk FROM ranked WHERE rk <= {_IVF_TOP_K}
"""


@query("similarity_ann_ivf", oracle=_ivf_oracle(),
       spark_oracle=_ivf_oracle("spark"))
def similarity_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate nearest neighbor: corpus vectors assigned once
    to their nearest centroid's inverted list (broadcast argmax, no
    corpus shuffle), queries probe only the nprobe nearest lists and
    rerank candidates by exact cosine — at cluster scale the lists are
    write-time partitions, so a probe touches nprobe partitions
    instead of the whole corpus (operators/similarity.py)."""
    from ..operators.similarity import ivf_assign, ivf_search

    emb = load_table(spark, sf_dir, "embeddings")
    dv = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    # cache the decoded vectors: the interpreted element-cast transform
    # would otherwise re-run for every sub-job (centroid collect,
    # assignment, probe selection, rerank)
    v = cache_tracked(emb.select(F.col("vec_id").alias("id"), dv.alias("e")))
    centroids = (v.filter(F.col("id").isin(list(_IVF_CENTROID_IDS)))
                 .select(F.col("id").alias("cid"), F.col("e").alias("ce")))
    corpus = v.filter(F.col("id") >= _IVF_QUERY_VECS)
    queries = v.filter(F.col("id") < _IVF_QUERY_VECS)
    assigned = ivf_assign(corpus, centroids)
    return ivf_search(assigned, centroids, queries,
                      nprobe=_IVF_NPROBE, k=_IVF_TOP_K)


# ---------------------------------------------------------------------------
# ExactSubstr-style duplicated spans (Lee et al. 2022): fraction of each
# document inside cross-document repeated 8-token shingles.
# ---------------------------------------------------------------------------

@query("dedup_substring_spans", oracle=r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS a FROM documents
), shingles AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(len(a) - 7, 0) + 1),
                i -> array_to_string(a[i:i+7], ' '))) AS g
  FROM toks
), dfreq AS (
  SELECT g, COUNT(DISTINCT doc_id) AS df FROM shingles GROUP BY g
), per_doc AS (
  SELECT doc_id, COUNT(*) AS n_shingles FROM shingles GROUP BY doc_id
), dup AS (
  SELECT s.doc_id, COUNT(*) AS n_dup
  FROM shingles s JOIN dfreq f ON s.g = f.g AND f.df >= 2
  GROUP BY s.doc_id
)
SELECT p.doc_id,
       p.n_shingles,
       COALESCE(d.n_dup, 0) AS n_dup_shingles,
       CAST(ROUND(COALESCE(d.n_dup, 0) * 1.0 / p.n_shingles, 4) AS DOUBLE)
         AS dup_ratio
FROM per_doc p LEFT JOIN dup d USING (doc_id)
""", spark_oracle=r"""
WITH toks AS (
  SELECT doc_id, split(trim(text), ' +') AS a FROM documents
), shingles AS (
  SELECT doc_id,
         explode(transform(
             CASE WHEN size(a) >= 8 THEN sequence(1, size(a) - 7)
                  ELSE CAST(array() AS ARRAY<INT>) END,
             i -> concat_ws(' ', slice(a, i, 8)))) AS g
  FROM toks
), dfreq AS (
  SELECT g, COUNT(DISTINCT doc_id) AS df FROM shingles GROUP BY g
), per_doc AS (
  SELECT doc_id, COUNT(*) AS n_shingles FROM shingles GROUP BY doc_id
), dup AS (
  SELECT s.doc_id, COUNT(*) AS n_dup
  FROM shingles s JOIN dfreq f ON s.g = f.g AND f.df >= 2
  GROUP BY s.doc_id
)
SELECT p.doc_id,
       p.n_shingles,
       COALESCE(d.n_dup, 0) AS n_dup_shingles,
       CAST(ROUND(COALESCE(d.n_dup, 0) * 1.0 / p.n_shingles, 4) AS DOUBLE)
         AS dup_ratio
FROM per_doc p LEFT JOIN dup d USING (doc_id)
""")
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-span stats via 8-token shingle blocking —
    the distributed form of suffix-array ExactSubstr dedup (the paper's
    single-machine suffix array becomes an explode + one df groupBy;
    operators/dedup.duplicated_spans, key='hash' is the 100 TB wire
    format, the gate runs key='text' so DuckDB reproduces it exactly)."""
    from ..operators.dedup import duplicated_spans
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return duplicated_spans(docs, "doc_id", "text", n=8, min_df=2,
                            key="text")


@query("dedup_substring_trim", oracle=r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS a FROM documents
), shingles AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(len(a) - 7, 0) + 1),
                i -> {'pos': i, 'g': array_to_string(a[i:i+7], ' ')})) AS s
  FROM toks
), dupg AS (
  SELECT g FROM (
    SELECT s.g AS g, COUNT(DISTINCT doc_id) AS df FROM shingles GROUP BY 1
  ) WHERE df >= 2
), ps AS (
  SELECT doc_id, list(s.pos) AS ps
  FROM shingles WHERE s.g IN (SELECT g FROM dupg)
  GROUP BY doc_id
)
SELECT t.doc_id,
       len(a) AS n_tokens,
       len(a) - len(kept) AS n_removed,
       COALESCE(array_to_string(list_transform(kept, i -> a[i]), ' '), '')
         AS trimmed
FROM (
  SELECT t.doc_id, t.a,
         list_filter(range(1, len(t.a) + 1),
                     i -> len(list_filter(COALESCE(p.ps, []),
                                          q -> q <= i AND i <= q + 7)) = 0)
           AS kept
  FROM toks t LEFT JOIN ps p USING (doc_id)
) t(doc_id, a, kept)
""")
def dedup_substring_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr trimming: every token inside a cross-document
    duplicated 8-token shingle is removed and the survivors re-joined
    (Lee et al. 2022; operators/dedup.trim_duplicated_spans). The
    oracle rebuilds the same interval cover with DuckDB nested list
    lambdas and must produce byte-identical trimmed text."""
    from ..operators.dedup import trim_duplicated_spans
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return trim_duplicated_spans(docs, "doc_id", "text", n=8, min_df=2)


_SSJ_T = 0.8                # exact-join threshold
_SSJ_MOD = 5                # doc_id % MOD == 0 subset (oracle pairs
                            # the subset quadratically; ours never does)


@query("join_jaccard_exact", oracle=f"""
WITH s AS (
  SELECT doc_id AS id, list(DISTINCT w) AS toks
  FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w
        FROM documents WHERE doc_id % {_SSJ_MOD} = 0) t
  WHERE w != ''
  GROUP BY doc_id
)
SELECT a.id AS id_l, b.id AS id_r,
       ROUND(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
             / (len(a.toks) + len(b.toks)
                - len(list_intersect(a.toks, b.toks))), 6) AS jacc
FROM s a JOIN s b ON a.id < b.id
WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
      / (len(a.toks) + len(b.toks)
         - len(list_intersect(a.toks, b.toks))) >= {_SSJ_T}
""")
def join_jaccard_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Jaccard set-similarity self-join via prefix filtering
    (operators/ssjoin.py — SSJoin/PPJoin): rarest-first canonical
    order, prefix-token candidate join, length filter, HOF
    verification. The oracle verifies by QUADRATIC pairing of the
    same subset, so a green hash proves the prefix filter loses no
    pair and admits no extra — exact where the MinHash/SimHash
    operators are probabilistic."""
    from ..operators.ssjoin import jaccard_join
    d = (_docs(spark, sf_dir)
         .filter(F.col("doc_id") % _SSJ_MOD == 0)
         .select("doc_id",
                 F.filter(F.split(F.trim("text"), r"\s+"),
                          lambda w: w != "").alias("toks")))
    return jaccard_join(d, "doc_id", "toks", _SSJ_T)


# ---------------------------------------------------------------------------
# Product-quantization (PQ) compressed ANN: m-byte codes instead of
# m×dsub×8-byte floats — the memory/IO reduction (here 64 doubles →
# 4 codes, 128×) that makes billion-vector search feasible (Jégou et
# al. TPAMI 2011; the FAISS IVF-PQ layout). Codebook entries are
# pinned data subvectors so the oracle can replay encode + ADC
# bit-for-bit; pq_train (per-subspace Lloyd's) is the production
# trainer, exactness-pinned in tests/test_pq.py.
# ---------------------------------------------------------------------------

_PQ_M = 4
_PQ_DSUB = 16
_PQ_CODE_IDS = (15, 60, 110, 170, 230, 290, 350, 410)   # K = 8
_PQ_QUERY_VECS = 10
_PQ_TOP_K = 5

_PQ_D2 = ("list_sum(list_transform(generate_series(1, {n}), "
          "__i -> ({a}[__i] - {b}[__i]) * ({a}[__i] - {b}[__i])))")


def _pq_oracle(dialect: str = "duckdb") -> str:
    codes = ", ".join(f"({c}, {vid})"
                      for c, vid in enumerate(_PQ_CODE_IDS))
    if dialect == "spark":
        dbl = "transform(embedding, x -> CAST(x AS DOUBLE))"
        d2 = ("aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
              "CAST(0.0 AS DOUBLE), (acc, z) -> acc + z)")
        sub_slice = f"slice({{v}}, sub * {_PQ_DSUB} + 1, {_PQ_DSUB})"
        cb_slice = (f"slice(cbsrc.e, s.sub * {_PQ_DSUB} + 1, {_PQ_DSUB})")
        subs = f"(SELECT explode(sequence(0, {_PQ_M - 1})) AS sub) s"
        # ordered list-aggs: sort struct(key, val) pairs, project val
        codes_agg = ("transform(array_sort(collect_list("
                     "struct(sub, code))), p -> p.code)")
        lut_row_agg = ("transform(array_sort(collect_list("
                       "struct(code, d2))), p -> p.d2)")
        lut_agg = ("transform(array_sort(collect_list("
                   "struct(sub, lrow))), p -> p.lrow)")
        adc = (f"aggregate(sequence(1, {_PQ_M}), CAST(0.0 AS DOUBLE), "
               "(acc, __s) -> acc + element_at("
               "element_at(lut.lut, __s), "
               "element_at(codes.codes, __s) + 1))")
    else:
        dbl = "embedding::DOUBLE[]"
        d2 = _PQ_D2.format(n=_PQ_DSUB, a="{a}", b="{b}")
        sub_slice = (f"list_slice({{v}}, sub * {_PQ_DSUB} + 1, "
                     f"sub * {_PQ_DSUB} + {_PQ_DSUB})")
        cb_slice = (f"list_slice(cbsrc.e, s.sub * {_PQ_DSUB} + 1, "
                    f"s.sub * {_PQ_DSUB} + {_PQ_DSUB})")
        subs = f"(SELECT unnest(range({_PQ_M})) AS sub) s"
        codes_agg = "list(code ORDER BY sub)"
        lut_row_agg = "list(d2 ORDER BY code)"
        lut_agg = "list(lrow ORDER BY sub)"
        adc = (f"list_sum(list_transform(generate_series(1, {_PQ_M}), "
               "__s -> lut.lut[__s][codes.codes[__s] + 1]))")
    d2_enc = d2.format(a=sub_slice.format(v="c.e"), b="cb.cvec")
    d2_lut = d2.format(a=sub_slice.format(v="q.qe"), b="cb.cvec")
    return f"""
WITH v AS (
  SELECT vec_id AS id, {dbl} AS e FROM embeddings
), cbsrc AS (
  SELECT c.code, v.e FROM (VALUES {codes}) AS c(code, vid)
  JOIN v ON v.id = c.vid
), cb AS (
  SELECT s.sub, cbsrc.code, {cb_slice} AS cvec
  FROM {subs} CROSS JOIN cbsrc
), corpus AS (
  SELECT id, e FROM v WHERE id >= {_PQ_QUERY_VECS}
), enc AS (
  SELECT c.id, cb.sub, cb.code, {d2_enc} AS d2
  FROM corpus c CROSS JOIN cb
), codes AS (
  SELECT id, {codes_agg} AS codes FROM (
    SELECT id, sub, code,
           ROW_NUMBER() OVER (PARTITION BY id, sub
                              ORDER BY d2, code) AS rn
    FROM enc) WHERE rn = 1 GROUP BY id
), q AS (
  SELECT id AS q_id, e AS qe FROM v WHERE id < {_PQ_QUERY_VECS}
), lutrows AS (
  SELECT q.q_id, cb.sub, cb.code, {d2_lut} AS d2
  FROM q CROSS JOIN cb
), lut AS (
  SELECT q_id, {lut_agg} AS lut FROM (
    SELECT q_id, sub, {lut_row_agg} AS lrow
    FROM lutrows GROUP BY q_id, sub) GROUP BY q_id
), scored AS (
  SELECT lut.q_id, codes.id AS c_id,
         CAST(ROUND({adc}, 6) AS DOUBLE) AS adc_dist
  FROM codes CROSS JOIN lut
), ranked AS (
  SELECT q_id, c_id, adc_dist,
         ROW_NUMBER() OVER (PARTITION BY q_id
                            ORDER BY adc_dist, c_id) AS rk
  FROM scored)
SELECT q_id, c_id, adc_dist, rk FROM ranked WHERE rk <= {_PQ_TOP_K}
"""


@query("similarity_ann_pq", oracle=_pq_oracle(),
       spark_oracle=_pq_oracle("spark"))
def similarity_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-compressed approximate nearest neighbor: vectors are
    product-quantized to m per-subspace codebook ids at WRITE time
    (operators/similarity.pq_encode — broadcast codebook, partial-agg
    argmin, no corpus shuffle), and each query scans the m-byte code
    table with a precomputed asymmetric-distance lookup table
    (pq_search_adc). The corpus's raw floats are never read at search
    time — the 128× payload reduction IS the scale story: at 10⁹×768d
    the code table is ~100 GB where the floats are ~3 TB. Codebooks
    here are pinned data subvectors so the DuckDB oracle replays
    encode + ADC exactly; the trained path (per-subspace Lloyd's,
    pq_train) is exactness-pinned in tests/test_pq.py."""
    from ..operators.similarity import pq_encode, pq_search_adc

    emb = load_table(spark, sf_dir, "embeddings")
    dv = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    v = cache_tracked(emb.select(F.col("vec_id").alias("id"), dv.alias("e")))
    ids = list(_PQ_CODE_IDS)
    code_of = (F.array_position(
        F.array(*[F.lit(i) for i in ids]), F.col("id")) - 1).cast("int")
    cb = (v.filter(F.col("id").isin(ids))
          .select(code_of.alias("code"), "e")
          .crossJoin(spark.range(_PQ_M)
                     .select(F.col("id").cast("int").alias("sub")))
          .select("sub", "code",
                  F.slice(F.col("e"), F.col("sub") * _PQ_DSUB + F.lit(1),
                          F.lit(_PQ_DSUB)).alias("cvec")))
    corpus = v.filter(F.col("id") >= _PQ_QUERY_VECS)
    queries = v.filter(F.col("id") < _PQ_QUERY_VECS)
    codes = pq_encode(corpus, cb, m=_PQ_M, dsub=_PQ_DSUB)
    return pq_search_adc(codes, cb, queries, m=_PQ_M, dsub=_PQ_DSUB,
                         k=_PQ_TOP_K)


# ---------------------------------------------------------------------------
# Incremental near-dup dedup: the daily-crawl shape — a new increment
# is deduped against an already-deduped corpus whose MinHash
# signatures were persisted by the previous run. Old×old pairs are
# never considered; old signatures are never recomputed.
# ---------------------------------------------------------------------------

_INC_NEW_MOD = 5        # doc_id % 5 == 0 → arrives in the increment


def _incremental_oracle() -> str:
    from .pipeline import _minhash_sql_oracle
    return f"""
SELECT * FROM ({_minhash_sql_oracle()})
WHERE doc_a % {_INC_NEW_MOD} = 0 OR doc_b % {_INC_NEW_MOD} = 0
"""


def _incremental_spark_oracle() -> str:
    from .pipeline import _minhash_spark_oracle
    return f"""
SELECT * FROM ({_minhash_spark_oracle()})
WHERE doc_a % {_INC_NEW_MOD} = 0 OR doc_b % {_INC_NEW_MOD} = 0
"""


@query("dedup_incremental_minhash", oracle=_incremental_oracle(),
       spark_oracle=_incremental_spark_oracle())
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MinHash LSH (operators/dedup.
    incremental_minhash_pairs): the previous run's signatures are
    persisted to parquet (simulated here by running the signature
    pass over the old split and writing the sidecar), the increment
    anti-joins to find genuinely-new docs, computes ONLY their
    signatures, and band-joins new vs old∪new — old×old never enters
    the pair space. The oracle recomputes the FULL batch LSH in
    DuckDB and keeps pairs with ≥1 new side, so a green hash proves
    increment ≡ full-rerun on exactly the pairs the increment is
    responsible for. Scale: the wide work is O(new × collisions);
    the old corpus contributes band keys from its (tiny) persisted
    signature table and candidate-only shingle verification."""
    import os

    from ..operators.dedup import incremental_minhash_pairs
    from .pipeline import _BANDS, _JACCARD_THRESHOLD, _MH_COEFFS

    arr = F.col("arr")
    # same short-doc guard as dedup_minhash_lsh: sequence(1, n-2)
    # descends when n < 3 → ANSI element_at error
    tri = F.transform(
        F.when(F.size(arr) >= 3, F.sequence(F.lit(1), F.size(arr) - 2))
        .otherwise(F.array().cast("array<int>")),
        lambda i: F.concat_ws(" ", F.element_at(arr, i),
                              F.element_at(arr, i + 1),
                              F.element_at(arr, i + 2)))
    docsets = cache_tracked(
        _docs(spark, sf_dir)
        .select("doc_id", F.split(F.trim(F.col("text")), " +").alias("arr"))
        .select("doc_id", F.array_distinct(tri).alias("shs")))
    old = docsets.filter(F.col("doc_id") % _INC_NEW_MOD != 0)

    # previous run: signatures of the deduped corpus, persisted.
    # An incremental operator's persisted state EXISTS between runs
    # by definition, so the simulation is content-keyed and
    # write-once (r11): re-simulating the prior batch inside every
    # timed invocation made the bench measure setup, not the
    # increment. The key fingerprints the old split + LSH params —
    # regenerated testdata or retuned constants land in a fresh dir,
    # a stale sidecar can never be silently reused.
    import time as _time

    from . import record_phase
    # content-sensitive key (ADVICE r11): additive sums alone can't
    # see a content change that preserves count/sum(doc_id)/bytes —
    # bit_xor over an md5-derived 60-bit word is order-independent
    # and flips on ANY text change
    krow = (_docs(spark, sf_dir)
            .filter(F.col("doc_id") % _INC_NEW_MOD != 0)
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("doc_id").alias("s"),
                 F.sum(F.length("text")).alias("c"),
                 F.expr("bit_xor(cast(conv(substring(md5(cast(text as "
                        "binary)), 1, 15), 16, 10) as bigint))")
                 .alias("x")).first())
    key = (f"{krow['n']}_{krow['s']}_{krow['c']}_{krow['x']}"
           f"_{_BANDS}_{len(_MH_COEFFS)}_{_JACCARD_THRESHOLD}")
    sig_dir = os.path.join("/tmp", "spark_graft_inc_sigs",
                           os.path.basename(sf_dir.rstrip("/")), key)
    if not os.path.exists(os.path.join(sig_dir, "_SUCCESS")):
        _t0 = _time.time()
        _, old_sigs = incremental_minhash_pairs(
            old, None, _MH_COEFFS, _BANDS, _JACCARD_THRESHOLD)
        # write to a process-unique dir, then one atomic rename into
        # place (ADVICE r11): a concurrent process can no longer read
        # a half-overwritten sidecar; losers of the rename race keep
        # the winner's (identical, content-keyed) files
        tmp_dir = f"{sig_dir}.tmp.{os.getpid()}_{int(_time.time()*1e6)}"
        old_sigs.write.mode("overwrite").parquet(tmp_dir)
        try:
            os.rename(tmp_dir, sig_dir)
        except OSError:
            # another process published the same content-keyed dir
            # first — use theirs, drop ours
            import shutil
            shutil.rmtree(tmp_dir, ignore_errors=True)
        record_phase("dedup_incremental_minhash", "prior_run_s",
                     _time.time() - _t0)

    # this run: the increment against the persisted sidecar
    pairs, _ = incremental_minhash_pairs(
        docsets, spark.read.parquet(sig_dir),
        _MH_COEFFS, _BANDS, _JACCARD_THRESHOLD)
    return pairs


def _cross_source_oracle() -> str:
    from .pipeline import _minhash_sql_oracle
    return f"""
WITH pairs AS ({_minhash_sql_oracle()})
SELECT LEAST(da.source, db.source) AS source_a,
       GREATEST(da.source, db.source) AS source_b,
       COUNT(*) AS n_pairs,
       CAST(SUM(CAST(p.jaccard AS DECIMAL(12,4))) AS DOUBLE) AS sum_jaccard
FROM pairs p
JOIN documents da ON da.doc_id = p.doc_a
JOIN documents db ON db.doc_id = p.doc_b
GROUP BY 1, 2
"""


@query("dedup_cross_source_matrix", oracle=_cross_source_oracle())
def dedup_cross_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix: near-dup pair counts and mean
    similarity per unordered source pair — the planning view for
    corpus mixing (how much of crawl duplicates curated sets decides
    which side survives dedup). Composes the batch MinHash pair
    operator with two small dimension joins; the matrix is
    |sources|², driver-tiny. Scale shape: the pair relation is the
    LSH output (banded, never quadratic), the source lookup is a
    broadcast join on doc_id."""
    from ..operators.dedup import incremental_minhash_pairs
    from .pipeline import _BANDS, _JACCARD_THRESHOLD, _MH_COEFFS

    arr = F.col("arr")
    tri = F.transform(
        F.when(F.size(arr) >= 3, F.sequence(F.lit(1), F.size(arr) - 2))
        .otherwise(F.array().cast("array<int>")),
        lambda i: F.concat_ws(" ", F.element_at(arr, i),
                              F.element_at(arr, i + 1),
                              F.element_at(arr, i + 2)))
    docs = cache_tracked(_docs(spark, sf_dir))
    # the shingle sets feed FOUR plan branches inside the pair
    # operator (signatures ×2 band sides, exact-verify ×2 sides) —
    # cache the shingled form, not just the raw docs, or the
    # tokenize+trigram work reruns per branch (measured 15 s → 6 s
    # at sf0.1·30×)
    docsets = cache_tracked(
        docs.select(
            "doc_id", F.split(F.trim(F.col("text")), " +").alias("arr"))
        .select("doc_id", F.array_distinct(tri).alias("shs")))
    pairs, _ = incremental_minhash_pairs(
        docsets, None, _MH_COEFFS, _BANDS, _JACCARD_THRESHOLD)
    src = docs.select("doc_id", "source")
    sa = src.select(F.col("doc_id").alias("doc_a"),
                    F.col("source").alias("sa"))
    sb = src.select(F.col("doc_id").alias("doc_b"),
                    F.col("source").alias("sb"))
    return (pairs.join(F.broadcast(sa), "doc_a")
            .join(F.broadcast(sb), "doc_b")
            .groupBy(F.least("sa", "sb").alias("source_a"),
                     F.greatest("sa", "sb").alias("source_b"))
            # DECIMAL sum of the (already 4dp-rounded) jaccards — an
            # AVG + round would hit half-rounding ties between engines
            .agg(F.count(F.lit(1)).alias("n_pairs"),
                 F.sum(F.col("jaccard").cast("decimal(12,4)"))
                 .cast("double").alias("sum_jaccard")))


# ---------------------------------------------------------------------------
# Winnowing fingerprints (MOSS) — round 8
# ---------------------------------------------------------------------------

_WIN_K = 16          # k-gram length (chars, post-normalization)
_WIN_W = 4           # window width (k-grams); density 2/(w+1)
_WIN_DF = 10         # drop fingerprints in more docs (boilerplate)
_WIN_MS = 2          # near-dup pair: >= this many shared fingerprints
_WIN_TRUNC = 200     # raw-char truncation bounding the oracle replay


_WINNOW_SPARK_ORACLE = f"""
WITH pre AS (
  SELECT doc_id,
         regexp_replace(lower(trim(substr(text, 1, {_WIN_TRUNC}))),
                        '\\\\s+', ' ') AS t
  FROM documents WHERE doc_id % 2 = 0),
g AS (SELECT doc_id, pos, md5(substr(t, pos, {_WIN_K})) AS h
      FROM pre
      LATERAL VIEW explode(if(length(t) >= {_WIN_K},
          sequence(1, length(t) - {_WIN_K} + 1),
          cast(array() as array<int>))) AS pos),
mx AS (SELECT doc_id, MAX(pos) AS m FROM g GROUP BY doc_id),
p AS (SELECT s.doc_id, s.pos AS st, gg.pos, gg.h
      FROM g s JOIN mx USING (doc_id)
      JOIN g gg ON gg.doc_id = s.doc_id
               AND gg.pos BETWEEN s.pos AND s.pos + {_WIN_W} - 1
      WHERE s.pos <= mx.m - {_WIN_W} + 1),
win AS (SELECT doc_id, st, MIN(h) AS mh FROM p GROUP BY doc_id, st),
selp AS (SELECT p.doc_id, p.st, MAX(p.pos) AS pos
         FROM p JOIN win ON win.doc_id = p.doc_id AND win.st = p.st
                        AND p.h = win.mh
         GROUP BY p.doc_id, p.st),
fps AS (SELECT DISTINCT g.doc_id, g.h
        FROM (SELECT DISTINCT doc_id, pos FROM selp) sp
        JOIN g ON g.doc_id = sp.doc_id AND g.pos = sp.pos),
kept AS (SELECT h FROM fps GROUP BY h HAVING COUNT(*) <= {_WIN_DF}),
fk AS (SELECT fps.doc_id, fps.h FROM fps JOIN kept USING (h))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
FROM fk a JOIN fk b ON a.h = b.h AND a.doc_id < b.doc_id
GROUP BY doc_a, doc_b
HAVING COUNT(*) >= {_WIN_MS}
"""


@query("dedup_winnow_fingerprints", spark_oracle=_WINNOW_SPARK_ORACLE,
       oracle=f"""
WITH pre AS (
  SELECT doc_id,
         regexp_replace(lower(trim(substr(text, 1, {_WIN_TRUNC}))),
                        '\\s+', ' ', 'g') AS t
  FROM documents WHERE doc_id % 2 = 0),
g AS (SELECT doc_id, CAST(u.pos AS INT) AS pos,
             md5(substr(t, CAST(u.pos AS INT), {_WIN_K})) AS h
      FROM pre, UNNEST(range(1, len(t) - {_WIN_K} + 2)) AS u(pos)),
mx AS (SELECT doc_id, MAX(pos) AS m FROM g GROUP BY doc_id),
p AS (SELECT s.doc_id, s.pos AS st, gg.pos, gg.h
      FROM g s JOIN mx USING (doc_id)
      JOIN g gg ON gg.doc_id = s.doc_id
               AND gg.pos BETWEEN s.pos AND s.pos + {_WIN_W} - 1
      WHERE s.pos <= mx.m - {_WIN_W} + 1),
win AS (SELECT doc_id, st, MIN(h) AS mh FROM p GROUP BY doc_id, st),
selp AS (SELECT p.doc_id, p.st, MAX(p.pos) AS pos
         FROM p JOIN win ON win.doc_id = p.doc_id AND win.st = p.st
                        AND p.h = win.mh
         GROUP BY p.doc_id, p.st),
fps AS (SELECT DISTINCT g.doc_id, g.h
        FROM (SELECT DISTINCT doc_id, pos FROM selp) sp
        JOIN g ON g.doc_id = sp.doc_id AND g.pos = sp.pos),
kept AS (SELECT h FROM fps GROUP BY h HAVING COUNT(*) <= {_WIN_DF}),
fk AS (SELECT fps.doc_id, fps.h FROM fps JOIN kept USING (h))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
FROM fk a JOIN fk b ON a.h = b.h AND a.doc_id < b.doc_id
GROUP BY doc_a, doc_b
HAVING COUNT(*) >= {_WIN_MS}
""")
def dedup_winnow_fingerprints(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Winnowing near-dup detection (Schleimer/Wilkerson/Aiken 2003,
    the MOSS fingerprinter — operators/dedup.winnow_fingerprints):
    md5 k-grams → per-window rightmost-minimum selection, ALL inside
    one row via array HOFs (zero-shuffle map, no UDF, no gram
    explode); the winnowed sets then pair up through a df-capped
    fingerprint join — the same blocking discipline as the MinHash
    band join, never all-pairs. The oracle replays gram hashing,
    window minima with the rightmost tie rule, df cap, and pair
    counts in SQL, so a green hash proves the HOF fold implements
    textbook winnowing exactly. Winnowing's guarantee makes this the
    local-substring near-dup detector: any shared run of
    ≥ k + w − 1 = 19 chars yields a shared fingerprint."""
    from ..operators.dedup import winnow_fingerprints, winnow_near_dups
    d = (_docs(spark, sf_dir)
         .filter(F.col("doc_id") % 2 == 0)
         .select("doc_id",
                 F.substring(F.col("text"), 1, _WIN_TRUNC).alias("text")))
    # the fingerprint frame feeds the df cap and both join sides —
    # cache it so the winnowing map runs once, not 4×
    fps = cache_tracked(winnow_fingerprints(d, "text",
                                            k=_WIN_K, w=_WIN_W))
    return winnow_near_dups(d, "text", k=_WIN_K, w=_WIN_W,
                            min_shared=_WIN_MS, max_df=_WIN_DF,
                            fingerprints=fps)
