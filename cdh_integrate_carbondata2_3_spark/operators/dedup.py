"""Parameterized near-duplicate / ANN building blocks.

The gate queries in ``queries/dedup_extra.py`` pin demo-sized
constants (so their DuckDB oracles can be generated from the same
numbers); these operators are the production surface where every
blocking knob is a parameter the caller sizes to the corpus.

Bucket-occupancy math (the knob that decides 100 TB survival): every
blocking scheme here puts each item into one (or ``probes``) of B
buckets and the verify step is quadratic PER BUCKET, so expected
verify cost is ``N²/B`` pair evaluations for N items under a uniform
hash. Size B so that ``N/B`` (expected bucket occupancy) stays in the
10³–10⁴ range:

- SimHash bands:          B = 2^(bits/bands) per band  → for N=10⁹
  use bits=64, bands=4 → 2^16 buckets is too few; bands=2×32-bit or
  bits=128 via two md5 words. The ``bands``דbits/bands`` split also
  sets recall: a pair collides if ANY band matches.
- Hyperplane sign LSH:    B = 2^planes                 → planes ≈
  log2(N) - 12 keeps occupancy ≈ 4096 (planes=18 for N=10⁹).
- n-gram inverted index:  B = #distinct rare shingles; the ``df_cap``
  bounds per-shingle candidate fan-out to ``df_cap²`` pairs.

Nothing here shuffles more than (key, id) pairs; verification always
runs on candidate pairs only, never the cross product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def _md5(col: Column) -> Column:
    return F.md5(col.cast("string"))


def _hexval(h: Column, p: int) -> Column:
    """Value 0..15 of hex char p of an md5-hex column."""
    return F.conv(F.substring(h, p + 1, 1), 16, 10).cast("int")


def dot(a, b) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def plane_weights(i: int, dim: int, modulus: int = 19) -> list[int]:
    """Deterministic pseudo-random hyperplane weights in
    [-(m-1)/2, (m-1)/2] — reproducible as SQL literals, no RNG, so a
    signature computed at write time equals one computed at query
    time on any cluster."""
    half = modulus // 2
    return [((i * 37 + j * 91) % modulus) - half for j in range(dim)]


# ------------------------------------------------------------- SimHash

def simhash_signatures(tokens: DataFrame, id_col: str = "doc_id",
                       tok_col: str = "tok", bits: int = 64) -> DataFrame:
    """(id, sim) with a ``bits``-wide (≤64) SimHash over the DISTINCT
    token set: bit j is the sign of the summed ±1 contributions of
    md5-bit j across tokens. One groupBy with map-side partials — the
    only shuffle is (id, 64 ints)."""
    if not 1 <= bits <= 64:
        raise ValueError("bits must be in 1..64")
    h = _md5(F.col(tok_col))
    contribs = [
        (F.shiftright(_hexval(h, j // 4), j % 4).bitwiseAND(F.lit(1))
         * 2 - 1).alias(f"c{j}")
        for j in range(bits)]
    sums = (tokens.select(id_col, *contribs)
            .groupBy(id_col)
            .agg(*[F.sum(f"c{j}").alias(f"s{j}") for j in range(bits)]))
    pack = None
    for j in range(bits):
        # bit 63 of a signed long is the sign bit: adding Long.MIN_VALUE
        # sets it (1 << 63 itself overflows the literal)
        bitval = -(1 << 63) if j == 63 else (1 << j)
        term = (F.when(F.col(f"s{j}") > 0, F.lit(bitval))
                .otherwise(F.lit(0)).cast("bigint"))
        pack = term if pack is None else pack + term
    return sums.select(id_col, pack.cast("bigint").alias("sim"))


def simhash_signature_col(toks: Column, bits: int = 32) -> Column:
    """Per-ROW SimHash over a token-array column — no explode, no
    groupBy, so it is legal in a streaming query before a stateful
    operator (aggregations would need a watermark there). Same bit
    scheme as simhash_signatures (sign of summed ±1 md5-bit
    contributions over the distinct token set); keep ``bits`` ≤ 32 —
    the expression carries one array-aggregate per bit."""
    if not 1 <= bits <= 32:
        raise ValueError("bits must be in 1..32 for the per-row form")
    d = F.array_distinct(toks)

    def _contrib(j: int):
        # closure, not a default arg: pyspark treats a 3-parameter
        # lambda as the (acc, x, i) aggregate form
        return lambda acc, t: acc + (
            F.shiftright(_hexval(_md5(t), j // 4), j % 4)
            .bitwiseAND(F.lit(1)) * 2 - 1)

    sig = None
    for j in range(bits):
        s = F.aggregate(d, F.lit(0), _contrib(j))
        term = F.when(s > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return sig.cast("bigint")


def simhash_band_pairs(sigs: DataFrame, id_col: str = "doc_id",
                       bits: int = 64, bands: int = 4) -> DataFrame:
    """Candidate pairs whose signatures agree on ≥1 of ``bands`` bands
    of ``bits/bands`` bits. All bands are stacked into ONE self-join
    keyed on (band_index, band_value) — band count changes recall, not
    the number of shuffles."""
    if bits % bands:
        raise ValueError("bits must divide evenly into bands")
    w = bits // bands
    def band_val(b: int) -> Column:
        if w >= 64:                       # single band = whole signature
            return F.col("sim")
        # shiftrightunsigned: the top band of a 64-bit sig must not
        # smear the sign bit into its value
        return (F.shiftrightunsigned(F.col("sim"), w * b)
                .bitwiseAND(F.lit((1 << w) - 1)))
    banded = sigs.select(
        id_col, "sim",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("bi"), band_val(b).alias("bv"))
            for b in range(bands)])).alias("band"))
    a = banded.select(F.col(id_col).alias("id_a"), F.col("sim").alias("sim_a"),
                      "band")
    b = banded.select(F.col(id_col).alias("id_b"), F.col("sim").alias("sim_b"),
                      "band")
    return (a.join(b, "band")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "sim_a", "id_b", "sim_b").distinct())


def simhash_near_dups(tokens: DataFrame, id_col: str = "doc_id",
                      tok_col: str = "tok", *, bits: int = 64,
                      bands: int = 4, max_hamming: int = 3) -> DataFrame:
    """(id_a, id_b, hamming) pairs with signature hamming distance ≤
    ``max_hamming``. Occupancy: per band, B = 2^(bits/bands) buckets —
    size ``bits/bands ≈ log2(N) - 12`` so each band bucket holds ~4k
    items (see module docstring). Default 64/4 = 16-bit bands (65k
    buckets per band) carries ~10⁸ docs at ~1.5k occupancy; demo
    corpora override down, billion-doc corpora go to bits=64 bands=2
    or double-word signatures."""
    sigs = simhash_signatures(tokens, id_col, tok_col, bits)
    cand = simhash_band_pairs(sigs, id_col, bits, bands)
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (cand.filter(ham <= max_hamming)
            .select("id_a", "id_b", ham.cast("int").alias("hamming")))


# -------------------------------------------------- n-gram Jaccard

def duplicated_spans(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", *, n: int = 8,
                     min_df: int = 2, key: str = "text") -> DataFrame:
    """Per-document duplicated-span statistics — the distributed
    adaptation of ExactSubstr deduplication (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better": find
    substrings repeated across documents and trim them; their suffix
    array is single-machine, the Spark-idiomatic equivalent blocks on
    word ``n``-gram shingles).

    Returns (id, n_shingles, n_dup_shingles, dup_ratio): how many of a
    document's overlapping n-token shingles also occur in at least
    ``min_df - 1`` OTHER documents. ``dup_ratio`` ≈ the fraction of
    the document inside cross-document duplicated spans — filter or
    trim on it downstream.

    ``key='hash'`` shuffles xxhash64(shingle) longs instead of shingle
    strings (the 100 TB setting: 8 bytes/shingle on the wire instead
    of ~50; collisions only ever OVER-count duplication, never drop
    it). ``key='text'`` is exact and engine-portable (the oracle's
    form). Shuffle shape: explode to (key, id) pairs, one groupBy for
    document frequency, one broadcast-averse but narrow join back —
    identical to the n-gram inverted index above, and the same df
    math bounds the work."""
    # materialize the token array ONCE — element_at over an inline
    # split() expression re-splits the whole text per access (8 splits
    # per shingle), which measured ~30× slower at sf0.1
    with_arr = docs.select(
        F.col(id_col),
        F.split(F.trim(F.col(text_col)), " +").alias("__a"))
    arr = F.col("__a")
    # sequence(1, 0) would run DESCENDING in Spark — short docs (<n
    # tokens) must produce an empty shingle list instead
    idx = F.when(F.size(arr) >= n,
                 F.sequence(F.lit(1), F.size(arr) - (n - 1))) \
        .otherwise(F.array().cast("array<int>"))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(arr, i + j)
                                          for j in range(n)]))
    per_doc = with_arr.select(F.col(id_col), F.explode(grams).alias("g"))
    if key == "hash":
        per_doc = per_doc.withColumn("g", F.xxhash64("g"))
    # document frequency per shingle (distinct docs)
    df_tbl = (per_doc.distinct()
              .groupBy("g").agg(F.count(F.lit(1)).alias("df")))
    dup = df_tbl.filter(F.col("df") >= min_df).select("g")
    per_doc_stats = per_doc.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_shingles"))
    dup_stats = (per_doc.join(dup, "g")
                 .groupBy(id_col)
                 .agg(F.count(F.lit(1)).alias("n_dup_shingles")))
    out = (per_doc_stats.join(dup_stats, id_col, "left")
           .withColumn("n_dup_shingles",
                       F.coalesce("n_dup_shingles", F.lit(0)))
           .withColumn("dup_ratio",
                       F.round(F.col("n_dup_shingles")
                               / F.col("n_shingles"), 4).cast("double")))
    return out


def trim_duplicated_spans(docs: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text", *, n: int = 8,
                          min_df: int = 2) -> DataFrame:
    """Remove cross-document duplicated spans from each document — the
    acting half of ExactSubstr dedup (Lee et al. 2022 trim the
    repeated substring, keeping one context). A token is removed when
    it falls inside ANY duplicated n-token shingle (a shingle whose
    text occurs in ≥ ``min_df`` distinct documents).

    Returns (id, n_tokens, n_removed, trimmed) with ``trimmed`` the
    surviving tokens re-joined. Shuffle shape: the same (shingle, id)
    explode + df groupBy as duplicated_spans, then ONE narrow join of
    per-doc duplicated-position lists back to the documents; the
    interval test runs as a nested higher-order function in codegen —
    positions never explode back out."""
    # materialized token array (see duplicated_spans: inline split
    # inside the lambda re-splits per element_at)
    with_arr = docs.select(
        F.col(id_col),
        F.split(F.trim(F.col(text_col)), " +").alias("__a"))
    arr = F.col("__a")
    idx = F.when(F.size(arr) >= n,
                 F.sequence(F.lit(1), F.size(arr) - (n - 1))) \
        .otherwise(F.array().cast("array<int>"))
    sh = F.transform(idx, lambda i: F.struct(
        i.alias("pos"),
        F.concat_ws(" ", *[F.element_at(arr, i + j)
                           for j in range(n)]).alias("g")))
    ex = (with_arr.select(F.col(id_col), F.explode(sh).alias("s"))
          .select(id_col, F.col("s.pos").alias("pos"),
                  F.col("s.g").alias("g")))
    dup_g = (ex.select(id_col, "g").distinct()
             .groupBy("g").agg(F.count(F.lit(1)).alias("df"))
             .filter(F.col("df") >= min_df).select("g"))
    ps = (ex.join(dup_g, "g")
          .groupBy(id_col).agg(F.collect_list("pos").alias("__ps")))
    joined = (with_arr.join(ps, id_col, "left")
              .withColumn("__ps", F.coalesce(
                  "__ps", F.array().cast("array<int>"))))
    covered = lambda i: F.exists(     # noqa: E731 — 1-based token index
        F.col("__ps"), lambda p: (i >= p) & (i <= p + (n - 1)))
    kept = F.filter(arr, lambda x, i0: ~covered(i0 + 1))
    return (joined.select(
        F.col(id_col),
        F.size(arr).alias("n_tokens"),
        (F.size(arr) - F.size(kept)).alias("n_removed"),
        F.array_join(kept, " ").alias("trimmed")))


def ngram_jaccard_near_dups(docs: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text", *, n: int = 2,
                            df_cap: int = 100,
                            threshold: float = 0.5) -> DataFrame:
    """(id_a, id_b, jaccard) for pairs with word-``n``-gram Jaccard ≥
    ``threshold``.

    Candidates: inverted index over shingles seen in ≤ ``df_cap`` docs
    (frequent shingles carry no signal and cost df² candidate pairs).
    Verify: ``size(array_intersect(sa, sb))`` on the cached per-doc
    DISTINCT shingle arrays — one narrow join per side instead of
    re-joining the exploded shingle relation (two wide shuffles
    saved vs the relational formulation)."""
    with_arr = docs.select(
        F.col(id_col),
        F.split(F.trim(F.col(text_col)), " +").alias("__a"))
    arr = F.col("__a")
    idx = F.when(F.size(arr) >= n,
                 F.sequence(F.lit(1), F.size(arr) - (n - 1))) \
        .otherwise(F.array().cast("array<int>"))
    grams_arr = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(arr, i + j)
                                          for j in range(n)]))
    per_doc = (with_arr
               .select(id_col, F.array_distinct(grams_arr).alias("gs"))
               .cache())
    grams = per_doc.select(id_col, F.explode("gs").alias("g"))
    rare = (grams.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= df_cap).select("g"))
    a = grams.select(F.col(id_col).alias("id_a"), "g")
    b = grams.select(F.col(id_col).alias("id_b"), "g")
    cand = (a.join(rare, "g").join(b, "g")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())
    sa = per_doc.select(F.col(id_col).alias("id_a"), F.col("gs").alias("sa"))
    sb = per_doc.select(F.col(id_col).alias("id_b"), F.col("gs").alias("sb"))
    inter = F.size(F.array_intersect(F.col("sa"), F.col("sb")))
    union = F.size("sa") + F.size("sb") - inter
    jac = inter.cast("double") / union
    return (cand.join(sa, "id_a").join(sb, "id_b")
            .filter(jac >= threshold)
            .select("id_a", "id_b",
                    F.round(jac, 4).cast("double").alias("jaccard")))


# ------------------------------------------- hyperplane sign blocking

def hyperplane_signature(vec_col: str, planes: int, dim: int) -> Column:
    """``planes``-bit signature: bit i is the sign of the dot product
    with deterministic hyperplane i. B = 2^planes buckets; pick
    ``planes ≈ log2(N) - 12`` for ~4k occupancy."""
    sig = None
    for i in range(planes):
        # one F.expr per plane, not dim F.lit py4j round trips — the
        # same float literals (repr round-trips IEEE-exactly), so the
        # projections and signature bits are bit-identical (r12; the
        # per-element form cost ~0.4 s of pure driver time at
        # planes=8 × dim=64 before the first job even started)
        w = F.expr("array(" + ",".join(
            f"{float(x)!r}D" for x in plane_weights(i, dim)) + ")")
        proj = dot(F.col(vec_col), w)
        term = F.when(proj > 0, F.lit(1 << i)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return sig.cast("bigint")


def axis_sign_signature(vec_col: str, planes: int) -> Column:
    """Axis-aligned variant (sign of the leading ``planes`` dims) —
    cheaper (no dot products) but only valid when leading dims are
    informative; the demo oracles use this form."""
    sig = None
    for d in range(planes):
        term = (F.when(F.col(vec_col)[d] > 0, F.lit(1 << d))
                .otherwise(F.lit(0)))
        sig = term if sig is None else sig + term
    return sig.cast("bigint")


def planes_for(n: int, target_occupancy: int = 4096) -> int:
    """Plane count that holds expected sign-LSH bucket occupancy at
    ``target_occupancy`` for an ``n``-item corpus: B = 2^planes, want
    n/B ≈ target. This is the module-docstring occupancy math as code
    (planes ≈ log2(N) - 12 for the default target): pass its result as
    ``planes=`` when the corpus outgrows a pinned demo constant —
    measured at the 10× replica, leaving the 2-vector demo default
    (planes=3, 8 buckets) in place turns candidate verification
    quadratic (tools/occupancy_demo.py, SCALE.md). More planes =
    fewer candidate pairs but lower recall (a near-dup pair must agree
    on EVERY plane); recover recall with multi-probe (ann_lsh_topk's
    flip_radius) or a second hash family, not fewer planes."""
    import math
    return max(1, math.ceil(math.log2(max(n, 2) / max(target_occupancy, 1))))


def cosine_near_dups(vecs: DataFrame, id_col: str = "vec_id",
                     vec_col: str = "e", *, threshold: float = 0.8,
                     planes: int = 12, dim: int | None = None,
                     axis_aligned: bool = False) -> DataFrame:
    """(id_a, id_b, cos_sim) for same-bucket pairs with cosine ≥
    ``threshold``. Blocking = 2^planes sign buckets; verify cost is
    N²/2^planes exact cosines."""
    if axis_aligned:
        bucket = axis_sign_signature(vec_col, planes)
    else:
        if dim is None:
            raise ValueError("dim required for hyperplane signatures")
        bucket = hyperplane_signature(vec_col, planes, dim)
    v = vecs.select(F.col(id_col), F.col(vec_col).alias("e"),
                    bucket.alias("bk"))
    a = v.select(F.col(id_col).alias("id_a"), F.col("e").alias("ea"), "bk")
    b = v.select(F.col(id_col).alias("id_b"), F.col("e").alias("eb"), "bk")
    cos = dot("ea", "eb") / (F.sqrt(dot("ea", "ea")) * F.sqrt(dot("eb", "eb")))
    return (a.join(b, "bk")
            .filter(F.col("id_a") < F.col("id_b"))
            .filter(cos >= threshold)
            .select("id_a", "id_b",
                    F.round(cos, 6).cast("double").alias("cos_sim")))


# ------------------------------------------------- multi-probe LSH ANN

def ann_lsh_topk(corpus: DataFrame, queries: DataFrame,
                 id_col: str = "id", vec_col: str = "e", *,
                 planes: int = 16, dim: int = 64, k: int = 10,
                 flip_radius: int = 1) -> DataFrame:
    """(q_id, c_id, cos_sim, rk): top-``k`` approximate neighbors per
    query via multi-probe hyperplane LSH. Queries probe their own
    bucket plus every bucket within hamming ``flip_radius`` of the
    signature (1 + planes probes at radius 1), so recall degrades
    gracefully as ``planes`` grows; candidate count per query is
    ``probes × N/2^planes``. Query side is exploded × probes and
    broadcast — the corpus is scanned once, never shuffled."""
    sig = hyperplane_signature(vec_col, planes, dim)
    norm = F.sqrt(dot(vec_col, vec_col))

    flips = [0] + [1 << i for i in range(planes)]
    if flip_radius >= 2:
        flips += [(1 << i) | (1 << j)
                  for i in range(planes) for j in range(i + 1, planes)]
    c = corpus.select(F.col(id_col).alias("c_id"),
                      F.col(vec_col).alias("ce"), norm.alias("cn"),
                      sig.alias("sig"))
    q = (queries.select(F.col(id_col).alias("q_id"),
                        F.col(vec_col).alias("qe"), norm.alias("qn"),
                        sig.alias("sig"),
                        F.explode(F.array(*[F.lit(x) for x in flips]))
                        .alias("f"))
         .select("q_id", "qe", "qn",
                 F.col("sig").bitwiseXOR(F.col("f")).alias("probe")))
    cand = (c.join(F.broadcast(q), F.col("sig") == F.col("probe"))
            .select("q_id", "c_id", "qe", "ce", "qn", "cn").distinct())
    cos = dot("qe", "ce") / (F.col("qn") * F.col("cn"))
    scored = cand.select("q_id", "c_id",
                         F.round(cos, 6).cast("double").alias("cos_sim"))
    w = W.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("c_id"))
    return (scored.select("q_id", "c_id", "cos_sim",
                          F.row_number().over(w).alias("rk"))
            .filter(F.col("rk") <= k))


# --------------------------------------------- incremental MinHash LSH

def minhash_signatures(docsets: DataFrame,
                       coeffs: tuple[tuple[int, int], ...],
                       id_col: str = "doc_id", set_col: str = "shs",
                       prime: int = 2147483647) -> DataFrame:
    """Per-document MinHash signature row: (id, n_tok, h0..h{k-1}).
    One md5 per set element; the k hashes are linear transforms of
    its first 60 bits (integer codegen, map-side partial mins — the
    shuffle carries one row per document). This is the artifact an
    incremental pipeline PERSISTS between runs: signatures of an
    already-deduped corpus never need recomputing."""
    toks = docsets.select(F.col(id_col).alias("doc_id"),
                          F.explode(set_col).alias("sh"))
    x = (F.conv(F.substring(_md5(F.col("sh")), 1, 15), 16, 10)
         .cast("long") % prime)
    return toks.select("doc_id", x.alias("x")).groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tok"),
        *[F.min((F.lit(a) * F.col("x") + F.lit(b)) % prime).alias(f"h{i}")
          for i, (a, b) in enumerate(coeffs)])


def _band_keys(sigs: DataFrame,
               bands: tuple[tuple[int, ...], ...]) -> DataFrame:
    return sigs.select(
        "doc_id", "n_tok",
        F.explode(F.array(*[
            F.struct(F.lit(bi).alias("bi"),
                     _md5(F.concat_ws("|", *[F.col(f"h{i}").cast("string")
                                             for i in band])).alias("bk"))
            for bi, band in enumerate(bands)])).alias("b")
        ).select("doc_id", "n_tok", "b.bi", "b.bk")


def incremental_minhash_pairs(
        docsets: DataFrame, old_sigs: DataFrame | None,
        coeffs: tuple[tuple[int, int], ...],
        bands: tuple[tuple[int, ...], ...],
        threshold: float, id_col: str = "doc_id", set_col: str = "shs",
        prime: int = 2147483647) -> tuple[DataFrame, DataFrame]:
    """Incremental near-dup detection — the daily-crawl production
    shape: an increment arrives on top of an already-deduped corpus
    whose MinHash signatures were PERSISTED by the previous run
    (``old_sigs``), so this run (a) computes signatures only for the
    new documents (those absent from old_sigs — anti-join), and
    (b) band-joins the NEW side against old∪new, never old×old: the
    wide work is O(new × collisions), not O(total²) and not even
    O(total × collisions). Returns ``(pairs, all_sigs)`` — persist
    ``all_sigs`` as the next run's old_sigs.

    ``docsets`` is (id, shs) for ALL current documents; old rows are
    touched only to verify candidate pairs exactly (the shingle-set
    projection evaluates after the candidate join, so at scale only
    collision partners are re-shingled — the same candidate-only
    rerank discipline as IVF/PQ search). Exact Jaccard ≥ threshold,
    pairs keyed (min_id, max_id), ≥1 new side by construction.
    First run: pass ``old_sigs=None`` — everything is new and this
    degrades to the batch LSH."""
    d = docsets.select(F.col(id_col).alias("doc_id"),
                       F.col(set_col).alias("shs"))
    if old_sigs is not None:
        new_sets = d.join(old_sigs.select("doc_id"), "doc_id", "left_anti")
    else:
        new_sets = d
    new_sigs = minhash_signatures(new_sets, coeffs, "doc_id", "shs", prime)
    all_sigs = (old_sigs.unionByName(new_sigs)
                if old_sigs is not None else new_sigs)
    # build the new side's band keys ONCE; the old side's keys derive
    # from the PERSISTED signature table directly and union as key
    # ROWS — the previous shape band-keyed old∪new, which re-evaluated
    # the new-signature aggregation a second time inside the union
    # (r11: the increment's dominant redundant work at bench scale)
    keys = _band_keys(new_sigs, bands)
    new_keys = keys.select(
        F.col("doc_id").alias("doc_n"), F.col("n_tok").alias("nn"),
        "bi", "bk")
    all_keys = (keys if old_sigs is None
                else _band_keys(old_sigs, bands).unionByName(keys)).select(
        F.col("doc_id").alias("doc_o"), F.col("n_tok").alias("no"),
        "bi", "bk")
    cand = (new_keys.join(all_keys, ["bi", "bk"])
            .filter(F.col("doc_n") != F.col("doc_o"))
            .select(F.least("doc_n", "doc_o").alias("doc_a"),
                    F.greatest("doc_n", "doc_o").alias("doc_b"))
            .distinct())
    sa = d.select(F.col("doc_id").alias("doc_a"), F.col("shs").alias("sa"),
                  F.size("shs").alias("na"))
    sb = d.select(F.col("doc_id").alias("doc_b"), F.col("shs").alias("sb"),
                  F.size("shs").alias("nb"))
    inter = (cand.join(sa, "doc_a").join(sb, "doc_b")
             .select("doc_a", "doc_b", "na", "nb",
                     F.size(F.array_intersect("sa", "sb")).alias("n_common")))
    jac = (F.col("n_common").cast("double")
           / (F.col("na") + F.col("nb") - F.col("n_common")))
    pairs = (inter.filter(jac >= threshold)
             .select("doc_a", "doc_b",
                     F.round(jac, 4).cast("double").alias("jaccard")))
    return pairs, all_sigs


def winnow_fingerprints(docs: DataFrame, text_col: str = "text", *,
                        k: int = 8, w: int = 4,
                        id_cols: tuple = ("doc_id",)) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): md5 every character k-gram of
    the whitespace-normalized lowercased text, slide a window of
    ``w`` consecutive k-gram hashes, and select each window's minimum
    (ties → rightmost). The guarantee: any shared substring of length
    ≥ k + w − 1 between two documents yields at least one SHARED
    selected fingerprint, so fingerprint equality is a sound local
    near-dup signal with a tunable density of 2/(w+1).

    Scale shape: everything happens INSIDE one row via array HOFs —
    gram hashing, window minima, dedup — so the pass is a zero-
    shuffle map over the corpus (O(len·w) work per row, JVM-side, no
    UDF, no k-gram explode). Only the final per-(doc, fingerprint)
    explode leaves the row, and that output is the winnowed set
    (density 2/(w+1)), not the full gram stream.

    Returns one row per selected fingerprint: id_cols + ``fp`` (md5
    hex). Documents shorter than k + w − 1 normalized chars emit
    nothing (no complete window exists).
    """
    ids = [F.col(c) for c in id_cols]
    t = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    n = F.length(t)
    m = n - F.lit(k - 1)               # number of k-grams
    # struct array: (h = md5(gram), pos) for pos 1..m. Guard m >= 1:
    # sequence(1, 0) would count DOWN.
    grams = F.when(m >= 1, F.transform(
        F.sequence(F.lit(1), m),
        lambda i: F.struct(F.md5(F.encode(F.substring(t, i, k), "UTF-8"))
                           .alias("h"),
                           i.alias("pos")))
    ).otherwise(F.array().cast("array<struct<h:string,pos:int>>"))

    def _windows(g):
        # g is a BOUND lambda variable — evaluated once per row. The
        # naive form (referencing the grams expression directly inside
        # the window transform) re-evaluates every md5 PER WINDOW
        # after Catalyst's CollapseProject inlines it: O(m²) hashing,
        # measured 37 s for 250 docs vs ~1 s with this let-binding.
        mm = F.size(g)
        pick = lambda s: F.aggregate(    # noqa: E731
            F.slice(g, s, w),
            F.lit(None).cast("struct<h:string,pos:int>"),
            lambda acc, x: F.when(
                acc.isNull() | (x["h"] < acc["h"])
                | ((x["h"] == acc["h"]) & (x["pos"] > acc["pos"])),
                x).otherwise(acc))
        return F.when(
            mm >= w,
            F.array_distinct(F.transform(
                F.sequence(F.lit(1), mm - F.lit(w - 1)),
                lambda s: pick(s)["h"]))
        ).otherwise(F.array().cast("array<string>"))

    # transform-over-one-element-array as a let binding: grams
    # evaluates ONCE, the window sweep reads the materialized array
    sel = F.transform(F.array(grams), _windows)[0]
    return (docs.select(*ids, F.explode(sel).alias("fp")))


def winnow_near_dups(docs: DataFrame, text_col: str = "text", *,
                     k: int = 8, w: int = 4, min_shared: int = 2,
                     max_df: int | None = None, id_col: str = "doc_id",
                     fingerprints: DataFrame | None = None) -> DataFrame:
    """Near-dup pairs by shared winnowed fingerprints: documents
    sharing ≥ ``min_shared`` selected fingerprints. The join is keyed
    on the fingerprint (hash-shuffle on md5 — uniform), never
    all-pairs; per-fingerprint fan-out is bounded by ``max_df``
    (fingerprints present in more documents are dropped before the
    pair join — boilerplate substrings carry no dedup signal and
    would fan out quadratically; the same df-cap discipline as the
    n-gram Jaccard blocking). Returns (doc_a, doc_b, n_shared).

    The fingerprint frame feeds the df cap AND both join sides (up to
    4 plan references); pass ``fingerprints=`` — a cached
    (id_col, fp) frame from :func:`winnow_fingerprints` — to compute
    the winnowing map once instead of per reference. The default
    recomputes (this function never caches: the caller owns
    persistence lifetime)."""
    fps = fingerprints
    if fps is None:
        fps = winnow_fingerprints(docs, text_col, k=k, w=w,
                                  id_cols=(id_col,))
    if max_df is not None:
        kept = (fps.groupBy("fp")
                .agg(F.count(F.lit(1)).alias("__df"))
                .filter(F.col("__df") <= max_df).select("fp"))
        fps = fps.join(kept, "fp")
    a = fps.select(F.col(id_col).alias("doc_a"), "fp")
    b = fps.select(F.col(id_col).alias("doc_b"), "fp")
    return (a.join(b, "fp")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("n_shared"))
            .filter(F.col("n_shared") >= min_shared))
