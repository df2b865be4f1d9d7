"""Reusable similarity-search operators over embedding columns.

Beyond the reference's surface (SURVEY.md §7 watch-list: training-data
pipeline extras): approximate nearest-neighbor search for
``array<double>`` embedding columns, designed for the 100 TB shape —
the corpus is never cross-joined against itself; candidates come from
partition (inverted-list / hash-bucket) collisions and only candidates
are reranked exactly.

Three tiers, same (id, e) DataFrame contract:
- ``cosine_topk``     — exact brute force; the correctness baseline.
  Scale: O(|corpus| × |queries|), acceptable only for small query sets
  (the query side is broadcast).
- LSH multi-probe     — in ``queries/dedup_extra.similarity_ann_lsh``:
  random-hyperplane signatures, flip-1 probes.
- ``ivf_assign/ivf_search`` — IVF (inverted-file) coarse quantizer:
  vectors are assigned to their nearest centroid's list at WRITE time
  (one narrow pass — the assignment is a broadcast argmax against a
  tiny centroid set, no shuffle of the corpus), and a query probes only
  the ``nprobe`` nearest lists. At cluster scale the lists map to
  partitions (``repartition(list_id)`` on write), so a probe touches
  nprobe partitions instead of the whole corpus.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

_DEC6 = Decimal("0.000001")


def dot(a, b) -> Column:
    """Sequential-order dot product of two array<double> columns —
    same left-to-right accumulation as DuckDB's list_dot_product, so
    oracle comparisons are IEEE-exact."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def cosine(a, b) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def norm(a) -> Column:
    """sqrt(dot(v, v)) — precompute per VECTOR before a join so the
    pair-scoring loop does one dot instead of three. Bit-identical to
    inlining: sqrt over the same sequential accumulation of the same
    array, so cosine = dot/(norm_a*norm_b) hashes equal to the
    DuckDB oracle's inline form."""
    return F.sqrt(dot(a, a))


def _cos_pre(qn: str = "qn", cn: str = "cn") -> Column:
    """cosine from a pair dot + the two precomputed norms; the
    expression tree (divide(dot, multiply(a, b))) matches the inline
    cosine() exactly."""
    return dot("qe", "ce") / (F.col(qn) * F.col(cn))


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int,
                id_col: str = "id", vec_col: str = "e") -> DataFrame:
    """Exact top-k by cosine: broadcast the (small) query side against
    the corpus, rerank per query. Columns out:
    (q_id, c_id, cos_sim, rk)."""
    q = queries.select(F.col(id_col).alias("q_id"),
                       F.col(vec_col).alias("qe"),
                       norm(F.col(vec_col)).alias("qn"))
    c = corpus.select(F.col(id_col).alias("c_id"),
                      F.col(vec_col).alias("ce"),
                      norm(F.col(vec_col)).alias("cn"))
    scored = (c.crossJoin(F.broadcast(q))
              .select("q_id", "c_id",
                      F.round(_cos_pre(), 6).cast("double")
                      .alias("cos_sim")))
    w = W.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("c_id"))
    return (scored.select("q_id", "c_id", "cos_sim",
                          F.row_number().over(w).alias("rk"))
            .filter(F.col("rk") <= k))


def ivf_assign(corpus: DataFrame, centroids: DataFrame,
               id_col: str = "id", vec_col: str = "e") -> DataFrame:
    """Assign every vector to its nearest centroid's inverted list.

    ``centroids`` is (cid, ce) and SMALL (it is broadcast); the argmax
    is a broadcast nested-loop score + a per-id ``min_by`` aggregate.
    Ties break on the lower cid deterministically (the ordering key is
    the struct (-sim, cid), compared lexicographically). Output:
    (id, e, list_id).

    Scale shape: the aggregate (unlike the window-argmin it replaced)
    has a PARTIAL phase — each map task reduces its slice of the N×k
    corpus×centroid expansion down to one row per id BEFORE the
    shuffle, so the exchange carries ≤N rows instead of N×k. At 10⁹
    vectors × 1024 lists that is a 1024× smaller shuffle.

    Implementation note (measured at sf0.1, 2000×64d): inlining the
    collected centroids as literal/unrolled expressions avoids the
    per-id shuffle but loses end-to-end — building ~1000-node column
    trees costs seconds of py4j round-trips and the giant expressions
    fall out of fast codegen (agg+HOF ~2s vs literal-unrolled 13s
    full-query). The broadcast join keeps expression trees small; the
    by-id shuffle happens once at index-build (write) time."""
    c = centroids.select(F.col("cid"), F.col("ce"),
                         norm(F.col("ce")).alias("cn"))
    v = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("e"),
                      norm(F.col(vec_col)).alias("qn"))
    scored = v.crossJoin(F.broadcast(c)).select(
        "id", "e", "cid",
        (dot("e", "ce") / (F.col("qn") * F.col("cn"))).alias("sim"))
    best = (scored.groupBy("id")
            .agg(F.min_by(F.struct(F.col("e"), F.col("cid")),
                          F.struct((-F.col("sim")).alias("ns"),
                                   F.col("cid"))).alias("b")))
    return best.select("id", F.col("b.e").alias("e"),
                       F.col("b.cid").alias("list_id"))


def ivf_search(assigned: DataFrame, centroids: DataFrame,
               queries: DataFrame, nprobe: int, k: int,
               id_col: str = "id", vec_col: str = "e") -> DataFrame:
    """Probe the ``nprobe`` nearest inverted lists per query, rerank
    candidates by exact cosine, keep top-k. Output:
    (q_id, c_id, cos_sim, rk).

    Scale shape: queries × centroids is tiny (both broadcast-size);
    the corpus-side work is a hash join of the assigned lists against
    the exploded (query, probe-list) pairs — only vectors in probed
    lists are scored."""
    q = queries.select(F.col(id_col).alias("q_id"),
                       F.col(vec_col).alias("qe"),
                       norm(F.col(vec_col)).alias("qn"))
    qc = q.crossJoin(F.broadcast(centroids)).select(
        "q_id", "qe", "qn", "cid",
        (dot("qe", "ce") / (F.col("qn") * norm(F.col("ce")))).alias("sim"))
    # top-nprobe lists per query as an aggregate (sort the per-query
    # centroid scores, slice) — no Window anywhere on the probe path;
    # the (-sim, cid) struct key makes ties deterministic (asc cid)
    probes = (qc.groupBy("q_id")
              .agg(F.slice(F.array_sort(F.collect_list(
                  F.struct((-F.col("sim")).alias("ns"), F.col("cid"),
                           F.col("qe"), F.col("qn")))), 1, nprobe)
                  .alias("ps"))
              .select("q_id", F.explode("ps").alias("p"))
              .select("q_id", F.col("p.qe").alias("qe"),
                      F.col("p.qn").alias("qn"),
                      F.col("p.cid").alias("list_id")))
    cand = (assigned.select(F.col("id").alias("c_id"), F.col("e").alias("ce"),
                            norm(F.col("e")).alias("cn"), "list_id")
            .join(F.broadcast(probes), "list_id"))
    scored = cand.select("q_id", "c_id",
                         F.round(_cos_pre(), 6).cast("double")
                         .alias("cos_sim"))
    wk = W.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("c_id"))
    return (scored.select("q_id", "c_id", "cos_sim",
                          F.row_number().over(wk).alias("rk"))
            .filter(F.col("rk") <= k))


def sq_dist(a, b) -> Column:
    """Index-ordered squared euclidean distance — deterministic fold,
    matches DuckDB's list_sum(list_transform(...)) form bit-for-bit."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                       F.lit(0.0), lambda acc, x: acc + x)


def kmeans_refine(v: DataFrame, centroids: DataFrame, iters: int = 1,
                  id_col: str = "id", vec_col: str = "e",
                  cid_col: str = "cid", cvec_col: str = "ce",
                  round_digits: int = 9,
                  materialize_rounds: bool = True
                  ) -> tuple[DataFrame, DataFrame]:
    """``iters`` rounds of Lloyd's k-means starting from ``centroids``;
    returns (assignment df (id, cluster), final centroids df (cid, ce)).

    Distributed shape (MLlib's): the corpus never shuffles — each round
    is one MAP-ONLY broadcast-argmin assignment (the centroid array
    rides a broadcast 1-row frame; the argmin is an array HOF per
    vector, no exchange at all — r12) plus one posexplode →
    (cluster, dim) aggregation whose partial phase collapses each task
    to ≤ k×dim rows; only the k×dim centroid matrix returns to the
    driver between rounds (k and dim are small by definition of a
    coarse quantizer). Per-dim means accumulate in DECIMAL and are
    rounded to ``round_digits`` so the next round's distances are
    bit-reproducible regardless of aggregation order — the property
    that lets a DuckDB oracle replay the same iterations exactly.

    ``materialize_rounds`` (r12, the perplexity-gate pattern —
    ``materialize_scalars=False``): True (default) collects each
    round's k×dim mean matrix to the driver and re-injects it as a
    local relation — the scale-robust shape (the corpus-sized means
    aggregation runs exactly once per round, and the returned plans
    are collect-rooted). False keeps the LAST round's centroids lazy,
    so a single-round refine composes into ONE Spark job exactly like
    the SQL twin that replays it — no mid-query driver round-trip.
    The trade: consumers that evaluate both returned frames (or the
    assignment twice) re-run the final means aggregation per
    evaluation, so False is for single-action small/medium refines
    (bench gates, interactive probes); keep True when the corpus pass
    dominates. Results are bit-identical either way (the re-injected
    relation carries the exact doubles the lazy plan computes)."""
    spark = v.sparkSession
    cent = centroids.select(F.col(cid_col).alias("cid"),
                            F.col(cvec_col).alias("ce"))

    def assign_to(c, keep_vec: bool = True):
        # Map-side argmin (r12, guide §2.4 — remove shuffles
        # outright): the centroid set rides as ONE broadcast row
        # holding a cid-sorted array<struct<cid, ce>>, and every
        # vector evaluates its k distances inside an array HOF and
        # takes array_min over (d2, cid) structs — the lexicographic
        # struct order IS the previous min_by's (d2, cid) key, ties
        # to the lower cid, so assignments are identical. The corpus
        # never shuffles for assignment; the r11 shape cross-joined
        # N×k scored rows into a per-id min_by whose exchange carried
        # one (id, vec, cluster) row per vector — at dim=64 ~0.5 KB
        # of payload per row for a value the map side already knew.
        # This is NOT the unrolled-literal form ivf_assign measured
        # and rejected (giant py4j-built expression trees): the plan
        # here is one transform+aggregate lambda, flat and small —
        # the centroid DATA rides the broadcast row, not the plan.
        # k×dim stays broadcast-small by the coarse-quantizer
        # contract (the driver already collects it between rounds).
        crow = c.agg(F.array_sort(F.collect_list(
            F.struct(F.col("cid"), F.col("ce")))).alias("__cents"))
        best = F.array_min(F.transform(
            F.col("__cents"),
            lambda s: F.struct(
                sq_dist(F.col(vec_col), s["ce"]).alias("d2"),
                s["cid"].alias("cid"))))
        base = (v.crossJoin(F.broadcast(crow))
                # empty centroid set → empty assignment (matches the
                # old crossJoin-against-empty shape)
                .where(F.size("__cents") > 0)
                .withColumn("__cluster", best["cid"]))
        if not keep_vec:
            return base.select(id_col, F.col("__cluster").alias("cluster"))
        return base.select(id_col, vec_col,
                           F.col("__cluster").alias("cluster"))

    for it in range(iters):
        assign = assign_to(cent)
        dims = assign.select(
            "cluster", F.posexplode(F.col(vec_col)).alias("i", "x"))
        # an empty cluster simply drops out (standard Lloyd's hazard);
        # callers needing fixed k should re-seed from the widest cluster
        # exact DECIMAL sum, then ONE double division — engine-neutral
        # (decimal/int division rules differ between engines)
        means = (dims.groupBy("cluster", "i")
                 .agg((F.sum(F.col("x").cast("decimal(28,14)"))
                       .cast("double")
                       / F.count(F.lit(1))).alias("m"))
                 .groupBy("cluster")
                 .agg(F.transform(
                     F.array_sort(F.collect_list(F.struct("i", "m"))),
                     lambda s: F.round(s["m"], round_digits)).alias("ce"))
                 .select(F.col("cluster").alias("cid"), "ce"))
        if materialize_rounds or it + 1 < iters:
            # non-final rounds ALWAYS materialize: a lazy chain of
            # rounds would re-derive every earlier round per plan
            # reference (exponential recompute), and the k×dim
            # collect is metadata-scale by contract
            cent = spark.createDataFrame(
                means.collect(), "cid bigint, ce array<double>")
        else:
            cent = means
    # assignment is w.r.t. the FINAL centroids (one more argmin pass;
    # vector payload dropped — nothing downstream reads it)
    return (assign_to(cent, keep_vec=False).select(id_col, "cluster"),
            cent)


def _subvec(vec, sub: int, dsub: int) -> Column:
    """1-based slice of subspace ``sub`` (0-based) from an
    array<double> column."""
    vec = F.col(vec) if isinstance(vec, str) else vec
    return F.slice(vec, sub * dsub + 1, dsub)


def pq_encode(corpus: DataFrame, codebooks: DataFrame, m: int, dsub: int,
              id_col: str = "id", vec_col: str = "e") -> DataFrame:
    """Product-quantization encode: split each vector into ``m``
    subspaces of ``dsub`` dims and store, per subspace, the id of the
    nearest codebook centroid (squared-L2, ties to the lower code).
    Output: (id, codes array<int>) — at K≤256 codes per subspace this
    is m bytes of payload per vector instead of m×dsub×8, the 32–64×
    memory/IO reduction that makes billion-vector rerank feasible
    (Jégou et al., "Product Quantization for Nearest Neighbor
    Search", TPAMI 2011 — the FAISS IVF-PQ layout).

    ``codebooks`` is (sub, code, cvec array<double>) and
    broadcast-small (m×K rows). Scale shape: the corpus expands to
    N×m×K scored rows map-side, but BOTH aggregates below have
    partial phases — per (id, sub) min_by collapses each task's slice
    to one row per (id, sub) before the first shuffle (≤N×m rows,
    like ``ivf_assign``), and the final per-id collect carries N rows.
    Encode is a write-time cost, amortized over every search."""
    cb = codebooks.select(F.col("sub"), F.col("code"), F.col("cvec"))
    scored = (corpus.select(F.col(id_col).alias("id"),
                            F.col(vec_col).alias("e"))
              .crossJoin(F.broadcast(cb))
              .select("id", "sub", "code",
                      sq_dist(F.slice(F.col("e"),
                                      F.col("sub") * dsub + F.lit(1),
                                      F.lit(dsub)),
                              F.col("cvec")).alias("d2")))
    best = (scored.groupBy("id", "sub")
            .agg(F.min_by(F.col("code"),
                          F.struct(F.col("d2"), F.col("code")))
                 .alias("code")))
    return (best.groupBy("id")
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("sub", "code"))),
                lambda s: s["code"]).alias("codes")))


def pq_search_adc(codes: DataFrame, codebooks: DataFrame,
                  queries: DataFrame, m: int, dsub: int, k: int,
                  id_col: str = "id", vec_col: str = "e") -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: each query
    precomputes a lookup table LUT[sub][code] = squared-L2 between its
    subvector and that codebook centroid (m×K doubles, broadcast with
    the query), and a candidate's approximate distance is the
    sequential sum of m table lookups — the corpus side never touches
    raw floats, only the m-byte code arrays. Output:
    (q_id, c_id, adc_dist, rk) with adc_dist rounded to 6dp before
    ranking (ties asc c_id) so an oracle replaying the same fold
    hashes identically.

    Scale shape: the LUT build is |queries|×m×K (tiny, broadcast);
    the scan is one narrow pass over the code table per query batch
    with no shuffle of the corpus — rank is the only exchange, and
    it moves candidate (q_id, c_id, dist) triples, not vectors."""
    luts = pq_luts(queries, codebooks, m, dsub, id_col, vec_col)
    cand = (codes.select(F.col("id").alias("c_id"), "codes")
            .crossJoin(F.broadcast(luts)))
    scored = cand.select("q_id", "c_id",
                         F.round(pq_adc_expr(), 6).cast("double")
                         .alias("adc_dist"))
    wk = W.partitionBy("q_id").orderBy(F.asc("adc_dist"), F.asc("c_id"))
    return (scored.select("q_id", "c_id", "adc_dist",
                          F.row_number().over(wk).alias("rk"))
            .filter(F.col("rk") <= k))


def pq_luts(queries: DataFrame, codebooks: DataFrame, m: int, dsub: int,
            id_col: str = "id", vec_col: str = "e") -> DataFrame:
    """Per-query ADC lookup table: (q_id, lut array<array<double>>),
    outer index = subspace, inner index = code id. Tiny
    (|queries|×m×K) — broadcast it against the code table."""
    cb = codebooks.select("sub", "code", "cvec")
    q = queries.select(F.col(id_col).alias("q_id"),
                       F.col(vec_col).alias("qe"))
    lut_rows = (q.crossJoin(F.broadcast(cb))
                .select("q_id", "sub", "code",
                        sq_dist(F.slice(F.col("qe"),
                                        F.col("sub") * dsub + F.lit(1),
                                        F.lit(dsub)),
                                F.col("cvec")).alias("d2")))
    n_codes = F.size(F.col("flat")) / m
    return (lut_rows.groupBy("q_id")
            .agg(F.array_sort(F.collect_list(
                F.struct("sub", "code", "d2"))).alias("flat"))
            .select("q_id",
                    F.transform(
                        F.sequence(F.lit(0), F.lit(m - 1)),
                        lambda s: F.transform(
                            F.slice(F.col("flat"),
                                    s * n_codes.cast("int") + F.lit(1),
                                    n_codes.cast("int")),
                            lambda x: x["d2"])).alias("lut")))


def pq_adc_expr(codes: str = "codes", lut: str = "lut") -> Column:
    """Sequential ADC distance: sum over subspaces of
    lut[sub][codes[sub]] — the m-lookup fold, no raw floats."""
    return F.aggregate(
        F.zip_with(F.col(codes), F.col(lut),
                   lambda c, row: F.element_at(row, c.cast("int") + 1)),
        F.lit(0.0), lambda acc, x: acc + x)


def pq_train(vectors: DataFrame, m: int, dsub: int, n_codes: int,
             iters: int = 2, id_col: str = "id", vec_col: str = "e",
             seed_ids: list[int] | None = None) -> DataFrame:
    """Train PQ codebooks: independent Lloyd's k-means per subspace
    (the PQ paper's training — subspaces are decorrelated by
    construction, so the m problems are separable). Seeds are data
    subvectors (the ``seed_ids`` rows, or the n_codes smallest ids)
    so training is deterministic. Returns (sub, code, cvec) ready for
    :func:`pq_encode` / :func:`pq_search_adc`.

    Each subspace reuses :func:`kmeans_refine` — corpus never
    shuffles, only the K×dsub mean matrix returns to the driver per
    round. The m trainings share the cached subvector projections."""
    spark = vectors.sparkSession
    v = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("e"))
    if seed_ids is None:
        seed_ids = [r[0] for r in v.select("id").orderBy("id")
                    .limit(n_codes).collect()]
    out = None
    for sub in range(m):
        sv = v.select("id", _subvec("e", sub, dsub).alias("e"))
        seeds = (sv.filter(F.col("id").isin(seed_ids))
                 .select(F.col("id").alias("cid"), F.col("e").alias("ce")))
        _, cent = kmeans_refine(sv, seeds, iters=iters)
        # re-key centroid ids to dense 0..K-1 codes (ordered by cid)
        rows = sorted(cent.collect(), key=lambda r: r["cid"])
        cb = spark.createDataFrame(
            [(sub, i, list(r["ce"])) for i, r in enumerate(rows)],
            "sub int, code int, cvec array<double>")
        out = cb if out is None else out.unionByName(cb)
    return out


def semantic_dedup(corpus: DataFrame, centroids: DataFrame,
                   threshold: float, id_col: str = "id",
                   vec_col: str = "e") -> DataFrame:
    """SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication", 2023): cluster the
    embedding space, then call two items semantic duplicates when they
    land in the SAME cluster with cosine ≥ ``threshold``; keep the
    min-id item of each duplicate pair chain as the survivor.

    ``centroids`` is (cid, ce) and broadcast-small (k-means centroids
    from ``kmeans_refine`` or pinned samples). The pairwise verify is
    confined to cluster blocks — the O(N²) cross-cluster pair space is
    never touched, which is the paper's point: k controls occupancy
    (N/k per cluster, quadratic verify inside). For 10⁹ docs at
    k=100 000 the blocks are ~10⁴ → 10⁸ in-block pairs per cluster
    pair-scan partition, the same occupancy budget as
    ``operators/dedup`` documents.

    Output: one row per cluster — (cluster_id, n_members, n_dups,
    n_survivors). Cosines are rounded to 6dp before the threshold
    test so any engine comparing must agree bit-for-bit (both engines
    accumulate the dot sequentially)."""
    assigned = ivf_assign(corpus, centroids, id_col, vec_col)
    a = assigned.select(F.col("id"), F.col("list_id"),
                        F.col("e"), norm(F.col("e")).alias("n"))
    left = a.select(F.col("id").alias("l_id"), F.col("list_id"),
                    F.col("e").alias("qe"), F.col("n").alias("qn"))
    right = a.select(F.col("id").alias("r_id"), F.col("list_id"),
                     F.col("e").alias("ce"), F.col("n").alias("cn"))
    pairs = (left.join(right, "list_id")
             .filter(F.col("l_id") < F.col("r_id"))
             .select("list_id", "l_id", "r_id",
                     F.round(_cos_pre(), 6).alias("cs")))
    # an item is a duplicate if ANY earlier-id cluster-mate is ≥ τ —
    # the min-id chain head survives
    dups = (pairs.filter(F.col("cs") >= threshold)
            .select("list_id", F.col("r_id").alias("id")).distinct())
    members = assigned.groupBy("list_id").agg(
        F.count(F.lit(1)).alias("n_members"))
    dup_counts = dups.groupBy("list_id").agg(
        F.count(F.lit(1)).alias("n_dups"))
    return (members.join(dup_counts, "list_id", "left")
            .select(F.col("list_id").alias("cluster_id"), "n_members",
                    F.coalesce(F.col("n_dups"), F.lit(0)).alias("n_dups"),
                    (F.col("n_members")
                     - F.coalesce(F.col("n_dups"), F.lit(0)))
                    .alias("n_survivors")))


def _round6_spark(x: float) -> float:
    """Spark ``ROUND(x, 6)`` on a DOUBLE, bit-exactly: the JVM path is
    ``BigDecimal.valueOf(x)`` (the SHORTEST decimal representation,
    exactly what Python's ``repr`` produces) ``.setScale(6, HALF_UP)
    .toDouble``. Java BigDecimal has no signed zero, so a tiny
    negative rounds to +0.0 — mirrored here (verified bit-equal
    against ``F.round(·, 6)`` over 50 019 randomized + adversarial
    doubles, tests/test_winnow_mmr.py). NaN/±Inf pass through, as in
    Spark."""
    if x != x or x == float("inf") or x == float("-inf"):
        return x
    r = float(Decimal(repr(x)).quantize(_DEC6, rounding=ROUND_HALF_UP))
    return 0.0 if r == 0.0 else r


def _mmr_driver_walk(rows, query_vec: list[float], k: int, lam: float,
                     id_col: str) -> list[dict]:
    """The greedy MMR walk on the driver over a COLLECTED candidate
    list — bit-identical arithmetic to the distributed rounds: the
    dot is the same left-to-right accumulation ``acc + x*y`` the
    zip_with/aggregate expression performs, cosine divides by
    ``sqrt(dot(a,a)) * sqrt(dot(b,b))`` in the same operand order,
    every cosine and every score passes :func:`_round6_spark`, the
    penalty max keeps the FIRST of equal values (Spark array_max
    semantics: −0.0 == 0.0, NaN greatest), and the argmax orders by
    (score desc, id asc) under Spark's nan-safe double comparison
    (NaN > all, −0.0 == 0.0, ties → smaller id). A zero-norm vector
    divides by zero and raises (ZeroDivisionError here,
    SparkArithmeticException under ANSI mode distributed) — both
    paths refuse degenerate input."""

    def sdot(a, b) -> float:
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def gt(a: float, b: float) -> bool:          # Spark nan-safe >
        if a != a:
            return b == b
        if b != b:
            return False
        return a > b

    qn = math.sqrt(sdot(query_vec, query_vec))
    # per-candidate state: [id, vec, rel, norm, picked, pen]
    # pen is MEMOIZED across ranks — max over picked is monotone, so
    # folding in ONE new cosine per rank (pen' = max(pen, cs_new),
    # first-of-equals kept exactly like Spark's array_max) yields the
    # same VALUE as re-maxing the whole pick set each round, and the
    # walk drops from O(k²·n·dim) to O(k·n·dim) — the difference
    # between ~2 s and ~0.4 s at a 6 700-candidate sf1 pool. pen is
    # None until the first pick (the operator's rank-0 penalty is the
    # literal 0.0, NOT max(0, cos): a first-pick negative cosine must
    # replace it, not be clipped).
    cands = []
    for r in rows:
        cid, v = r[0], list(r[1])
        rel = _round6_spark(
            sdot(query_vec, v) / (qn * math.sqrt(sdot(v, v))))
        cands.append([cid, v, rel, math.sqrt(sdot(v, v)), False, None])
    picks: list[dict] = []
    one_m_lam = 1.0 - lam
    last_pick: tuple[list[float], float] | None = None
    for rank in range(k):
        best = None
        for c in cands:
            if c[4]:
                continue
            if last_pick is not None:
                cs = _round6_spark(
                    sdot(last_pick[0], c[1]) / (last_pick[1] * c[3]))
                if c[5] is None or gt(cs, c[5]):
                    c[5] = cs
            pen = 0.0 if c[5] is None else c[5]
            s = _round6_spark(lam * c[2] - one_m_lam * pen)
            if best is None or gt(s, best[1]) or (
                    not gt(best[1], s) and c[0] < best[0]):
                best = (c[0], s, c[1], c)
        if best is None:
            break                      # fewer candidates than k
        picks.append({"rank": rank, id_col: best[0],
                      "score": float(best[1])})
        last_pick = (best[2], math.sqrt(sdot(best[2], best[2])))
        best[3][4] = True
    return picks


def mmr_select(candidates: DataFrame, query_vec: list[float], k: int, *,
               lam: float = 0.7, id_col: str = "id",
               vec_col: str = "e", driver_below: int | None = 20_000,
               n_hint: int | None = None) -> list[dict]:
    """Maximal Marginal Relevance selection (Carbonell & Goldstein
    1998): greedily pick ``k`` items maximizing
    ``lam·cos(q, d) − (1−lam)·max_{s∈picked} cos(d, s)`` — the
    standard relevance-vs-redundancy knob for retrieval and for
    diversity-aware training-data selection.

    Scale shape — size-adaptive like ``bloom_semi_join`` (r13):

    - Pools of ≤ ``driver_below`` candidates (the common case — MMR
      pools come from an ANN/BM25 top-N, bounded by construction)
      COLLECT once (one job: ids + vectors, k×dim-bounded bytes) and
      run the whole greedy walk driver-side with bit-identical IEEE
      arithmetic (:func:`_mmr_driver_walk`) — replacing k sequential
      argmax jobs (+ their per-round ~0.25 s local-mode job floor and
      O(k²·dim) literal construction) with ONE job.
    - Bigger pools keep the distributed rounds: each of the ``k``
      rounds is ONE argmax (TakeOrderedAndProject) over the candidate
      frame — the corpus never self-joins; picked vectors fold back
      in as literal arrays, so the redundancy penalty
      ``max_j cos(d, pick_j)`` evaluates JVM-side with zero extra
      shuffles. Callers on this path should cache the frame (it is
      scanned k times).

    ``n_hint`` (caller-known candidate count) skips the sizing
    ``count()``; without it one count job decides the path (≤ 1/k of
    the distributed path's scans). ``driver_below=None`` forces the
    distributed rounds. Both paths produce IDENTICAL picks and scores
    (parity pinned over randomized pools in
    tests/test_winnow_mmr.py::test_mmr_driver_walk_parity).

    Similarities are ROUND(·, 6) with id tie-break — the repo-wide
    convention that lets a SQL oracle replay the identical greedy
    walk. Returns the picks in selection order:
    ``[{"rank", id_col, "score"}, ...]``.

    Driver-overhead note (r12): the picked vectors ride ONE
    ``F.expr("array(array(...), ...)")`` literal per round and the
    per-pick penalty cosines evaluate through an ``array_max`` over a
    ``transform`` lambda. The r8–r11 form built a 64-node
    ``F.array(F.lit(...))`` tree per pick per round — O(k²·dim) py4j
    round trips that measured ~0.4–0.8 s of pure driver time PER
    ROUND at k=8 (the compute itself is microseconds). Same IEEE
    expression per value (zip_with/aggregate dot, ROUND(·,6), max
    over the same set), so the walk and scores are bit-identical.
    """
    if driver_below is not None:
        n = n_hint if n_hint is not None else candidates.count()
        if n <= driver_below:
            rows = candidates.select(F.col(id_col),
                                     F.col(vec_col)).collect()
            return _mmr_driver_walk(rows, [float(x) for x in query_vec],
                                    k, float(lam), id_col)

    def _arr_sql(vec) -> str:
        return "array(" + ",".join(f"{float(x)!r}D" for x in vec) + ")"

    qv = F.expr(_arr_sql(query_vec))
    cand = candidates.select(F.col(id_col),
                             F.col(vec_col).alias("__v"))
    rel = F.round(cosine(qv, F.col("__v")), 6)
    picks: list[dict] = []
    pick_rows: list[list[float]] = []
    for rank in range(k):
        if pick_rows:
            parr = F.expr(
                "array(" + ",".join(_arr_sql(v) for v in pick_rows) + ")")
            pen = F.array_max(F.transform(
                parr, lambda p: F.round(cosine(p, F.col("__v")), 6)))
        else:
            pen = F.lit(0.0)
        # the score itself is ROUND(·, 6) too (not just the cosines):
        # selection order and the returned value are then identical
        # to a SQL replay — rounding happens engine-side so no
        # Python-vs-SQL half-rounding mismatch can creep in
        scored = cand.select(
            id_col, "__v",
            F.round(F.lit(lam) * rel - F.lit(1.0 - lam) * pen, 6)
            .alias("__s"))
        if picks:
            scored = scored.filter(
                ~F.col(id_col).isin([p[id_col] for p in picks]))
        row = (scored.orderBy(F.desc("__s"), F.asc(id_col))
               .limit(1).collect())
        if not row:
            break                      # fewer candidates than k
        r = row[0]
        picks.append({"rank": rank, id_col: r[id_col],
                      "score": float(r["__s"])})
        pick_rows.append([float(x) for x in r["__v"]])
    return picks
