"""Parameterized dedup/ANN operators (operators/dedup.py): the
blocking knobs must actually move bucket counts (the 100 TB lever),
and verify steps must stay exact."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from cdh_integrate_carbondata2_3_spark.operators import dedup


def _vecs(spark, n=64, dim=16):
    def comp(i, j):
        # deterministic but unstructured (multiplicative hashing)
        return ((i * 2654435761 + j * 97 + (i * j * 40503)) % 1999 - 999) / 999.0
    rows = [(i, [comp(i, j) for j in range(dim)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id int, e array<double>")


def test_hyperplane_bucket_count_scales_with_planes(spark):
    v = _vecs(spark, n=256)
    counts = {}
    for planes in (2, 4, 8):
        sig = dedup.hyperplane_signature("e", planes, 16)
        counts[planes] = v.select(sig.alias("bk")).distinct().count()
        assert counts[planes] <= 2 ** planes
    # more planes → strictly finer blocking on this corpus
    assert counts[2] < counts[4] < counts[8]


def test_simhash_wide_signature_and_band_split(spark):
    toks = spark.createDataFrame(
        [(d, f"tok{t}") for d in range(20) for t in range(d % 5, d % 5 + 8)],
        "doc_id int, tok string")
    sigs = dedup.simhash_signatures(toks, bits=64)
    vals = [r["sim"] for r in sigs.collect()]
    assert len(vals) == 20
    # high bits really used (bit 63 set → negative in signed-long view)
    assert any(abs(v) > (1 << 32) for v in vals)
    # identical token sets → identical signatures → hamming 0 pairs
    pairs = dedup.simhash_near_dups(toks, bits=64, bands=8, max_hamming=0)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    same = {(a, b) for a in range(20) for b in range(a + 1, 20)
            if a % 5 == b % 5}
    assert got >= same


def test_simhash_rejects_bad_params(spark):
    toks = spark.createDataFrame([(1, "a")], "doc_id int, tok string")
    try:
        dedup.simhash_near_dups(toks, bits=65)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
    try:
        dedup.simhash_near_dups(toks, bits=64, bands=7)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_ngram_jaccard_operator_exact_vs_bruteforce(spark):
    texts = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),
        (2, "a completely different sentence with no overlap here"),
        (3, "the quick brown fox jumps over the lazy dog"),
    ]
    docs = spark.createDataFrame(texts, "doc_id int, text string")
    pairs = dedup.ngram_jaccard_near_dups(docs, threshold=0.3, df_cap=10)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}

    def grams(t):
        w = t.split()
        return {" ".join(w[i:i + 2]) for i in range(len(w) - 1)}

    want = {}
    for (ia, ta), (ib, tb) in itertools.combinations(texts, 2):
        ga, gb = grams(ta), grams(tb)
        j = len(ga & gb) / len(ga | gb)
        if j >= 0.3:
            want[(ia, ib)] = round(j, 4)
    assert got == want


def test_cosine_near_dups_hyperplane_mode_is_exact_within_buckets(spark):
    v = _vecs(spark, n=40)
    pairs = dedup.cosine_near_dups(v, "vec_id", "e", threshold=0.99,
                                   planes=4, dim=16)
    for r in pairs.collect():
        assert r["cos_sim"] >= 0.99


def test_ann_lsh_topk_param_surface(spark):
    v = _vecs(spark, n=80)
    res = dedup.ann_lsh_topk(
        v.filter(F.col("vec_id") >= 5), v.filter(F.col("vec_id") < 5),
        "vec_id", "e", planes=6, dim=16, k=3, flip_radius=2)
    rows = res.collect()
    assert rows
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append(r["rk"])
    for q, rks in by_q.items():
        assert sorted(rks) == list(range(1, len(rks) + 1))
        assert len(rks) <= 3


def test_planes_for_occupancy_sizing():
    from cdh_integrate_carbondata2_3_spark.operators.dedup import planes_for
    # the module-docstring example: N=1e9 at ~4k occupancy → 18 planes
    assert planes_for(10**9) == 18
    # expected occupancy n / 2^planes lands at-or-under target
    for n in (100, 20_000, 10**6, 10**9):
        for target in (256, 4096):
            p = planes_for(n, target)
            assert n / (1 << p) <= target
            assert p >= 1
    # tiny corpora never get a degenerate bucket count
    assert planes_for(0) == 1 and planes_for(5000, 4096) == 1


def test_connected_components_basic(spark):
    from cdh_integrate_carbondata2_3_spark.operators.graph import (
        connected_components, dedup_survivors)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (8, 8)], "id_a bigint, id_b bigint")
    comps = {(r["node"], r["comp"])
             for r in connected_components(edges).collect()}
    assert comps == {(1, 1), (2, 1), (3, 1), (5, 5), (6, 5), (8, 8)}
    all_ids = spark.createDataFrame(
        [(i,) for i in range(10)], "doc_id bigint")
    surv = {r["doc_id"] for r in
            dedup_survivors(edges, all_ids).collect()}
    # one survivor per component + every untouched doc
    assert surv == {0, 1, 4, 5, 7, 8, 9}


def test_connected_components_chain_diameter(spark):
    from cdh_integrate_carbondata2_3_spark.operators.graph import (
        connected_components)
    # a 12-node path needs several propagation rounds
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "id_a bigint, id_b bigint")
    comps = connected_components(edges).collect()
    assert {r["comp"] for r in comps} == {0}
    assert len(comps) == 12


def test_cc_convergence_check_rides_propagation_jobs(spark):
    """The convergence test must NOT be a separate old-vs-new
    join+count job per round: the _chg flag rides the propagation
    select and the lazy localCheckpoint is materialized by the
    convergence sum itself. Measured on this Spark (AQE on, 11-round
    path): folded shape = 100 jobs vs 148 for the join+count shape —
    the bound below fails if the separate-join shape comes back."""
    from cdh_integrate_carbondata2_3_spark.operators.graph import (
        connected_components)
    sc = spark.sparkContext
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "id_a bigint, id_b bigint")
    sc.setJobGroup("cc_jobs", "cc_jobs")
    try:
        assert connected_components(edges).count() == 12
        n_jobs = len(sc.statusTracker().getJobIdsForGroup("cc_jobs"))
    finally:
        sc.setJobGroup("", "")
    assert n_jobs <= 120, f"{n_jobs} jobs: convergence check regressed?"


def test_star_components_path_graph(spark):
    """Large-star/small-star on the worst case for propagation — a
    path graph (diameter = n-1). Star rewiring hops multiple levels
    per round, so a 24-node path converges well inside max_iter=8
    where plain propagation would need ~23 rounds."""
    from cdh_integrate_carbondata2_3_spark.operators.graph import (
        connected_components)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(23)], "id_a bigint, id_b bigint")
    comps = connected_components(edges, algorithm="star", max_iter=8)
    rows = comps.collect()
    assert {r["comp"] for r in rows} == {0}
    assert len(rows) == 24


def test_star_matches_label_propagation(spark):
    from cdh_integrate_carbondata2_3_spark.operators.graph import (
        connected_components)
    # two components + a self-loop + duplicate/reversed edges
    pairs = [(1, 2), (2, 3), (3, 1), (2, 1), (5, 6), (6, 7),
             (9, 9), (7, 5), (3, 4)]
    edges = spark.createDataFrame(pairs, "id_a bigint, id_b bigint")
    want = {(r["node"], r["comp"])
            for r in connected_components(edges).collect()}
    got = {(r["node"], r["comp"])
           for r in connected_components(edges, algorithm="star").collect()}
    assert got == want == {(1, 1), (2, 1), (3, 1), (4, 1),
                           (5, 5), (6, 5), (7, 5), (9, 9)}


def test_duplicated_spans(spark):
    from cdh_integrate_carbondata2_3_spark.operators.dedup import (
        duplicated_spans)
    shared = "a b c d e f g h"                        # one shared 8-gram
    docs = spark.createDataFrame(
        [(1, shared + " x y z"),
         (2, "p q r " + shared),
         (3, "unique words only here nothing repeats at all"),
         (4, "too short")],                           # < n tokens
        "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in
           duplicated_spans(docs, n=8, min_df=2).collect()}
    # doc1: 4 shingles, 1 duplicated (the shared 8-gram)
    assert got[1]["n_shingles"] == 4 and got[1]["n_dup_shingles"] == 1
    assert got[2]["n_shingles"] == 4 and got[2]["n_dup_shingles"] == 1
    assert got[3]["n_dup_shingles"] == 0 and got[3]["dup_ratio"] == 0.0
    assert 4 not in got                               # short doc: no shingles
    assert got[1]["dup_ratio"] == 0.25
    # hash keying counts the same duplication (collision-free here)
    goth = {r["doc_id"]: r for r in
            duplicated_spans(docs, n=8, min_df=2, key="hash").collect()}
    assert {k: (v["n_shingles"], v["n_dup_shingles"])
            for k, v in got.items()} == \
           {k: (v["n_shingles"], v["n_dup_shingles"])
            for k, v in goth.items()}


def test_trim_duplicated_spans(spark):
    from cdh_integrate_carbondata2_3_spark.operators.dedup import (
        trim_duplicated_spans)
    shared = "a b c d e f g h"
    docs = spark.createDataFrame(
        [(1, "x y z " + shared + " q r"),
         (2, shared + " different tail here"),
         (3, "totally unique text with no repeats anywhere at all")],
        "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in
           trim_duplicated_spans(docs, n=8, min_df=2).collect()}
    # doc1: tokens 4..11 covered → 'x y z q r' survives
    assert got[1]["trimmed"] == "x y z q r"
    assert got[1]["n_tokens"] == 13 and got[1]["n_removed"] == 8
    # doc2: tokens 1..8 covered → tail survives
    assert got[2]["trimmed"] == "different tail here"
    # doc3 untouched
    assert got[3]["n_removed"] == 0
    assert got[3]["trimmed"] == docs.collect()[2]["text"]


def test_simhash_signature_col_matches_grouped(spark):
    """The per-row signature (streaming form) equals the groupBy
    signature for the same bit width."""
    from pyspark.sql import functions as F
    from cdh_integrate_carbondata2_3_spark.operators.dedup import (
        simhash_signature_col, simhash_signatures)
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon"),
         (3, "alpha beta gamma")],
        "doc_id bigint, text string")
    toks = F.filter(F.split(F.trim("text"), " +"), lambda t: t != F.lit(""))
    per_row = {r["doc_id"]: r["sig"] for r in docs.select(
        "doc_id", simhash_signature_col(toks, 32).alias("sig")).collect()}
    grouped = {r["doc_id"]: r["sim"] for r in simhash_signatures(
        docs.select("doc_id", F.explode(toks).alias("tok")),
        bits=32).collect()}
    assert per_row == grouped
    assert per_row[1] == per_row[3] != per_row[2]


def test_connected_components_empty_edges(spark):
    """Zero near-dup pairs must yield an empty labeling, not a
    non-convergence error (SUM over zero rows is NULL)."""
    from cdh_integrate_carbondata2_3_spark.operators.graph import (
        connected_components)
    empty = spark.createDataFrame([], "id_a bigint, id_b bigint")
    assert connected_components(empty, "id_a", "id_b").count() == 0


def test_incremental_minhash_matches_batch(spark):
    """Increment ≡ batch on the ≥1-new pair subset; first run (no
    persisted sigs) ≡ batch exactly."""
    from cdh_integrate_carbondata2_3_spark.operators.dedup import (
        incremental_minhash_pairs)
    from cdh_integrate_carbondata2_3_spark.queries.pipeline import (
        _BANDS, _JACCARD_THRESHOLD, _MH_COEFFS)

    docs = [(i, f"alpha beta gamma delta epsilon zeta copy{i % 4} "
                f"eta theta iota kappa") for i in range(40)]
    d = spark.createDataFrame(docs, "doc_id bigint, text string")
    arr = F.split(F.trim(F.col("text")), " +")
    tri = F.transform(
        F.sequence(F.lit(1), F.size(arr) - 2),
        lambda i: F.concat_ws(" ", F.element_at(arr, i),
                              F.element_at(arr, i + 1),
                              F.element_at(arr, i + 2)))
    docsets = d.select("doc_id", F.array_distinct(tri).alias("shs")).cache()

    batch, _ = incremental_minhash_pairs(
        docsets, None, _MH_COEFFS, _BANDS, _JACCARD_THRESHOLD)
    batch_pairs = {(r["doc_a"], r["doc_b"], r["jaccard"])
                   for r in batch.collect()}
    assert batch_pairs, "fixture must produce near-dups"

    old = docsets.filter(F.col("doc_id") < 30)
    _, old_sigs = incremental_minhash_pairs(
        old, None, _MH_COEFFS, _BANDS, _JACCARD_THRESHOLD)
    inc, all_sigs = incremental_minhash_pairs(
        docsets, old_sigs, _MH_COEFFS, _BANDS, _JACCARD_THRESHOLD)
    inc_pairs = {(r["doc_a"], r["doc_b"], r["jaccard"])
                 for r in inc.collect()}
    want = {(a, b, j) for a, b, j in batch_pairs if a >= 30 or b >= 30}
    assert inc_pairs == want
    assert all_sigs.count() == 40


def test_incremental_minhash_trusts_persisted_sigs(spark):
    """Old signatures are NEVER recomputed: poisoning a persisted
    signature row changes the old doc's band keys (the operator must
    use the stored values, not re-derive them from the text)."""
    from cdh_integrate_carbondata2_3_spark.operators.dedup import (
        incremental_minhash_pairs, minhash_signatures)
    from cdh_integrate_carbondata2_3_spark.queries.pipeline import (
        _BANDS, _JACCARD_THRESHOLD, _MH_COEFFS)

    # doc 0 (old) and doc 1 (new) are identical → a certain pair
    docs = [(0, "w1 w2 w3 w4 w5 w6 w7 w8"), (1, "w1 w2 w3 w4 w5 w6 w7 w8")]
    d = spark.createDataFrame(docs, "doc_id bigint, text string")
    arr = F.split(F.trim(F.col("text")), " +")
    tri = F.transform(
        F.sequence(F.lit(1), F.size(arr) - 2),
        lambda i: F.concat_ws(" ", F.element_at(arr, i),
                              F.element_at(arr, i + 1),
                              F.element_at(arr, i + 2)))
    docsets = d.select("doc_id", F.array_distinct(tri).alias("shs"))
    old_sigs = minhash_signatures(
        docsets.filter("doc_id = 0"), _MH_COEFFS)

    pairs, _ = incremental_minhash_pairs(
        docsets, old_sigs, _MH_COEFFS, _BANDS, _JACCARD_THRESHOLD)
    assert {(r["doc_a"], r["doc_b"]) for r in pairs.collect()} == {(0, 1)}

    # poison every stored hash → band keys no longer collide → the
    # pair disappears, proving the stored sidecar is authoritative
    poisoned = old_sigs.select(
        "doc_id", "n_tok",
        *[(F.col(f"h{i}") + 12345).alias(f"h{i}")
          for i in range(len(_MH_COEFFS))])
    pairs2, _ = incremental_minhash_pairs(
        docsets, poisoned, _MH_COEFFS, _BANDS, _JACCARD_THRESHOLD)
    assert pairs2.count() == 0


def test_operators_tolerate_null_and_empty_inputs(spark):
    """Degenerate-input contract across the operator family: NULL /
    empty strings, empty token sets, and empty corpora must not
    throw (ANSI mode makes silent index bugs loud — the shingle
    descending-sequence crash was exactly this class)."""
    from cdh_integrate_carbondata2_3_spark.operators.bpe import train_bpe
    from cdh_integrate_carbondata2_3_spark.operators.fuzzyjoin import (
        editdist_join)
    from cdh_integrate_carbondata2_3_spark.operators.skyline import skyline
    from cdh_integrate_carbondata2_3_spark.operators.ssjoin import (
        jaccard_join)

    l = spark.createDataFrame([(0, "kitten"), (1, None), (2, "")],
                              "id bigint, s string")
    r = spark.createDataFrame([(10, "sitten"), (11, None), (12, "")],
                              "id bigint, s string")
    got = {(x["l_id"] if "l_id" in x.__fields__ else x[0])
           for x in editdist_join(l, r, "s", "s", max_edits=1).collect()}
    assert got                                     # pairs, no throw

    sd = spark.createDataFrame(
        [(1, 1.0, None), (2, 2.0, 3.0), (3, None, None), (4, 1.0, 4.0)],
        "id bigint, a double, b double")
    # rows with NULL criteria are INCOMPARABLE → excluded from the
    # domination analysis but RETURNED unconditionally (the public
    # contract since the r6 null fix — previously the 2-D path
    # silently dropped them; see skyline() docstring and
    # test_skyline::test_null_and_nan_criteria_are_incomparable)
    assert sorted(x["id"] for x in
                  skyline(sd, ["a", "b"], ["max", "max"]).collect()) \
        == [1, 2, 3, 4]

    j = spark.createDataFrame(
        [(0, ["a", "b"]), (1, []), (2, None), (3, ["a", "b"])],
        "id bigint, toks array<string>")
    assert jaccard_join(j, "id", "toks", 0.5).count() == 1

    e = spark.createDataFrame([("",), (None,)], "text string")
    assert train_bpe(e, "text", num_merges=3) == []
