"""Deterministic sampling / chunking operators: correctness of the
selection logic plus the plan-shape properties that make them free at
100 TB (the samplers and the chunker must be pure map-side — zero
Exchange; the funnel must be one scan; the shard summary exactly one
tiny shuffle)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from cdh_integrate_carbondata2_3_spark.queries import all_queries
from tests.test_plans import plan_of

QUERIES = all_queries()


def test_bernoulli_sample_is_shuffle_free(spark, sf_dir):
    df = QUERIES["sample_hash_bernoulli"].fn(spark, sf_dir)
    plan = plan_of(df)
    assert "Exchange" not in plan and "Join" not in plan


def test_stratified_sample_is_shuffle_free(spark, sf_dir):
    df = QUERIES["sample_stratified_lang"].fn(spark, sf_dir)
    plan = plan_of(df)
    assert "Exchange" not in plan and "Join" not in plan


def test_chunker_is_shuffle_free(spark, sf_dir):
    df = QUERIES["text_chunk_windows"].fn(spark, sf_dir)
    plan = plan_of(df)
    assert "Exchange" not in plan and "Generate" in plan


def test_funnel_single_scan(spark, sf_dir):
    df = QUERIES["quality_filter_funnel"].fn(spark, sf_dir)
    plan = plan_of(df)
    # one scan node in the detail section (each node prints twice:
    # tree line + "(n) <Node>" header)
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_shards_partial_agg_before_shuffle(spark, sf_dir):
    plan = plan_of(QUERIES["sample_train_shards"].fn(spark, sf_dir))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "partial_count" in plan  # map-side combine before the shuffle


def test_sampling_is_deterministic_across_runs(spark, sf_dir):
    q = QUERIES["sample_hash_bernoulli"].fn
    a = {r.doc_id for r in q(spark, sf_dir).collect()}
    b = {r.doc_id for r in q(spark, sf_dir).collect()}
    assert a == b and a


def test_stratified_rates_ordered(spark, sf_dir):
    """en must be sampled at a visibly higher rate than the tail langs."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    totals = {r.lang: r.n for r in
              docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    sampled = {r.lang: r.n for r in
               QUERIES["sample_stratified_lang"].fn(spark, sf_dir)
               .groupBy("lang").agg(F.count("*").alias("n")).collect()}
    rate = {k: sampled.get(k, 0) / totals[k] for k in totals}
    assert rate["en"] > rate.get("zh", 0)
    assert rate["en"] > 0.3


def test_chunks_cover_every_token(spark, sf_dir):
    """Sum of chunk token counts == doc token count (no token dropped
    or duplicated by the window arithmetic)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    expected = (docs.select(
        "doc_id", F.size(F.split(F.trim("text"), " +")).alias("n"))
        .collect())
    got = {r.doc_id: r.s for r in
           QUERIES["text_chunk_windows"].fn(spark, sf_dir)
           .groupBy("doc_id").agg(F.sum("n_tokens").alias("s")).collect()}
    for r in expected:
        assert got[r.doc_id] == r.n, r.doc_id


def test_funnel_monotone(spark, sf_dir):
    rows = {r.stage: r.n_docs for r in
            QUERIES["quality_filter_funnel"].fn(spark, sf_dir).collect()}
    assert (rows["00_total"] >= rows["10_lang"] >= rows["20_length"]
            >= rows["30_stop_ratio"])
    assert rows["30_stop_ratio"] > 0


def test_shards_cover_all_docs(spark, sf_dir):
    df = QUERIES["sample_train_shards"].fn(spark, sf_dir)
    total = df.agg(F.sum("n_docs")).collect()[0][0]
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert total == n_docs
    assert df.count() == 8


# ---------------------------------------------------------------------------
# dense ranks + sparse-id-robust negative sampling (round 9)
# ---------------------------------------------------------------------------


def test_dense_ranks_match_global_window(spark):
    from cdh_integrate_carbondata2_3_spark.operators.ranking import (
        dense_ranks)
    ids = [7, 1000003, 52, 999999999, 123456789, 17, 88, 4]
    df = spark.createDataFrame([(i,) for i in ids], "vec_id long")
    ranks, n = dense_ranks(df, "vec_id", out="r", partitions=3)
    got = {r["vec_id"]: r["r"] for r in ranks.collect()}
    assert n == len(ids)
    assert got == {v: i for i, v in enumerate(sorted(ids))}


def test_hard_negatives_full_yield_on_sparse_ids(spark):
    """Folding into the dense rank space must yield exactly k
    partners per anchor on an id layout full of gaps — the raw-span
    fold yielded (near) zero there."""
    from cdh_integrate_carbondata2_3_spark.operators.ranking import (
        dense_ranks)
    ids = [3, 9001, 77, 123456789012, 40, 500000, 86, 2, 31337, 664]
    df = spark.createDataFrame([(i, f"l{i % 3}") for i in ids],
                               "vec_id long, label string")
    ranks, n = dense_ranks(df, "vec_id", out="r")
    k = 5
    key = F.concat(F.col("a_id").cast("string"), F.lit("#"),
                   F.col("j").cast("string"))
    cand = (df.select(F.col("vec_id").alias("a_id"))
            .select("a_id", F.explode(F.array(
                *[F.lit(j) for j in range(1, k + 1)])).alias("j"))
            .select("a_id",
                    (F.conv(F.substring(F.md5(key.cast("binary")),
                                        1, 12), 16, 10).cast("long")
                     % F.lit(n)).alias("r")))
    per = {r["a_id"]: r["c"] for r in
           cand.join(ranks.withColumnRenamed("vec_id", "neg_id"), "r")
           .groupBy("a_id").agg(F.count(F.lit(1)).alias("c"))
           .collect()}
    # every hash lands on a real row (ranks are gap-free): exactly k
    # candidates per anchor before the self-collision filter
    assert per == {i: k for i in ids}


def test_weighted_wor_matches_python_replay(spark):
    """A-Res selection replayed in pure Python (hashlib md5, same key
    formula) must pick the same ids in the same order."""
    import hashlib, math
    from cdh_integrate_carbondata2_3_spark.queries.sampling import (
        weighted_sample_wor)
    rows = [(i, "g" if i % 2 else "h", (i * 37) % 500 + 1)
            for i in range(1, 101)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    got = {(r["lang"], r["rk"]): r["doc_id"] for r in
           weighted_sample_wor(df, ["lang"], "n_chars", 3).collect()}

    def key(i, w):
        h = hashlib.md5(str(i).encode()).hexdigest()[:12]
        u = (int(h, 16) + 0.5) / 16 ** 12
        return math.log(u) / max(float(w), 1.0)

    for g in ("g", "h"):
        members = [(key(i, w), i) for i, lg, w in rows if lg == g]
        members.sort(key=lambda t: (-t[0], t[1]))
        for rk, (_, i) in enumerate(members[:3], start=1):
            assert got[(g, rk)] == i, (g, rk)


def test_weighted_wor_no_repeats_and_weight_bias(spark):
    from pyspark.sql import functions as F
    from cdh_integrate_carbondata2_3_spark.queries.sampling import (
        weighted_sample_wor)
    # 200 groups; each has one heavy doc (w=10000) and 9 light (w=1)
    rows = []
    for g in range(200):
        rows.append((g * 100, f"g{g}", 10000))
        rows.extend((g * 100 + j, f"g{g}", 1) for j in range(1, 10))
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    out = weighted_sample_wor(df, ["lang"], "n_chars", 2).collect()
    per = {}
    for r in out:
        per.setdefault(r["lang"], []).append(r["doc_id"])
    assert all(len(v) == 2 == len(set(v)) for v in per.values())
    heavy_hits = sum(1 for v in per.values() if any(d % 100 == 0 for d in v))
    # heavy doc has >99.9% inclusion probability per group
    assert heavy_hits >= 190, heavy_hits


def test_dense_ranks_lazy_equals_two_phase(spark):
    """The size-adaptive rank map (r11): both forms must assign
    IDENTICAL ranks on a sparse, scattered id domain — the lazy
    global-window variant is what small corpora use, the two-phase
    checkpoint+offset variant is the big-domain path."""
    from cdh_integrate_carbondata2_3_spark.operators.ranking import (
        dense_ranks, dense_ranks_lazy)
    from pyspark.sql import functions as F

    df = spark.range(500).select(
        ((F.col("id") * 37) % 1000 + 10_000).alias("k"))
    two, n2 = dense_ranks(df, "k", out="r", partitions=7)
    lazy, nf = dense_ranks_lazy(df, "k", out="r")
    assert nf.first()["n"] == n2
    a = sorted((r["k"], r["r"]) for r in two.collect())
    b = sorted((r["k"], r["r"]) for r in lazy.collect())
    assert a == b


def test_dense_ranks_auto_gate(spark):
    """dense_ranks_auto (r12, VERDICT r11 item 5): the n_hint gate
    picks lazy below the threshold and two-phase above it, and BOTH
    branches return identical (ranks, 1-row-count-frame) shapes."""
    from cdh_integrate_carbondata2_3_spark.operators.ranking import (
        dense_ranks_auto)
    from pyspark.sql import functions as F

    df = spark.range(300).select(
        ((F.col("id") * 53) % 700 + 5_000).alias("k"))
    lazy_r, lazy_n = dense_ranks_auto(df, "k", out="r", n_hint=100)
    two_r, two_n = dense_ranks_auto(df, "k", out="r", n_hint=100,
                                    lazy_below=10, partitions=5)
    assert lazy_n.first()["n"] == two_n.first()["n"]
    a = sorted((r["k"], r["r"]) for r in lazy_r.collect())
    b = sorted((r["k"], r["r"]) for r in two_r.collect())
    assert a == b
