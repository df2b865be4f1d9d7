"""Bloom-prefiltered semi/anti join (operators/bloomjoin.py) and
SemDeDup semantic dedup (operators/similarity.semantic_dedup): the
bloom result must EQUAL the exact join (false-negative freedom is the
bloom guarantee; refine removes the false positives), and the
semantic dedup must match a hand-computed clustering."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from cdh_integrate_carbondata2_3_spark.operators.bloomjoin import (
    bloom_semi_join, m_for)
from cdh_integrate_carbondata2_3_spark.operators.similarity import (
    semantic_dedup)


def _sides(spark, n_cand=2000, n_ref=500):
    # overlap: every 4th candidate key appears in the reference
    cand = spark.range(n_cand).select(
        F.concat(F.lit("k"), (F.col("id") % (n_cand // 2))).alias("fp"),
        F.col("id").alias("payload"))
    ref = spark.range(n_ref).select(
        F.concat(F.lit("k"), (F.col("id") * 4)).alias("fp"))
    return cand, ref


def test_bloom_semi_equals_exact_semi(spark):
    cand, ref = _sides(spark)
    got = bloom_semi_join(cand, ref, on="fp", how="semi", m_bits=8192)
    want = cand.join(ref.select("fp"), "fp", "left_semi")
    assert sorted(got.collect()) == sorted(want.collect())


def test_bloom_anti_equals_exact_anti(spark):
    cand, ref = _sides(spark)
    got = bloom_semi_join(cand, ref, on="fp", how="anti", m_bits=8192)
    want = cand.join(ref.select("fp"), "fp", "left_anti")
    assert sorted(got.collect()) == sorted(want.collect())


def test_bloom_unrefined_semi_is_superset_without_false_negatives(spark):
    # tiny bitset → high fpr, but NEVER a false negative: every true
    # match must survive the prefilter even before the exact refine
    cand, ref = _sides(spark, n_cand=500, n_ref=100)
    got = set(r.fp for r in bloom_semi_join(
        cand, ref, on="fp", how="semi", m_bits=1024,
        refine=False).collect())
    want = set(r.fp for r in
               cand.join(ref.select("fp"), "fp", "left_semi").collect())
    assert want <= got


def test_bloom_rejects_bad_args(spark):
    cand, ref = _sides(spark, n_cand=10, n_ref=5)
    with pytest.raises(ValueError, match="semi/anti"):
        bloom_semi_join(cand, ref, on="fp", how="inner")
    with pytest.raises(ValueError, match="multiple of 8"):
        bloom_semi_join(cand, ref, on="fp", m_bits=1001)


def test_m_for_sizes_to_fpr():
    m = m_for(1_000_000, fpr=0.01)
    # k=2 bloom: fpr = (1 - e^(-2n/m))^2 must land at ~1%
    fpr = (1.0 - math.exp(-2.0 * 1_000_000 / m)) ** 2
    assert 0.005 < fpr < 0.02
    assert m_for(1) >= 8192          # floor for tiny references
    assert m_for(1_000_000) % 8 == 0


def _vec_df(spark, rows):
    return spark.createDataFrame(rows, "id bigint, e array<double>")


def test_semantic_dedup_hand_case(spark):
    # two obvious clusters on the axes; 10/11 are near-dups of 1
    # (cos≈1), 20/21 cluster with 2 but are orthogonal-ish to it
    corpus = _vec_df(spark, [
        (1, [1.0, 0.0]), (10, [0.999, 0.01]), (11, [0.998, 0.02]),
        (2, [0.0, 1.0]), (20, [0.5, 0.8]), (21, [-0.5, 0.8]),
    ])
    cents = (corpus.filter(F.col("id").isin([1, 2]))
             .select(F.col("id").alias("cid"), F.col("e").alias("ce")))
    out = {r.cluster_id: r for r in
           semantic_dedup(corpus, cents, 0.99).collect()}
    assert out[1].n_members == 3 and out[1].n_dups == 2
    assert out[1].n_survivors == 1           # min-id survivor: 1
    assert out[2].n_members == 3 and out[2].n_dups == 0


def test_semantic_dedup_threshold_is_inclusive(spark):
    corpus = _vec_df(spark, [(1, [1.0, 0.0]), (2, [1.0, 0.0])])
    cents = _vec_df(spark, [(1, [1.0, 0.0])]).select(
        F.col("id").alias("cid"), F.col("e").alias("ce"))
    row = semantic_dedup(corpus, cents, 1.0).collect()[0]
    assert row.n_dups == 1                   # cos == τ counts


def test_bloom_rejects_key_type_mismatch(spark):
    cand = spark.range(10).select(F.col("id").alias("fp"))
    ref = spark.range(5).select((F.col("id") * 2).cast("string").alias("fp"))
    with pytest.raises(ValueError, match="key type mismatch"):
        bloom_semi_join(cand, ref, on="fp", how="anti")


def test_bloom_join_null_keys_match_sql_semantics(spark):
    """NULL join keys: SQL semi drops them (NULL = NULL is not true),
    anti keeps them. xxhash64(NULL, seed) hashes consistently on both
    sides so the prefilter stays sound, and the exact refine enforces
    the NULL semantics."""
    cand = spark.createDataFrame([("a", 1), (None, 2), ("b", 3)],
                                 "fp string, v int")
    ref = spark.createDataFrame([("a",), (None,)], "fp string")
    for how in ("semi", "anti"):
        got = bloom_semi_join(cand, ref, "fp", how=how, m_bits=1024)
        want = cand.join(ref.select("fp"), "fp", f"left_{how}")
        assert sorted(got.collect(), key=str) == \
            sorted(want.collect(), key=str)


def test_canonical_pick_plans_partial_aggregate(spark):
    """The per-cluster argmax must plan as a partial-aggregating
    min_by (map-side combine), not a window over the corpus."""
    from cdh_integrate_carbondata2_3_spark.queries import all_queries

    df = all_queries()["dedup_canonical_pick"].fn(
        spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    tail = plan.split("min_by")[0] if "min_by" in plan else plan
    # the argmax aggregation subtree contains no Window operator
    assert "min_by" in plan
    assert "Window" not in tail.split("HashAggregate")[-1]


def test_sketch_bounds_plans_two_aggregations(spark):
    """countDistinct stays in its OWN aggregation: mixed with the
    sketch aggregates it forces the expand + sort-based-fallback plan
    (38 s vs 2 s at sf0.1)."""
    from cdh_integrate_carbondata2_3_spark.queries import all_queries

    df = all_queries()["agg_approx_sketch_bounds"].fn(
        spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # the exact distinct and the sketches never share an Aggregate
    assert not any(("approx_count_distinct" in chunk
                    and "count(distinct" in chunk.lower())
                   for chunk in plan.split("Aggregate")[1:])


def test_bloom_auto_plain_fallback_small_reference(spark):
    """Size-adaptive bloom join (r11): a small n_ref_hint (no explicit
    m_bits) must take the exact broadcast join — same result, no
    bloom UDF in the plan; explicit m_bits forces the bloom path."""
    cand = spark.createDataFrame([(f"k{i}",) for i in range(40)],
                                 "fp string")
    ref = spark.createDataFrame([(f"k{i}",) for i in range(0, 40, 4)],
                                "fp string")
    for how in ("semi", "anti"):
        got = bloom_semi_join(cand, ref, "fp", how=how, n_ref_hint=10)
        want = cand.join(ref, "fp", f"left_{how}")
        assert sorted(r.fp for r in got.collect()) == \
            sorted(r.fp for r in want.collect())
        # ADVICE r11: the plain path SETS the handle to None so
        # documented cleanup code (getattr + destroy-if-not-None)
        # works uniformly on both paths
        assert got._bloom_broadcast is None
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "may_contain" not in plan
    forced = bloom_semi_join(cand, ref, "fp", how="semi",
                             n_ref_hint=10, m_bits=8192)
    assert forced._bloom_broadcast is not None
