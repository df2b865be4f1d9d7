"""Spark-parseable oracle twins (Query.spark_oracle): five heavyweight
pipeline gates have DuckDB-only correctness oracles, so their
plain-Spark baseline ratio (tools/baseline_bench.py) runs a Spark-SQL
twin instead. These tests pin the twins SEMANTICALLY: the twin's
result must hash-equal the engine's result — otherwise the baseline
would time a different computation (VERDICT r9 next-round 2)."""

from __future__ import annotations

import hashlib

import pytest

from cdh_integrate_carbondata2_3_spark.queries import all_queries
from cdh_integrate_carbondata2_3_spark.sources.registry import (
    TPCH_TABLES, register_views)

TWINNED = ("similarity_mmr_select", "dedup_winnow_fingerprints",
           "text_lm_perplexity_filter", "dedup_incremental_minhash",
           "similarity_kmeans_refine",
           # r10 second batch: the shared minhash core + brute-force
           # cosine — two more heavyweight rows into the ratio table
           "dedup_minhash_lsh", "similarity_cosine_topk",
           # r10 third batch: percentile rename, HOF token stats,
           # correlated-NOT-EXISTS skyline, and the unrolled
           # min-label CC twin (single back-reference per round —
           # a second one inlines the CTE tree 2^rounds times)
           "events_anomaly_mad", "text_bm25_rank",
           "select_pareto_multid", "dedup_components",
           "dedup_components_star", "dedup_canonical_pick",
           # r10 fourth batch: cosine-template dialects
           "dedup_semantic_clusters", "search_hybrid_rerank",
           # r11 batch (VERDICT r10 next-round 1c): the ANN family +
           # every remaining dialect-gap headline row — 21 more
           # hash-pinned twins so the ratio table covers 53/70 rows
           "window_rank_customers", "events_hourly_rollup",
           "agg_exact_quantiles", "text_fingerprint",
           "sample_stratified_lang", "text_chunk_windows",
           "sample_temperature_mix", "sample_weighted_wor",
           "join_asof_events", "events_time_decay_score",
           "text_pii_redact", "text_pack_sequences",
           "embedding_quantize_int8", "events_gap_fill",
           "sample_hard_negatives", "multimodal_frame_sample",
           "similarity_ann_lsh", "similarity_ann_ivf",
           "similarity_ann_pq", "dedup_substring_spans",
           "dedup_bloom_prefilter")


def _canon(pdf):
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = sorted("\x1f".join(r) for r in
                  pdf.astype(str).itertuples(index=False, name=None))
    return (len(pdf), cols,
            hashlib.md5("\x1e".join(rows).encode()).hexdigest())


@pytest.mark.parametrize("name", TWINNED)
def test_spark_oracle_twin_hash_equals_engine(spark, sf_dir, name):
    register_views(spark, sf_dir, TPCH_TABLES)
    q = all_queries()[name]
    assert q.spark_oracle, f"{name} lost its spark_oracle twin"
    eng = _canon(q.fn(spark, sf_dir).toPandas())
    twin = _canon(spark.sql(q.spark_oracle).toPandas())
    assert eng == twin, (name, eng, twin)


def test_every_headline_row_now_has_a_baseline_side(spark):
    """Every headline query must offer SOMETHING baseline_bench can
    run on plain Spark: a Spark-parseable oracle or a spark_oracle
    twin (training gates whose pinned oracle is corpus-keyed VALUES
    are Spark-parseable as-is)."""
    import bench
    qs = all_queries()
    missing = [n for n in bench.HEADLINE
               if not (qs[n].oracle or qs[n].spark_oracle)]
    assert not missing, missing


def test_baseline_bench_nulls_ratio_on_diverging_twin(spark, sf_dir):
    """The ratio tool must never time a plain side that computed a
    DIFFERENT result than the engine (VERDICT r10 next-round 3): feed
    bench_one a deliberately diverging twin and assert the ratio is
    nulled with a twin_mismatch reason; then the true twin and assert
    the ratio survives the hash gate."""
    from cdh_integrate_carbondata2_3_spark.queries import Query
    from tools.baseline_bench import bench_one

    register_views(spark, sf_dir, TPCH_TABLES)
    real = all_queries()["similarity_cosine_topk"]
    diverging = Query(real.name, real.fn, real.oracle,
                      spark_oracle=real.spark_oracle
                      + " ORDER BY 1 LIMIT 1")
    row = bench_one(spark, diverging, sf_dir)
    assert row["ratio"] is None
    assert row["no_ratio_reason"].startswith("twin_mismatch")

    row = bench_one(spark, real, sf_dir)
    assert row["ratio"] is not None
    assert "no_ratio_reason" not in row
