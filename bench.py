"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from cdh_integrate_carbondata2_3_spark.queries import all_queries  # noqa: E402
from cdh_integrate_carbondata2_3_spark.session import get_spark  # noqa: E402

HEADLINE = (
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
    "q6_forecast_revenue", "q7_volume_shipping", "q10_returned_items",
    "count_star_metadata", "agg_count_distinct", "window_rank_customers",
    "topk_per_group", "events_hourly_rollup", "dedup_exact_groups",
    "dedup_minhash_lsh", "text_fingerprint", "similarity_cosine_topk",
    "similarity_ann_lsh", "similarity_ann_ivf", "geo_polygon_filter",
    "multimodal_frame_sample", "sample_stratified_lang", "text_chunk_windows",
    "join_asof_events", "join_range_events",
    # round 3 additions
    "text_pii_redact", "events_gap_fill", "embedding_quantize_int8",
    "text_pack_sequences", "agg_exact_quantiles", "similarity_kmeans_refine",
    # round 4 additions
    "text_bm25_rank", "dedup_substring_spans", "sample_temperature_mix",
    "dedup_semantic_clusters", "dedup_bloom_prefilter",
    "agg_hll_mergeable_rollup", "search_hybrid_rerank",
    "dedup_canonical_pick",
    # round 6 additions (NOT in the r5 37-query total — compare
    # like-for-like on the shared prefix): merge-on-read DELETE and
    # incremental view maintenance (end-to-end lifecycle ops),
    # PQ-compressed ANN (the memory-bound scale path), and
    # incremental dedup (sign-only-new + persisted sidecar)
    "table_delete_mor", "table_mv_ivm_delete", "similarity_ann_pq",
    "dedup_incremental_minhash",
    # round-6 third-session additions: star-join MV (incremental
    # refresh + rewrite end-to-end), n-d skyline (post serial-phase
    # fix), REAL WAV decode through the Arrow extractor
    "table_mv_join_rewrite", "select_pareto_multid",
    "multimodal_wav_decode",
    # round 7 additions: real PNG decode (stdlib zlib inflate +
    # unfilter through the Arrow extractor), MV join-arity
    # subsumption (2-dim MV answering a 1-dim rollup), IRLS logistic
    # fit + calibrated holdout scoring
    "multimodal_png_decode", "table_mv_subsumed_rollup",
    "ml_logit_fit_calibrate",
    # round-7 second-session additions: baseline JPEG decode (Huffman
    # + IDCT), MP3/MP4 container metadata parsing
    "multimodal_jpeg_decode", "multimodal_av_meta",
    # round 8 additions: database-qualified DDL/DML/query isolation,
    # PageRank centrality (6 power-iteration rounds), bigram-LM
    # perplexity filtering, winnowing fingerprint dedup, MMR diverse
    # top-k (8 distributed argmax rounds)
    "table_db_namespace", "graph_pagerank_centrality",
    "text_lm_perplexity_filter", "dedup_winnow_fingerprints",
    "similarity_mmr_select", "events_funnel_conversion",
    "events_markov_transitions", "events_time_decay_score",
    "sample_hard_negatives", "mine_frequent_pairs",
    # round 9 additions: unigram tokenizer training (EM over the
    # word table), streaming-ingest × MV staleness/refresh lifecycle,
    # personalized PageRank, exact triangle counting (already gated
    # r8 — benched now so every graph operator has a bench row)
    "text_unigram_train", "stream_mv_staleness",
    "graph_ppr_seeded", "graph_triangle_count",
    # round-9 late additions: LPA communities, weighted sampling
    # without replacement
    "graph_lpa_communities", "sample_weighted_wor",
    "agg_cms_mergeable_rollup", "table_hilbert_prune",
    "events_anomaly_mad", "agg_cms_join_size",
    # round 10 addition: mixed-format external-segment stats
    # harvesting + pruning (parquet + orc + csv table end-to-end)
    "table_orc_stats_prune",
    # round 11 addition: adopt-then-normalize CUSTOM compaction over
    # mixed-format segments — benched with per-phase seconds
    # (build / compact / read) via the phase registry
    "table_mixed_compact",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = 0.0          # non-sfN dir name — still bench, just unlabeled
    spark = get_spark("bench")
    qs = all_queries()

    # JVM+codegen warmup on the smallest sf so per-query times measure the
    # engine, not first-call JIT (the driver compares end-to-end anyway).
    warm = qs["q1_pricing_summary"].fn(spark, sf_dir)
    warm.limit(1).collect()

    # calibration row (VERDICT r10 next-round 6): a fixed constant-work
    # Spark job — sum over a generated range at a pinned partition
    # count, independent of sf and of any engine code — timed FIRST so
    # cross-round walls are normalizable and a contended run is
    # self-evident (the r10 driver bench's uniform ~1.29x drift cost a
    # judge session to adjudicate; this makes it one division).
    t0 = time.time()
    spark.range(0, 200_000_000, 1, 32).selectExpr(
        "sum(id % 7) AS s").collect()
    calibration_s = round(time.time() - t0, 3)

    # min-of-2 per query: a single cold run can't distinguish a real
    # regression from JVM/GC variance — the r4 round's ~13% "drift"
    # was unfalsifiable for exactly that reason. Caches a query
    # builds help its second run (that's the warm path, legitimately
    # part of the query's design), then are dropped so query N's
    # persisted DataFrames can't build memory pressure under N+1.
    # The action is count() — kept for longitudinal comparability
    # with BENCH_r01..r08. Caveat (found r9): Catalyst prunes value
    # expressions a count doesn't need, so count() UNDER-measures
    # value-heavy aggregates; it does so identically across rounds,
    # which is what this file tracks. The engine-vs-plain-Spark
    # comparison (tools/baseline_bench.py) forces full values with
    # collect() on both sides — use THAT for absolute claims.
    from cdh_integrate_carbondata2_3_spark import queries as qreg
    timings: dict[str, float] = {}
    phases: dict[str, dict[str, float]] = {}
    t_all = time.time()
    for name in HEADLINE:
        fn = qs[name].fn
        best = None
        best_ph: dict[str, float] = {}
        for _ in range(2):
            qreg.reset_phases()
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.count()
            dt = time.time() - t0
            if best is None or dt < best:
                best = dt
                best_ph = qreg.phase_report().get(name, {})
        timings[name] = round(best, 3)
        if best_ph:
            # read_s = the timed action minus the recorded setup
            # phases — the part of a lifecycle gate that answers a
            # query (VERDICT r10 next-round 7)
            best_ph["read_s"] = round(
                max(best - sum(best_ph.values()), 0.0), 3)
            phases[name] = best_ph
        spark.catalog.clearCache()
    wall = round(time.time() - t_all, 3)
    # headline value = sum of per-query minima (comparable to the
    # per-query numbers and to tools/baseline_bench.py's protocol);
    # wall_sec is the raw 2-run harness wall for reference
    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "runs_per_query": 2,
        "wall_sec": wall,
        "calibration_s": calibration_s,
        "phases": phases,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
