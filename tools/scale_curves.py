"""Per-query scaling curves: run the headline + dedup/ANN/curation
set at two (or more) sf dirs and report sec + ratios.

The point (VERDICT r3 item 1): every 100 TB claim in the repo rests on
blocking/occupancy math that was only ever *measured* to a 10×
replica. This runs the actual query set at 10× (≈sf1 via
tools/make_scale.py) and prints per-query growth so a super-linear
constant has nowhere to hide.

Usage:
  python tools/scale_curves.py /root/testdata/sf0.1 .scratch/scale/sf1
Prints one JSON line:
  {"metric": "scale_curves", "dirs": [...], "queries":
    {"q1": {"sec": [a, b], "ratio": b/a}, ...}, "total": [...]}
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from cdh_integrate_carbondata2_3_spark.queries import all_queries  # noqa: E402
from cdh_integrate_carbondata2_3_spark.session import get_spark  # noqa: E402

from bench import HEADLINE  # noqa: E402

# dedup/ANN/curation queries not already in the headline set
EXTRA = (
    "dedup_exact_survivors", "dedup_simhash", "dedup_ngram_jaccard",
    "dedup_embedding_near", "dedup_components", "corpus_curation_pipeline",
    "text_decontaminate", "sample_weighted_tokens",
    "table_vector_index_search", "events_rolling_window",
    "events_gap_fill_locf", "table_bucket_map_join",
    "table_runtime_filter_join", "table_zorder_prune",
    # round-4 hardening additions (the data-heavy ones)
    "join_salted_skew", "agg_salted_twophase", "agg_approx_sketch_bounds",
    "stream_cdc_apply", "table_si_index_prune",
    "search_hybrid_rerank", "dedup_canonical_pick",
    "stream_near_dup_parity", "table_insert_stage",
)


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1",
                            os.path.join(os.path.dirname(os.path.dirname(
                                os.path.abspath(__file__))),
                                ".scratch", "scale", "sf1")]
    spark = get_spark("scale_curves")
    qs = all_queries()
    # dedupe while preserving order — queries promoted into bench's
    # HEADLINE later may still be listed in EXTRA, and a duplicate
    # name would append four sec entries and skew its ratio
    names = tuple(dict.fromkeys(tuple(HEADLINE) + EXTRA))
    skip = set(os.environ.get("SCALE_SKIP", "").split(","))
    names = tuple(n for n in names if n not in skip)
    out: dict[str, dict] = {n: {"sec": []} for n in names}
    totals = []
    for d in dirs:
        # warm the JVM/codegen per dir so ratios compare engine work
        qs["q1_pricing_summary"].fn(spark, d).limit(1).collect()
        t_dir = time.time()
        for n in names:
            t0 = time.time()
            qs[n].fn(spark, d).count()
            out[n]["sec"].append(round(time.time() - t0, 3))
        totals.append(round(time.time() - t_dir, 2))
    for n in names:
        s = out[n]["sec"]
        out[n]["ratio"] = round(s[-1] / s[0], 2) if s[0] > 0 else None
    print(json.dumps({"metric": "scale_curves", "dirs": dirs,
                      "queries": out, "total": totals}))


if __name__ == "__main__":
    main()
