"""Median-of-5 protocol for the heaviest ≈sf1 bench rows (VERDICT r11
next-round 1): the iterative/graph rows swing ±40% run-to-run at sf1,
so single-run sf1 deltas on exactly the most expensive operators are
unfalsifiable. This tool runs each heavy row N times (same count()
action and per-query cache-drop as bench.py), and writes median +
min/max spread per row, plus the bench calibration job, so a
contended run is self-evident and cross-round comparisons divide out.

Usage:
    python tools/bench_sf1_medians.py [sf_dir] [out.json] [runs]
Defaults: .scratch/scale/sf1   BENCH_sf1_r12.json   5
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from cdh_integrate_carbondata2_3_spark.queries import all_queries  # noqa: E402
from cdh_integrate_carbondata2_3_spark.session import get_spark  # noqa: E402

# the ~14 heaviest rows of BENCH_sf1_r11.json (everything ≥ 4 s),
# i.e. exactly the rows whose single-run deltas were unadjudicable
HEAVY = (
    "graph_pagerank_centrality", "graph_ppr_seeded",
    "graph_triangle_count", "graph_lpa_communities",
    "table_hilbert_prune", "multimodal_jpeg_decode",
    "table_mv_ivm_delete", "table_mv_join_rewrite",
    "dedup_canonical_pick", "mine_frequent_pairs",
    "table_mv_subsumed_rollup", "similarity_mmr_select",
    "dedup_minhash_lsh", "dedup_incremental_minhash",
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else \
        str(Path(__file__).resolve().parent.parent / ".scratch/scale/sf1")
    out = sys.argv[2] if len(sys.argv) > 2 else "BENCH_sf1_r12.json"
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    spark = get_spark("bench_sf1_medians")
    qs = all_queries()
    qs["q1_pricing_summary"].fn(spark, sf_dir).limit(1).collect()

    t0 = time.time()
    spark.range(0, 200_000_000, 1, 32).selectExpr(
        "sum(id % 7) AS s").collect()
    calibration_s = round(time.time() - t0, 3)

    rows: dict[str, dict] = {}
    for name in HEAVY:
        fn = qs[name].fn
        ts: list[float] = []
        for _ in range(runs):
            spark.sparkContext.setJobDescription(f"median5:{name}")
            t0 = time.time()
            fn(spark, sf_dir).count()
            ts.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        rows[name] = {
            "runs": ts,
            "median": round(statistics.median(ts), 3),
            "min": min(ts), "max": max(ts),
            "spread_ratio": round(max(ts) / min(ts), 2),
        }
        print(json.dumps({name: rows[name]}), flush=True)

    payload = {
        "protocol": f"median-of-{runs}, count() action, cache dropped "
                    "between runs, one warm session (bench.py parity)",
        "sf_dir": sf_dir,
        "calibration_s": calibration_s,
        "queries": rows,
    }
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
