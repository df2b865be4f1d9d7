"""Round-8 scale probes: wall time of the new gates at sf0.1 (1×)
vs a 30× id-shifted replica (tools/make_scale.py), single run each,
cold caches per gate (registry release). Usage:

    python tools/scale_probe_r8.py [replica_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from cdh_integrate_carbondata2_3_spark.queries import all_queries  # noqa: E402
from cdh_integrate_carbondata2_3_spark.session import get_spark  # noqa: E402

GATES = ("graph_pagerank_centrality", "graph_ppr_seeded",
         "text_lm_perplexity_filter", "dedup_winnow_fingerprints",
         "similarity_mmr_select", "events_funnel_conversion",
         "events_markov_transitions", "events_time_decay_score",
         "sample_hard_negatives", "mine_frequent_pairs")


def main() -> None:
    rep = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/repo/.scratch/scale/sf3"
    spark = get_spark("scale_probe_r8", cpus=16)
    qs = all_queries()
    qs["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.1") \
        .limit(1).collect()               # JVM warmup
    for name in GATES:
        row = [name]
        for sf_dir in ("/root/testdata/sf0.1", rep):
            t0 = time.time()
            n = qs[name].fn(spark, sf_dir).count()
            row.append(f"{time.time() - t0:.1f}s({n}r)")
            spark.catalog.clearCache()
        print(" | ".join(row), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
