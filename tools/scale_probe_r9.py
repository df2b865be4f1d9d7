"""Round-9 scale probes at the 10x/30x replicas
(.scratch/scale/sf1, .scratch/scale/sf3 from tools/make_scale.py):

- frequent_pairs: A-priori L1 prune shrinking the pair explode
  (pair instances + wall, min_support 1 vs 5) and the guard's
  zero-cost raise path;
- text_unigram_train / text_lm_perplexity_filter (trigram) /
  events_funnel_conversion / graph_pagerank_centrality /
  graph_ppr_seeded / sample_hard_negatives wall-clock curves.

Usage: python tools/scale_probe_r9.py [probe ...]
Probes: pairs unigram trigram funnel graph negatives
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from cdh_integrate_carbondata2_3_spark.queries import all_queries  # noqa: E402
from cdh_integrate_carbondata2_3_spark.session import get_spark  # noqa: E402
from cdh_integrate_carbondata2_3_spark.sources.registry import (  # noqa: E402
    load_table)

SF01 = "/root/testdata/sf0.1"
SF1 = str(Path(__file__).resolve().parent.parent / ".scratch/scale/sf1")
SF3 = str(Path(__file__).resolve().parent.parent / ".scratch/scale/sf3")


def timed(fn):
    t0 = time.time()
    r = fn()
    return time.time() - t0, r


def probe_pairs(spark):
    from cdh_integrate_carbondata2_3_spark.operators.mining import (
        frequent_pairs)
    for sf_dir, tag in ((SF01, "1x"), (SF3, "30x")):
        li = load_table(spark, sf_dir, "lineitem") \
            .select("l_orderkey", "l_partkey")
        for ms in (1, 5):
            t, n = timed(lambda: frequent_pairs(
                li, "l_orderkey", "l_partkey",
                min_support=ms).count())
            print(f"PAIRS {tag} min_support={ms}: "
                  f"{n} surviving pairs, {t:.2f}s")


def probe_unigram(spark):
    for sf_dir, tag in ((SF01, "1x"), (SF3, "30x")):
        q = all_queries()["text_unigram_train"]
        t, _ = timed(lambda: q.fn(spark, sf_dir).count())
        print(f"UNIGRAM {tag}: {t:.2f}s")


def probe_trigram(spark):
    for sf_dir, tag in ((SF01, "1x"), (SF3, "30x")):
        q = all_queries()["text_lm_perplexity_filter"]
        t, _ = timed(lambda: q.fn(spark, sf_dir).count())
        print(f"TRIGRAM {tag}: {t:.2f}s")


def probe_funnel(spark):
    for sf_dir, tag in ((SF01, "1x"), (SF3, "30x")):
        q = all_queries()["events_funnel_conversion"]
        t, _ = timed(lambda: q.fn(spark, sf_dir).count())
        print(f"FUNNEL {tag}: {t:.2f}s")


def probe_graph(spark):
    for name in ("graph_pagerank_centrality", "graph_ppr_seeded"):
        for sf_dir, tag in ((SF01, "1x"), (SF3, "30x")):
            q = all_queries()[name]
            t, _ = timed(lambda: q.fn(spark, sf_dir).count())
            print(f"GRAPH {name} {tag}: {t:.2f}s")


def probe_negatives(spark):
    for sf_dir, tag in ((SF01, "1x"), (SF3, "30x")):
        q = all_queries()["sample_hard_negatives"]
        t, df = timed(lambda: q.fn(spark, sf_dir))
        rows = df.agg(F.sum("n_pairs")).first()[0]
        print(f"NEGATIVES {tag}: {rows} pairs, {t:.2f}s construction"
              f" (+agg)")


PROBES = {"pairs": probe_pairs, "unigram": probe_unigram,
          "trigram": probe_trigram, "funnel": probe_funnel,
          "graph": probe_graph, "negatives": probe_negatives}


def main():
    which = sys.argv[1:] or list(PROBES)
    spark = get_spark("scale_probe_r9")
    for w in which:
        PROBES[w](spark)


if __name__ == "__main__":
    main()
