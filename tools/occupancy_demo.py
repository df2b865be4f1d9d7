"""Measured proof that the blocking knobs hold bucket occupancy —
the claim SCALE.md makes for 100 TB survival, demonstrated at the
largest local corpus (the 10× replica's 50k documents / 20k vectors).

Two experiments, printed as one JSON line:

1. SimHash band width (``operators/dedup.py`` occupancy math): 8-bit
   bands (256 buckets/band — what a naive demo constant would ship)
   vs the default 16-bit bands (65 536 buckets/band). Reports
   candidate-pair counts and the verify-stage wall: the knob, not the
   corpus, decides the quadratic constant.
2. Hyperplane-LSH planes: bucket-occupancy distribution (max/p99/avg)
   for planes = 8 vs 12 vs 16 on the embedding corpus — planes ≈
   log2(N) - k keeps max occupancy bounded as N grows.

3. The round-4 scale-curve finding, fixed by the knob:
   dedup_embedding_near's demo constant (planes=3 → 8 buckets, pinned
   so its DuckDB oracle stays writable) went 22× on 10× vectors.
   Re-running cosine_near_dups with planes_for(N) shows the wall and
   candidate count coming back to linear — the documented override,
   measured.

Usage: python tools/occupancy_demo.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from cdh_integrate_carbondata2_3_spark.operators.dedup import (  # noqa: E402
    cosine_near_dups, hyperplane_signature, planes_for,
    simhash_band_pairs, simhash_signatures)
from cdh_integrate_carbondata2_3_spark.session import get_spark  # noqa: E402
from cdh_integrate_carbondata2_3_spark.sources.registry import (  # noqa: E402
    load_table)


def simhash_bands(spark, sf_dir: str) -> list[dict]:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tokens = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), " +")).alias("tok"))
    sigs = simhash_signatures(tokens, "doc_id", "tok", bits=64)
    sigs = sigs.localCheckpoint()       # time banding, not signatures
    n = sigs.count()
    # OCC_SIZED_ONLY=1 (big corpora): the mis-sized variant's candidate
    # count comes from occupancy algebra (sum of C(c,2) per bucket —
    # what the banded join would enumerate) instead of materializing a
    # quadratic join just to count it; the SIZED variant still runs the
    # real join.
    sized_only = os.environ.get("OCC_SIZED_ONLY") == "1"
    out = []
    for bands, width in ((8, 8), (4, 16)):
        t0 = time.time()
        if sized_only and width == 8:
            w = 64 // bands
            banded = sigs.select(F.explode(F.array(*[
                F.struct(
                    F.lit(bi).alias("bi"),
                    F.shiftrightunsigned(F.col("sim"), w * bi)
                     .bitwiseAND(F.lit((1 << w) - 1)).alias("bv"))
                for bi in range(bands)])).alias("band"))
            n_cand = int(
                (banded.groupBy("band")
                 .agg(F.count(F.lit(1)).alias("c"))
                 .agg(F.sum(F.expr("c * (c - 1) / 2")).alias("p"))
                 .first()["p"]) or 0)   # pre-dedup generations: upper bound
            analytic = True
        else:
            n_cand = simhash_band_pairs(sigs, "doc_id", 64, bands).count()
            analytic = False
        out.append({"bands": bands, "band_bits": width,
                    "buckets_per_band": 1 << width, "n_docs": n,
                    "candidate_pairs": n_cand, "analytic": analytic,
                    "wall_s": round(time.time() - t0, 2)})
    return out


def lsh_occupancy(spark, sf_dir: str) -> list[dict]:
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dim = len(emb.first()["embedding"])
    n = emb.count()
    out = []
    for planes in (8, 12, 16):
        occ = (emb.select(hyperplane_signature("embedding", planes, dim)
                          .alias("bucket"))
               .groupBy("bucket").agg(F.count(F.lit(1)).alias("c")))
        stats = occ.agg(
            F.max("c").alias("mx"),
            F.expr("percentile_approx(c, 0.99)").alias("p99"),
            F.avg("c").alias("avg"),
            F.count(F.lit(1)).alias("used")).first()
        out.append({"planes": planes, "buckets": 1 << planes,
                    "n_vectors": n, "buckets_used": stats["used"],
                    "max_occupancy": stats["mx"],
                    "p99_occupancy": int(stats["p99"]),
                    "avg_occupancy": round(stats["avg"], 1)})
    return out


def embedding_near_override(spark, sf_dir: str) -> list[dict]:
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select("vec_id",
                   F.transform("embedding", lambda x: x.cast("double"))
                   .alias("e")).localCheckpoint()
    n = v.count()
    sized = planes_for(n, target_occupancy=256)
    sized_only = os.environ.get("OCC_SIZED_ONLY") == "1"
    out = []
    for planes in (3, sized):
        t0 = time.time()
        if sized_only and planes != sized:
            # candidate-cosine count from bucket occupancy (the work
            # the verify stage would do), not the quadratic join itself
            from cdh_integrate_carbondata2_3_spark.operators.dedup import (
                axis_sign_signature)
            occ = (v.select(axis_sign_signature("e", planes).alias("b"))
                   .groupBy("b").agg(F.count(F.lit(1)).alias("c"))
                   .agg(F.sum(F.expr("c * (c - 1) / 2")).alias("p"))
                   .first()["p"])
            out.append({"planes": planes, "buckets": 1 << planes,
                        "n_vectors": n,
                        "candidate_cosines": int(occ or 0),
                        "analytic": True,
                        "wall_s": round(time.time() - t0, 2),
                        "sized_by_planes_for": False})
            continue
        n_pairs = cosine_near_dups(
            v, "vec_id", "e", threshold=0.94, planes=planes,
            axis_aligned=True).count()
        out.append({"planes": planes, "buckets": 1 << planes,
                    "n_vectors": n, "pairs_found": n_pairs,
                    "wall_s": round(time.time() - t0, 2),
                    "sized_by_planes_for": planes == sized})
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else str(
        Path(__file__).resolve().parent.parent / ".scratch" / "scale" / "sf1")
    spark = get_spark("occupancy_demo")
    print(json.dumps({"metric": "occupancy_demo",
                      "simhash": simhash_bands(spark, sf_dir),
                      "lsh": lsh_occupancy(spark, sf_dir),
                      "embedding_near": embedding_near_override(
                          spark, sf_dir)}))


if __name__ == "__main__":
    main()
