"""Triangle-counting scale probe: exact at sf0.1 vs DOULION sampling
at the 30× replica (where the co-order graph densifies quadratically —
parts are dims and do not scale with the fact, so 30× orders pile
onto the same 20 k parts). Demonstrates the documented scale path:
exact where affordable, deterministic-sampled estimate where the
wedge space explodes. Usage: python tools/scale_probe_triangles.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from cdh_integrate_carbondata2_3_spark.operators.graph import (  # noqa: E402
    triangle_count)
from cdh_integrate_carbondata2_3_spark.session import get_spark  # noqa: E402


def edges_for(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    it = (li.filter(F.col("l_orderkey") % 3 == 0)
          .select("l_orderkey", "l_partkey").distinct())
    a, b = it.alias("a"), it.alias("b")
    return (a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                   & (F.col("a.l_partkey") < F.col("b.l_partkey")))
            .select(F.col("a.l_partkey").alias("u"),
                    F.col("b.l_partkey").alias("v")).distinct()
            .cache())


def main() -> None:
    spark = get_spark("tri_probe", cpus=16, shuffle_partitions=64)
    e1 = edges_for(spark, "/root/testdata/sf0.1")
    t0 = time.time()
    exact1 = triangle_count(e1, "u", "v")
    print(f"1x exact: {exact1} triangles, {time.time()-t0:.1f}s, "
          f"{e1.count()} edges", flush=True)
    t0 = time.time()
    s1 = triangle_count(e1, "u", "v", sample_p=0.2)
    print(f"1x doulion p=0.2: est {s1/0.2**3:.0f} "
          f"(err {abs(s1/0.2**3-exact1)/exact1:.1%}), "
          f"{time.time()-t0:.1f}s", flush=True)
    e1.unpersist()
    e30 = edges_for(spark, "/root/repo/.scratch/scale/sf3")
    n30 = e30.count()
    t0 = time.time()
    s30 = triangle_count(e30, "u", "v", sample_p=0.2)
    print(f"30x ({n30} edges) doulion p=0.2: est {s30/0.2**3:.0f}, "
          f"{time.time()-t0:.1f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
