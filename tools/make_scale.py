"""Build a replicated larger-sf dataset for scale-stress benching.

The driver ships sf0.001/0.01/0.1 only; constants that are fine at
sf0.1 (LSH bucket counts, df caps, broadcast sizes) can go quadratic
one order of magnitude later. This tool unions K id-shifted copies of
a source sf dir into a scratch dir (key columns offset per copy so
join/group cardinalities scale like real data instead of stacking
duplicates), then ``SPARK_GRAFT_SF_DIR=<out> python bench.py`` runs
the same headline bench against it.

Usage: python tools/make_scale.py [src_dir] [copies] [out_dir]
Defaults: /root/testdata/sf0.1  5  <repo>/.scratch/scale/sf0.5
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from cdh_integrate_carbondata2_3_spark.session import get_spark  # noqa: E402
from cdh_integrate_carbondata2_3_spark.sources.registry import (  # noqa: E402
    TPCH_TABLES, load_table)

# key columns to shift per copy so cardinalities actually grow
_SHIFT_COLS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],          # part/supp keys stay (dims not scaled)
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# dims stay single-copy: region nation supplier part


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    out = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch", "scale", "sf0.5")
    os.makedirs(out, exist_ok=True)
    spark = get_spark("make_scale")
    for name in TPCH_TABLES:
        df = load_table(spark, src, name)
        shift_cols = _SHIFT_COLS.get(name)
        if shift_cols:
            # offset far above any existing key
            base = 10 ** 9
            parts = [df]
            for c in range(1, copies):
                p = df
                for col in shift_cols:
                    p = p.withColumn(col, F.col(col) + c * base)
                parts.append(p)
            full = parts[0]
            for p in parts[1:]:
                full = full.unionByName(p)
        else:
            full = df
        full.write.mode("overwrite").parquet(os.path.join(
            out, f"{name}.parquet"))
        print(f"{name}: {full.count()} rows")
    spark.stop()
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
