"""Measure star-join MV maintenance at scale: incremental fact-side
refresh vs full rebuild, and rewrite-vs-direct query latency.

The scale claim under test: a fact-side load's refresh cost is
O(increment ⋈ dim) + O(merge with the rollup) — independent of the
fact's accumulated size — while the full rebuild is O(fact ⋈ dim).
At 100 TB that difference is the whole point of the MV.

Usage: python tools/bench_mv_join.py [rows] [increment_rows]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from cdh_integrate_carbondata2_3_spark.catalog import Table  # noqa: E402
from cdh_integrate_carbondata2_3_spark.mv import (  # noqa: E402
    AggSpec, MVManager, QuerySpec)
from cdh_integrate_carbondata2_3_spark.session import get_spark  # noqa: E402


def run(rows: int, inc: int) -> None:
    spark = get_spark("bench_mv_join", cpus=16)
    root = tempfile.mkdtemp(prefix="mvjoin_")
    try:
        fact = Table.create(spark, f"{root}/fact",
                            "id bigint, store_id bigint, qty double")
        fact.insert(spark.range(0, rows).selectExpr(
            "id", "id % 10000 as store_id",
            "cast(id % 97 as double) as qty"))
        dim = Table.create(spark, f"{root}/dim",
                           "s_id bigint, region string")
        dim.insert(spark.range(0, 10000).selectExpr(
            "id as s_id",
            "concat('r', cast(id % 50 as string)) as region"))
        mgr = MVManager(fact)
        t0 = time.perf_counter()
        mgr.create("jmv", ["region"], [AggSpec("avg", "qty")],
                   joins=[(dim, "store_id", "s_id")])
        build = time.perf_counter() - t0

        fact.insert(spark.range(rows, rows + inc).selectExpr(
            "id", "id % 10000 as store_id",
            "cast(id % 89 as double) as qty"))
        t0 = time.perf_counter()
        mgr.refresh("jmv", incremental=True)
        incr = time.perf_counter() - t0

        fact.insert(spark.range(rows + inc, rows + 2 * inc).selectExpr(
            "id", "id % 10000 as store_id",
            "cast(id % 83 as double) as qty"))
        t0 = time.perf_counter()
        mgr.refresh("jmv", incremental=False)
        full = time.perf_counter() - t0

        q = QuerySpec(["region"], {"aq": AggSpec("avg", "qty"),
                                   "n": AggSpec("count", "*")},
                      joins=[(dim, "store_id", "s_id")])
        t0 = time.perf_counter()
        df, used = mgr.answer(q)
        df.collect()
        mv_q = time.perf_counter() - t0
        assert used == "jmv"
        t0 = time.perf_counter()
        mgr._direct(q).collect()
        direct_q = time.perf_counter() - t0
        print(f"rows={rows:,} inc={inc:,}  build={build:.2f}s  "
              f"incremental={incr:.2f}s  full={full:.2f}s  "
              f"mv_query={mv_q:.2f}s  direct={direct_q:.2f}s")

        # FILTERED join MV — the r7-flagged path: its FK certificate
        # used to re-run the FULL fact join on EVERY refresh
        # (mv/manager.py r7 line 461), de-incrementalizing it. The r8
        # fix verifies the count invariant on NEW segments only, so
        # this number must be flat in fact size.
        mgr.create("jflt", ["region"], [AggSpec("sum", "qty")],
                   filter="qty > 10.0",
                   joins=[(dim, "store_id", "s_id")])
        fact.insert(spark.range(rows + 2 * inc, rows + 3 * inc)
                    .selectExpr("id", "id % 10000 as store_id",
                                "cast(id % 79 as double) as qty"))
        t0 = time.perf_counter()
        mgr.refresh("jflt", incremental=True)
        incr_flt = time.perf_counter() - t0
        meta = mgr._load("jflt")
        assert meta.fk_dims, "filtered MV lost its FK certificate"
        print(f"rows={rows:,} inc={inc:,}  filtered_incremental="
              f"{incr_flt:.2f}s  (certificate intact)")
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    inc = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    run(rows, inc)
