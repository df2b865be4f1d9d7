"""Isolate one registry query: run it N times (noop sink + the bench's
count() action), print per-run seconds, and optionally save
``explain("formatted")`` — the guide §1 measurement loop
(spark_optimization_guide.md §1.4 noop sink, §1.5 job labels, §7.2
plan reading) packaged so before/after evidence for OPTIMIZATION_r12
is one command:

    python tools/profile_query.py text_bm25_rank -n 3 \
        --explain plans/r12/text_bm25_rank_after.txt
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from cdh_integrate_carbondata2_3_spark.queries import all_queries  # noqa: E402
from cdh_integrate_carbondata2_3_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("-n", "--runs", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--explain", default=None,
                    help="file to write explain('formatted') to "
                         "(single query only)")
    ap.add_argument("--action", choices=("noop", "count", "both", "none"),
                    default="both")
    ap.add_argument("--twin", action="store_true",
                    help="also time the plain-Spark twin "
                         "(spark_oracle or oracle) with collect() on "
                         "both sides — the baseline_bench protocol")
    args = ap.parse_args()

    spark = get_spark("profile")
    if args.twin:
        from cdh_integrate_carbondata2_3_spark.sources.registry import (
            TPCH_TABLES, register_views)
        register_views(spark, args.sf, TPCH_TABLES)
    qs = all_queries()
    # same warmup as bench.py so run 1 isn't JIT/codegen-cold
    qs["q1_pricing_summary"].fn(spark, args.sf).limit(1).collect()
    t0 = time.time()
    spark.range(0, 200_000_000, 1, 32).selectExpr(
        "sum(id % 7) AS s").collect()
    calib = round(time.time() - t0, 3)

    out: dict[str, dict] = {}
    for name in args.names:
        q = qs[name]
        if args.explain and len(args.names) == 1:
            df = q.fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            Path(args.explain).parent.mkdir(parents=True, exist_ok=True)
            Path(args.explain).write_text(plan)
        rec: dict[str, list[float]] = {}
        if args.twin:
            for side, mk in (
                    ("engine_collect",
                     lambda: q.fn(spark, args.sf).select("*").collect()),
                    ("twin_collect",
                     lambda: spark.sql(
                         q.spark_oracle or q.oracle).collect())):
                times = []
                for i in range(args.runs):
                    spark.sparkContext.setJobDescription(
                        f"{name} [{side} run {i}]")
                    t0 = time.time()
                    mk()
                    times.append(round(time.time() - t0, 3))
                    spark.sparkContext.setJobDescription(None)
                spark.catalog.clearCache()
                rec[side] = times
        for action in (("noop", "count") if args.action == "both"
                       else () if args.action == "none"
                       else (args.action,)):
            times = []
            for i in range(args.runs):
                spark.sparkContext.setJobDescription(
                    f"{name} [{action} run {i}]")
                t0 = time.time()
                df = q.fn(spark, args.sf)
                if action == "noop":
                    df.write.format("noop").mode("overwrite").save()
                else:
                    df.count()
                times.append(round(time.time() - t0, 3))
                spark.sparkContext.setJobDescription(None)
            spark.catalog.clearCache()
            rec[action] = times
        out[name] = rec
        print(json.dumps({"query": name, **rec, "calibration_s": calib}),
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
