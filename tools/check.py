"""Local driver-mimic: run every queries() entry on Spark and its
oracle on DuckDB, compare row count / columns / order-insensitive
value hash. Run:  python tools/check.py [sf_dir] [query ...]

Set CHECK_OUT=<path.json> to also write a per-query artifact in the
driver's CORRECTNESS format — the registry (223) outgrew the driver's
50-slot stamp window, so each round commits a full-registry
CORRECTNESS_FULL_r{N}.json next to the driver's window artifact
(VERDICT r9 next-round 5); stamp age then stops mattering.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def canon(df: pd.DataFrame) -> tuple[int, list[str], str]:
    cols = sorted(df.columns)
    df = df[cols]
    cells = df.astype(str)
    rows = sorted("\x1f".join(r) for r in cells.itertuples(index=False, name=None))
    digest = hashlib.md5("\x1e".join(rows).encode()).hexdigest()
    return len(df), cols, digest


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    # Deliberately a PLAIN session — NOT session.get_spark(). The
    # grading driver builds its own SparkSession without the engine's
    # confs, so any conf a query needs must be set by the code under
    # test at runtime (r4 lesson: local 155/155 vs driver 49/50
    # because spark.sql.python.filterPushdown.enabled was only set in
    # the engine's session builder). Keep this mirror conf-naked.
    spark = (SparkSession.builder.master("local[8]")
             .appName("check")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    def fresh_con():
        """One connection per oracle: a bounded memory pool with disk
        spill (big-sf oracles — the 8-bucket embedding blocking at 10×
        — otherwise OOM the shared allocator and poison every later
        tiny allocation), and per-query isolation so one blowup can't
        fail the rest of the gate."""
        c = duckdb.connect()
        c.execute("SET memory_limit='24GB'")
        c.execute("SET temp_directory='/tmp/duckspill'")
        for t in TABLES:
            p = f"{sf_dir}/{t}.parquet"
            # driver testdata ships single files; Spark-written
            # replicas (tools/make_scale.py) are part-file directories
            pat = f"{p}/*.parquet" if Path(p).is_dir() else p
            c.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
        return c

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    results: dict[str, dict] = {}

    def record(name, *, rows_match=None, schema_match=None,
               hash_match=None, spark_rows=None, oracle_rows=None,
               err=None):
        results[name] = {
            "rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match, "spark_rows": spark_rows,
            "oracle_rows": oracle_rows, "err": err}

    for name, fn in qs.items():
        if only and name not in only:
            continue
        # drop whatever the PREVIOUS query cached — 155 queries in one
        # JVM otherwise accumulate executor memory (ADVICE r4)
        spark.catalog.clearCache()
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            record(name, err=f"spark:{type(e).__name__}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"pass {name}: rows-only ({len(sdf)} rows) [{time.time()-t0:.1f}s]")
            record(name, spark_rows=len(sdf), err="no_oracle")
            n_pass += 1
            continue
        try:
            con = fresh_con()
            odf = con.execute(oracles[name]).fetchdf()
            con.close()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            record(name, spark_rows=len(sdf),
                   err=f"duckdb:{type(e).__name__}")
            n_fail += 1
            continue
        sn, scols, shash = canon(sdf)
        on, ocols, ohash = canon(odf)
        record(name, rows_match=sn == on, schema_match=scols == ocols,
               hash_match=shash == ohash, spark_rows=sn, oracle_rows=on)
        if sn != on:
            print(f"FAIL {name}: rows spark={sn} duckdb={on}")
            n_fail += 1
        elif scols != ocols:
            print(f"FAIL {name}: cols spark={scols} duckdb={ocols}")
            n_fail += 1
        elif shash != ohash:
            print(f"FAIL {name}: value hash mismatch ({sn} rows)")
            merged = sdf[sorted(sdf.columns)].astype(str)
            omerged = odf[sorted(odf.columns)].astype(str)
            skey = set(map(tuple, merged.itertuples(index=False, name=None)))
            okey = set(map(tuple, omerged.itertuples(index=False, name=None)))
            for r in list(skey - okey)[:3]:
                print(f"   spark-only: {r}")
            for r in list(okey - skey)[:3]:
                print(f"   duck-only:  {r}")
            n_fail += 1
        else:
            print(f"PASS {name}: {sn} rows hash={shash[:8]} [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    out_path = os.environ.get("CHECK_OUT")
    if out_path:
        import json
        with open(out_path, "w") as f:
            json.dump({"sf_dir": sf_dir,
                       "n_pass": n_pass, "n_fail": n_fail,
                       "queries": results}, f, indent=1)
        print(f"wrote {out_path}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
