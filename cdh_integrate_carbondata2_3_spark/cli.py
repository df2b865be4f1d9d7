"""Offline table inspector — the engine's CarbonCli.

Reference: tools/cli/.../CarbonCli.java with DataSummary.java (schema /
segment / per-column stats printout) and ScanBenchmark.java (per-file
scan timing). Everything here is driver-side: manifest JSON + parquet
footers via pyarrow — no SparkSession needed.

Usage::

    python -m cdh_integrate_carbondata2_3_spark.cli summary <table_dir>
    python -m cdh_integrate_carbondata2_3_spark.cli bench   <table_dir>
"""

from __future__ import annotations

import json
import sys
import time

import pyarrow.parquet as pq

from .catalog.manifest import QUERYABLE, Manifest


def summary(table_dir: str) -> dict:
    """Schema + properties + per-segment and per-column summary
    (reference DataSummary.java)."""
    m = Manifest(table_dir)
    doc = m.load()
    segs = []
    col_minmax: dict[str, list] = {}
    total_rows = total_bytes = 0
    for s in m.segments():
        segs.append({
            "id": s.id, "status": s.status, "format": s.format,
            "source": s.source, "rows": s.rows, "bytes": s.bytes,
            "n_files": len(s.files),
        })
        if s.status not in QUERYABLE:
            continue
        total_rows += max(s.rows, 0)
        total_bytes += s.bytes
        for f in s.files:
            for col, (mn, mx) in (f.minmax or {}).items():
                cur = col_minmax.get(col)
                if cur is None:
                    col_minmax[col] = [mn, mx]
                else:
                    cur[0] = min(cur[0], mn)
                    cur[1] = max(cur[1], mx)
    out = {
        "table_dir": table_dir,
        "schema": doc["schema"],
        "properties": doc.get("properties", {}),
        "version": doc.get("version"),
        "segments": segs,
        "total_rows": total_rows,
        "total_bytes": total_bytes,
        "column_minmax": col_minmax,
    }
    deltas = doc.get("delete_deltas") or []
    if deltas:
        # merge-on-read: footer counts include soft-deleted rows —
        # report both so the summary matches what queries return
        deleted = sum(d["rows"] for d in deltas)
        out["delete_deltas"] = len(deltas)
        out["deleted_rows"] = deleted
        out["live_rows"] = total_rows - deleted
    return out


def bench(table_dir: str) -> dict:
    """Per-file scan timing over queryable segments
    (reference ScanBenchmark.java). Pure pyarrow column scan."""
    m = Manifest(table_dir)
    files = []
    for s in m.queryable_segments():
        if s.format != "parquet":
            continue
        for f in s.files:
            p = f.path
            files.append(p if p.startswith("/")
                         else f"{table_dir}/{p}")
    timings = []
    t_all = time.time()
    rows = 0
    for p in files:
        t0 = time.time()
        tbl = pq.read_table(p)
        rows += tbl.num_rows
        timings.append({"file": p, "rows": tbl.num_rows,
                        "sec": round(time.time() - t0, 4)})
    return {"table_dir": table_dir, "n_files": len(files), "rows": rows,
            "total_sec": round(time.time() - t_all, 4), "files": timings}


def main(argv: list[str] | None = None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 2 or argv[0] not in ("summary", "bench"):
        print(__doc__)
        return 2
    cmd, table_dir = argv
    out = summary(table_dir) if cmd == "summary" else bench(table_dir)
    print(json.dumps(out, indent=2, default=str))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
