"""Driver-side manifest prune scalability: how far does the
single-JSON tablestatus + linear min/max prune carry before the driver
becomes the bottleneck the reference built its distributed index
server for (indexserver/IndexServer.scala)?

Synthesizes manifests of N in {1e3, 1e4, 1e5} files (realistic stats:
3 min/max columns + a partition key per file, 100 segments), then
times, per N:
  load       — Manifest.load() JSON parse (paid once per cold query)
  prune      — prune_files() over every file with a selective
               range+partition predicate (paid per query)
  scan_files — the end-to-end Table.scan_files() path (load + prune,
               no Spark session involved)

Run:  python tools/bench_manifest_prune.py [out.json]
Prints one JSON line; SCALE.md records the verdict.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from cdh_integrate_carbondata2_3_spark.catalog.manifest import (  # noqa: E402
    FileStat, Manifest)
from cdh_integrate_carbondata2_3_spark.plans.pruning import (  # noqa: E402
    prune_files)

N_SEGMENTS = 100
# keeps exactly one file (gid 51: k-range hit + partition p_3 match)
PREDICATES = [("k", ">=", 50_000_000), ("k", "<", 55_000_000),
              ("p", "=", "p_3")]


def synth_manifest(root: str, n_files: int,
                   stats_format: str = "json") -> Manifest:
    m = Manifest(root)
    m.init("k bigint, v double, s string",
           {"manifest.stats": stats_format})
    per_seg = n_files // N_SEGMENTS
    rows_per_file = 1_000_000

    def mut(doc):
        for sid in range(N_SEGMENTS):
            files = []
            for i in range(per_seg):
                gid = sid * per_seg + i
                lo = gid * rows_per_file
                files.append(FileStat(
                    path=f"seg{sid}/part-{i:05d}.parquet",
                    rows=rows_per_file, bytes=128 << 20,
                    minmax={"k": [lo, lo + rows_per_file - 1],
                            "v": [0.0, 1.0],
                            "s": [f"a{gid}", f"z{gid}"]},
                    partition={"p": f"p_{gid % 16}"}).to_json())
            doc["segments"].append({
                "id": sid, "status": "SUCCESS", "format": "parquet",
                "files": files, "load_time": 0.0, "source": "load"})
    m.update(mut)
    return m


def bench_one(n_files: int, stats_format: str = "json") -> dict:
    root = tempfile.mkdtemp(prefix=f"mprune_{n_files}_")
    try:
        t0 = time.perf_counter()
        m = synth_manifest(root, n_files, stats_format)
        t_synth = time.perf_counter() - t0

        m = Manifest(root)              # fresh instance: cold caches
        t0 = time.perf_counter()
        doc = m.load()
        t_load_cold = time.perf_counter() - t0
        size_mb = Path(m.status_path).stat().st_size / 1e6

        segs = m.queryable_segments()
        all_files = [f for s in segs for f in s.files]
        t0 = time.perf_counter()
        kept = prune_files(all_files, PREDICATES)
        t_prune = time.perf_counter() - t0

        def scan() -> int:
            total = 0
            for seg in m.queryable_segments():
                total += len(prune_files(seg.files, PREDICATES))
            return total

        # end-to-end driver path (Table.scan_files shape, sans Spark):
        # cold = fresh Manifest (parse + materialize + prune);
        # warm = stat-keyed cache hit (prune only) — the per-query
        # steady state, since queries vastly outnumber commits
        m2 = Manifest(root)
        t0 = time.perf_counter()
        total_kept = sum(len(prune_files(s.files, PREDICATES))
                         for s in m2.queryable_segments())
        t_scan_cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        warm_kept = scan()
        t_scan_warm = time.perf_counter() - t0

        # vectorized sidecar path (parquet mode only): pyarrow mask,
        # survivors-only materialization — Table.scan_files fast path
        t_vec_cold = t_vec_warm = None
        if stats_format == "parquet":
            m3 = Manifest(root)
            t0 = time.perf_counter()
            pf = m3.pruned_filestats(PREDICATES)
            t_vec_cold = round(time.perf_counter() - t0, 4)
            assert sum(len(v) for v in pf.values()) == len(kept)
            t0 = time.perf_counter()
            pf = m3.pruned_filestats(PREDICATES)
            t_vec_warm = round(time.perf_counter() - t0, 4)
            assert sum(len(v) for v in pf.values()) == len(kept)

        assert len(doc["segments"]) == N_SEGMENTS
        assert len(kept) == total_kept == warm_kept
        if fr := doc.get("files_ref"):
            size_mb += Path(m.meta_dir, fr).stat().st_size / 1e6
        return {"n_files": n_files, "stats_format": stats_format,
                "manifest_mb": round(size_mb, 1),
                "synth_s": round(t_synth, 3),
                "load_cold_s": round(t_load_cold, 3),
                "prune_s": round(t_prune, 3),
                "scan_cold_s": round(t_scan_cold, 3),
                "scan_warm_s": round(t_scan_warm, 3),
                "scan_vec_cold_s": t_vec_cold,
                "scan_vec_warm_s": t_vec_warm,
                "kept": total_kept}
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    out = [bench_one(n, fmt) for n in (1_000, 10_000, 100_000)
           for fmt in ("json", "parquet")]
    # the 100-TB-class point (1e6 files ≈ 128 TB at 128 MB/file):
    # parquet stats mode only — the single-JSON manifest is exactly
    # what this path replaces at that scale
    out.append(bench_one(1_000_000, "parquet"))
    line = json.dumps({"metric": "manifest_prune", "results": out})
    print(line)
    if len(sys.argv) > 1:
        Path(sys.argv[1]).write_text(line + "\n")


if __name__ == "__main__":
    main()
