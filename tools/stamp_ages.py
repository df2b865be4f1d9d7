"""Driver-window stamp-age report: which round last hash-stamped each
registered query, and what the next rotation should drain.

Usage: python tools/stamp_ages.py

A row counts as stamped in round N if CORRECTNESS_rN.json has it with
hash_match=true or err=="no_oracle" (the driver's rows-only pass).
The 50-slot window ordering lives in queries/__init__.py::all_queries
(never-stamped -> _ROTATE_BACK_IN -> _DEFER_TO_NEXT -> rest); each
round the oldest-stamp rows + that round's changed-path rows belong
in _ROTATE_BACK_IN and the previous window moves to
_STAMPED_PRIOR_ROUNDS. This tool prints the age buckets and the
oldest cohort so the rotation plan is one copy-paste, not an ad-hoc
scan (r11 process note)."""

from __future__ import annotations

import glob
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    stamps: dict[str, int] = {}
    for f in sorted(glob.glob("CORRECTNESS_r*.json")):
        if "FULL" in f:
            continue
        rnd = int(f.split("_r")[1].split(".")[0])
        doc = json.load(open(f))
        for name, row in doc.get("queries", doc).items():
            if not isinstance(row, dict):
                continue
            if row.get("hash_match") or row.get("err") == "no_oracle":
                stamps[name] = max(stamps.get(name, 0), rnd)

    import __spark_entry__ as entry
    names = list(entry.queries().keys())
    never = [n for n in names if n not in stamps]
    buckets: dict[int, list[str]] = {}
    for n in names:
        if n in stamps:
            buckets.setdefault(stamps[n], []).append(n)
    print(f"registered: {len(names)}; never stamped: {len(never)}")
    for n in never:
        print(f"  NEVER: {n}")
    for r in sorted(buckets):
        print(f"r{r}: {len(buckets[r])} rows")
    if buckets:
        oldest = min(buckets)
        print(f"\noldest cohort (r{oldest}) — next _ROTATE_BACK_IN:")
        for n in sorted(buckets[oldest]):
            print(f'    "{n}",')
    window = names[:50]
    print(f"\ncurrent window (first 50 of queries()): "
          f"{len(set(window))} unique")


if __name__ == "__main__":
    main()
