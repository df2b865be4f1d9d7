"""Driver-side file pruning from manifest min/max + partition values.

The reference prunes blocklets on the driver before scheduling splits
(hadoop/.../CarbonInputFormat.java:540-681 getPrunedBlocklets: default
min/max index → CG → FG). Spark's parquet reader only skips row groups
*after* files are listed, so file-level skipping from the manifest is
the one piece Catalyst doesn't give us — everything coarser (partition
dirs) and finer (row groups, pages) is built in.

Predicates here are simple conjuncts ``(col, op, value)``; Spark
re-evaluates the full filter exactly, so pruning only has to be
*sound* (never drop a file that may contain a match), mirroring the
reference's include/exclude executor contract.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, Sequence

from ..catalog.manifest import FileStat

Predicate = tuple[str, str, Any]    # (column, op, value); op ∈ =,!=,<,<=,>,>=,in,between


def _norm_value(v: Any) -> Any:
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat(sep=" ")
    return v


def _comparable(a: Any, b: Any) -> bool:
    num = (int, float)
    if isinstance(a, num) and isinstance(b, num):
        return True
    return type(a) is type(b)


def file_may_match(f: FileStat, predicates: Sequence[Predicate]) -> bool:
    """Sound skip test: False only if NO row in the file can satisfy
    the conjunction of predicates."""
    for col, op, value in predicates:
        # partition pruning (exact: partition value is the value)
        if col in f.partition:
            pv = f.partition[col]
            v = value
            if op == "=" and str(v) != pv:
                return False
            if op == "in" and all(str(x) != pv for x in v):
                return False
            continue
        if col not in f.minmax:
            continue                        # no stats → cannot skip
        mn, mx = f.minmax[col]
        if op == "between":
            lo, hi = (_norm_value(value[0]), _norm_value(value[1]))
            if not (_comparable(mn, lo) and _comparable(mx, hi)):
                continue
            if hi < mn or lo > mx:
                return False
            continue
        if op == "ranges":
            # disjoint [lo, hi] list (spatial range-list pushdown —
            # reference GeoHashIndex.java:187 query-by-range-list):
            # skip the file iff no range overlaps [mn, mx]
            pairs = [(_norm_value(lo), _norm_value(hi)) for lo, hi in value]
            if not all(_comparable(mn, lo) and _comparable(mx, hi)
                       for lo, hi in pairs):
                continue
            if all(hi < mn or lo > mx for lo, hi in pairs):
                return False
            continue
        if op == "in":
            vals = [_norm_value(x) for x in value]
            if not all(_comparable(mn, x) for x in vals):
                continue
            if all(x < mn or x > mx for x in vals):
                return False
            continue
        v = _norm_value(value)
        if not _comparable(mn, v):
            continue
        if op == "=" and (v < mn or v > mx):
            return False
        if op == "<" and mn >= v:
            return False
        if op == "<=" and mn > v:
            return False
        if op == ">" and mx <= v:
            return False
        if op == ">=" and mx < v:
            return False
        # != can only be pruned when min==max==v
        if op == "!=" and mn == mx == v:
            return False
    return True


def prune_files(files: Sequence[FileStat],
                predicates: Sequence[Predicate] | None) -> list[FileStat]:
    if not predicates:
        return list(files)
    return [f for f in files if file_may_match(f, predicates)]
