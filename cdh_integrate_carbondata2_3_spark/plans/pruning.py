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
import re
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


_SIMPLE_CMP = re.compile(
    r"^\s*(\w+)\s*(=|!=|<>|<=|>=|<|>)\s*('(?:[^']*)'|-?\d+(?:\.\d+)?)\s*$")
_SIMPLE_IN = re.compile(r"^\s*(\w+)\s+IN\s*\(([^()]*)\)\s*$", re.IGNORECASE)
_SIMPLE_BETWEEN = re.compile(
    r"^\s*(\w+)\s+BETWEEN\s+('(?:[^']*)'|-?\d+(?:\.\d+)?)"
    r"\s+AND\s+('(?:[^']*)'|-?\d+(?:\.\d+)?)\s*$", re.IGNORECASE)


def _lit(s: str):
    s = s.strip()
    if s.startswith("'"):
        return s[1:-1]
    return float(s) if "." in s else int(s)


def parse_simple_condition(condition: str) -> list[Predicate] | None:
    """Best-effort SQL condition → pruning predicates for the
    manifest/SI machinery. Handles top-level AND conjunctions of
    ``col op literal`` / ``col IN (...)`` / ``col BETWEEN a AND b``;
    returns None for anything it can't FULLY understand (OR, NOT,
    subqueries, expressions) — conservative by construction: pruning
    with a wrong predicate would drop rows, so the fallback is always
    "no file pruning" (Spark still pushes the row filter exactly)."""
    if not condition or condition.strip().lower() == "true":
        return None
    upper = f" {condition.upper()} "
    if " OR " in upper or " NOT " in upper or "SELECT" in upper:
        return None
    # split on AND, re-joining the AND that belongs to a BETWEEN
    raw = re.split(r"\s+AND\s+", condition, flags=re.IGNORECASE)
    parts: list[str] = []
    i = 0
    while i < len(raw):
        frag = raw[i]
        if (re.match(r"^\s*\w+\s+BETWEEN\s+", frag, re.IGNORECASE)
                and i + 1 < len(raw)):
            frag = f"{frag} AND {raw[i + 1]}"
            i += 1
        parts.append(frag)
        i += 1
    preds: list[Predicate] = []
    for part in parts:
        if m := _SIMPLE_CMP.match(part):
            col, op, val = m.group(1), m.group(2), _lit(m.group(3))
            preds.append((col, "!=" if op == "<>" else op, val))
        elif m := _SIMPLE_IN.match(part):
            vals = [_lit(v) for v in m.group(2).split(",") if v.strip()]
            preds.append((m.group(1), "in", vals))
        elif m := _SIMPLE_BETWEEN.match(part):
            preds.append((m.group(1), "between",
                          (_lit(m.group(2)), _lit(m.group(3)))))
        else:
            return None            # unknown fragment → no pruning at all
    return preds or None
