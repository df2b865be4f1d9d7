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
    if isinstance(v, _dt.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, _dt.date):      # date has no sep kwarg
        return v.isoformat()
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


# ---------------------------------------------------------------- vectorized
# Same skip test over a parquet stats sidecar (manifest.stats='parquet',
# columns seg_id/path/rows/bytes + min#col/max#col/pt#col) — the prune
# runs as pyarrow compute over ALL files at once instead of a Python
# loop per file. This is the driver-metadata scale path: at 1e5+ files
# the mask costs milliseconds and only SURVIVING files ever become
# Python objects. Property-tested equivalent to file_may_match
# (tests/test_property.py); any type surprise falls back to
# "no constraint", which is sound.

def _type_comparable(typ, v: Any) -> bool:
    import pyarrow as pa
    if isinstance(v, bool):
        return pa.types.is_boolean(typ)
    if isinstance(v, (int, float)):
        return pa.types.is_integer(typ) or pa.types.is_floating(typ)
    if isinstance(v, str):
        return pa.types.is_string(typ) or pa.types.is_large_string(typ)
    return False


def _minmax_keep(mn, mx, op: str, value: Any):
    """Boolean mask: may the file contain a match, judging only by
    [mn, mx]? None = this predicate can't constrain (type mismatch /
    unknown op). Nulls (absent stats) fill to True."""
    import pyarrow.compute as pc
    typ = mn.type
    if op == "between":
        lo, hi = _norm_value(value[0]), _norm_value(value[1])
        if not (_type_comparable(typ, lo) and _type_comparable(typ, hi)):
            return None
        return pc.and_kleene(pc.greater_equal(hi, mn), pc.less_equal(lo, mx))
    if op in ("in", "ranges"):
        keep = None
        for item in value:
            lo, hi = (item if op == "ranges" else (item, item))
            lo, hi = _norm_value(lo), _norm_value(hi)
            if not (_type_comparable(typ, lo) and _type_comparable(typ, hi)):
                return None
            one = pc.and_kleene(pc.greater_equal(hi, mn),
                                pc.less_equal(lo, mx))
            keep = one if keep is None else pc.or_kleene(keep, one)
        return keep
    v = _norm_value(value)
    if not _type_comparable(typ, v):
        return None
    if op == "=":
        return pc.and_kleene(pc.greater_equal(v, mn), pc.less_equal(v, mx))
    if op == "<":
        return pc.less(mn, v)
    if op == "<=":
        return pc.less_equal(mn, v)
    if op == ">":
        return pc.greater(mx, v)
    if op == ">=":
        return pc.greater_equal(mx, v)
    if op == "!=":
        return pc.invert(pc.and_kleene(pc.equal(mn, v), pc.equal(mx, v)))
    return None


def arrow_prune_mask(stats, predicates: Sequence[Predicate] | None):
    """Vectorized file_may_match over a stats sidecar table; returns a
    null-free boolean pa.Array (True = file may match)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    n = stats.num_rows
    keep = pa.array([True] * n, type=pa.bool_())
    names = set(stats.column_names)
    for col, op, value in (predicates or []):
        base = None
        if f"min#{col}" in names:
            try:
                base = _minmax_keep(stats[f"min#{col}"].combine_chunks(),
                                    stats[f"max#{col}"].combine_chunks(),
                                    op, value)
            except (pa.ArrowInvalid, pa.ArrowTypeError,
                    pa.ArrowNotImplementedError):
                base = None
            if base is not None:
                base = pc.fill_null(base, True)   # no stats → can't skip
        if base is None:
            base = keep                            # no constraint
        if f"pt#{col}" in names:
            ptv = stats[f"pt#{col}"]
            if op == "=":
                pt_keep = pc.equal(ptv, str(_norm_value(value)))
            elif op == "in":
                pt_keep = pc.is_in(ptv, value_set=pa.array(
                    [str(_norm_value(x)) for x in value]))
            else:
                pt_keep = keep                     # partition: only =/in prune
            # partition value present → partition test decides (exact);
            # absent → fall back to the min/max verdict
            base = pc.if_else(pc.is_valid(ptv),
                              pc.fill_null(pt_keep, False), base)
        keep = pc.and_(keep, base)
    return keep.combine_chunks() if hasattr(keep, "combine_chunks") else keep


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
