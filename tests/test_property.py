"""Property-based invariants (hypothesis) for driver-side primitives —
no SparkSession needed, so these run fast and explore odd inputs:

- bloom filters never produce false negatives, at any (m, k);
- connected_components agrees with a reference union-find on random
  graphs (checked through the same label-propagation math the Spark
  operator runs, driver-side).
"""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings, strategies as st

from cdh_integrate_carbondata2_3_spark.catalog.index import _Bloom


@settings(max_examples=50, deadline=None)
@given(values=st.lists(st.text(min_size=0, max_size=30), max_size=60),
       probes=st.lists(st.text(min_size=0, max_size=30), max_size=20),
       m_bits=st.integers(min_value=8, max_value=4096),
       k=st.integers(min_value=1, max_value=8))
def test_bloom_no_false_negatives(values, probes, m_bits, k):
    b = _Bloom(m_bits, k)
    for v in values:
        b.add(v)
    for v in values:
        assert b.may_contain(v)          # added → always reported
    # round-trip through the b64 sidecar encoding preserves membership
    b2 = _Bloom.from_b64(m_bits, k, b.b64())
    for v in values:
        assert b2.may_contain(v)
    for p in probes:
        # may_contain may false-positive but must never crash
        b2.may_contain(p)


def _union_find_components(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _label_propagation(edges, max_iter=100):
    """Driver-side replica of operators.graph.connected_components'
    per-round math: comp[node] = min(comp[node], min(comp[neighbors]))."""
    sym: dict[int, set[int]] = {}
    for a, b in edges:
        sym.setdefault(a, set()).add(b)
        sym.setdefault(b, set()).add(a)
    comp = {n: n for n in sym}
    for _ in range(max_iter):
        new = {n: min([comp[n]] + [comp[v] for v in sym[n]])
               for n in sym}
        if new == comp:
            return comp
        comp = new
    raise RuntimeError("no convergence")


@settings(max_examples=80, deadline=None)
@given(edges=st.lists(
    st.tuples(st.integers(min_value=0, max_value=40),
              st.integers(min_value=0, max_value=40)),
    min_size=1, max_size=60))
def test_label_propagation_matches_union_find(edges):
    want = _union_find_components(edges)
    got = _label_propagation(edges)
    assert got == want


import cdh_integrate_carbondata2_3_spark.catalog  # noqa: E402,F401 (break import cycle)
from cdh_integrate_carbondata2_3_spark.plans.pruning import (  # noqa: E402
    parse_simple_condition)

# exclude SQL keywords: a column named 'or'/'not'/... makes the
# parser's conservative keyword bail-out fire (sound: no pruning),
# and such names would need quoting in real SQL anyway
_ident = st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True).filter(
    lambda s: s not in ("or", "not", "and", "in", "between", "select"))
_num = st.integers(min_value=-10**6, max_value=10**6)
_strlit = st.from_regex(r"[a-zA-Z0-9_ ]{0,12}", fullmatch=True)


@settings(max_examples=80, deadline=None)
@given(parts=st.lists(
    st.one_of(
        st.tuples(_ident, st.sampled_from(["=", "!=", "<", "<=", ">", ">="]),
                  _num),
        st.tuples(_ident, st.just("in"),
                  st.lists(_num, min_size=1, max_size=5)),
        st.tuples(_ident, st.just("between"), st.tuples(_num, _num)),
        st.tuples(_ident, st.just("=s"), _strlit),
    ), min_size=1, max_size=5))
def test_parse_simple_condition_roundtrip(parts):
    frags, want = [], []
    for p in parts:
        col, op, v = p
        if op == "in":
            frags.append(f"{col} IN ({', '.join(str(x) for x in v)})")
            want.append((col, "in", list(v)))
        elif op == "between":
            frags.append(f"{col} BETWEEN {v[0]} AND {v[1]}")
            want.append((col, "between", (v[0], v[1])))
        elif op == "=s":
            frags.append(f"{col} = '{v}'")
            want.append((col, "=", v))
        else:
            frags.append(f"{col} {op} {v}")
            want.append((col, op, v))
    assert parse_simple_condition(" AND ".join(frags)) == want


@settings(max_examples=40, deadline=None)
@given(cond=st.sampled_from([
    "a = 1 OR b = 2", "NOT a = 1", "a = (SELECT max(x) FROM t)",
    "length(a) > 3", "a + 1 = 2", "true", "a LIKE 'x%'",
]))
def test_parse_simple_condition_bails_on_complex(cond):
    assert parse_simple_condition(cond) is None


# ---------------------------------------------------------------------------
# Vectorized (arrow) prune ≡ scalar prune — the parquet-stats sidecar
# path (manifest.stats='parquet') must never keep/drop differently from
# file_may_match, on any stats/predicate combination.

_COLS = ("k", "s")


@st.composite
def _filestats(draw):
    from cdh_integrate_carbondata2_3_spark.catalog.manifest import FileStat
    files = []
    n = draw(st.integers(min_value=0, max_value=12))
    for i in range(n):
        minmax = {}
        if draw(st.booleans()):
            a, b = sorted([draw(st.integers(-50, 50)),
                           draw(st.integers(-50, 50))])
            minmax["k"] = [a, b]
        if draw(st.booleans()):
            a, b = sorted([draw(st.text("abc", min_size=0, max_size=3)),
                           draw(st.text("abc", min_size=0, max_size=3))])
            minmax["s"] = [a, b]
        partition = {}
        if draw(st.booleans()):
            partition["p"] = draw(st.sampled_from(["p_0", "p_1", "p_2"]))
        files.append(FileStat(path=f"f{i}", rows=10, bytes=100,
                              minmax=minmax, partition=partition))
    return files


@st.composite
def _predicates(draw):
    preds = []
    for _ in range(draw(st.integers(0, 3))):
        col = draw(st.sampled_from(["k", "s", "p", "missing"]))
        op = draw(st.sampled_from(["=", "!=", "<", "<=", ">", ">=",
                                   "in", "between", "ranges"]))
        if col == "s":
            v = draw(st.text("abc", min_size=0, max_size=3))
        elif col == "p":
            v = draw(st.sampled_from(["p_0", "p_1", "p_9"]))
        else:
            v = draw(st.integers(-60, 60))
        if op == "in":
            value = [v] + [draw(st.integers(-60, 60)) if col == "k"
                           else draw(st.text("abc", max_size=3))
                           for _ in range(draw(st.integers(0, 2)))]
            if not value:
                continue
        elif op == "between":
            if isinstance(v, int):
                value = tuple(sorted([v, draw(st.integers(-60, 60))]))
            else:
                value = tuple(sorted([v, draw(st.text("abc", max_size=3))]))
        elif op == "ranges":
            if not isinstance(v, int):
                continue
            value = [tuple(sorted([v, draw(st.integers(-60, 60))]))
                     for _ in range(draw(st.integers(1, 2)))]
        else:
            value = v
        preds.append((col, op, value))
    return preds


@settings(max_examples=200, deadline=None)
@given(files=_filestats(), preds=_predicates())
def test_arrow_prune_equals_scalar_prune(files, preds):
    import pyarrow.compute as pc
    from cdh_integrate_carbondata2_3_spark.catalog.manifest import Manifest
    from cdh_integrate_carbondata2_3_spark.plans.pruning import (
        arrow_prune_mask, prune_files)
    # build the sidecar shape exactly the way _write_filestats does
    doc = {"segments": [{"id": 0, "files": [f.to_json() for f in files]}]}
    m = Manifest.__new__(Manifest)
    m.meta_dir = "/tmp"
    import pyarrow as pa

    flat = [(0, f) for f in doc["segments"][0]["files"]]
    mm_names = sorted({c for _, f in flat for c in f.get("minmax", {})})
    pt_names = sorted({c for _, f in flat for c in f.get("partition", {})})
    data = {"seg_id": [s for s, _ in flat],
            "path": [f["path"] for _, f in flat],
            "rows": [f["rows"] for _, f in flat],
            "bytes": [f["bytes"] for _, f in flat]}
    for c in mm_names:
        pairs = [f.get("minmax", {}).get(c) for _, f in flat]
        data[f"min#{c}"] = [p[0] if p else None for p in pairs]
        data[f"max#{c}"] = [p[1] if p else None for p in pairs]
    for c in pt_names:
        data[f"pt#{c}"] = [f.get("partition", {}).get(c) for _, f in flat]
    t = pa.table(data)

    scalar_kept = {f.path for f in prune_files(files, preds)}
    mask = arrow_prune_mask(t, preds)
    arrow_kept = set(t.filter(mask)["path"].to_pylist()) if t.num_rows else set()
    assert arrow_kept == scalar_kept, (preds, scalar_kept, arrow_kept)


@settings(max_examples=60, deadline=None)
@given(data=st.data(),
       m_bytes=st.integers(min_value=2, max_value=512))
def test_bloomjoin_bitset_no_false_negatives(data, m_bytes):
    """operators/bloomjoin numpy bit math: every inserted (p1, p2)
    position pair must test positive afterward, across any split of
    the inserts into batches and any duplicate positions — the same
    false-negative-freedom the distributed build relies on."""
    import numpy as np

    from cdh_integrate_carbondata2_3_spark.operators.bloomjoin import (
        _set_bits, _test_bits)

    m_bits = m_bytes * 8
    pos = st.integers(min_value=0, max_value=m_bits - 1)
    pairs = data.draw(st.lists(st.tuples(pos, pos), max_size=80))
    bits = np.zeros(m_bytes, dtype=np.uint8)
    # insert in two arbitrary slices to mimic per-partition folds
    cut = data.draw(st.integers(min_value=0, max_value=len(pairs)))
    for chunk in (pairs[:cut], pairs[cut:]):
        if chunk:
            flat = np.array([p for pr in chunk for p in pr],
                            dtype=np.int64)
            part = np.zeros(m_bytes, dtype=np.uint8)
            _set_bits(part, flat)
            bits |= part                 # driver OR-fold
    if pairs:
        p1 = np.array([a for a, _ in pairs], dtype=np.int64)
        p2 = np.array([b for _, b in pairs], dtype=np.int64)
        assert _test_bits(bits, p1, p2).all()


# ---------------------------------------------------------------------------
# round-9 operator invariants (driver-side references — the Spark
# operators are pinned to these same reference functions in their own
# test files; here hypothesis explores odd inputs)
# ---------------------------------------------------------------------------


def _hilbert_ref(coords, bits):
    X = list(coords)
    n = len(X)
    q = 1 << (bits - 1)
    while q > 1:
        p = q - 1
        for i in range(n):
            if X[i] & q:
                X[0] ^= p
            else:
                t = (X[0] ^ X[i]) & p
                X[0] ^= t
                X[i] ^= t
        q >>= 1
    for i in range(1, n):
        X[i] ^= X[i - 1]
    t = 0
    q = 1 << (bits - 1)
    while q > 1:
        if X[n - 1] & q:
            t ^= q - 1
        q >>= 1
    X = [x ^ t for x in X]
    h = 0
    for j in range(bits - 1, -1, -1):
        for i in range(n):
            h = (h << 1) | ((X[i] >> j) & 1)
    return h


@settings(max_examples=25, deadline=None)
@given(bits=st.integers(min_value=1, max_value=5),
       dims=st.integers(min_value=1, max_value=3))
def test_hilbert_reference_bijective_and_adjacent(bits, dims):
    side = 1 << bits
    pts = [[]]
    for _ in range(dims):
        pts = [p + [c] for p in pts for c in range(side)]
    hs = {tuple(p): _hilbert_ref(p, bits) for p in pts}
    assert sorted(hs.values()) == list(range(side ** dims))
    inv = {h: p for p, h in hs.items()}
    for h in range(side ** dims - 1):
        a, b = inv[h], inv[h + 1]
        assert sum(abs(x - y) for x, y in zip(a, b)) == 1


@settings(max_examples=50, deadline=None)
@given(rows=st.lists(st.tuples(st.integers(0, 20), st.integers(0, 12)),
                     max_size=80),
       min_support=st.integers(min_value=1, max_value=5))
def test_frequent_pairs_l1_prune_exact_without_truncation(rows,
                                                          min_support):
    """With no basket truncation in play, the A-priori L1 prune is
    EXACT: the surviving pair set equals the unpruned mine filtered
    to support >= min_support, value-for-value. (Under a truncating
    cap the prune legitimately changes which items survive the cap —
    prune happens BEFORE basket formation, by design, in both this
    reference and the operator.)"""
    from itertools import combinations
    baskets: dict[int, set] = {}
    for b, i in rows:
        baskets.setdefault(b, set()).add(i)

    def mine(ms):
        item_support = Counter()
        for items in baskets.values():
            for i in items:
                item_support[i] += 1
        sup = Counter()
        for items in baskets.values():
            keep = {i for i in items
                    if ms <= 1 or item_support[i] >= ms}
            for a, b in combinations(sorted(keep), 2):
                sup[(a, b)] += 1
        return {k: v for k, v in sup.items() if v >= ms}

    pruned = mine(min_support)
    baseline = {k: v for k, v in mine(1).items() if v >= min_support}
    assert pruned == baseline


@settings(max_examples=50, deadline=None)
@given(ids=st.lists(st.integers(min_value=-2**40, max_value=2**40),
                    unique=True, max_size=60))
def test_dense_rank_reference_is_sort_position(ids):
    want = {v: i for i, v in enumerate(sorted(ids))}
    # the two-phase construction equals sort position for ANY split:
    # simulate arbitrary contiguous range partitions
    import random
    rnd = random.Random(42)
    s = sorted(ids)
    cuts = sorted(rnd.sample(range(len(s) + 1),
                             min(3, len(s) + 1))) if s else []
    parts, prev = [], 0
    for c in cuts:
        parts.append(s[prev:c])
        prev = c
    parts.append(s[prev:])
    off, got = 0, {}
    for part in parts:
        for j, v in enumerate(sorted(part)):
            got[v] = off + j
        off += len(part)
    assert got == want
