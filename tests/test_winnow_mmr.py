"""Winnowing fingerprints vs a literal brute-force reference (incl.
the rightmost-min tie rule and the shared-substring guarantee) and
MMR selection vs a numpy replay of the same rounded greedy walk."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from cdh_integrate_carbondata2_3_spark.operators.dedup import (
    winnow_fingerprints, winnow_near_dups)
from cdh_integrate_carbondata2_3_spark.operators.similarity import mmr_select


def _ref_winnow(text: str, k: int, w: int) -> set[str]:
    t = " ".join(text.strip().lower().split())
    hs = [hashlib.md5(t[i:i + k].encode()).hexdigest()
          for i in range(len(t) - k + 1)]
    sel = set()
    for s in range(len(hs) - w + 1):
        win = hs[s:s + w]
        mn = min(win)
        # rightmost minimum
        pos = max(i for i, h in enumerate(win) if h == mn)
        sel.add(win[pos])
    return sel


@pytest.mark.parametrize("text,k,w", [
    ("the quick brown fox jumps over the lazy dog", 5, 4),
    ("abababababababababab", 3, 4),          # massive hash ties
    ("  Mixed   CASE\tand\nwhitespace  here ", 4, 3),
    ("x" * 50, 8, 4),                        # single repeated gram
])
def test_winnow_matches_bruteforce(spark, text, k, w):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = {r["fp"] for r in
           winnow_fingerprints(df, k=k, w=w).collect()}
    assert got == _ref_winnow(text, k, w)


def test_winnow_short_docs_emit_nothing(spark):
    df = spark.createDataFrame(
        [(1, "tiny"), (2, ""), (3, "just-right-here")],
        "doc_id long, text string")
    out = winnow_fingerprints(df, k=8, w=4).groupBy("doc_id").count()
    got = {r["doc_id"]: r["count"] for r in out.collect()}
    # doc 1: 0 grams of len 8 → nothing; doc 3: 15 chars → 8 grams,
    # 5 windows → some fingerprints
    assert 1 not in got and 2 not in got and got[3] >= 1


def test_winnow_guarantee_shared_substring_shares_fingerprint(spark):
    # any shared run of >= k + w - 1 chars must yield a shared
    # fingerprint (the winnowing theorem) — embed one 20-char run in
    # otherwise-different documents (k=8, w=4 → threshold 11... use
    # k+w-1 = 11 < 20, satisfied)
    shared = "zqxj kvwpy gmbtf"      # 16 chars, rare
    a = "left padding words " + shared + " alpha beta"
    b = "completely other start " + shared + " gamma"
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    fps = winnow_fingerprints(df, k=8, w=4)
    both = (fps.groupBy("fp").agg(F.count_distinct("doc_id").alias("n"))
            .filter(F.col("n") == 2).count())
    assert both >= 1


def test_winnow_near_dups_max_df_drops_boilerplate(spark):
    # 6 docs all share boilerplate; only 2 share a rare run
    boiler = "common header appears in every single document here"
    rare = "unique shared payload fragment"
    rows = [(i, boiler + f" filler{i} ") for i in range(4)]
    rows += [(10, boiler + " " + rare), (11, boiler + " " + rare + " x")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = winnow_near_dups(df, k=8, w=4, min_shared=1, max_df=3)
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    assert (10, 11) in got
    # boilerplate-only pairs are gone (their fps exceed max_df)
    assert all(p == (10, 11) for p in got)


# ---------------------------------------------------------------------------
# MMR
# ---------------------------------------------------------------------------


def _ref_mmr(cands: dict[int, list[float]], q: list[float], k: int,
             lam: float) -> list[tuple[int, float]]:
    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return round(d / (math.sqrt(sum(x * x for x in a))
                          * math.sqrt(sum(x * x for x in b))), 6)
    picks = []
    rest = dict(cands)
    while rest and len(picks) < k:
        best = None
        for cid, v in rest.items():
            pen = max((cos(v, cands[p]) for p, _ in picks), default=0.0)
            s = round(lam * cos(v, q) - (1 - lam) * pen, 6)
            if best is None or s > best[1] or (s == best[1] and cid < best[0]):
                best = (cid, s)
        picks.append(best)
        del rest[best[0]]
    return picks


def test_mmr_matches_reference_walk(spark):
    cands = {1: [1.0, 0.0, 0.0], 2: [0.99, 0.1, 0.0],
             3: [0.0, 1.0, 0.0], 4: [0.5, 0.5, 0.1],
             5: [0.0, 0.0, 1.0]}
    q = [1.0, 0.05, 0.0]
    df = spark.createDataFrame(
        [(i, v) for i, v in cands.items()], "id long, e array<double>")
    got = mmr_select(df, q, 4, lam=0.75)
    want = _ref_mmr(cands, q, 4, 0.75)
    assert [(p["id"], p["score"]) for p in got] == \
        [(i, pytest.approx(s, abs=1e-9)) for i, s in want]
    # at λ=0.5 the redundancy penalty dominates: the near-duplicate
    # of pick 1 (id 2, cos≈0.995 to id 1) must NOT be pick 2
    got_div = mmr_select(df, q, 3, lam=0.5)
    want_div = _ref_mmr(cands, q, 3, 0.5)
    assert [(p["id"], p["score"]) for p in got_div] == \
        [(i, pytest.approx(s, abs=1e-9)) for i, s in want_div]
    assert got_div[0]["id"] == 1 and got_div[1]["id"] != 2


def test_mmr_lam_one_is_pure_relevance(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0])],
        "id long, e array<double>")
    got = [p["id"] for p in mmr_select(df, [1.0, 0.0], 3, lam=1.0)]
    assert got == [1, 2, 3]


def test_mmr_k_exceeding_candidates_stops_early(spark):
    df = spark.createDataFrame([(1, [1.0]), (2, [0.5])],
                               "id long, e array<double>")
    got = mmr_select(df, [1.0], 10)
    assert [p["rank"] for p in got] == [0, 1]


def test_winnow_randomized_batch_parity(spark):
    """200 seeded random strings over a small alphabet (maximizing
    gram collisions and tie cases) — operator output must equal the
    brute-force reference for every document, in one Spark job."""
    import random
    rng = random.Random(20260816)
    rows = []
    for i in range(200):
        n = rng.randrange(0, 60)
        rows.append((i, "".join(rng.choice("ab c") for _ in range(n))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    k, w = 4, 3
    got: dict[int, set[str]] = {}
    for r in winnow_fingerprints(df, k=k, w=w).collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    for i, text in rows:
        want = _ref_winnow(text, k, w) if len(
            " ".join(text.strip().lower().split())) >= k + w - 1 else set()
        assert got.get(i, set()) == want, (i, text)


def test_mmr_driver_walk_parity(spark):
    """r13: pools ≤ driver_below run the greedy walk on the driver
    with emulated Spark arithmetic (sequential dot, HALF_UP round-6,
    nan-safe ordering). Pin bit-exact pick/score parity against the
    distributed argmax rounds (driver_below=None) over randomized
    pools, including near-tie geometry and awkward magnitudes."""
    import random
    import struct
    rng = random.Random(20260818)
    for trial in range(4):
        dim = rng.choice([3, 8, 16])
        n = rng.randrange(5, 40)
        rows = []
        for i in range(n):
            v = [rng.uniform(-1, 1) for _ in range(dim)]
            if rng.random() < 0.3 and rows:          # near-duplicates
                base = rows[rng.randrange(len(rows))][1]
                v = [x + rng.uniform(-1e-9, 1e-9) for x in base]
            rows.append((i, v))
        q = [rng.uniform(-1, 1) for _ in range(dim)]
        lam = rng.choice([0.5, 0.7, 0.75, 1.0])
        k = rng.randrange(1, min(9, n + 1))
        df = spark.createDataFrame(rows, "id long, e array<double>")
        drv = mmr_select(df, q, k, lam=lam)                 # driver walk
        dist = mmr_select(df, q, k, lam=lam,
                          driver_below=None)                # Spark rounds
        assert [p["id"] for p in drv] == [p["id"] for p in dist], trial
        for a, b in zip(drv, dist):
            assert struct.pack(">d", a["score"]) == \
                struct.pack(">d", b["score"]), (trial, a, b)


def test_mmr_round6_matches_spark_round(spark):
    """The driver walk's _round6_spark must be bit-equal to
    F.round(·, 6) — randomized + adversarial doubles (the −0.0
    normalization class included: Java BigDecimal has no signed
    zero)."""
    import random
    import struct
    from cdh_integrate_carbondata2_3_spark.operators.similarity import (
        _round6_spark)
    rng = random.Random(7)
    vals = [rng.uniform(-1, 1) for _ in range(2000)]
    vals += [rng.uniform(-1e-7, 1e-7) for _ in range(1000)]
    vals += [0.1234565, -0.1234565, 0.9999995, -0.9999995, 1e-17,
             -0.0, 0.0, 5e-324, 0.30000000000000004, 0.0000005,
             -0.0000005, 0.0000015, 123456789.1234565, -2.5e-6,
             float("inf"), float("-inf")]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "i long, x double")
    got = {r["i"]: r["r"]
           for r in df.select("i", F.round("x", 6).alias("r")).collect()}
    for i, v in enumerate(vals):
        p = _round6_spark(v)
        assert struct.pack(">d", p) == struct.pack(">d", got[i]), \
            (repr(v), repr(p), repr(got[i]))
    # NaN passthrough (can't struct-compare canonicalized NaNs)
    assert _round6_spark(float("nan")) != _round6_spark(float("nan"))


def test_mmr_expr_literal_roundtrip_awkward_floats(spark):
    """r12: picked vectors re-enter the plan as F.expr array literals
    (one parse instead of dim F.lit py4j calls). repr() of a double
    must round-trip through the Spark SQL parser IEEE-exactly even
    for exponent-notation, negative and subnormal-ish magnitudes —
    this pins the literal path with exactly those shapes."""
    cands = {1: [1e-17, -0.0, 123456789.123456789],
             2: [-1e-17, 5e-324, 0.1],          # 5e-324 = min subnormal
             3: [0.30000000000000004, -2.5e16, 1.0],
             4: [1e-17, -0.0, 123456789.0]}
    q = [1.0, 1e-8, -1e8]
    df = spark.createDataFrame(
        [(i, v) for i, v in cands.items()], "id long, e array<double>")
    got = mmr_select(df, q, 4, lam=0.75)
    want = _ref_mmr(cands, q, 4, 0.75)
    assert [(p["id"], p["score"]) for p in got] == \
        [(i, pytest.approx(s, abs=1e-12)) for i, s in want]
