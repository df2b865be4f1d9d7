"""Heavy hitters (frequent items) without shuffling the key space.

``df.groupBy(col).count().orderBy(...).limit(k)`` is exact but
shuffles EVERY distinct key — at 100 TB with billions of distinct
URLs/domains/tokens that shuffle dwarfs the answer. The classic fix
(Misra & Gries 1982; the "summary → candidates → exact refine"
shape of Metwally et al.'s Space-Saving):

1. **Per-partition Misra–Gries** over the Arrow batch stream:
   ``m`` counters per partition, O(m) memory regardless of distinct
   count, one pass, no shuffle. Runs in ``mapInPandas`` — the
   generator closure keeps the summary across batches, so state
   never leaves the executor. Each partition's summary also carries
   ONE sentinel row (key = NULL, lb = partition row count), so the
   global N is a sum over the tiny summary frame — the source is
   never re-scanned just to count it.
2. **Candidate union** — the pigeonhole guarantee: any key with
   global count > N/m must exceed N_p/m in at least one partition,
   and per-partition MG keeps every key whose local count > N_p/m.
   So the union of survivors (≤ partitions × m keys) is a SUPERSET
   of every global heavy hitter. The union stays DISTRIBUTED — a
   semi-join on the cached summary frame, never a driver collect —
   so 10⁵ partitions × m keys is an executor-side frame, not a
   driver-memory event.
3. **Exact refine**: one filtered aggregation counts only the
   candidate keys — the shuffle touches ≤ partitions × m keys, not
   the key space. The result is exact, not an estimate.

Total passes over the source: exactly TWO (summary, refine). The
summary frame is cached so N, the candidate count, and the semi-join
all read the ≤ partitions×(m+1)-row cache, not the source.

``verified`` in the result certifies exactness: if the k-th
candidate's exact count exceeds N/m, the true top-k provably lies
inside the candidate set. When it doesn't (m sized too small for the
skew), the function raises rather than silently returning a
maybe-wrong top-k — ``m`` is the caller's documented scale lever,
exactly like the LSH band widths elsewhere in this engine.

No reference analogue (the reference has no frequent-items
operator); part of the training-data pipeline surface (dominant
domains / boilerplate detection / vocabulary heads).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _mg_partition(col: str, m: int):
    """Misra–Gries over a partition's Arrow batches: keep ≤ m
    counters; overflow decrements all (classic amortized eviction via
    offset subtraction). Yields the surviving (key, lower-bound
    count) pairs once after the last batch, plus one sentinel row
    (key=NULL, lb=partition row count) so N rides the summaries."""
    import pandas as pd

    def run(batches):
        counts: dict = {}
        n_p = 0
        for pdf in batches:
            n_p += int(len(pdf))
            for key, c in pdf[col].value_counts().items():
                counts[key] = counts.get(key, 0) + int(c)
            if len(counts) > m:
                # mergeable-summaries prune (Agarwal et al. 2013):
                # subtract the (m+1)-th largest count from everyone,
                # keep the positives — still an MG summary, total
                # undercount ≤ N_p/(m+1)
                s = sorted(counts.values(), reverse=True)[m]
                counts = {k2: v - s for k2, v in counts.items() if v > s}
        yield pd.DataFrame({"key": list(counts) + [None],
                            "lb": list(counts.values()) + [n_p]})
    return run


def heavy_hitters(df: DataFrame, col: str, k: int,
                  m: int = 1024) -> DataFrame:
    """EXACT top-``k`` most frequent values of ``col`` with the
    shuffle bounded by candidates, not distinct keys, and exactly two
    passes over the source (MG summary, candidate refine). Raises
    when the exactness certificate fails (k-th count ≤ N/m → grow
    ``m``). Returns (key, cnt) ordered by (cnt desc, key)."""
    if k < 1 or m <= k:
        raise ValueError("need 1 <= k < m")
    src = (df.select(F.col(col).cast("string").alias(col))
           .filter(F.col(col).isNotNull()))
    # Source nulls are filtered above, so key IS NULL unambiguously
    # marks the per-partition row-count sentinel.
    summaries = src.mapInPandas(_mg_partition(col, m),
                                "key string, lb bigint").cache()
    try:
        n_total = (summaries.filter(F.col("key").isNull())
                   .agg(F.sum("lb")).first()[0] or 0)  # pass 1 runs here
        cand_df = (summaries.filter(F.col("key").isNotNull())
                   .select(F.col("key").alias(col)).distinct())
        n_cand = cand_df.count()  # cached summaries — no source pass
        if n_cand == 0:
            if n_total:
                raise ValueError(
                    "heavy_hitters: no candidates survived the summaries "
                    f"(near-uniform data); increase m from {m}")
            return df.sparkSession.createDataFrame(
                [], "key string, cnt bigint")
        if n_cand <= 100_000:
            # ~100k strings is single-digit MB materialized on the
            # driver + per executor — safe at default memory. Past
            # that (mis-sized m at extreme partition counts) a
            # broadcast is hundreds of MB everywhere, so fall through
            # to the shuffled semi-join, which stays distributed.
            filt = src.join(F.broadcast(cand_df), col, "left_semi")
        else:
            filt = src.join(cand_df, col, "left_semi")
        exact = (filt.groupBy(F.col(col).alias("key"))
                 .agg(F.count(F.lit(1)).alias("cnt"))
                 .orderBy(F.desc("cnt"), F.asc("key"))).cache()
        try:
            rows = exact.limit(k).collect()  # pass 2 (refine) runs here
            cand_mass = exact.agg(F.sum("cnt")).first()[0] or 0
        finally:
            exact.unpersist()
    finally:
        summaries.unpersist()
    # exactness certificates:
    # - full page: the k-th exact count beats the MG threshold N/m
    #   (every non-candidate key is provably below that), so the true
    #   top-k lies inside the candidate set;
    # - short page (< k rows): only exact if the candidates account
    #   for the ENTIRE mass, i.e. no key exists outside them.
    if len(rows) == k:
        if rows[-1]["cnt"] * m <= n_total:
            raise ValueError(
                f"heavy_hitters: cannot certify exact top-{k} — the "
                f"k-th candidate count {rows[-1]['cnt']} is not above "
                f"N/m = {n_total}/{m}; increase m")
    elif cand_mass != n_total:
        raise ValueError(
            f"heavy_hitters: only {len(rows)} certifiable candidates "
            f"for top-{k} (uncovered mass {n_total - cand_mass} rows); "
            f"increase m from {m}")
    return df.sparkSession.createDataFrame(rows, "key string, cnt bigint")
