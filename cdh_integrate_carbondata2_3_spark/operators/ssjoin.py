"""Exact set-similarity self-join via prefix filtering (PPJoin family).

The LSH operators (MinHash / SimHash / n-gram Jaccard in
operators/dedup.py) trade recall for scale. This is their EXACT
counterpart — every pair with Jaccard ≥ τ, no false negatives —
using the prefix-filtering principle (Chaudhuri et al. 2006 SSJoin;
Xiao et al. 2008 PPJoin):

1. **Global token ordering**: one aggregation ranks tokens by
   (frequency asc, token) — rarest first. Canonicalizing every set
   in this order makes the prefix maximally selective.
2. **Prefix emission**: a set s with Jaccard-τ matches must share at
   least one token with any match inside its first
   ``|s| - ceil(τ·|s|) + 1`` canonical tokens. Only those prefix
   tokens become join keys — and they are by construction the RAREST
   tokens of each set, so candidate buckets stay small exactly where
   a naive token-join explodes (stopword buckets never join).
3. **Length filter** at the candidate stage: τ·|a| ≤ |b| (with
   |a| ≤ |b| by pairing order) — cheap, provably safe.
4. **Exact verification**: array_intersect over the two canonical
   arrays → |∩| / (|a| + |b| − |∩|) ≥ τ. Pure JVM HOFs.

Everything is joins + aggregations + higher-order functions — no
Python, no cross join (plan-asserted in tests), shuffles keyed by
prefix token then by pair id. At 100 TB the scale lever is τ: the
prefix length (1−τ)·|s|+1 bounds the fan-out per set; the token
ordering bounds the bucket sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def canonicalize(df: DataFrame, id_col: str, tokens_col: str
                 ) -> DataFrame:
    """(id, toks) with tokens DEDUPLICATED and sorted rarest-first by
    corpus frequency (ties lexicographic) — the canonical order
    prefix filtering requires. One explode + count + re-group."""
    ex = (df.select(F.col(id_col).alias("id"),
                    F.explode(F.array_distinct(tokens_col)).alias("tok")))
    freq = ex.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    return (ex.join(freq, "tok")
            .groupBy("id")
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("df", "tok"))),
                lambda s: s["tok"]).alias("toks")))


def _auto_rows(bands: int, t: float) -> int:
    """Threshold-adaptive signature rows: place the LSH S-curve
    midpoint (1/bands)^(1/rows) just under τ. Too few rows is the
    quadratic trap — a large family of mutually FAR-below-τ sets
    (J≈0.4 under τ=0.8, the hot-slice shape that triggered the
    fallback in the first place) collides in nearly every band and
    the band join re-creates the all-pairs explosion the cap
    guarded against. Rows chosen here keep collision probability at
    J≈τ/2 in the per-mille range while recall at τ stays
    1−(1−τ^rows)^bands (≈0.95 for τ=0.8, 16 bands)."""
    import math
    mid = max(0.05, 0.9 * t)
    return max(2, min(12, round(math.log(bands) / -math.log(mid))))


def _lsh_candidates(hot_sets: DataFrame, t: float,
                    bands: int, rows: int) -> DataFrame:
    """Banded-MinHash candidate pairs among the hot-slice sets
    (id, toks, n): ``bands×rows`` murmur min-hashes over the full
    token set, one band-bucket join, the same length filter the
    exact path applies. Returns the exact-verify input columns —
    verification downstream is identical, so LSH only affects which
    candidates are SEEN (recall ≈ 1−(1−τ^rows)^bands), never
    whether a reported pair is a true ≥τ match."""
    k = bands * rows

    def _minhash(seed: int):
        # NOTE: closing over the seed via a helper, NOT a default-arg
        # lambda — pyspark treats a two-parameter HOF lambda as
        # (element, INDEX), so `lambda tk, s=seed:` would silently
        # hash (token, position) and collapse every "seed" to the
        # same signature
        return F.array_min(F.transform(
            "toks", lambda tk: F.hash(tk, F.lit(seed))))

    sigs = hot_sets.select(
        "id", "toks", "n",
        *[_minhash(s).alias(f"__h{s}") for s in range(k)])
    band_keys = F.array(*[
        F.struct(F.lit(b).alias("b"),
                 F.hash(*[F.col(f"__h{b * rows + r}")
                          for r in range(rows)]).alias("k"))
        for b in range(bands)])
    bl = sigs.select("id", "toks", "n",
                     F.explode(band_keys).alias("bk"))
    return (bl.select(F.col("id").alias("id_l"),
                      F.col("toks").alias("toks_l"),
                      F.col("n").alias("n_l"), "bk")
            .join(bl.select(F.col("id").alias("id_r"),
                            F.col("toks").alias("toks_r"),
                            F.col("n").alias("n_r"), "bk"), "bk")
            .filter(F.col("id_l") < F.col("id_r"))
            .filter(F.least("n_l", "n_r")
                    >= F.greatest("n_l", "n_r") * F.lit(t))
            .select("id_l", "id_r", "toks_l", "toks_r", "n_l", "n_r"))


def jaccard_join(df: DataFrame, id_col: str, tokens_col: str,
                 threshold: float,
                 bucket_cap: int = 100_000,
                 on_hot: str = "raise",
                 lsh_bands: int = 16,
                 lsh_rows: int | None = None) -> DataFrame:
    """All pairs (id_l < id_r, jacc) with Jaccard(tokens_l, tokens_r)
    ≥ ``threshold`` — exact, no sampling, no hashing. ``tokens_col``
    is an array column; duplicates within a set are ignored (set
    semantics).

    ``bucket_cap`` is the quadratic-death guard (same contract as
    editdist_join's uniq_cap, lazily enforced with assert_true inside
    the plan): a prefix token shared by more than ``bucket_cap`` sets
    means the corpus has a large family of sets built ENTIRELY from
    frequent tokens — candidate generation is then quadratic by
    problem statement, and the right tool is the MinHash/SimHash LSH
    operators, not an exact join. ``on_hot`` picks the response:

    - ``'raise'`` (default): fail explicitly, never a silent runaway
      stage — the result, when it returns, is EXACT.
    - ``'lsh'``: only the over-cap prefix buckets are excluded from
      the exact candidate join; the sets touching them instead
      generate candidates through a banded-MinHash pass
      (``lsh_bands`` × ``lsh_rows`` signature over the FULL token
      set), and every candidate — exact or LSH — goes through the
      same exact verification. Soundness partition: a qualifying
      pair shares ≥1 prefix token; if any shared prefix token is
      cold, the exact path finds the pair (no recall loss); pairs
      whose EVERY shared prefix token is hot have both members in
      the LSH pass. The result is therefore exact except for LSH
      recall (≈ 1−(1−τ^rows)^bands at Jaccard τ) on that hot slice
      only — the documented 100 TB degradation path for u³-skewed
      corpora, instead of an error. ``lsh_rows`` defaults to a
      threshold-adaptive value (see _auto_rows) — passing too few
      rows for a high τ re-creates the quadratic explosion inside
      the band buckets."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError("threshold must be in (0, 1]")
    if on_hot not in ("raise", "lsh"):
        raise ValueError("on_hot must be 'raise' or 'lsh'")
    if lsh_rows is None:
        lsh_rows = _auto_rows(lsh_bands, threshold)
    t = float(threshold)
    sets = canonicalize(df, id_col, tokens_col)
    sz = F.size("toks")
    # prefix = |s| - ceil(t*|s|) + 1 rarest tokens, with their
    # position (the PPJoin positional filter needs it)
    plen = sz - F.ceil(sz * F.lit(t)).cast("int") + 1
    pref = (sets.select("id", "toks", sz.alias("n"),
                        F.posexplode(F.slice("toks", 1, plen))
                        .alias("pos", "tok")))
    wb = W.partitionBy("tok")
    bc = F.count(F.lit(1)).over(wb)
    hot_sets = None
    if on_hot == "raise":
        cap_msg = (f"jaccard_join: a prefix token is shared by more "
                   f"than bucket_cap={bucket_cap} sets — candidate "
                   "generation is quadratic on this corpus; use "
                   "on_hot='lsh', the LSH near-dup operators, or "
                   "raise bucket_cap knowingly")
        guarded = pref.withColumn("__ok", F.assert_true(
            bc <= F.lit(bucket_cap),
            F.lit(cap_msg))).where(F.col("__ok").isNull()).drop("__ok")
    else:
        tagged = pref.withColumn("__bc", bc)
        guarded = (tagged.where(F.col("__bc") <= bucket_cap)
                   .drop("__bc"))
        hot_sets = (tagged.where(F.col("__bc") > bucket_cap)
                    .select("id", "toks", "n").distinct())
    l = guarded.select(F.col("id").alias("id_l"),
                       F.col("toks").alias("toks_l"),
                       F.col("n").alias("n_l"),
                       F.col("pos").alias("p_l"), "tok")
    r = guarded.select(F.col("id").alias("id_r"),
                       F.col("toks").alias("toks_r"),
                       F.col("n").alias("n_r"),
                       F.col("pos").alias("p_r"), "tok")
    # Positional filter (PPJoin idea, per-emission-sound form): a
    # shared token at 0-based canonical positions (p_l, p_r) splits
    # both arrays; because the order is GLOBAL, shared tokens ranked
    # below it sit before it in BOTH arrays (≤ min(p_l, p_r) of
    # them), shared tokens above it sit after it in both. So
    # overlap ≤ min(p_l,p_r) + 1 + min(n_l-p_l-1, n_r-p_r-1), while
    # Jaccard ≥ t needs overlap ≥ ceil(t/(1+t) · (n_l + n_r)). A
    # pair survives if ANY of its shared prefix emissions passes —
    # dedup happens after the filter, so that is exactly what the
    # join computes.
    alpha = F.ceil(F.lit(t / (1.0 + t)) * (F.col("n_l") + F.col("n_r")))
    upper = (F.least("p_l", "p_r") + F.lit(1)
             + F.least(F.col("n_l") - F.col("p_l") - 1,
                       F.col("n_r") - F.col("p_r") - 1))
    cand = (l.join(r, "tok")
            .filter(F.col("id_l") < F.col("id_r"))
            # length filter: with n_l ≤ n_r needed t*n_r ≤ n_l, and
            # symmetrically — jointly: t*greatest ≤ least
            .filter(F.least("n_l", "n_r")
                    >= F.greatest("n_l", "n_r") * F.lit(t))
            .filter(upper >= alpha)
            .select("id_l", "id_r", "toks_l", "toks_r", "n_l", "n_r"))
    if hot_sets is not None:
        cand = cand.unionByName(
            _lsh_candidates(hot_sets, t, lsh_bands, lsh_rows))
    cand = cand.dropDuplicates(["id_l", "id_r"])
    inter = F.size(F.array_intersect("toks_l", "toks_r"))
    jacc = inter / (F.col("n_l") + F.col("n_r") - inter)
    # threshold on the UNROUNDED value (rounding must not flip
    # membership); round only the reported score
    return (cand.select("id_l", "id_r", jacc.alias("__j"))
            .filter(F.col("__j") >= t)
            .select("id_l", "id_r",
                    F.round("__j", 6).alias("jacc")))
