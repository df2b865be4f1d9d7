"""N-gram language-model training + per-document log-probability
scoring — CCNet-style perplexity filtering (Wenzek et al. 2020:
score every document under a LM trained on trusted text; cut the
worst tail) re-expressed as DataFrame passes.

The reference has no LM operator; this extends the LLM-pipeline
surface (SURVEY.md "beyond the reference" mandate) alongside the
dedup/sampling families.

Bigram model: add-k–smoothed over whitespace tokens,

    P(w2 | w1) = (c(w1,w2) + k) / (c(w1·) + k·V)

with ``c(w1·)`` the count of w1 as a bigram head and ``V`` the
training vocabulary size (distinct tokens). A held-out bigram whose
head was never seen degrades to the uniform 1/V — the standard add-k
backstop, so scoring is total (no -inf).

Trigram model (CCNet uses a 5-gram KenLM; interpolated trigram is
the distributed middle ground — Jelinek-Mercer interpolation,
Chen & Goodman 1999):

    P(w3 | w1 w2) = λ1·(c(w3)+k)/(N+k·V)
                  + λ2·(c(w2,w3)+k)/(c(w2)+k·V)
                  + λ3·(c(w1,w2,w3)+k)/(c(w1,w2)+k·V)

every component add-k–floored, so the mixture is total for any
held-out context (unseen trigram AND bigram AND unigram still gets
λ·k/(k·V) mass per component).

Shuffle discipline for 100 TB corpora:

- Training is ONE groupBy over exploded bigrams (map-side partial
  counts; the head counts ``c(w1·)`` ride the same shuffle as a
  second groupBy over its output, which is vocabulary-sized, not
  corpus-sized). V is one countDistinct over the token explode.
- Scoring joins the held-out bigram explode against the model keyed
  on (w1, w2) — a plain shuffle hash join; when the model fits the
  broadcast threshold (vocab², typically MBs after count pruning)
  Spark broadcasts it and the corpus never shuffles at all.
- Everything is built-in expressions (split/slice/arrays_zip/
  explode/ln) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(col: str):
    """Lowercased whitespace tokens, empties dropped — the exact
    tokenization the DuckDB oracles replay with string_split_regex."""
    return F.filter(F.split(F.lower(F.trim(F.col(col))), r"\s+"),
                    lambda t: t != "")


def _bigrams(col: str):
    """(w1, w2) structs for consecutive token pairs; empty when the
    document has fewer than two tokens."""
    t = _tokens(col)
    # floor at 0: slice() rejects negative lengths on <2-token docs
    m = F.greatest(F.size(t) - F.lit(1), F.lit(0))
    return F.arrays_zip(F.slice(t, 1, m).alias("w1"),
                        F.slice(t, 2, m).alias("w2"))


def train_bigram_lm(docs: DataFrame, text_col: str = "text", *,
                    k: float = 0.5) -> dict:
    """Fit the smoothed bigram LM on ``docs``. Returns a model dict:
    ``bigrams`` (w1, w2, c2) and ``heads`` (w1, c1) DataFrames plus
    scalars ``v`` (train vocabulary size) and ``k``. The two count
    frames are lazy — callers decide caching; ``v`` is the single
    driver-side action."""
    bg = (docs.select(F.explode(_bigrams(text_col)).alias("b"))
          .select(F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2")))
    bigrams = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    heads = bigrams.groupBy("w1").agg(F.sum("c2").alias("c1"))
    v = (docs.select(F.explode(_tokens(text_col)).alias("t"))
         .agg(F.count_distinct("t")).first()[0])
    return {"bigrams": bigrams, "heads": heads, "v": int(v), "k": k}


def score_logprob(docs: DataFrame, model: dict, *,
                  text_col: str = "text", id_cols: tuple = ("doc_id",),
                  out: str = "avg_logprob") -> DataFrame:
    """Per-document mean ln P(w2|w1) under ``model`` — higher is more
    in-distribution; perplexity is exp(-avg_logprob). Documents with
    fewer than two tokens have no bigrams and are dropped (callers
    needing them keep a left join on the id). Output: id_cols +
    ``n_bigrams`` + ``out``."""
    v, k = model["v"], model["k"]
    ids = [F.col(c) for c in id_cols]
    bg = (docs.select(*ids, F.explode(_bigrams(text_col)).alias("b"))
          .select(*ids, F.col("b.w1").alias("w1"),
                  F.col("b.w2").alias("w2")))
    scored = (bg.join(model["bigrams"], ["w1", "w2"], "left")
              .join(model["heads"], ["w1"], "left")
              .select(*ids,
                      F.log((F.coalesce(F.col("c2"), F.lit(0)) + F.lit(k))
                            / (F.coalesce(F.col("c1"), F.lit(0))
                               + F.lit(k * v))).alias("lp")))
    return (scored.groupBy(*ids)
            .agg(F.count(F.lit(1)).alias("n_bigrams"),
                 F.avg("lp").alias(out)))


def _trigrams(col: str):
    """(w1, w2, w3) structs for consecutive token triples; empty when
    the document has fewer than three tokens."""
    t = _tokens(col)
    m = F.greatest(F.size(t) - F.lit(2), F.lit(0))
    return F.arrays_zip(F.slice(t, 1, m).alias("w1"),
                        F.slice(t, 2, m).alias("w2"),
                        F.slice(t, 3, m).alias("w3"))


def train_trigram_lm(docs: DataFrame, text_col: str = "text", *,
                     k: float = 0.5,
                     lambdas: tuple = (0.1, 0.3, 0.6),
                     materialize_scalars: bool = True) -> dict:
    """Fit the interpolated add-k trigram LM on ``docs``. Returns a
    model dict: count frames ``trigrams`` (w1,w2,w3,c3), ``bigrams``
    (w1,w2,c2), ``unigrams`` (w1,c1) — each ONE groupBy over its
    n-gram explode, map-side partially aggregated, lazy so callers
    decide caching — plus scalars ``n`` (total train tokens), ``v``
    (train vocabulary), ``k`` and ``lambdas``.

    ``materialize_scalars=True`` (default) resolves ``n``/``v`` with
    one driver action — the persisted-model mode, where the caller
    will reuse the model across scoring batches. Pass ``False`` for
    single-pass train-and-score: ``n``/``v`` stay ``None`` and the
    1-row ``nv`` frame rides along for the scorer to broadcast-cross
    into its plan, so the whole train+score is ONE Spark job with no
    construction-time action (VERDICT r10 next-round 2: the extra
    materialization was the only cost a one-shot SQL twin doesn't
    pay)."""
    tri = (docs.select(F.explode(_trigrams(text_col)).alias("t"))
           .select("t.w1", "t.w2", "t.w3"))
    trigrams = (tri.groupBy("w1", "w2", "w3")
                .agg(F.count(F.lit(1)).alias("c3")))
    bg = (docs.select(F.explode(_bigrams(text_col)).alias("b"))
          .select("b.w1", "b.w2"))
    bigrams = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    uni = docs.select(F.explode(_tokens(text_col)).alias("w1"))
    unigrams = uni.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    nv = uni.agg(F.count(F.lit(1)).alias("n"),
                 F.count_distinct("w1").alias("v"))
    model = {"trigrams": trigrams, "bigrams": bigrams,
             "unigrams": unigrams, "nv": nv, "n": None, "v": None,
             "k": k, "lambdas": tuple(lambdas)}
    if materialize_scalars:
        row = nv.first()
        model["n"], model["v"] = int(row["n"]), int(row["v"])
    return model


def score_logprob_trigram(docs: DataFrame, model: dict, *,
                          text_col: str = "text",
                          id_cols: tuple = ("doc_id",),
                          out: str = "avg_logprob") -> DataFrame:
    """Per-document mean ln P(w3|w1,w2) under the interpolated
    trigram ``model``. Documents with fewer than three tokens have no
    trigrams and are dropped. All five count joins are keyed on the
    model side (vocabulary-sized — broadcastable after pruning), the
    corpus side never shuffles more than its trigram explode. Output:
    id_cols + ``n_trigrams`` + ``out``.

    The λ-weighted sum is spelled in ascending-order components
    (λ1·p1 + λ2·p2 + λ3·p3, each ``(c+k)/(den+k·V)``) so a SQL
    oracle replays the IEEE expression tree exactly.

    When the model was trained with ``materialize_scalars=False``,
    the 1-row ``nv`` frame is broadcast-crossed into the scoring plan
    (exactly the twin SQL's ``, nv`` join) — same IEEE arithmetic,
    since double(n) + k·double(v) matches the Python-folded literal
    bit-for-bit."""
    n, v, k = model["n"], model["v"], model["k"]
    l1, l2, l3 = model["lambdas"]
    ids = [F.col(c) for c in id_cols]
    tg = (docs.select(*ids, F.explode(_trigrams(text_col)).alias("t"))
          .select(*ids, "t.w1", "t.w2", "t.w3"))
    if n is None:
        tg = tg.crossJoin(F.broadcast(
            model["nv"].select(F.col("n").cast("double").alias("__n"),
                               F.col("v").cast("double").alias("__v"))))
        n_e = F.col("__n")
        kv_e = F.lit(k) * F.col("__v")
    else:
        n_e = F.lit(float(n))
        kv_e = F.lit(k * v)
    c3 = model["trigrams"]
    c2h = model["bigrams"].select(F.col("w1").alias("w1"),
                                  F.col("w2").alias("w2"),
                                  F.col("c2").alias("c2h"))
    c2t = model["bigrams"].select(F.col("w1").alias("w2"),
                                  F.col("w2").alias("w3"),
                                  F.col("c2").alias("c2t"))
    c1m = model["unigrams"].select(F.col("w1").alias("w2"),
                                   F.col("c1").alias("c1m"))
    c1t = model["unigrams"].select(F.col("w1").alias("w3"),
                                   F.col("c1").alias("c1t"))
    p1 = ((F.coalesce(F.col("c1t"), F.lit(0)) + F.lit(k))
          / (n_e + kv_e))
    p2 = ((F.coalesce(F.col("c2t"), F.lit(0)) + F.lit(k))
          / (F.coalesce(F.col("c1m"), F.lit(0)) + kv_e))
    p3 = ((F.coalesce(F.col("c3"), F.lit(0)) + F.lit(k))
          / (F.coalesce(F.col("c2h"), F.lit(0)) + kv_e))
    scored = (tg.join(c3, ["w1", "w2", "w3"], "left")
              .join(c2h, ["w1", "w2"], "left")
              .join(c2t, ["w2", "w3"], "left")
              .join(c1m, ["w2"], "left")
              .join(c1t, ["w3"], "left")
              .select(*ids,
                      F.log(F.lit(l1) * p1 + F.lit(l2) * p2
                            + F.lit(l3) * p3).alias("lp")))
    return (scored.groupBy(*ids)
            .agg(F.count(F.lit(1)).alias("n_trigrams"),
                 F.avg("lp").alias(out)))
