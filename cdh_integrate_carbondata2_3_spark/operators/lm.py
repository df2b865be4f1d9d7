"""Bigram language-model training + per-document log-probability
scoring — CCNet-style perplexity filtering (Wenzek et al. 2020:
score every document under a LM trained on trusted text; cut the
worst tail) re-expressed as two DataFrame passes.

The reference has no LM operator; this extends the LLM-pipeline
surface (SURVEY.md "beyond the reference" mandate) alongside the
dedup/sampling families.

Model: add-k–smoothed bigram LM over whitespace tokens,

    P(w2 | w1) = (c(w1,w2) + k) / (c(w1·) + k·V)

with ``c(w1·)`` the count of w1 as a bigram head and ``V`` the
training vocabulary size (distinct tokens). A held-out bigram whose
head was never seen degrades to the uniform 1/V — the standard add-k
backstop, so scoring is total (no -inf).

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
