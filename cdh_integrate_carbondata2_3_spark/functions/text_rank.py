"""BM25 relevance ranking over whitespace-analyzed text — the scoring
half of the reference's Lucene fine-grain index
(index/lucene/src/main/java/org/apache/carbondata/index/lucene/
LuceneFineGrainIndex.java:63-204 returns Lucene-scored hits;
text_match in our engine prunes+filters but, through round 3, did not
rank). This module adds ranking as a first-class DataFrame operator
using Lucene's BM25Similarity formula (Robertson/Sparck Jones BM25 as
shipped in Lucene 8+, k1=1.2, b=0.75):

    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    score   = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

Scale shape: one agg over the corpus produces a SINGLE row of global
statistics (N, sum(dl), df per query term) which is broadcast back —
the corpus itself never shuffles; per-document term frequencies are
higher-order array functions in whole-stage codegen (no explode →
groupBy of every token, no Python UDF). Two scans of the (pruned)
text column total.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["bm25_score", "bm25_topk"]

K1_DEFAULT = 1.2
B_DEFAULT = 0.75


def _toks(text: Column, casefold: bool = True) -> Column:
    """Analyzer: split on whitespace, drop empties; ``casefold``
    lowercases first (the 'standard' analyzer / the oracle's
    lower+string_split_regex form). NULL text coalesces to '' (empty
    token array → tf 0, dl 0) BEFORE the split: a nullable token
    expression makes every downstream score nullable, and Catalyst
    then pushes `isnotnull(score-subtree)` prefilters below the
    projection that materializes the token array — at r12
    measurement the candidate side re-tokenized every document 4×
    (three split subtrees in the pushed Filter + one in the Project;
    guide §7.2 'duplicated subtrees'). Scoring-wise identical: a
    no-term row scores 0.0 either way (the documented contract), and
    match-only consumers filter score > 0."""
    src = F.coalesce(text, F.lit(""))
    if casefold:
        src = F.lower(src)
    return F.filter(F.split(src, r"\s+"), lambda t: t != F.lit(""))


def _tf(toks: Column, term: str, casefold: bool = True) -> Column:
    t0 = term.lower() if casefold else term
    return F.size(F.filter(toks, lambda t: t == F.lit(t0)))


def _toks_english(text_col: str) -> Column:
    """Analyzed token array under the 'english' analyzer: lowercase →
    stop-remove → stem (functions/analyzers.py — the same pipeline the
    postings build and the refine predicate use). ``text_col`` must be
    a plain column name (it is spliced into a SQL expression)."""
    from .analyzers import stem_sql, stops_sql
    return F.expr(
        f"transform(filter(split(lower({text_col}), '\\\\s+'), "
        f"__x -> __x != '' AND __x NOT IN ({stops_sql()})), "
        f"__t -> {stem_sql('__t')})")


def _toks_porter_sql(text_col: str, stem) -> "F.Column":
    """Analyzed token array under 'porter' via the dictionary fast
    path: the same lowercase → stop-remove pipeline with the
    surface→stem map lookup as the stemmer (sql._porter_stem_map) —
    pure JVM HOFs, no Python anywhere in the scoring plan."""
    from .analyzers import stops_sql
    return F.expr(
        f"transform(filter(split(lower({text_col}), '\\\\s+'), "
        f"__x -> __x != '' AND __x NOT IN ({stops_sql()})), "
        f"__t -> {stem('__t')})")


def _toks_porter(text_col: str):
    """Analyzed token array under the 'porter' analyzer (lowercase →
    stop-remove → full Porter stem) as an Arrow-batched pandas UDF —
    Porter's measure conditions have no SQL form, so this is the one
    Python step; tf/dl over the returned array stay JVM-side HOFs."""
    from .porter import porter_analyze

    @F.pandas_udf("array<string>")
    def _p(s: pd.Series) -> pd.Series:
        return s.map(lambda tx: [] if tx is None else
                     [a for a in (porter_analyze(t) for t in tx.split())
                      if a is not None])
    return _p(F.col(text_col))


def bm25_score(df: DataFrame, terms: list[str], text_col: str = "text",
               k1: float = K1_DEFAULT, b: float = B_DEFAULT,
               boosts: list[float] | None = None,
               casefold: bool = True,
               english: bool = False,
               porter: bool = False,
               porter_stem_sql=None) -> DataFrame:
    """Append a ``bm25`` double column scoring ``text_col`` against the
    bag of ``terms``. Rows matching no term score 0.0 (kept — filter
    downstream if Lucene match-only semantics are wanted). ``boosts``
    scales each term's contribution (Lucene BoostQuery). ``english``
    scores ANALYZED terms against the analyzed token stream — tf of
    the stem, dl = emitted (post-stop) token count, stopword terms
    contribute nothing — Lucene's behavior when the field analyzer is
    EnglishAnalyzer. ``porter`` is the same with the full Porter
    stemmer (tokenization through one Arrow-batched UDF, stats and
    scoring JVM-side; with ``porter_stem_sql`` — the dictionary fast
    path's map-lookup stemmer — even tokenization is pure SQL)."""
    if not terms:
        raise ValueError("bm25_score: need at least one query term")
    if boosts is not None and len(boosts) != len(terms):
        raise ValueError("bm25_score: boosts must pair 1:1 with terms")
    if english and porter:
        raise ValueError("bm25_score: english and porter are exclusive")
    if english or porter:
        if porter:
            from .porter import porter_analyze as _an
        else:
            from .analyzers import analyze_term as _an
        pairs = [(_an(t), boosts[i] if boosts is not None else 1.0)
                 for i, t in enumerate(terms)]
        pairs = [(t, bo) for t, bo in pairs if t is not None]
        if not pairs:
            # every term was a stopword: nothing scorable (Lucene's
            # analyzer emits no token → empty query side)
            return df.withColumn("bm25", F.lit(0.0))
        terms = [t for t, _ in pairs]
        boosts = [bo for _, bo in pairs]
        casefold = False            # terms are pre-analyzed
    # materialize the analyzed token array ONCE per row: inlining the
    # split+filter tree into every tf column re-analyzes the text
    # per term (same 4.6x lesson as the shingle spans in
    # operators/dedup.duplicated_spans)
    toks_expr = (_toks_porter_sql(text_col, porter_stem_sql)
                 if porter and porter_stem_sql is not None
                 else _toks_porter(text_col) if porter
                 else _toks_english(text_col) if english
                 else _toks(F.col(text_col), casefold))
    with_toks = df.select("*", toks_expr.alias("__toks"))
    toks = F.col("__toks")
    tf_cols = [_tf(toks, t, casefold).alias(f"__tf{i}")
               for i, t in enumerate(terms)]
    with_tf = (with_toks
               .select("*", F.size(toks).alias("__dl"), *tf_cols)
               .drop("__toks"))
    stats = with_tf.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__dl").cast("double").alias("__sumdl"),
        *[F.sum((F.col(f"__tf{i}") > 0).cast("long")).alias(f"__df{i}")
          for i in range(len(terms))])
    joined = with_tf.crossJoin(F.broadcast(stats))
    n = F.col("__n").cast("double")
    avgdl = F.col("__sumdl") / n
    score = None
    for i in range(len(terms)):
        tf = F.col(f"__tf{i}").cast("double")
        dfreq = F.col(f"__df{i}").cast("double")
        idf = F.log(F.lit(1.0) + (n - dfreq + 0.5) / (dfreq + 0.5))
        part = idf * tf * (k1 + 1.0) / (
            tf + k1 * (1.0 - b + b * F.col("__dl").cast("double") / avgdl))
        if boosts is not None and boosts[i] != 1.0:
            part = part * F.lit(boosts[i])
        score = part if score is None else score + part
    drop = (["__dl", "__n", "__sumdl"]
            + [f"__tf{i}" for i in range(len(terms))]
            + [f"__df{i}" for i in range(len(terms))])
    return joined.withColumn("bm25", score).drop(*drop)


def bm25_topk(df: DataFrame, terms: list[str], k: int,
              text_col: str = "text", id_col: str = "doc_id",
              k1: float = K1_DEFAULT, b: float = B_DEFAULT,
              round_to: int | None = 4) -> DataFrame:
    """Top-k documents by BM25 (ties broken by ``id_col`` for a
    deterministic cut), excluding zero-score rows — Lucene returns
    only matching docs. ``round_to`` rounds the published score so
    results hash identically across engines; the ORDER BY uses the
    rounded value too, keeping the cut line engine-independent."""
    scored = bm25_score(df, terms, text_col=text_col, k1=k1, b=b)
    out = F.col("bm25")
    if round_to is not None:
        out = F.round(out, round_to).cast("double")
    return (scored.filter(F.col("bm25") > 0)
            .select(id_col, out.alias("bm25"))
            .orderBy(F.col("bm25").desc(), F.col(id_col))
            .limit(k))
