"""Distributed BPE tokenizer training.

Byte-pair encoding as a Spark pipeline (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units";
the word-frequency formulation every practical trainer uses):

1. The corpus collapses to a WORD-COUNT table with one hash
   aggregation — map-side partial counts make this the only pass
   over the full data. At 100 TB the corpus is petabyte-scale but
   the distinct-word vocabulary is millions of rows: that table is
   the training state, and it's what every subsequent round touches.
2. Each merge round: explode adjacent symbol pairs weighted by word
   count (skipping the end-of-word sentinel), aggregate, take the
   argmax pair (driver sees ONE row), then rewrite the symbol arrays
   of the words containing that pair with a pure-SQL left-to-right
   greedy fold — no Python in the loop, the vocabulary never leaves
   the executors.
3. Lineage is truncated with localCheckpoint every few rounds so N
   merges cost N short jobs, not an N-deep plan.

The trained artifact is the ranked merge list (+ final subword
vocabulary); ``bpe_encode`` applies it to new text with the same
fold, so encoding is a column expression usable in any query.

This has no reference analogue (the reference feeds training via
pycarbon readers; tokenizer training sits upstream) — it's part of
the LLM-pipeline surface this engine adds on top. Deterministic:
pair-count ties break lexicographically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

EOW = "</w>"            # end-of-word sentinel (classic BPE)


def _merge_fold_sql(col: str, a: str, b: str) -> str:
    """Greedy left-to-right merge of adjacent (a, b) into 'ab' over a
    symbol array — a pure-SQL fold. A freshly merged token can't
    chain-merge (its string differs from ``a``), which is exactly
    BPE's single-pass-per-rank semantics."""
    qa, qb = a.replace("'", "''"), b.replace("'", "''")
    qab = (a + b).replace("'", "''")
    return (f"aggregate({col}, cast(array() as array<string>), "
            f"(acc, s) -> CASE WHEN size(acc) > 0 "
            f"AND element_at(acc, -1) = '{qa}' AND s = '{qb}' "
            f"THEN concat(slice(acc, 1, size(acc) - 1), array('{qab}')) "
            f"ELSE concat(acc, array(s)) END)")


def word_counts(df: DataFrame, text_col: str,
                lowercase: bool = True) -> DataFrame:
    """(word, n) over whitespace tokens — the single full-corpus pass."""
    t = F.col(text_col)
    if lowercase:
        t = F.lower(t)
    return (df.select(F.explode(F.split(F.trim(t), r"\s+")).alias("word"))
            .filter("word != ''")
            .groupBy("word").agg(F.count(F.lit(1)).alias("n")))


def train_bpe(df: DataFrame, text_col: str, num_merges: int,
              lowercase: bool = True,
              checkpoint_every: int = 8,
              batch: int = 1) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from ``df[text_col]``.
    Returns the ranked merge list [(left, right), ...].

    ``batch`` > 1 accepts up to that many pairs per counting round
    and is PROVABLY EXACT — any budget's merge list is identical to
    classic one-at-a-time training. Per round, candidates walk in
    (count desc, a, b) order (= sequential's exact pick order,
    tie-break included) and a pair joins the tentative set iff its
    {left, right, left+right} tokens are disjoint from every
    higher-ranked candidate's. The round then keeps only the prefix
    whose counts STRICTLY exceed ``bound`` = max(every non-accepted
    page count, the page floor if the page was full), falling back
    to the top-1 (= classic argmax, always exact) when the prefix is
    empty. Why this is exact:

    - Disjoint merges commute and leave each other's counts intact
      (destroying an occurrence needs a shared input symbol,
      creating one needs one's output as the other's input — both
      excluded), so each accepted count is the count sequential
      would see at its turn.
    - Any pair a batch merge CREATES, (x, left+right) or
      (left+right, y), has count ≤ the current count of the
      overlapping pair (x, left) / (right, y) — which shares a token
      with the accepted pair, hence was rejected in the walk (or
      lies under the page floor) and is therefore ≤ bound.
    - Any pair a batch merge CHANGES only loses count, and its
      pre-count was ≤ bound for the same reason.
    - So every accepted pair, strictly above bound, beats every
      created/changed/unaccepted pair at its sequential turn, with
      no tie to re-break.
    - EXCEPT self-pairs (a, a): merging one creates pairs whose
      counts are bounded by the accepted pair's OWN count (runs of
      ``a`` overlap the pair with itself), which ``bound`` does not
      cover — so the round's acceptance walk stops at the first
      accepted self-pair (it may be the last acceptance, never
      followed by another in the same round).

    Chained merges (the Sennrich worked example) make bound equal
    the head count, so the batch falls back to top-1 — automatically
    sequential. On realistic zipf vocabularies the head counts
    separate and the rounds×latency axis drops toward B×.
    ``batch=1`` skips the machinery and is classic sequential BPE."""
    if batch < 1:
        raise ValueError("batch must be >= 1")
    vocab = word_counts(df, text_col, lowercase).select(
        F.concat(F.split(F.col("word"), ""),
                 F.array(F.lit(EOW))).alias("syms"),
        "n").localCheckpoint()
    merges: list[tuple[str, str]] = []
    last_cp = 0
    pair_expr = ("zip_with(slice(syms, 1, size(syms) - 1), "
                 "slice(syms, 2, size(syms) - 1), "
                 "(x, y) -> struct(x AS a, y AS b))")
    while len(merges) < num_merges:
        pairs = (vocab
                 .select(F.explode(F.expr(pair_expr)).alias("p"), "n")
                 .select("p.a", "p.b", "n")
                 .groupBy("a", "b").agg(F.sum("n").alias("cnt"))
                 # the sentinel may END a pair but never start one
                 .filter(F.col("a") != EOW))
        k = min(batch, num_merges - len(merges))
        # over-fetch: overlap rejections thin the page (driver sees
        # a few tiny rows per round, never the pair space)
        page_limit = max(4 * k, k + 4)
        top = (pairs.orderBy(F.desc("cnt"), "a", "b")
               .limit(page_limit).collect())
        tentative: list[tuple[str, str, int]] = []
        used: set[str] = set()
        ceiling = 0  # max count among walked-but-rejected candidates
        for row in top:
            if row["cnt"] < 2:
                break   # below BPE's support floor (and sorted desc)
            a, b = row["a"], row["b"]
            toks = {a, b, a + b}
            if toks & used:
                ceiling = max(ceiling, int(row["cnt"]))
            else:
                tentative.append((a, b, int(row["cnt"])))
            used |= toks
        if not tentative:
            break
        # pairs outside a FULL page are bounded by its last count
        page_floor = int(top[-1]["cnt"]) if len(top) == page_limit else 0
        bound = max(ceiling, page_floor)
        accepted = []
        for i, (a, b, c) in enumerate(tentative):
            if i >= k or c <= bound:
                break
            accepted.append((a, b))
            if a == b:
                # Self-pair: merging (a, a) CREATES pairs — (aa, aa)
                # from runs of 4+, (aa, a) from odd runs — whose counts
                # are bounded by THIS pair's count, not by ``bound``
                # (the overlapping-pair argument above needs the
                # overlapping pair to be a *rejected* candidate; for a
                # run it's the accepted pair itself). A later
                # acceptance in the same round could therefore be
                # overtaken by a created pair at its sequential turn.
                # Counts walk non-increasing, so nothing after this
                # point can strictly beat the created pairs' ceiling —
                # the round must end here to stay exact.
                break
        if not accepted:
            # top-1 is the global argmax with sequential's tie-break —
            # always exact
            accepted = [tentative[0][:2]]
        for a, b in accepted:
            merges.append((a, b))
            has = (f"exists(zip_with(slice(syms, 1, size(syms) - 1), "
                   f"slice(syms, 2, size(syms) - 1), (x, y) -> "
                   f"x = '{a.replace(chr(39), chr(39)*2)}' AND "
                   f"y = '{b.replace(chr(39), chr(39)*2)}'), z -> z)")
            vocab = vocab.withColumn(
                "syms", F.when(F.expr(has),
                               F.expr(_merge_fold_sql("syms", a, b)))
                .otherwise(F.col("syms")))
        if len(merges) - last_cp >= checkpoint_every:
            vocab = vocab.localCheckpoint()
            last_cp = len(merges)
    return merges


def subword_vocab(df: DataFrame, text_col: str,
                  merges: list[tuple[str, str]],
                  lowercase: bool = True) -> DataFrame:
    """(subword, n_occurrences) after applying ``merges`` — the
    tokenizer's vocabulary with corpus frequencies."""
    enc = bpe_encode(df, text_col, merges, lowercase=lowercase,
                     out_col="toks")
    return (enc.select(F.explode("toks").alias("subword"))
            .groupBy("subword").agg(F.count(F.lit(1)).alias("n")))


def bpe_encode(df: DataFrame, text_col: str,
               merges: list[tuple[str, str]],
               lowercase: bool = True,
               out_col: str = "bpe_tokens") -> DataFrame:
    """Apply a trained merge list to ``text_col`` → ``out_col``
    (array of subword tokens, end-of-word sentinels stripped into
    word boundaries). Pure column expressions: the same greedy fold
    per rank, so encoding matches training exactly and runs
    JVM-side in any downstream query.

    One pass per rank (not best-first iteration) is exact for any
    merge list BPE training can produce: a merge's two input tokens
    are created only by strictly earlier-ranked merges, so by the
    time rank r's fold runs, everything it could consume already
    exists, and nothing a later rank creates can feed an earlier
    rank. (An inconsistent hand-written list — e.g. ('ab','c')
    ranked before ('a','b') — would diverge, but training cannot
    emit one.)"""
    src = f"lower({text_col})" if lowercase else text_col
    words = f"split(trim({src}), '\\\\s+')"
    # per word: chars + sentinel, then fold each merge in rank order
    sym = "concat(split(w, ''), array('" + EOW + "'))"
    for a, b in merges:
        sym = _merge_fold_sql(sym, a, b)
    toks = F.expr(
        f"flatten(transform(filter({words}, w -> w != ''), "
        f"w -> transform({sym}, s -> replace(s, '{EOW}', ''))))")
    return df.withColumn(out_col, F.filter(toks, lambda s: s != ""))
