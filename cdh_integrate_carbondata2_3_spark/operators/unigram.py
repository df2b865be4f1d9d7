"""Distributed unigram-LM tokenizer training (SentencePiece's
unigram model, Kudo 2018 "Subword Regularization") — the other half
of real-world tokenizers next to BPE (operators/bpe.py).

Algorithm (the standard EM + prune loop):

1. The corpus collapses to the same WORD-COUNT table BPE trains on —
   one hash aggregation is the only pass over the full data; the
   distinct-word table (millions of rows at 100 TB) is the training
   state every round touches.
2. Seed vocabulary: every substring up to ``max_piece_len`` weighted
   by word count (one array-HOF explode + groupBy), the top
   ``seed_size`` by frequency plus ALL single characters (so every
   word stays segmentable; singles are never pruned).
3. EM rounds: the E-step computes each piece's EXPECTED COUNT under
   the current probabilities with a forward-backward pass over each
   word's segmentation lattice — an Arrow-batched ``mapInPandas``
   over the word-count table with the (vocabulary-sized) model in
   the closure; per-piece expected counts come back through one
   groupBy and a vocabulary-sized driver collect. The M-step
   re-normalizes. No corpus pass, no shuffle bigger than the
   vocabulary.
4. Prune: drop the multi-character pieces with the smallest expected
   counts until the vocabulary shrinks by ``shrink`` (SentencePiece
   prunes by likelihood-loss-if-removed; expected-count ranking is
   the standard simplification and keeps the gate deterministic —
   ties break lexicographically). Repeat EM + prune until
   ``vocab_size`` is reached, then one final EM polish.

``unigram_encode`` applies Viterbi (max-probability) segmentation
with the trained vocabulary — the inference path.

No reference analogue (tokenizer training sits upstream of the
reference's pycarbon feeding); part of the LLM-pipeline surface this
engine adds. Exactness is pinned in tests/test_unigram.py against
full segmentation-enumeration references.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from .bpe import word_counts


# ---------------------------------------------------------------- lattice


def _forward_backward(word: str, logp: dict[str, float],
                      max_len: int) -> tuple[dict[str, float], float]:
    """Expected piece counts for one word under the unigram model,
    plus the word's total log-likelihood. Standard lattice
    forward-backward in log space; returns ({}, -inf) when the word
    has no segmentation (a character missing from the vocabulary)."""
    n = len(word)
    NEG = float("-inf")

    def lse(xs):
        m = max(xs)
        if m == NEG:
            return NEG
        return m + math.log(sum(math.exp(x - m) for x in xs))

    # arcs[j] = [(i, piece, logp)] for pieces spanning word[i:j]
    alpha = [NEG] * (n + 1)
    alpha[0] = 0.0
    arcs: list[list[tuple[int, str, float]]] = [[] for _ in range(n + 1)]
    for j in range(1, n + 1):
        cand = []
        for i in range(max(0, j - max_len), j):
            piece = word[i:j]
            lp = logp.get(piece)
            if lp is not None:
                arcs[j].append((i, piece, lp))
                if alpha[i] != NEG:
                    cand.append(alpha[i] + lp)
        if cand:
            alpha[j] = lse(cand)
    if alpha[n] == NEG:
        return {}, NEG
    beta = [NEG] * (n + 1)
    beta[n] = 0.0
    for j in range(n - 1, -1, -1):
        cand = []
        for jj in range(j + 1, min(n, j + max_len) + 1):
            piece = word[j:jj]
            lp = logp.get(piece)
            if lp is not None and beta[jj] != NEG:
                cand.append(lp + beta[jj])
        if cand:
            beta[j] = lse(cand)
    z = alpha[n]
    ec: dict[str, float] = {}
    for j in range(1, n + 1):
        for i, piece, lp in arcs[j]:
            if alpha[i] == NEG or beta[j] == NEG:
                continue
            ec[piece] = ec.get(piece, 0.0) + math.exp(
                alpha[i] + lp + beta[j] - z)
    return ec, z


def _viterbi(word: str, logp: dict[str, float],
             max_len: int) -> list[str]:
    """Max-probability segmentation; ties break toward the LONGER
    last piece (deterministic). Unsegmentable words fall back to
    character pieces."""
    n = len(word)
    NEG = float("-inf")
    best = [NEG] * (n + 1)
    back: list[tuple[int, str] | None] = [None] * (n + 1)
    best[0] = 0.0
    for j in range(1, n + 1):
        for i in range(max(0, j - max_len), j):
            piece = word[i:j]
            lp = logp.get(piece)
            if lp is None or best[i] == NEG:
                continue
            score = best[i] + lp
            # >= : later (longer-last-piece) candidates win ties
            if score >= best[j]:
                best[j] = score
                back[j] = (i, piece)
    if back[n] is None:
        return list(word)
    out: list[str] = []
    j = n
    while j > 0:
        i, piece = back[j]          # type: ignore[misc]
        out.append(piece)
        j = i
    return out[::-1]


# ---------------------------------------------------------------- training


def _seed_vocab(wc: DataFrame, *, max_piece_len: int,
                seed_size: int) -> dict[str, float]:
    """Top substrings by corpus frequency + all single characters,
    as normalized log-probabilities proportional to frequency."""
    subs = wc.select(
        F.explode(F.expr(
            "flatten(transform(sequence(1, length(word)), i -> "
            "transform(sequence(i, least(length(word), "
            f"i + {max_piece_len - 1})), "
            "j -> substring(word, i, j - i + 1))))")).alias("piece"),
        F.col("n"))
    freq = subs.groupBy("piece").agg(F.sum("n").alias("f"))
    # ONE action for both seed slices (r13, guide §2.4): the singles
    # filter and the top-k multi-char slice used to be two separate
    # collects, each re-running the substring explosion + aggregation
    # from scratch. Unioning them lets ReuseExchange dedup the
    # explosion's shuffle (the map-side pass runs once), and one
    # driver round-trip returns both. Same rows, same values — the
    # slices are disjoint by construction (length 1 vs > 1).
    rows = (freq.filter(F.length("piece") == 1)
            .unionAll(freq.filter(F.length("piece") > 1)
                      .orderBy(F.desc("f"), "piece").limit(seed_size))
            .collect())
    singles = {r["piece"]: r["f"] for r in rows if len(r["piece"]) == 1}
    top = {r["piece"]: r["f"] for r in rows if len(r["piece"]) > 1}
    raw = {**top, **singles}
    total = sum(raw.values())
    return {p: math.log(f / total) for p, f in raw.items()}


def _em_round(wc: DataFrame, logp: dict[str, float],
              max_len: int) -> dict[str, float]:
    """One distributed E-step + driver-side M-step: expected counts
    per piece (one mapInPandas over the word table, one
    vocabulary-keyed groupBy), re-normalized to new log-probs.
    Pieces with zero expectation keep a floor so the prune ranks
    them (deterministically) instead of math blowing up."""
    import pandas as pd

    model = dict(logp)

    def estep(batches):
        for pdf in batches:
            pieces: list[str] = []
            ecs: list[float] = []
            for word, n in zip(pdf["word"], pdf["n"]):
                ec, _ = _forward_backward(word, model, max_len)
                for p, c in ec.items():
                    pieces.append(p)
                    ecs.append(c * int(n))
            yield pd.DataFrame({"piece": pieces, "ec": ecs})

    ec_rows = (wc.mapInPandas(estep, "piece string, ec double")
               .groupBy("piece").agg(F.sum("ec").alias("ec"))
               .collect())
    ec = {r["piece"]: r["ec"] for r in ec_rows}
    total = sum(ec.values())
    if total <= 0:
        return logp
    floor = math.log(1e-12)
    return {p: (math.log(ec[p] / total) if ec.get(p, 0.0) > 0
                else floor) for p in logp}


def train_unigram(df: DataFrame, text_col: str, vocab_size: int, *,
                  max_piece_len: int = 8, seed_size: int = 2000,
                  em_iters: int = 2, shrink: float = 0.75,
                  lowercase: bool = True) -> dict[str, float]:
    """Learn a unigram tokenizer vocabulary of ``vocab_size`` pieces
    (single characters always included). Returns piece → log-prob,
    normalized over the final vocabulary."""
    if not 0 < shrink < 1:
        raise ValueError("shrink must be in (0, 1)")
    wc = word_counts(df, text_col, lowercase)
    # the training state: every EM round re-reads it
    wc = wc.localCheckpoint()
    logp = _seed_vocab(wc, max_piece_len=max_piece_len,
                       seed_size=seed_size)
    while True:
        for _ in range(em_iters):
            logp = _em_round(wc, logp, max_piece_len)
        n_now = len(logp)
        if n_now <= vocab_size:
            break
        singles = {p for p in logp if len(p) == 1}
        target = max(vocab_size, int(n_now * shrink))
        keep_multi = max(0, target - len(singles))
        all_multi = [p for p in logp if len(p) > 1]
        if not all_multi:
            break            # can't shrink below the character set
        multi = sorted(all_multi,
                       key=lambda p: (-logp[p], p))[:keep_multi]
        kept = singles | set(multi)
        # renormalize over the surviving vocabulary
        probs = {p: math.exp(logp[p]) for p in kept}
        z = sum(probs.values())
        logp = {p: math.log(v / z) for p, v in probs.items()}
        if len(logp) <= vocab_size:
            for _ in range(em_iters):        # final polish
                logp = _em_round(wc, logp, max_piece_len)
            break
    return logp


def unigram_encode(df: DataFrame, text_col: str,
                   logp: dict[str, float], *,
                   max_piece_len: int = 8, lowercase: bool = True,
                   out: str = "pieces") -> DataFrame:
    """Viterbi-segment every whitespace token of ``text_col`` with
    the trained vocabulary; appends ``out`` as array<string>. Arrow-
    batched; the model rides the closure (vocabulary-sized)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    model = dict(logp)
    ml = max_piece_len

    def _enc(texts):
        def one(t):
            if t is None:
                return []
            t = t.lower() if lowercase else t
            pieces: list[str] = []
            for w in t.strip().split():
                pieces.extend(_viterbi(w, model, ml))
            return pieces
        return texts.map(one)

    enc = pandas_udf(_enc, "array<string>")
    return df.withColumn(out, enc(F.col(text_col)))


# ---------------------------------------------------------------- wordpiece


def _wordpiece_word(word: str, vocab: set, max_len: int,
                    unk: str, cont: str) -> list[str]:
    """Greedy longest-match-first (the WordPiece inference rule,
    Wu et al. 2016 / BERT tokenizer): repeatedly take the longest
    vocabulary piece prefixing the remainder; continuation pieces
    carry the ``cont`` prefix ('##'). A word with an unmatchable
    remainder becomes [unk] — whole-word, like BERT."""
    out: list[str] = []
    i, n = 0, len(word)
    while i < n:
        j = min(n, i + max_len)
        piece = None
        while j > i:
            cand = word[i:j] if i == 0 else cont + word[i:j]
            if cand in vocab:
                piece = cand
                break
            j -= 1
        if piece is None:
            return [unk]
        out.append(piece)
        i = j
    return out


def wordpiece_encode(df: DataFrame, text_col: str, vocab, *,
                     max_piece_len: int = 20, lowercase: bool = True,
                     unk: str = "[UNK]", cont: str = "##",
                     out: str = "pieces") -> DataFrame:
    """WordPiece greedy segmentation of whitespace tokens with an
    explicit vocabulary (continuation pieces prefixed ``##``) —
    the inference half of the BERT tokenizer, completing the
    tokenizer trio next to BPE merges and unigram Viterbi. Arrow-
    batched; the vocabulary rides the closure."""
    import pandas as pd  # noqa: F401
    from pyspark.sql.functions import pandas_udf

    vset = set(vocab)
    ml = max_piece_len

    def _enc(texts):
        def one(t):
            if t is None:
                return []
            t = t.lower() if lowercase else t
            pieces: list[str] = []
            for w in t.strip().split():
                pieces.extend(_wordpiece_word(w, vset, ml, unk, cont))
            return pieces
        return texts.map(one)

    enc = pandas_udf(_enc, "array<string>")
    return df.withColumn(out, enc(F.col(text_col)))
