"""Distributed BPE trainer (operators/bpe.py) — pinned against the
canonical Sennrich et al. 2016 worked example, plus encode
generalization to unseen words and the no-Python-in-plan guarantee."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdh_integrate_carbondata2_3_spark.operators.bpe import (
    bpe_encode, subword_vocab, train_bpe, word_counts)


def _corpus(spark):
    # the classic vocabulary {low:5, lower:2, newest:6, widest:3}
    rows = [("low " * 5 + "lower " * 2,), ("newest " * 6 + "widest " * 3,)]
    return spark.createDataFrame(rows, "text string")


def test_canonical_merges(spark):
    df = _corpus(spark)
    m = train_bpe(df, "text", 6)
    assert m == [("e", "s"), ("es", "t"), ("est", "</w>"),
                 ("l", "o"), ("lo", "w"), ("e", "w")]


def test_encode_matches_training_and_generalizes(spark):
    df = _corpus(spark)
    m = train_bpe(df, "text", 5)
    enc = bpe_encode(df, "text", m)
    toks = enc.select("bpe_tokens").collect()
    assert toks[0][0] == ["low"] * 5 + ["low", "e", "r"] * 2
    # unseen word: 'lowest' must decompose through the learned ranks
    unseen = spark.createDataFrame([("Lowest",)], "text string")
    got = bpe_encode(unseen, "text", m).select("bpe_tokens").first()[0]
    assert got == ["low", "est"]
    # reconstruction: concatenated subwords spell the source words
    joined = (bpe_encode(df, "text", m)
              .select(F.concat_ws("", "bpe_tokens").alias("j"),
                      F.regexp_replace(F.lower("text"), r"\s+", "")
                      .alias("raw")))
    assert all(r["j"] == r["raw"].strip() for r in joined.collect())


def test_subword_vocab_counts(spark):
    df = _corpus(spark)
    m = train_bpe(df, "text", 6)
    v = {r["subword"]: r["n"] for r in
         subword_vocab(df, "text", m).collect()}
    assert v["est"] == 9 and v["low"] == 7 and v["ew"] == 6


def test_word_counts_single_pass(spark):
    df = _corpus(spark)
    wc = {r["word"]: r["n"] for r in word_counts(df, "text").collect()}
    assert wc == {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_training_loop_is_jvm_side(spark):
    """The per-round pair count and the merge application are pure
    SQL — no EvalPython anywhere in either plan."""
    df = _corpus(spark)
    m = train_bpe(df, "text", 3)
    enc = bpe_encode(df, "text", m)
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_stops_when_no_pair_repeats(spark):
    df = spark.createDataFrame([("ab cd",)], "text string")
    m = train_bpe(df, "text", 50)
    assert len(m) < 50                   # converged, didn't loop 50×


def test_batched_training_collapses_on_chained_merges(spark):
    """The Sennrich example is maximal chaining (each merge's count
    ties the rejected overlapping pairs), so the safety bound forces
    top-1 fallback every round — batch>1 reproduces the EXACT
    sequential merge list."""
    df = _corpus(spark)
    assert train_bpe(df, "text", 6, batch=8) == train_bpe(df, "text", 6)


def test_batched_training_exact_on_tied_word_final_pairs(spark):
    """Every word-final pair ties its (last, </w>) companion, so the
    bound rejects multi-accept rounds here too — batch must still be
    EXACTLY the sequential list, and encodes identically."""
    rows = [("xy " * 10 + "qr " * 9,), ("mn " * 8 + "st " * 7,)]
    df = spark.createDataFrame(rows, "text string")
    seq = train_bpe(df, "text", 8, batch=1)
    bat = train_bpe(df, "text", 8, batch=4)
    assert seq == bat
    probe = spark.createDataFrame([("xy qr mn st xyqr",)], "text string")
    enc_seq = bpe_encode(probe, "text", seq).select("bpe_tokens").first()[0]
    enc_bat = bpe_encode(probe, "text", bat).select("bpe_tokens").first()[0]
    assert enc_seq == enc_bat


def test_batched_training_fewer_rounds_when_heads_separate(spark,
                                                          monkeypatch):
    """Separated head counts ((a,b):8 strictly above every
    overlapping/rejected pair at 4, (q,r):6 likewise) let one round
    accept both — same exact merge list as sequential, observably
    fewer counting rounds (one driver collect per round)."""
    rows = [("xaby " * 4 + "zabw " * 4 + "mqrn " * 3 + "pqrs " * 3,)]
    df = spark.createDataFrame(rows, "text string")
    from pyspark.sql.classic.dataframe import DataFrame as DF
    calls = {"n": 0}
    orig = DF.collect

    def counting(self):
        calls["n"] += 1
        return orig(self)

    monkeypatch.setattr(DF, "collect", counting)
    seq = train_bpe(df, "text", 2, batch=1)
    n_seq, calls["n"] = calls["n"], 0
    bat = train_bpe(df, "text", 2, batch=4)
    n_bat = calls["n"]
    assert bat == seq == [("a", "b"), ("q", "r")]
    assert n_bat < n_seq


def test_batched_training_exact_on_run_heavy_corpus(spark):
    """Self-pair regression: merging (a, a) creates (aa, aa)/(aa, a)
    pairs whose counts are bounded by the ACCEPTED pair's count, not
    by the round's safety bound — a naive batch accepts a second pair
    in the same round that sequential would rank AFTER the created
    (aa, aa). The walk must stop at the first accepted self-pair."""
    rows = [("bbaaaaaa " * 28 + "aabbabba " * 10 + "bbbaabba " * 2,)]
    df = spark.createDataFrame(rows, "text string")
    seq = train_bpe(df, "text", 3, batch=1)
    assert seq == [("a", "a"), ("aa", "aa"), ("b", "b")]
    for b in (2, 4, 8):
        assert train_bpe(df, "text", 3, batch=b) == seq


def test_batched_training_exact_on_long_runs(spark):
    """Pure run corpus (every merge is a self-pair) — batch>1 must
    degrade to one accept per round and match sequential exactly."""
    rows = [("a" * 32 + " " + "a" * 31,), ("b" * 16 + " " + "b" * 15,)]
    df = spark.createDataFrame(rows, "text string")
    seq = train_bpe(df, "text", 6, batch=1)
    bat = train_bpe(df, "text", 6, batch=8)
    assert seq == bat


def test_batched_training_respects_budget(spark):
    rows = [("xy " * 10 + "qr " * 9 + "mn " * 8,)]
    df = spark.createDataFrame(rows, "text string")
    m = train_bpe(df, "text", 3, batch=16)
    assert len(m) == 3                    # batch never overshoots
