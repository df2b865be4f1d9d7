"""Unigram tokenizer training (operators/unigram.py): the lattice
forward-backward is pinned against FULL segmentation enumeration,
Viterbi against brute-force best segmentation, the distributed EM
round against a serial reference over the same word counts, and the
end-to-end trainer for determinism + vocabulary contracts."""

from __future__ import annotations

import math
from itertools import product

import pytest
from pyspark.sql import functions as F

from cdh_integrate_carbondata2_3_spark.operators.unigram import (
    _em_round, _forward_backward, _seed_vocab, _viterbi,
    train_unigram, unigram_encode)
from cdh_integrate_carbondata2_3_spark.operators.bpe import word_counts


def _enumerate_segmentations(word, vocab, max_len):
    """All segmentations of word into vocab pieces (brute force)."""
    def rec(i):
        if i == len(word):
            yield []
            return
        for j in range(i + 1, min(len(word), i + max_len) + 1):
            p = word[i:j]
            if p in vocab:
                for rest in rec(j):
                    yield [p] + rest
    return list(rec(0))


def _enum_expected_counts(word, logp, max_len):
    segs = _enumerate_segmentations(word, logp, max_len)
    if not segs:
        return {}, float("-inf")
    weights = [math.exp(sum(logp[p] for p in s)) for s in segs]
    z = sum(weights)
    ec = {}
    for s, w in zip(segs, weights):
        for p in s:
            ec[p] = ec.get(p, 0.0) + w / z
    return ec, math.log(z)


VOCAB = {"a": math.log(0.3), "b": math.log(0.2), "ab": math.log(0.25),
         "ba": math.log(0.15), "aba": math.log(0.1)}


@pytest.mark.parametrize("word", ["abab", "aba", "bbaa", "a", "abba"])
def test_forward_backward_matches_enumeration(word):
    got, gz = _forward_backward(word, VOCAB, max_len=3)
    want, wz = _enum_expected_counts(word, VOCAB, 3)
    assert gz == pytest.approx(wz, rel=1e-12)
    assert set(got) == set(want)
    for p in want:
        assert got[p] == pytest.approx(want[p], rel=1e-12), (word, p)


def test_forward_backward_unsegmentable():
    ec, z = _forward_backward("xyz", VOCAB, max_len=3)
    assert ec == {} and z == float("-inf")


@pytest.mark.parametrize("word", ["abab", "aba", "baab", "aabb"])
def test_viterbi_matches_brute_force(word):
    segs = _enumerate_segmentations(word, VOCAB, 3)
    best = max(segs, key=lambda s: (sum(VOCAB[p] for p in s),))
    got = _viterbi(word, VOCAB, 3)
    assert sum(VOCAB[p] for p in got) == pytest.approx(
        sum(VOCAB[p] for p in best), rel=1e-12)


def test_viterbi_fallback_to_chars():
    assert _viterbi("qqq", VOCAB, 3) == ["q", "q", "q"]


def test_seed_vocab_contents(spark):
    df = spark.createDataFrame([(1, "ab ab ba")], "id long, text string")
    wc = word_counts(df, "text")
    logp = _seed_vocab(wc, max_piece_len=2, seed_size=10)
    # pieces: a, b (singles), ab (f=2), ba (f=1)
    assert set(logp) == {"a", "b", "ab", "ba"}
    f = {p: math.exp(lp) for p, lp in logp.items()}
    # frequencies: a:3, b:3, ab:2, ba:1 -> normalized over 9
    assert f["a"] == pytest.approx(3 / 9, rel=1e-12)
    assert f["ab"] == pytest.approx(2 / 9, rel=1e-12)
    assert sum(f.values()) == pytest.approx(1.0, rel=1e-12)


def test_distributed_em_round_matches_serial(spark):
    rows = [(1, "abab aba ab"), (2, "ba ab abab")]
    df = spark.createDataFrame(rows, "id long, text string")
    wc = word_counts(df, "text")
    got = _em_round(wc, VOCAB, 3)
    # serial reference over the same word counts
    counts = {r["word"]: r["n"] for r in wc.collect()}
    ec_tot: dict[str, float] = {}
    for w, n in counts.items():
        ec, _ = _forward_backward(w, VOCAB, 3)
        for p, c in ec.items():
            ec_tot[p] = ec_tot.get(p, 0.0) + c * n
    z = sum(ec_tot.values())
    for p in VOCAB:
        if ec_tot.get(p, 0.0) > 0:
            assert math.exp(got[p]) == pytest.approx(
                ec_tot[p] / z, rel=1e-9), p
        else:
            assert got[p] == math.log(1e-12)


def test_train_deterministic_and_contract(spark):
    rows = [(i, "hello world hold on") for i in range(5)] + \
           [(i + 10, "low lower lowest holder") for i in range(5)]
    df = spark.createDataFrame(rows, "id long, text string")
    v1 = train_unigram(df, "text", vocab_size=30, max_piece_len=4,
                       seed_size=40, em_iters=1)
    v2 = train_unigram(df, "text", vocab_size=30, max_piece_len=4,
                       seed_size=40, em_iters=1)
    assert v1 == v2                      # deterministic end to end
    assert len(v1) <= 30 or all(len(p) == 1 for p in v1)
    chars = {c for r in rows for c in r[1] if c != " "}
    assert chars <= set(v1)              # singles never pruned
    assert sum(math.exp(lp) for lp in v1.values()) == pytest.approx(
        1.0, rel=1e-9)


def test_encode_roundtrip(spark):
    rows = [(i, "hello hold world") for i in range(5)]
    df = spark.createDataFrame(rows, "id long, text string")
    vocab = train_unigram(df, "text", vocab_size=25, max_piece_len=4,
                          seed_size=30, em_iters=1)
    out = unigram_encode(df, "text", vocab, max_piece_len=4)
    for r in out.collect():
        assert "".join(r["pieces"]) == "helloholdworld"


# ---------------------------------------------------------------------------
# wordpiece greedy encode
# ---------------------------------------------------------------------------


def test_wordpiece_canonical_example(spark):
    """The BERT-paper example: 'unaffable' with {un, ##aff, ##able}."""
    from cdh_integrate_carbondata2_3_spark.operators.unigram import (
        wordpiece_encode)
    vocab = {"un", "##aff", "##able", "the"}
    df = spark.createDataFrame([(1, "the unaffable")],
                               "id long, text string")
    out = wordpiece_encode(df, "text", vocab).collect()[0]["pieces"]
    assert out == ["the", "un", "##aff", "##able"]


def test_wordpiece_longest_match_first(spark):
    from cdh_integrate_carbondata2_3_spark.operators.unigram import (
        wordpiece_encode)
    # 'ab' must win over 'a' at word start
    vocab = {"a", "ab", "##c", "##bc"}
    df = spark.createDataFrame([(1, "abc")], "id long, text string")
    out = wordpiece_encode(df, "text", vocab).collect()[0]["pieces"]
    assert out == ["ab", "##c"]


def test_wordpiece_whole_word_unk(spark):
    from cdh_integrate_carbondata2_3_spark.operators.unigram import (
        wordpiece_encode)
    vocab = {"a", "##b"}
    df = spark.createDataFrame([(1, "ab axq a")],
                               "id long, text string")
    out = wordpiece_encode(df, "text", vocab).collect()[0]["pieces"]
    # 'axq' has no match for 'x' remainder -> whole-word [UNK]
    assert out == ["a", "##b", "[UNK]", "a"]
