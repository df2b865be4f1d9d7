"""BM25 ranking (functions/text_rank.py) — the scoring half of the
reference's Lucene fine-grain index (LuceneFineGrainIndex.java:63-204
returns Lucene-scored hits; formula = Lucene BM25Similarity)."""

import math

import pytest

from cdh_integrate_carbondata2_3_spark.functions.text_rank import (
    bm25_score, bm25_topk)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(1, "spark spark spark fast"),
         (2, "spark slow"),
         (3, "slow slow slow slow slow slow slow slow"),
         (4, "walk quick")],
        "doc_id bigint, text string")


def _expected_bm25(terms, corpus, text, k1=1.2, b=0.75):
    n = len(corpus)
    dls = [len(t.split()) for t in corpus]
    avgdl = sum(dls) / n
    dl = len(text.split())
    s = 0.0
    for term in terms:
        df = sum(1 for t in corpus if term in t.split())
        tf = text.split().count(term)
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    return s


def test_bm25_matches_reference_formula(docs):
    corpus = [r["text"] for r in docs.select("text").collect()]
    got = {r["doc_id"]: r["bm25"]
           for r in bm25_score(docs, ["spark", "slow"]).collect()}
    for did, text in [(1, corpus[0]), (2, corpus[1]),
                      (3, corpus[2]), (4, corpus[3])]:
        assert got[did] == pytest.approx(
            _expected_bm25(["spark", "slow"], corpus, text), abs=1e-9)


def test_bm25_topk_order_and_cut(docs):
    rows = bm25_topk(docs, ["spark"], k=2).collect()
    # doc 1 has tf=3 and is shorter than corpus average competitors;
    # doc 2 matches once; doc 3/4 not at all
    assert [r["doc_id"] for r in rows] == [1, 2]
    # zero-score rows are excluded even when k is large
    rows = bm25_topk(docs, ["spark"], k=10).collect()
    assert {r["doc_id"] for r in rows} == {1, 2}


def test_bm25_rarer_term_scores_higher(docs):
    # 'quick' (df=1) must out-rank 'slow' (df=2) at equal tf/dl
    got = {r["doc_id"]: r["bm25"]
           for r in bm25_score(docs, ["quick", "slow"]).collect()}
    assert got[4] > got[2]


def test_bm25_requires_terms(docs):
    with pytest.raises(ValueError):
        bm25_score(docs, [])


def test_bm25_plan_is_jvm_side(docs):
    """The scoring plan must stay in codegen: no Python UDF (BatchEval
    / ArrowEval nodes) and the stats side must be broadcast."""
    plan = bm25_topk(docs, ["spark", "slow"], k=3) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
