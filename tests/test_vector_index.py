"""Persistent IVF vector index (catalog/vector_index.py): build on a
managed table, search with probes, recall vs brute force, staleness
watermark."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdh_integrate_carbondata2_3_spark.catalog.table import Table
from cdh_integrate_carbondata2_3_spark.catalog.vector_index import (
    VectorIndexManager)


@pytest.fixture()
def vtable(spark, tmp_path, sf_dir):
    t = Table.create(spark, str(tmp_path / "vt"),
                     "vec_id bigint, embedding array<float>")
    t.insert(spark.read.parquet(f"{sf_dir}/embeddings.parquet")
             .select("vec_id", "embedding"))
    return t


def _queries(spark, sf_dir, n=5):
    return (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .filter(F.col("vec_id") < n)
            .select(F.col("vec_id").alias("q_id"),
                    F.transform(F.col("embedding"),
                                lambda x: x.cast("double")).alias("qe")))


def test_ivf_index_build_and_search(spark, sf_dir, vtable):
    vm = VectorIndexManager(vtable)
    vm.create("ivf1", "vec_id", "embedding", k=8, iters=1)
    res, stale = vm.search("ivf1", _queries(spark, sf_dir),
                           nprobe=3, topk=5)
    assert not stale
    rows = res.collect()
    assert rows
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append((r["rk"], r["c_id"]))
    for q, rr in by_q.items():
        assert sorted(rk for rk, _ in rr) == list(range(1, len(rr) + 1))
        assert len(rr) <= 5


def test_ivf_recall_vs_bruteforce(spark, sf_dir, vtable):
    from cdh_integrate_carbondata2_3_spark.operators.similarity import dot

    vm = VectorIndexManager(vtable)
    vm.create("ivf2", "vec_id", "embedding", k=8, iters=2)
    q = _queries(spark, sf_dir)
    res, _ = vm.search("ivf2", q, nprobe=4, topk=5)
    approx = {(r["q_id"], r["c_id"]) for r in res.collect()}

    corpus = (vtable.read().select(
        F.col("vec_id").alias("c_id"),
        F.transform(F.col("embedding"), lambda x: x.cast("double"))
        .alias("ce")))
    cos = (dot("qe", "ce")
           / (F.sqrt(dot("qe", "qe")) * F.sqrt(dot("ce", "ce"))))
    from pyspark.sql import Window as W
    wr = W.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("c_id"))
    exact = {(r["q_id"], r["c_id"])
             for r in (corpus.crossJoin(F.broadcast(q))
                       .filter(F.col("c_id") != F.col("q_id"))
                       .select("q_id", "c_id", cos.alias("cos"))
                       .withColumn("rk", F.row_number().over(wr))
                       .filter(F.col("rk") <= 5).collect())}
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.5, f"recall@5 {recall:.2f} too low for nprobe=4/8"


def test_ivf_staleness_watermark(spark, sf_dir, vtable):
    vm = VectorIndexManager(vtable)
    vm.create("ivf3", "vec_id", "embedding", k=4, iters=1)
    vtable.insert(spark.createDataFrame(
        [(10_000, [0.1] * 64)], "vec_id bigint, embedding array<float>"))
    _, stale = vm.search("ivf3", _queries(spark, sf_dir))
    assert stale
    vm.refresh("ivf3")
    _, stale = vm.search("ivf3", _queries(spark, sf_dir))
    assert not stale


def test_create_ivf_index_via_sql(spark, tmp_path, sf_dir):
    from cdh_integrate_carbondata2_3_spark.sql import Engine

    eng = Engine(spark, str(tmp_path / "wh"))
    eng.sql("CREATE TABLE ve (vec_id BIGINT, embedding ARRAY<FLOAT>)")
    src = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .select("vec_id", "embedding"))
    eng.table("ve").insert(src)
    eng.sql("CREATE INDEX vq ON TABLE ve (vec_id, embedding) AS 'ivf'")
    t = eng.table("ve")
    res, stale = t.vector_indexes.search("vq", _queries(spark, sf_dir))
    assert not stale and res.count() > 0


def test_ivf_index_coexists_with_predicate_reads(spark, sf_dir, vtable):
    """An ivf index must not break the shared index machinery: SHOW
    INDEXES lists it, and predicate reads (which iterate every index
    meta) still work."""
    vm = VectorIndexManager(vtable)
    vm.create("ivf4", "vec_id", "embedding", k=4, iters=1)
    listed = {i["name"]: i["type"] for i in vtable.indexes.show()}
    assert listed.get("ivf4") == "ivf"
    assert vtable.read([("vec_id", "=", 7)]).count() == 1
    assert vtable.read([("vec_id", "in", [1, 2, 3])]).count() == 3
