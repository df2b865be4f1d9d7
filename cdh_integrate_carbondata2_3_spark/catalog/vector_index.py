"""Persistent IVF vector index on a managed table's embedding column.

Extends the table format's index family (SI / bloom / FTS / spatial —
catalog/index.py) with a coarse-quantizer ANN index, so similarity
search is a TABLE capability, not a per-query recomputation:

- CREATE: centroids are learned with Lloyd's rounds
  (operators/similarity.kmeans_refine — broadcast argmin + exact
  DECIMAL means, corpus never shuffles), then every row's nearest-list
  assignment is written EXECUTOR-side as a parquet sidecar
  (id, list_id) under the index dir; the tiny k×dim centroid matrix
  lives in the meta JSON.
- SEARCH: queries rank centroids, probe only the ``nprobe`` nearest
  lists (a semi-join of the sidecar against the probed list ids →
  candidate row ids → candidate rows), and rerank candidates by exact
  cosine. At cluster scale the sidecar join prunes the corpus scan the
  same way the SI prunes point lookups: only candidate files' rows
  flow into the rerank.

Like every index here, the sidecar carries a segment watermark: rows
loaded after the index build are NOT searchable until REFRESH — the
caller sees a stale=True flag instead of silently-wrong results.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .index import _index_dir, _meta_path


def _seed_frame(v: DataFrame, k: int) -> DataFrame:
    """Deterministic k-means seeds = the k smallest ids, planned as a
    distributed TakeOrderedAndProject (per-partition top-k → driver
    merge of k×partitions rows). NOT a row_number() over a global
    no-partition window — that would funnel the ENTIRE corpus through
    one partition before k-means even starts, the first thing to die
    on a 100 TB embedding column (tests/test_vector_index.py asserts
    the plan)."""
    return (v.orderBy("id").limit(k)
            .select(F.col("id").alias("cid"), F.col("e").alias("ce")))


class VectorIndexManager:
    def __init__(self, table):
        self.table = table

    def create(self, name: str, id_col: str, vec_col: str, *,
               k: int = 16, iters: int = 2,
               pq_m: int | None = None, pq_codes: int = 16) -> None:
        """CREATE VECTOR INDEX: learn k centroids, persist per-row
        list assignments as a parquet sidecar. With ``pq_m`` set the
        sidecar additionally stores each row's product-quantization
        codes (``pq_m`` subspaces × ``pq_codes``-entry codebooks,
        trained per-subspace with Lloyd's — operators/similarity
        pq_train), making the index an IVF-PQ: ADC search never reads
        the raw vectors, only the m-byte code column (the FAISS
        IVFPQ layout over raw vectors; the residual-quantization
        variant would subtract the list centroid before encoding)."""
        if os.path.exists(_meta_path(self.table.table_dir, name)):
            raise FileExistsError(f"index {name} exists")
        self._build(name, id_col, vec_col, k, iters, pq_m, pq_codes)

    def refresh(self, name: str) -> None:
        meta = self._meta(name)
        self._build(name, meta["id_col"], meta["vec_col"],
                    meta["k"], meta["iters"],
                    meta.get("pq_m"), meta.get("pq_codes", 16))

    def _build(self, name, id_col, vec_col, k, iters,
               pq_m=None, pq_codes=16) -> None:
        from ..operators.similarity import kmeans_refine, pq_encode, pq_train

        segs = self.table.manifest.queryable_segments()
        wm = max((s.id for s in segs), default=-1)
        v = (self.table.read()
             .select(F.col(id_col).alias("id"),
                     F.transform(F.col(vec_col),
                                 lambda x: x.cast("double")).alias("e")))
        seeds = _seed_frame(v, k)
        assign, cent = kmeans_refine(v, seeds, iters=iters)
        sidecar = assign.select("id", F.col("cluster").alias("list_id"))
        codebooks = None
        if pq_m is not None:
            dim = len(v.select("e").head()["e"])
            if dim % pq_m:
                raise ValueError(f"dim {dim} not divisible by pq_m {pq_m}")
            dsub = dim // pq_m
            cb = pq_train(v, m=pq_m, dsub=dsub, n_codes=pq_codes,
                          iters=iters)
            codes = pq_encode(v, cb, m=pq_m, dsub=dsub)
            sidecar = sidecar.join(codes, "id")
            codebooks = [(r["sub"], r["code"], list(r["cvec"]))
                         for r in cb.collect()]
        idx_dir = _index_dir(self.table.table_dir, name)
        shutil.rmtree(idx_dir, ignore_errors=True)
        (sidecar.repartition(max(1, k // 4), "list_id")
         .write.mode("overwrite").parquet(idx_dir))
        centroids = [(r["cid"], list(r["ce"])) for r in cent.collect()]
        # "columns" keeps the shared index listing/pruning machinery
        # happy (IndexManager.show / candidate_files iterate ALL metas)
        self._save_meta({"name": name,
                         "type": "ivfpq" if pq_m is not None else "ivf",
                         "columns": [id_col, vec_col],
                         "id_col": id_col, "vec_col": vec_col,
                         "k": k, "iters": iters, "centroids": centroids,
                         "pq_m": pq_m, "pq_codes": pq_codes,
                         "codebooks": codebooks,
                         "watermark_segment": wm})

    def search(self, name: str, queries: DataFrame, *,
               nprobe: int = 3, topk: int = 10
               ) -> tuple[DataFrame, bool]:
        """(results, stale): top-``topk`` rows per query by exact
        cosine among the ``nprobe`` probed lists. ``queries`` needs
        (q_id, qe: array<double>). ``stale`` is True when segments
        newer than the index exist (their rows are not searchable
        until refresh)."""
        from ..operators.similarity import dot

        meta = self._meta(name)
        spark = self.table.spark
        stale = any(s.id > meta["watermark_segment"]
                    for s in self.table.manifest.queryable_segments())
        cent = spark.createDataFrame(
            [(c, e) for c, e in meta["centroids"]],
            "cid bigint, ce array<double>")
        d2 = F.aggregate(F.zip_with(F.col("qe"), F.col("ce"),
                                    lambda x, y: (x - y) * (x - y)),
                         F.lit(0.0), lambda a, x: a + x)
        w = W.partitionBy("q_id").orderBy(F.asc("d2"), F.asc("cid"))
        probes = (queries.crossJoin(F.broadcast(cent))
                  .select("q_id", "qe", "cid", d2.alias("d2"))
                  .withColumn("rn", F.row_number().over(w))
                  .filter(F.col("rn") <= nprobe)
                  .select("q_id", "qe", F.col("cid").alias("list_id")))
        sidecar = spark.read.parquet(
            _index_dir(self.table.table_dir, name))
        if meta.get("pq_m"):
            out = self._adc_search(meta, sidecar, probes, queries, topk)
            return out, stale
        cand_ids = (sidecar.join(
            F.broadcast(probes.select("list_id").distinct()), "list_id"))
        rows = (self.table.read()
                .select(F.col(meta["id_col"]).alias("id"),
                        F.transform(F.col(meta["vec_col"]),
                                    lambda x: x.cast("double")).alias("ce")))
        cand = (rows.join(cand_ids, "id")
                .join(F.broadcast(probes), "list_id")
                .filter(F.col("id") != F.col("q_id")))
        cos = (dot("qe", "ce")
               / (F.sqrt(dot("qe", "qe")) * F.sqrt(dot("ce", "ce"))))
        scored = cand.select("q_id", F.col("id").alias("c_id"),
                             F.round(cos, 6).cast("double").alias("cos_sim"))
        wr = W.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("c_id"))
        out = (scored.withColumn("rk", F.row_number().over(wr))
               .filter(F.col("rk") <= topk))
        return out, stale

    def _adc_search(self, meta, sidecar, probes, queries,
                    topk: int) -> DataFrame:
        """IVF-PQ search: candidates from the probed lists are ranked
        by ADC distance computed FROM THE SIDECAR CODES ONLY — the
        table's raw vectors are never scanned (the scan feeding the
        rank reads k-pruned lists × m bytes per row). Output:
        (q_id, c_id, adc_dist, rk), adc rounded to 6dp, ties asc id."""
        from ..operators.similarity import pq_adc_expr, pq_luts

        spark = self.table.spark
        m = meta["pq_m"]
        cb = spark.createDataFrame(
            [(s, c, v) for s, c, v in meta["codebooks"]],
            "sub int, code int, cvec array<double>")
        dim = len(meta["codebooks"][0][2]) * m
        luts = pq_luts(queries.select(F.col("q_id").alias("id"),
                                      F.col("qe").alias("e")),
                       cb, m, dim // m)
        cand = (sidecar.join(
            F.broadcast(probes.select("q_id", "list_id")), "list_id")
            .join(F.broadcast(luts), "q_id")
            .filter(F.col("id") != F.col("q_id")))
        scored = cand.select(
            "q_id", F.col("id").alias("c_id"),
            F.round(pq_adc_expr(), 6).cast("double").alias("adc_dist"))
        wr = W.partitionBy("q_id").orderBy(F.asc("adc_dist"), F.asc("c_id"))
        return (scored.withColumn("rk", F.row_number().over(wr))
                .filter(F.col("rk") <= topk))

    def _save_meta(self, meta: dict) -> None:
        p = _meta_path(self.table.table_dir, meta["name"])
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, p)

    def _meta(self, name: str) -> dict:
        with open(_meta_path(self.table.table_dir, name)) as f:
            return json.load(f)
