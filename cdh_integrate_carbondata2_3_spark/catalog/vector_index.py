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


class VectorIndexManager:
    def __init__(self, table):
        self.table = table

    def create(self, name: str, id_col: str, vec_col: str, *,
               k: int = 16, iters: int = 2) -> None:
        """CREATE VECTOR INDEX: learn k centroids, persist per-row
        list assignments as a parquet sidecar."""
        if os.path.exists(_meta_path(self.table.table_dir, name)):
            raise FileExistsError(f"index {name} exists")
        self._build(name, id_col, vec_col, k, iters)

    def refresh(self, name: str) -> None:
        meta = self._meta(name)
        self._build(name, meta["id_col"], meta["vec_col"],
                    meta["k"], meta["iters"])

    def _build(self, name, id_col, vec_col, k, iters) -> None:
        from ..operators.similarity import kmeans_refine

        segs = self.table.manifest.queryable_segments()
        wm = max((s.id for s in segs), default=-1)
        v = (self.table.read()
             .select(F.col(id_col).alias("id"),
                     F.transform(F.col(vec_col),
                                 lambda x: x.cast("double")).alias("e")))
        w = W.orderBy("id")
        seeds = (v.withColumn("rn", F.row_number().over(w))
                 .filter(F.col("rn") <= k)
                 .select(F.col("id").alias("cid"), F.col("e").alias("ce")))
        assign, cent = kmeans_refine(v, seeds, iters=iters)
        idx_dir = _index_dir(self.table.table_dir, name)
        shutil.rmtree(idx_dir, ignore_errors=True)
        (assign.select("id", F.col("cluster").alias("list_id"))
         .repartition(max(1, k // 4), "list_id")
         .write.mode("overwrite").parquet(idx_dir))
        centroids = [(r["cid"], list(r["ce"])) for r in cent.collect()]
        # "columns" keeps the shared index listing/pruning machinery
        # happy (IndexManager.show / candidate_files iterate ALL metas)
        self._save_meta({"name": name, "type": "ivf",
                         "columns": [id_col, vec_col],
                         "id_col": id_col, "vec_col": vec_col,
                         "k": k, "iters": iters, "centroids": centroids,
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

    def _save_meta(self, meta: dict) -> None:
        p = _meta_path(self.table.table_dir, meta["name"])
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, p)

    def _meta(self, name: str) -> dict:
        with open(_meta_path(self.table.table_dir, name)) as f:
            return json.load(f)
