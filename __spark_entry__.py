"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual query surface lives in
``cdh_integrate_carbondata2_3_spark.queries`` (one registry entry per
operator from SURVEY.md §2, each with its DuckDB oracle).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from cdh_integrate_carbondata2_3_spark.queries import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the engine's signature path end-to-end on sf0.001 —
    a managed segmented table (manifest + min/max stats), a porter
    Lucene-style FTS index (postings file-pruning + the dictionary
    fast path), a stemmed text_match through the SQL surface, SimHash
    near-dup clustering over the hits, and a per-language rollup of
    clusters vs raw matches. Exercises the custom machinery the
    driver smoke should cover, not just delegated Spark."""
    from pyspark.sql import functions as F

    from cdh_integrate_carbondata2_3_spark.operators.dedup import (
        simhash_near_dups)
    from cdh_integrate_carbondata2_3_spark.operators.graph import (
        connected_components)
    from cdh_integrate_carbondata2_3_spark.queries.lifecycle_queries import (
        _scratch)
    from cdh_integrate_carbondata2_3_spark.sql import Engine

    sf = "/root/testdata/sf0.001"
    eng = Engine(spark, _scratch("flagship", sf))
    spark.read.parquet(f"{sf}/documents.parquet") \
        .createOrReplaceTempView("__flagship_docs")
    eng.sql("CREATE TABLE flagdoc (doc_id BIGINT, text STRING, "
            "lang STRING, n_chars BIGINT) "
            "TBLPROPERTIES('iud.mode'='mor')")
    for par in (0, 1):          # two segments → real manifest pruning
        eng.sql("INSERT INTO flagdoc SELECT doc_id, text, lang, n_chars "
                f"FROM __flagship_docs WHERE doc_id % 2 = {par}")
    # merge-on-read DELETE: a delta sidecar, no file rewrite — every
    # downstream step (index build, text_match, dedup) sees only
    # surviving rows through the central read path
    eng.sql("DELETE FROM flagdoc WHERE doc_id % 17 = 3")
    eng.sql("CREATE INDEX flagfts ON TABLE flagdoc (text) AS 'lucene' "
            "PROPERTIES('analyzer'='porter')")
    # porter stems both sides: vectors→vector, hashing→hash
    hits = eng.sql("SELECT doc_id, text, lang FROM flagdoc "
                   "WHERE text_match('text:vectors OR text:hashing')") \
        .cache()
    toks = hits.select("doc_id",
                       F.explode(F.split(F.trim("text"), " +")).alias("tok"))
    pairs = simhash_near_dups(toks, bits=32, bands=4, max_hamming=3)
    comp = connected_components(pairs)
    clustered = (hits.join(comp, hits.doc_id == comp.node, "left")
                 .select("lang", F.coalesce("comp", "doc_id").alias("comp")))
    return (clustered.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_matches"),
                 F.countDistinct("comp").alias("n_clusters"))
            .orderBy("lang"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for
    non-SQL-expressible ops → driver records a rows-only check)."""
    return {name: q.oracle for name, q in all_queries().items()
            if q.oracle is not None}
