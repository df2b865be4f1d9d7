"""Physical-plan shape assertions: the properties that make queries
scale (predicate pushdown to the parquet scan, column pruning,
broadcast of dimension tables, partial aggregation, top-k without a
full sort, whole-stage codegen) must be visible in `.explain` output —
a correct result from a bad plan is a regression at 100 TB even when
row counts match.

Mirrors what the reference guarantees structurally: pushed filters
(CarbonFilters.scala:75-250), projection pruning
(PushDownHelper.scala:27), broadcast SI joins (DMLStrategy.scala:
172-236), TakeOrderedAndProject (CarbonTakeOrderedAndProjectExec.scala:
29-86), metadata count(*) (CarbonCountStar.scala:44-108).
"""

from __future__ import annotations

import io
import re

import pytest
from pyspark.sql import functions as F

from cdh_integrate_carbondata2_3_spark.queries import all_queries

QUERIES = all_queries()


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
          .filter(F.col("l_shipdate") > "1998-03-15")
          .select("l_orderkey", "l_extendedprice"))
    plan = plan_of(df)
    assert "PushedFilters" in plan
    m = re.search(r"PushedFilters: \[(.*?)\]", plan)
    assert m and "l_shipdate" in m.group(1), plan


def test_column_pruning_reaches_scan(spark, sf_dir):
    df = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
          .groupBy("l_returnflag").agg(F.sum("l_quantity")))
    m = re.search(r"ReadSchema: (.*)", plan_of(df))
    assert m, "no ReadSchema in plan"
    schema = m.group(1)
    assert "l_returnflag" in schema and "l_quantity" in schema
    assert "l_extendedprice" not in schema and "l_partkey" not in schema


@pytest.mark.parametrize("name", [
    "q3_shipping_priority", "q5_local_supplier_volume",
    "q7_volume_shipping", "q10_returned_items",
])
def test_dimension_joins_are_broadcast(spark, sf_dir, name):
    plan = plan_of(QUERIES[name].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, f"{name} has no broadcast join"


def test_fact_fact_join_shuffles_not_broadcasts(spark, sf_dir):
    # lineitem x orders must NOT broadcast either fact side (it would
    # OOM at scale; the hint would silently pin it)
    plan = plan_of(QUERIES["q8_market_share"].fn(spark, sf_dir))
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin)", plan), plan


def test_partial_aggregation_before_shuffle(spark, sf_dir):
    plan = plan_of(QUERIES["q1_pricing_summary"].fn(spark, sf_dir))
    # two HashAggregates (partial + final) around one exchange
    assert len(re.findall(r"HashAggregate", plan)) >= 2
    assert "Exchange" in plan


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = plan_of(QUERIES["q3_shipping_priority"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, \
        "ORDER BY + LIMIT should not plan a global sort"


def test_whole_stage_codegen_covers_scan_filter_agg(spark, sf_dir):
    # AQE finalizes codegen stages only at execution; run, then inspect.
    # Codegen'd operators carry the `*(n)` prefix in simple-mode output.
    df = QUERIES["q6_forecast_revenue"].fn(spark, sf_dir)
    df.collect()
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple")
    spans = set(re.findall(r"\*\((\d+)\)", plan))
    assert spans, f"no WholeStageCodegen spans:\n{plan[:500]}"
    # scan-filter-project-partialAgg must fuse into ONE span
    assert re.search(r"\*\((\d+)\) HashAggregate.*partial_sum", plan)
    m_f = re.search(r"\*\((\d+)\) Filter", plan)
    m_a = re.search(r"\*\((\d+)\) HashAggregate\(keys=\[\], functions=\[partial", plan)
    assert m_f and m_a and m_f.group(1) == m_a.group(1), \
        "filter and partial aggregate are in different codegen stages"


def test_no_python_udf_in_relational_plans(spark, sf_dir):
    for name in ("q1_pricing_summary", "q5_local_supplier_volume",
                 "agg_rollup", "window_rank_customers",
                 "text_token_stats", "text_lang_heuristic"):
        plan = plan_of(QUERIES[name].fn(spark, sf_dir))
        assert "BatchEvalPython" not in plan, \
            f"{name} fell off the JVM into a row-at-a-time Python UDF"


def test_count_star_is_metadata_only(spark, tmp_path):
    from cdh_integrate_carbondata2_3_spark.sql import Engine
    eng = Engine(spark, str(tmp_path / "wh"))
    eng.sql("CREATE TABLE t (id INT)")
    eng.sql("INSERT INTO t SELECT * FROM VALUES (1),(2),(3) v(id)")
    df = eng.sql("SELECT COUNT(*) FROM t")
    # metadata fast path: the answer is a local one-row DataFrame with
    # no file scan in its plan
    assert "FileScan" not in plan_of(df)
    assert df.first()[0] == 3


def test_minhash_has_no_cartesian(spark, sf_dir):
    plan = plan_of(QUERIES["dedup_minhash_lsh"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan and \
           "BroadcastNestedLoopJoin" not in plan, \
        "LSH candidate generation must stay an equi-join on band keys"


def test_geo_list_filters_stay_jvm_side(spark, sf_dir):
    # polygon-list and polyline-buffer predicates are pure column
    # arithmetic: no Python UDF, single scan, codegen present
    for name in ("geo_polygon_list_filter", "geo_polyline_buffer"):
        plan = plan_of(QUERIES[name].fn(spark, sf_dir))
        assert "BatchEvalPython" not in plan, name
        # the predicate is a plain Filter over the scan — no join stage
        assert "Join" not in plan, name


def test_range_list_join_is_broadcast(spark, sf_dir):
    # range-list membership joins broadcast the tiny range side;
    # the point side must never be broadcast or cartesian-joined
    plan = plan_of(QUERIES["geo_polygon_join_range_list"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_ivf_probe_join_is_broadcast(spark, sf_dir):
    plan = plan_of(QUERIES["similarity_ann_ivf"].fn(spark, sf_dir))
    # the probed-lists join must broadcast the (tiny) probe side
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_ivf_argmin_is_partial_aggregate_not_window(spark):
    """The nearest-centroid argmin (ivf_assign / kmeans assign_to) must
    plan as a partial-then-final aggregate, not a Window: the partial
    phase collapses each map task's N×k corpus×centroid expansion to
    one row per id BEFORE the shuffle (a Window would shuffle all N×k
    scored rows — k× more exchange volume at scale)."""
    from cdh_integrate_carbondata2_3_spark.operators import similarity as S
    corpus = spark.range(40).selectExpr(
        "id", "array(cast(id as double), cast(id % 7 as double)) as e")
    cents = spark.createDataFrame(
        [(0, [0.0, 1.0]), (1, [10.0, 3.0])], "cid bigint, ce array<double>")
    plan = plan_of(S.ivf_assign(corpus, cents))
    assert "Window" not in plan
    assert "partial_min_by" in plan or "partial_min" in plan


def test_bm25_corpus_never_hash_shuffles(spark):
    """bm25_score's only aggregation is the single-row corpus stats
    (N, Σdl, per-term df), which broadcasts back onto the scored rows:
    the corpus itself must never cross a hash exchange — at 100 TB the
    whole rank is a scan + one tiny global agg, not a shuffle."""
    from cdh_integrate_carbondata2_3_spark.functions.text_rank import bm25_score
    docs = spark.range(50).selectExpr(
        "id as doc_id",
        "concat('word', cast(id % 5 as string), ' filler text') as text")
    plan = plan_of(bm25_score(docs, ["word1", "filler"]))
    assert plan.count("Exchange hashpartitioning") == 0, plan
    assert "BroadcastNestedLoopJoin" in plan  # stats row re-attach
    assert "Window" not in plan


def test_kmeans_assign_no_window_no_corpus_shuffle(spark):
    """kmeans_refine's assignment must plan MAP-ONLY (r12): the
    centroid array rides a broadcast 1-row frame and the argmin is an
    array_min over (d2, cid) structs evaluated per vector — no Window
    (which would shuffle all N×k scored rows), no per-id min_by
    aggregation (the r11 shape, which shuffled one (id, vec, cluster)
    row per vector), and no sort-merge/shuffled-hash join."""
    from cdh_integrate_carbondata2_3_spark.operators.similarity import (
        kmeans_refine)
    v = spark.range(40).selectExpr(
        "id", "array(cast(id as double), cast(id % 7 as double)) as e")
    seeds = spark.createDataFrame(
        [(0, [0.0, 1.0]), (1, [10.0, 3.0])], "cid bigint, ce array<double>")
    assign, _cent = kmeans_refine(v, seeds, iters=1)
    plan = plan_of(assign)
    assert "Window" not in plan
    assert "min_by" not in plan          # assignment shuffles nothing
    assert "array_min" in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 0, plan


def test_bpe_tokens_plan_is_single_scan_no_udf(spark, sf_dir):
    plan = plan_of(QUERIES["text_bpe_tokens"].fn(spark, sf_dir))
    assert "BatchEvalPython" not in plan
    # pure per-row projection: no shuffle, no join, one codegen span
    assert "Exchange" not in plan and "Join" not in plan


def test_ngram_jaccard_verify_uses_array_intersect(spark):
    """The Jaccard verify must intersect cached per-doc shingle arrays
    (narrow id->array joins), not re-join the exploded gram relation —
    the plan carries array_intersect and a bounded exchange count."""
    from cdh_integrate_carbondata2_3_spark.operators.dedup import (
        ngram_jaccard_near_dups)
    docs = spark.createDataFrame(
        [(i, "a b c d e f g h") for i in range(6)],
        "doc_id int, text string")
    plan = (ngram_jaccard_near_dups(docs)
            ._jdf.queryExecution().executedPlan().toString())
    assert "array_intersect" in plan
    assert plan.count("Exchange hashpartitioning") <= 8


def test_runtime_filter_join_caps_and_falls_back(spark, tmp_path):
    from cdh_integrate_carbondata2_3_spark.catalog.table import Table
    from cdh_integrate_carbondata2_3_spark.plans.runtime_filter import (
        dim_filtered_join)
    from pyspark.sql import functions as F

    t = Table.create(spark, str(tmp_path / "f"), "k bigint, v bigint",
                     {"sort_columns": ["k"], "sort_scope": "global_sort",
                      "global_sort_partitions": "4"})
    t.insert(spark.range(1000).select(F.col("id").alias("k"),
                                      (F.col("id") * 2).alias("v")))
    dim = spark.createDataFrame([(5, "a"), (700, "b")], "dk bigint, name string")
    got = dim_filtered_join(t, dim, [("k", "dk")]).collect()
    assert {(r["k"], r["name"]) for r in got} == {(5, "a"), (700, "b")}
    # over-cap dim: same answer, no error (pruning silently disabled)
    big_dim = spark.range(999).select(F.col("id").alias("dk"))
    assert dim_filtered_join(t, big_dim, [("k", "dk")],
                             max_keys=100).count() == 999
    # unsound join types refused
    try:
        dim_filtered_join(t, dim, [("k", "dk")], how="left")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_english_fts_predicates_stay_jvm_side(spark):
    """The english-analyzer phrase/fuzzy/range predicates compile to
    higher-order functions over the analyzed token array — no Python
    UDF may appear in the plan (the 'porter' analyzer is the one
    deliberate UDF opt-in)."""
    from cdh_integrate_carbondata2_3_spark.sql import _lucene_to_sql
    docs = spark.range(30).selectExpr(
        "id as doc_id", "concat('the slow filters run ', id) as text")
    for q in ('text:"slow filters"', "text:solw~1", "text:[sora TO sorz]",
              "text:Filters AND NOT text:the"):
        pred = _lucene_to_sql(q, english=True)
        plan = plan_of(docs.filter(pred))
        assert "BatchEvalPython" not in plan, q
        assert "ArrowEvalPython" not in plan, q


def test_join_mv_rewrite_scans_only_the_mv(spark, tmp_path):
    """A query answered from a star-join MV must read the MV's
    (pre-aggregated, tiny) segments ONLY — neither the fact's nor
    the dim's data files appear in the scan, and no join runs at
    query time. At 100 TB the rewrite turns a fact-scale
    shuffle-join-aggregate into a scan of the rollup."""
    from cdh_integrate_carbondata2_3_spark.catalog import Table
    from cdh_integrate_carbondata2_3_spark.mv import (
        AggSpec, MVManager, QuerySpec)
    fact = Table.create(spark, str(tmp_path / "factp"),
                        "id bigint, store_id bigint, qty double")
    fact.insert(spark.range(0, 500).selectExpr(
        "id", "id % 10 as store_id", "cast(id % 4 as double) as qty"))
    dim = Table.create(spark, str(tmp_path / "dimp"),
                       "s_id bigint, region string")
    dim.insert(spark.range(0, 10).selectExpr(
        "id as s_id", "case when id < 5 then 'east' else 'west' end as region"))
    mgr = MVManager(fact)
    mgr.create("pmv", ["region"], [AggSpec("sum", "qty")],
               joins=[(dim, "store_id", "s_id")])
    df, used = mgr.answer(QuerySpec(
        ["region"], {"total": AggSpec("sum", "qty")},
        joins=[(dim, "store_id", "s_id")]))
    assert used == "pmv"
    plan = plan_of(df)
    assert "factp/segment" not in plan and "dimp/segment" not in plan, plan
    assert "_meta/mvs/pmv" in plan, plan
    assert "Join" not in plan, plan     # rollup re-agg only, no join
