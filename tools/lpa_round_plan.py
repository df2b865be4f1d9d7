"""Dump ONE LPA round's lazy update plan (checkpointing disabled) —
the committed gate truncates lineage per round, so the gate-level
explain only shows a checkpoint scan; this exposes the round body."""
import sys
sys.path.insert(0, ".")
from pyspark.sql import functions as F
from cdh_integrate_carbondata2_3_spark.session import get_spark
from cdh_integrate_carbondata2_3_spark.sources.registry import load_table
from cdh_integrate_carbondata2_3_spark.operators.graph import lpa_communities

out = sys.argv[1] if len(sys.argv) > 1 else "plans/r12/graph_lpa_communities_round_after.txt"
sf = "/root/testdata/sf0.1"
spark = get_spark("lpa_round_plan")
li = load_table(spark, sf, "lineitem")
it = (li.filter(F.col("l_orderkey") % 3 == 0)
      .select("l_orderkey", "l_partkey").distinct())
a, b = it.alias("a"), it.alias("b")
ed = (a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
             & (F.col("a.l_partkey") < F.col("b.l_partkey")))
      .select(F.col("a.l_partkey").alias("u"),
              F.col("b.l_partkey").alias("v")).distinct())
edges = ed.select(F.col("u").alias("src"), F.col("v").alias("dst")) \
    .unionAll(ed.select(F.col("v").alias("src"), F.col("u").alias("dst")))
labels = lpa_communities(edges, rounds=1, use_local_checkpoint=False)
with open(out, "w") as f:
    f.write(labels._sc._jvm.PythonSQLUtils.explainString(
        labels._jdf.queryExecution(), "formatted"))
print("wrote", out)
