"""Connected components over a pair-edge set — the clustering step
that turns near-dup PAIRS (minhash/simhash/jaccard output) into dedup
GROUPS with one survivor per component.

Spark formulation: iterative min-label propagation. Each round every
node takes the min component label among itself and its neighbors;
convergence in O(diameter) rounds (near-dup graphs are
short-diameter: components are quasi-cliques, so 2-4 rounds in
practice). Per round: one shuffle for the neighbor-min groupBy and
one for the label join — both keyed on node id, no edge blow-up.
``localCheckpoint`` truncates the growing lineage each round (on a
real cluster use ``checkpoint`` with a DFS dir instead; flag below).

At 10⁹-edge scale the round count, not per-round cost, dominates;
the large-star/small-star optimization (Kiveris et al., "Connected
Components in MapReduce and Beyond") halves rounds by rewiring edges
toward the current minimum — the hook is the same loop shape, so the
propagation step can be swapped without changing callers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, src: str = "id_a",
                         dst: str = "id_b", *, max_iter: int = 30,
                         use_local_checkpoint: bool = True) -> DataFrame:
    """(node, comp) for every node in ``edges``; ``comp`` is the
    component's minimum node id. Edges are undirected; self-loops and
    duplicates are fine."""
    sym = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
           .union(edges.select(F.col(dst).alias("u"),
                               F.col(src).alias("v")))
           .distinct())
    if use_local_checkpoint:
        sym = sym.localCheckpoint()
    labels = (sym.select(F.col("u").alias("node")).distinct()
              .withColumn("comp", F.col("node")))
    for _ in range(max_iter):
        nbr_min = (sym.join(labels.withColumnRenamed("node", "v")
                            .withColumnRenamed("comp", "vcomp"), "v")
                   .groupBy("u").agg(F.min("vcomp").alias("nmin"))
                   .withColumnRenamed("u", "node"))
        new_labels = (labels.join(nbr_min, "node", "left")
                      .select("node",
                              F.least(F.col("comp"),
                                      F.coalesce(F.col("nmin"),
                                                 F.col("comp")))
                              .alias("comp")))
        if use_local_checkpoint:
            new_labels = new_labels.localCheckpoint()
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "node")
                   .filter(F.col("n.comp") != F.col("o.comp")).count())
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(f"did not converge in {max_iter} rounds")


def dedup_survivors(edges: DataFrame, all_ids: DataFrame,
                    id_col: str = "doc_id", src: str = "id_a",
                    dst: str = "id_b") -> DataFrame:
    """One row per surviving document: the min-id member of each
    near-dup component, plus every document with no near-dup edge."""
    comps = connected_components(edges, src, dst)
    in_graph = comps.select(F.col("node").alias(id_col),
                            F.col("comp"))
    survivors_in_graph = (in_graph.filter(F.col(id_col) == F.col("comp"))
                          .select(id_col))
    loners = (all_ids.select(id_col)
              .join(in_graph.select(id_col), id_col, "left_anti"))
    return survivors_in_graph.unionByName(loners)
