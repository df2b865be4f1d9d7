"""Count-Min sketch (Cormode & Muthukrishnan 2005) as a MERGEABLE
DataFrame-native frequency sketch — the frequency-estimation sibling
of the HLL++ distinct rollup (`agg_hll_mergeable_rollup`) and the GK
quantile contracts (`agg_approx_sketch_bounds`).

Representation: a sketch is a sparse cell frame
``(group_cols..., row, col, c)`` — depth rows of hash functions ×
width columns, absent cells are zero. Everything is built-in JVM
expressions (``xxhash64(item, row) % width``) so sketches build
map-side-combined in ONE groupBy, MERGE by plain cell addition
(associative + commutative — roll partial sketches up any
aggregation tree, exactly how a 1000-executor cluster folds
per-partition state), and answer point queries with a cell join +
``min`` over rows.

Guarantees (classic CMS): estimates NEVER undercount
(``est >= true`` deterministically — every occurrence lands in every
row's counted cell), and overcount by at most ``eps * N`` with
probability ``1 - delta`` where ``eps = e / width``,
``delta = e^-depth``, ``N`` the group's total item count.

Pipeline role at 100 TB: fixed-size frequency state where exact
per-item counts don't fit — hot-token tracking for the ssjoin guard
tier, per-shard n-gram frequency priors, approximate join-key skew
detection — with the one-sided error that makes "is this item above
threshold" filters safe (no false negatives).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cms_build(df: DataFrame, item_col: str,
              group_cols: list[str] | None = None, *,
              width: int = 2048, depth: int = 4,
              weight_col: str | None = None) -> DataFrame:
    """One CMS per group over ``item_col`` occurrences (optionally
    ``weight_col``-weighted): sparse cell frame
    (group_cols..., row, col, c). ONE hash aggregation — map-side
    partial sums make the shuffle at most groups × depth × width
    cells regardless of corpus size."""
    group_cols = list(group_cols or [])
    w = (F.col(weight_col).cast("long") if weight_col
         else F.lit(1).cast("long"))
    rows = F.explode(F.array(*[F.lit(i) for i in range(depth)]))
    out = (df.select(*group_cols, F.col(item_col).alias("__i"),
                     w.alias("__w"))
           .withColumn("row", rows)
           .withColumn("col", F.pmod(F.xxhash64(F.col("__i"),
                                                F.col("row")),
                                     F.lit(width)).cast("int"))
           .groupBy(*group_cols, "row", "col")
           .agg(F.sum("__w").alias("c")))
    # Self-describing sketch: width/depth ride the `col` field's
    # schema metadata (driver-side only, zero runtime cost; survives
    # groupBy/select because the attribute is reused) so downstream
    # binary ops can refuse to combine incompatible sketches.
    return out.withMetadata("col", {"cms_width": width,
                                    "cms_depth": depth})


def cms_merge(cells: DataFrame,
              to_group_cols: list[str]) -> DataFrame:
    """Merge sketches down to a coarser grouping by cell addition —
    the mergeability that lets partial sketches roll up any
    aggregation tree (executor → node → cluster)."""
    meta = _cms_meta(cells)
    out = (cells.groupBy(*to_group_cols, "row", "col")
           .agg(F.sum("c").alias("c")))
    return out.withMetadata("col", meta) if meta else out


def _cms_meta(cells: DataFrame) -> dict:
    """width/depth metadata a cms_build frame carries on `col`
    (empty dict for hand-built cell frames)."""
    for f in cells.schema.fields:
        if f.name == "col":
            m = f.metadata or {}
            return {k: m[k] for k in ("cms_width", "cms_depth")
                    if k in m}
    return {}


def cms_estimate(cells: DataFrame, probes: DataFrame, item_col: str,
                 group_cols: list[str] | None = None, *,
                 width: int | None = None,
                 depth: int | None = None) -> DataFrame:
    """Point-query estimates for every (group, probe item):
    min over the depth rows of the item's cells (absent cell = 0 —
    only reachable when the item never occurred). ``probes`` carries
    ``group_cols + [item_col]``; the cell join is sketch-keyed and
    broadcastable (the sketch is fixed-size).

    Probes must hash with the SAME width/depth the sketch was built
    with — a mismatch silently breaks the no-undercount guarantee
    (probe cells stop colliding with build cells). cms_build frames
    self-describe via schema metadata; width/depth default to None
    (ADVICE r10: a non-None default made "explicitly passed the
    default" indistinguishable from "omitted") so ANY explicitly
    passed value is checked against the sketch metadata and a
    conflict raises. Omitted values resolve metadata → cms_build's
    defaults (2048/4) for hand-built cell frames."""
    meta = _cms_meta(cells)
    for key, arg in (("cms_width", width), ("cms_depth", depth)):
        known = meta.get(key)
        if known is not None and arg is not None and known != arg:
            raise ValueError(
                f"cms_estimate: {key}={arg} passed but the sketch "
                f"was built with {known}")
    width = int(meta.get("cms_width", width if width is not None
                         else 2048))
    depth = int(meta.get("cms_depth", depth if depth is not None
                         else 4))
    group_cols = list(group_cols or [])
    rows = F.explode(F.array(*[F.lit(i) for i in range(depth)]))
    pr = (probes.select(*group_cols, F.col(item_col).alias("__i"))
          .withColumn("row", rows)
          .withColumn("col", F.pmod(F.xxhash64(F.col("__i"),
                                               F.col("row")),
                                    F.lit(width)).cast("int")))
    return (pr.join(cells, group_cols + ["row", "col"], "left")
            .groupBy(*group_cols, "__i")
            .agg(F.min(F.coalesce(F.col("c"), F.lit(0)))
                 .alias("est"))
            .withColumnRenamed("__i", item_col))


def cms_eps(width: int) -> float:
    """The additive error factor: overcount <= eps * N w.h.p."""
    return math.e / width


def cms_join_size(cells_a: DataFrame, cells_b: DataFrame, *,
                  depth: int | None = None,
                  width: int | None = None) -> DataFrame:
    """Equi-join SIZE estimate from two CMS built on the join key
    (same width/depth/seeds): |A ⋈ B| = Σ_k f_A(k)·f_B(k), estimated
    as min over rows of the per-row cell inner product — the classic
    CMS second act (Cormode & Muthukrishnan §4.2). NEVER
    undercounts (hash collisions only ever add cross terms) and
    overcounts by ≤ eps·N_A·N_B w.h.p. — exactly the one-sided
    shape a join planner wants for "will this key explode"
    decisions at 100 TB, from two fixed-size sketches and ZERO scans
    of either table. Returns a one-row frame ``(est)``; the compute
    is a cell-keyed join of two sketch frames (at most depth × width
    rows each).

    Both sketches must share width AND depth — different moduli stop
    (row, col) cells from colliding and the no-undercount guarantee
    silently dies. cms_build frames self-describe (schema metadata),
    so mismatched builds are rejected here; hand-built frames can
    pass ``width=``/``depth=`` and are checked against any metadata
    present."""
    ma, mb = _cms_meta(cells_a), _cms_meta(cells_b)
    for key, arg in (("cms_width", width), ("cms_depth", depth)):
        va, vb = ma.get(key), mb.get(key)
        if va is not None and vb is not None and va != vb:
            raise ValueError(
                f"cms_join_size: sketches disagree on {key} "
                f"({va} vs {vb}) — the inner-product estimate is "
                "only valid for identically-parameterized sketches")
        known = va if va is not None else vb
        if known is not None and arg is not None and known != arg:
            raise ValueError(
                f"cms_join_size: {key}={arg} passed but sketches "
                f"were built with {known}")
    if ma.get("cms_depth") is not None:
        depth = int(ma["cms_depth"])
    elif mb.get("cms_depth") is not None:
        depth = int(mb["cms_depth"])
    elif depth is None:
        depth = 4
    a = cells_a.select("row", "col", F.col("c").alias("ca"))
    b = cells_b.select("row", "col", F.col("c").alias("cb"))
    per_row = (a.join(b, ["row", "col"])
               .groupBy("row")
               .agg(F.sum(F.col("ca") * F.col("cb")).alias("ip")))
    # a row with NO overlapping cells has inner product 0 — include
    # it (true join size is then provably 0-bounded by that row)
    all_rows = cells_a.sparkSession.range(depth) \
        .select(F.col("id").cast("int").alias("row"))
    return (all_rows.join(per_row, "row", "left")
            .agg(F.min(F.coalesce(F.col("ip"), F.lit(0)))
                 .alias("est")))
