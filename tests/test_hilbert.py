"""Hilbert-curve clustering (catalog/table.py hilbert_index_col +
sort_scope='hilbert'): exactness vs a serial Skilling reference,
bijectivity, the unit-step adjacency property that makes Hilbert
locality strictly better than Z-order, and end-to-end file pruning."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cdh_integrate_carbondata2_3_spark.catalog.table import (
    Table, hilbert_index_col)


def _hilbert_ref(coords, bits):
    X = list(coords)
    n = len(X)
    q = 1 << (bits - 1)
    while q > 1:
        p = q - 1
        for i in range(n):
            if X[i] & q:
                X[0] ^= p
            else:
                t = (X[0] ^ X[i]) & p
                X[0] ^= t
                X[i] ^= t
        q >>= 1
    for i in range(1, n):
        X[i] ^= X[i - 1]
    t = 0
    q = 1 << (bits - 1)
    while q > 1:
        if X[n - 1] & q:
            t ^= q - 1
        q >>= 1
    X = [x ^ t for x in X]
    h = 0
    for j in range(bits - 1, -1, -1):
        for i in range(n):
            h = (h << 1) | ((X[i] >> j) & 1)
    return h


@pytest.mark.parametrize("bits,dims", [(3, 2), (2, 3)])
def test_matches_serial_reference_and_bijective(spark, bits, dims):
    side = 1 << bits
    grids = [[c] for c in range(side)]
    for _ in range(dims - 1):
        grids = [g + [c] for g in grids for c in range(side)]
    cols = [f"x{i}" for i in range(dims)]
    df = spark.createDataFrame([tuple(g) for g in grids],
                               ", ".join(f"{c} int" for c in cols))
    out = hilbert_index_col(df, cols, bits)
    got = {tuple(r[c] for c in cols): r["__h__"]
           for r in out.collect()}
    for g in grids:
        assert got[tuple(g)] == _hilbert_ref(g, bits), g
    # bijection onto [0, side^dims)
    assert sorted(got.values()) == list(range(side ** dims))


def test_curve_adjacency_unit_steps(spark):
    """Consecutive Hilbert indices must be GRID NEIGHBORS (Manhattan
    distance 1) — the locality property Z-order lacks."""
    bits = 3
    side = 1 << bits
    pts = [(x, y) for x in range(side) for y in range(side)]
    df = spark.createDataFrame(pts, "x0 int, x1 int")
    rows = hilbert_index_col(df, ["x0", "x1"], bits).collect()
    by_h = {r["__h__"]: (r["x0"], r["x1"]) for r in rows}
    for h in range(side * side - 1):
        (a, b), (c, d) = by_h[h], by_h[h + 1]
        assert abs(a - c) + abs(b - d) == 1, (h, by_h[h], by_h[h + 1])


def test_hilbert_load_sort_prunes_files(spark, tmp_path, sf_dir):
    t = Table.create(spark, os.path.join(str(tmp_path), "t"),
                     "o_orderkey bigint, o_custkey bigint, "
                     "o_totalprice double",
                     {"sort_columns": ["o_custkey", "o_totalprice"],
                      "sort_scope": "hilbert",
                      "global_sort_partitions": "12"})
    t.insert(spark.read.parquet(f"{sf_dir}/orders.parquet")
             .select("o_orderkey", "o_custkey",
                     F.col("o_totalprice").cast("double")))
    total = sum(len(v) for v in t.scan_files().values())
    pruned = sum(len(v) for v in t.scan_files(
        [("o_custkey", "<", 50), ("o_totalprice", "<", 100000.0)]
    ).values())
    assert pruned < total, "hilbert clustering produced no skipping"
    # pruned read returns exactly the plain filtered result
    got = (t.read([("o_custkey", "<", 50),
                   ("o_totalprice", "<", 100000.0)])
           .filter((F.col("o_custkey") < 50)
                   & (F.col("o_totalprice") < 100000.0)).count())
    want = (spark.read.parquet(f"{sf_dir}/orders.parquet")
            .filter((F.col("o_custkey") < 50)
                    & (F.col("o_totalprice") < 100000.0)).count())
    assert got == want


def test_wide_keys_use_long_and_over_63_bits_raise(spark):
    """ADVICE r9: bits*dims > 31 used to wrap the int32 interleave
    accumulator and scramble the cluster order. The index is now a
    LONG (pinned against the serial reference past 31 bits) and
    widths past 63 raise instead of wrapping."""
    bits, dims = 16, 2            # 32 index bits: wraps under int32
    coords = [(1 << 15, (1 << 15) + 3), (40000, 1), (65535, 65535)]
    df = spark.createDataFrame(coords, "x0 int, x1 int")
    out = hilbert_index_col(df, ["x0", "x1"], bits)
    assert dict(out.dtypes)["__h__"] == "bigint"
    got = {(r["x0"], r["x1"]): r["__h__"]
           for r in out.select("x0", "x1", "__h__").collect()}
    for c in coords:
        assert got[c] == _hilbert_ref(list(c), bits)
        assert got[c] >= 0
    with pytest.raises(ValueError, match="63"):
        hilbert_index_col(df, ["x0", "x1"], 32)


def test_sort_scope_constant_covers_cluster_scopes(tmp_path, spark):
    """ADVICE r9: SORT_SCOPES must list every scope _apply_load_sort
    dispatches (zorder/hilbert were missing), and unknown scopes must
    raise instead of silently loading unsorted."""
    from cdh_integrate_carbondata2_3_spark.catalog.table import (
        SORT_SCOPES)
    assert "zorder" in SORT_SCOPES and "hilbert" in SORT_SCOPES
    t = Table.create(spark, str(tmp_path / "badscope"),
                     "a int, b int",
                     {"sort_scope": "bogus", "sort_columns": ["a"]})
    with pytest.raises(ValueError, match="bogus"):
        t.insert(spark.createDataFrame([(1, 2)], "a int, b int"))

def test_lookup_path_equals_column_cascade(spark):
    """r12: the literal-lookup fast path must produce the identical
    __h__ as the column cascade on the same coordinates (both are the
    same Skilling transform; lookup precomputes it per cell)."""
    bits, dims = 4, 3          # 4096 cells — lookup-eligible
    side = 1 << bits
    pts = [(x, y, z) for x in range(side)
           for y in range(0, side, 3) for z in range(0, side, 5)]
    df = spark.createDataFrame(pts, "x0 int, x1 int, x2 int")
    cols = ["x0", "x1", "x2"]
    a = {tuple(r[c] for c in cols): r["__h__"]
         for r in hilbert_index_col(df, cols, bits, lookup=True).collect()}
    b = {tuple(r[c] for c in cols): r["__h__"]
         for r in hilbert_index_col(df, cols, bits, lookup=False).collect()}
    assert a == b
    for p, h in a.items():
        assert h == _hilbert_ref(list(p), bits), p
