"""Randomized DML-equivalence fuzz: a seeded sequence of INSERT /
UPDATE / DELETE / COMPACT ops runs against the engine (CoW and
merge-on-read variants) and, in lockstep, against a DuckDB twin
executing the IDENTICAL SQL statements. After every op the full table
contents must match row-for-row — any divergence in the touched-file
rewrite, the delta sidecars, horizontal compaction, or the optimistic
commit path surfaces with the op index and statement printed."""

from __future__ import annotations

import random

import duckdb
import pytest

from cdh_integrate_carbondata2_3_spark.sql import Engine

_SEED = 0xDECAF
_N_OPS = 24


def _pred(rng: random.Random) -> str:
    kind = rng.randrange(4)
    if kind == 0:
        return f"k % {rng.randrange(3, 11)} = {rng.randrange(0, 3)}"
    if kind == 1:
        lo = rng.randrange(0, 900)
        return f"k BETWEEN {lo} AND {lo + rng.randrange(10, 300)}"
    if kind == 2:
        return f"v > {rng.randrange(0, 50)}.5"
    return f"s = '{rng.choice(['x', 'y', 'z'])}'"


def _snapshot_engine(eng) -> list[str]:
    return sorted(f"{r['k']}|{r['v']}|{r['s']}"
                  for r in eng.sql("SELECT k, v, s FROM dz").collect())


def _snapshot_duck(con) -> list[str]:
    return sorted(f"{k}|{v}|{s}"
                  for k, v, s in con.execute(
                      "SELECT k, v, s FROM dz").fetchall())


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_random_dml_sequence_matches_duckdb_twin(spark, tmp_path, mode):
    eng = Engine(spark, str(tmp_path / f"wh_{mode}"))
    props = (" TBLPROPERTIES('iud.mode'='mor')" if mode == "mor" else "")
    eng.sql(f"CREATE TABLE dz (k BIGINT, v DOUBLE, s STRING){props}")
    con = duckdb.connect()
    con.execute("CREATE TABLE dz (k BIGINT, v DOUBLE, s STRING)")

    rng = random.Random(_SEED)
    next_k = [0]

    def insert_batch() -> str:
        n = rng.randrange(50, 200)
        rows = [(next_k[0] + i, float(rng.randrange(0, 100)),
                 rng.choice(["x", "y", "z"])) for i in range(n)]
        next_k[0] += n
        vals = ", ".join(f"({k}, CAST({v} AS DOUBLE), '{s}')"
                         for k, v, s in rows)
        return (f"INSERT INTO dz SELECT * FROM VALUES {vals} t(k, v, s)",
                f"INSERT INTO dz VALUES {vals}")

    # seed data
    e_sql, d_sql = insert_batch()
    eng.sql(e_sql)
    con.execute(d_sql)

    for i in range(_N_OPS):
        kind = rng.randrange(6)
        if kind <= 1:
            e_sql, d_sql = insert_batch()
        elif kind <= 3:
            p = _pred(rng)
            e_sql = d_sql = f"DELETE FROM dz WHERE {p}"
        elif kind == 4:
            p = _pred(rng)
            delta = rng.randrange(1, 9)
            e_sql = f"UPDATE dz SET (v) = (v + {delta}.25) WHERE {p}"
            d_sql = f"UPDATE dz SET v = v + {delta}.25 WHERE {p}"
        else:
            e_sql = f"ALTER TABLE dz COMPACT '{rng.choice(['minor', 'major'])}'"
            d_sql = None              # physical reorganization only
        eng.sql(e_sql)
        if d_sql:
            con.execute(d_sql)
        got, want = _snapshot_engine(eng), _snapshot_duck(con)
        assert got == want, (
            f"seed={_SEED} op #{i} diverged after: {e_sql!r} "
            f"(engine {len(got)} rows, twin {len(want)} rows)")
    assert len(_snapshot_engine(eng)) > 0
