"""Runtime join-filter pruning — the dynamic-partition-pruning
analogue for manifest-backed tables.

Spark's own DPP only fires on hive-partition columns of catalog
tables. Our manifest keeps per-file min/max for EVERY column, so a
selective dimension filter can prune fact FILES, not just partitions:
evaluate the dim side first, collect its (small, capped) join-key set,
and push it into the fact scan as an IN predicate — the manifest
min/max + SI/bloom machinery then skips whole files before the join
shuffle reads them (reference parity: CarbonDataSourceScan's pushed
runtime filters; same motivation as Spark's InSubqueryExec DPP).

Scale shape: the dim side is by construction the small side (it's
being broadcast into the join anyway); the key set is capped at
``max_keys`` — beyond the cap pruning degrades to the plain join, it
never errors and never collects an unbounded set to the driver.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_MAX_KEYS = 10_000


def dim_filtered_join(fact, dim: DataFrame, on: Sequence[tuple[str, str]],
                      how: str = "inner",
                      max_keys: int = DEFAULT_MAX_KEYS) -> DataFrame:
    """Join ``fact`` (a catalog Table) to an already-filtered ``dim``
    DataFrame on [(fact_col, dim_col), ...] pairs, pruning the fact
    scan with the dim's key values first.

    Only sound for join types that cannot resurrect fact rows without
    a dim partner (inner / left_semi): pruned fact files can only
    contain rows whose keys aren't in the dim set."""
    if how not in ("inner", "left_semi", "semi", "leftsemi"):
        raise ValueError(f"runtime pruning unsound for how={how!r}")
    fact_col, dim_col = on[0]
    keys = [r[0] for r in
            dim.select(dim_col).distinct().limit(max_keys + 1).collect()]
    if len(keys) > max_keys:
        scan = fact.read()          # cap exceeded → no pruning, plain join
    else:
        # IN predicate → manifest min/max + SI/bloom file skipping;
        # Spark still re-evaluates the predicate exactly on read
        scan = fact.read(predicates=[(fact_col, "in", keys)])
    cond = [scan[fc] == dim[dc] for fc, dc in on]
    return scan.join(F.broadcast(dim), cond, how)
