"""Gopher-style repetition quality signals, computed WITHOUT a shuffle.

The classic filters (Rae et al. 2021, "Scaling Language Models" §A1.1:
duplicate-n-gram and top-n-gram fractions) are usually written as
explode → groupBy(doc, gram) → max(count) — a full shuffle of every
token in the corpus. At 100 TB that shuffle dominates the job. These
helpers instead compute each document's statistics inside a single
row: sort the token array, then a sequential fold (``F.aggregate``)
finds the longest equal-run — the most frequent token's count — in
pure JVM codegen. Zero shuffles, perfectly partition-parallel, and
the plan is a bare scan+project.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["tokens", "bigrams", "max_run_count", "distinct_count"]


def tokens(text: Column) -> Column:
    """Whitespace tokens of a document."""
    return F.split(F.trim(text), " +")


def bigrams(toks: Column) -> Column:
    """Adjacent word pairs as 'a b' strings (empty array if < 2
    tokens)."""
    n = F.size(toks)
    return F.zip_with(F.slice(toks, 1, n - 1),
                      F.slice(toks, 2, n - 1),
                      lambda a, b: F.concat(a, F.lit(" "), b))


def max_run_count(arr: Column) -> Column:
    """Count of the most frequent element: sort, then fold over
    positions comparing neighbours — run lengths of equal elements,
    keep the best. All inside one row; no explode, no shuffle."""
    s = F.array_sort(arr)
    n = F.size(s)
    acc0 = F.struct(F.lit(1).alias("run"), F.lit(1).alias("best"))
    folded = F.aggregate(
        F.sequence(F.lit(2), n),                       # 1-based positions 2..n
        acc0,
        lambda acc, i: F.struct(
            F.when(F.element_at(s, i) == F.element_at(s, i - 1),
                   acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(F.element_at(s, i) == F.element_at(s, i - 1),
                       acc["run"] + 1).otherwise(F.lit(1))).alias("best")))
    # sequence(2, n) flips to a DESCENDING [2,1] when n < 2 and
    # element_at(s, 0) is an ANSI error — short-circuit small arrays
    return F.when(n >= 2, folded["best"]).otherwise(F.least(n, F.lit(1)))


def distinct_count(arr: Column) -> Column:
    return F.size(F.array_distinct(arr))
