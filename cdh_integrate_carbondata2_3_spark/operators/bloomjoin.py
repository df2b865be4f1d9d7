"""Bloom-prefiltered semi/anti join — membership dedup against a
reference corpus at 100 TB.

The scale problem: "drop every candidate document whose fingerprint
appears in a reference set" is a semi join, and a shuffled semi join
moves the ENTIRE candidate side over the network even though almost
none of it matches. Spark's own runtime bloom-filter join
(`spark.sql.optimizer.runtime.bloomFilter.enabled`) injects the same
trick below a selective build side; this operator is the explicit
form for when the planner can't see the selectivity (reference
analogue: the bloom index sidecars of `catalog/index.py`, applied to
a join instead of a scan).

Shape:
 1. the reference side computes k=2 bit positions per key JVM-side
    (`xxhash64` with two seeds — whole-stage codegen, no Python);
 2. one `mapInPandas` pass ORs the positions into one m-bit numpy
    bitset per PARTITION (the partition's whole batch stream folds
    into a single `m/8`-byte row — unbuffered `np.bitwise_or.at`, no
    Python loop over rows);
 3. the ≤`num_partitions` bitsets (metadata-scale: 1 MiB each at the
    default m=2²³) collect to the driver, OR together, broadcast;
 4. the candidate side computes its positions JVM-side and a
    pandas_udf tests both bits with numpy indexing — vectorized, no
    per-row Python;
 5. bloom positives (the only rows that shuffle) go through an exact
    semi join refine, so the RESULT is exactly the semi join — the
    bloom only prunes shuffle volume. False-negative freedom is the
    bloom guarantee (property-tested in tests/test_hardening.py).

Cost model: only the `fpr + true_match` fraction of the candidate
side ships into the shuffle; the reference side ships ≤32 × m/8
bytes to the driver. Size the bitset with `m_for` — m ≈ 10×n_ref
bits gives ~1% fpr for the k=2 scheme (10⁹ reference keys → ~1.2 GB,
executor-memory scale). Scan counts: semi reads the candidate side
once; anti reads it twice (the bloom-negative keeps and the
bloom-positive refine are separate branches of the same narrow scan —
at candidate sizes where a re-scan hurts more than materialization,
persist the input before calling).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SEED1 = 0x9E3779B9
_SEED2 = 0x85EBCA6B


def m_for(n_ref: int, fpr: float = 0.01) -> int:
    """Bits for a k=2 bloom holding ``n_ref`` keys at ``fpr``:
    fpr ≈ (1 - e^(-2n/m))² ⇒ m = -2n / ln(1 - sqrt(fpr)), rounded up
    to a byte multiple (min 1 KiB so tiny refs don't degenerate)."""
    m = int(-2.0 * max(n_ref, 1) / math.log(1.0 - math.sqrt(fpr)))
    return max((m + 7) // 8 * 8, 8192)


def _positions(key: Column, m_bits: int) -> tuple[Column, Column]:
    # xxhash64 is JVM-side and seed-stable across executors/retries.
    return (F.pmod(F.xxhash64(key, F.lit(_SEED1)), F.lit(m_bits)),
            F.pmod(F.xxhash64(key, F.lit(_SEED2)), F.lit(m_bits)))


def _set_bits(bits: np.ndarray, pos: np.ndarray) -> None:
    """OR bit positions into a uint8 bitset in place (unbuffered, so
    duplicate positions in one batch still all land)."""
    np.bitwise_or.at(bits, pos >> 3,
                     np.uint8(1) << (pos & 7).astype(np.uint8))


def _test_bits(bits: np.ndarray, p1: np.ndarray,
               p2: np.ndarray) -> np.ndarray:
    """True where BOTH positions are set — the k=2 may-contain."""
    return ((((bits[p1 >> 3] >> (p1 & 7).astype(np.uint8)) & 1)
             & ((bits[p2 >> 3] >> (p2 & 7).astype(np.uint8)) & 1))
            .astype(bool))


_MAX_BUILD_PARTS = 32


def _build_bloom(ref: DataFrame, key: Column, m_bits: int) -> bytes:
    """One bitset per partition via mapInPandas (the iterator spans the
    whole partition → exactly one m/8-byte output row each), OR-folded
    on the driver. The position stream is coalesced (narrow, no
    shuffle) to ≤32 partitions first, so driver traffic is bounded at
    32 × m/8 bytes no matter how many files the reference side scans —
    at the default m=2²³ that is ≤32 MiB for a billion-key reference."""
    p1, p2 = _positions(key, m_bits)
    pos = ref.select(p1.alias("p1"), p2.alias("p2"))
    if pos.rdd.getNumPartitions() > _MAX_BUILD_PARTS:
        pos = pos.coalesce(_MAX_BUILD_PARTS)

    def fold(batches):
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        seen = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            seen = True
            p = np.concatenate([pdf["p1"].to_numpy(np.int64),
                                pdf["p2"].to_numpy(np.int64)])
            _set_bits(bits, p)
        if seen:
            yield pd.DataFrame({"bits": [bits.tobytes()]})

    parts = pos.mapInPandas(fold, "bits binary").collect()
    merged = np.zeros(m_bits // 8, dtype=np.uint8)
    for row in parts:
        merged |= np.frombuffer(row.bits, dtype=np.uint8)
    return merged.tobytes()


def bloom_semi_join(candidates: DataFrame, reference: DataFrame,
                    on: str, how: str = "semi",
                    m_bits: int | None = None, n_ref_hint: int = 1 << 20,
                    refine: bool = True,
                    auto_plain_below: int = 8192) -> DataFrame:
    """Semi ('keep matches') or anti ('keep non-matches') join of
    ``candidates`` against ``reference`` on column ``on``, with a bloom
    prefilter so only bloom-positive candidate rows reach the exact
    join. Result is EXACTLY the semi/anti join (``refine=False`` skips
    the exact pass and returns the bloom superset/complement — only for
    callers that tolerate the fpr).

    DETERMINISM REQUIREMENT (anti only): the anti path evaluates the
    ``candidates`` plan twice (the bloom-negative keep branch and the
    bloom-positive refine branch). If that plan is non-deterministic —
    sampling, an un-ordered ``limit``, ``rand()``/``now()`` — a row can
    land in both or neither branch. Persist/checkpoint such inputs
    before calling, or use ``how='semi'`` (single-scan). Deterministic
    inputs (file scans + deterministic expressions) are safe.

    Broadcast lifetime: the bitset ships as a SparkContext broadcast
    that must outlive every action on the returned DataFrame. It is
    exposed as ``result._bloom_broadcast``; long-lived sessions issuing
    many bloom joins should ``.destroy()`` it after the result is
    materialized (otherwise it is reclaimed only when the DataFrame
    and its UDF closure are garbage-collected). On the auto-plain
    path (no bloom built) the attribute is set to ``None`` — cleanup
    code should ``getattr(result, '_bloom_broadcast', None)`` and
    skip when absent/None (ADVICE r11)."""
    if how not in ("semi", "anti"):
        raise ValueError(f"bloom_semi_join supports semi/anti, got {how!r}")
    ctype = candidates.schema[on].dataType
    rtype = reference.schema[on].dataType
    if ctype != rtype:
        # a plain join would implicitly cast, but xxhash64 hashes each
        # side's NATIVE encoding — e.g. bigint 3 and string '3' join
        # equal yet hash differently, so the bloom would miss true
        # matches and the 'exactly the semi/anti join' contract breaks
        raise ValueError(
            f"key type mismatch on {on!r}: candidates {ctype.simpleString()}"
            f" vs reference {rtype.simpleString()} — cast one side first")
    if m_bits is None and n_ref_hint <= auto_plain_below:
        # Below ~10⁴ reference keys the bloom cannot repay its build
        # job + bitset broadcast: the reference broadcasts whole, so
        # the exact broadcast semi/anti join already ships zero
        # candidate rows through a shuffle — the bloom would only add
        # a second candidate branch (anti) and a UDF pass. This is
        # the same size gate Spark's own runtime bloom-filter join
        # applies to its build side. Result is identical (it IS the
        # exact join, even under refine=False). Passing m_bits
        # explicitly forces the bloom path regardless of the hint.
        out = candidates.join(F.broadcast(reference.select(on)), on,
                              f"left_{how}")
        out._bloom_broadcast = None  # no bloom on this path (docstring)
        return out
    m_bits = m_bits or m_for(n_ref_hint)
    if m_bits % 8:
        raise ValueError("m_bits must be a multiple of 8")
    bloom = _build_bloom(reference, F.col(on), m_bits)
    # ship the bitset as a broadcast variable — once per executor; a
    # closure capture would ride the serialized task for every stage
    # and hit the 2 GB task-binary ceiling at ~10⁹ reference keys
    bc = candidates.sparkSession.sparkContext.broadcast(bloom)

    @F.pandas_udf("boolean")
    def may_contain(p1: pd.Series, p2: pd.Series) -> pd.Series:
        bits = np.frombuffer(bc.value, dtype=np.uint8)
        return pd.Series(_test_bits(bits, p1.to_numpy(np.int64),
                                    p2.to_numpy(np.int64)))

    p1, p2 = _positions(F.col(on), m_bits)
    flagged = candidates.withColumn("__bloom_hit__", may_contain(p1, p2))
    pos = flagged.filter(F.col("__bloom_hit__")).drop("__bloom_hit__")
    neg = flagged.filter(~F.col("__bloom_hit__")).drop("__bloom_hit__")
    if not refine:
        out = pos if how == "semi" else neg
    elif how == "semi":
        # bloom negatives are guaranteed non-matches — only positives
        # need the exact semi join
        out = pos.join(reference.select(on), on, "left_semi")
    else:
        # anti: negatives are guaranteed non-matches (keep them all);
        # positives may be fpr — exact anti join only on those
        out = neg.unionByName(
            pos.join(reference.select(on), on, "left_anti"))
    out._bloom_broadcast = bc  # caller-visible handle (see docstring)
    return out
