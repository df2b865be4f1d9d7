"""Engine-vs-plain-Spark baseline comparison (BASELINE.md target:
headline queries within 2× of plain `spark.read.parquet` + Spark SQL
on the same data).

For every headline query that has a SQL oracle, run BOTH:
  (a) the engine's DataFrame implementation, and
  (b) the oracle SQL executed by PLAIN Spark over parquet temp views
    (not DuckDB — this isolates our engine overhead on the same
    executor), skipping oracles that use DuckDB-only syntax.

Every row WITHOUT a ratio carries a named `no_ratio_reason` (VERDICT
r10 next-round 1: the bare `except Exception` made a broken twin
indistinguishable from a dialect gap). Every row WITH a ratio is
hash-verified first: the engine's and the plain side's collected
results must canonicalize equal, else the ratio is nulled and the row
flagged `twin_mismatch` — so the baseline can never time a different
computation than the engine's (VERDICT r10 next-round 3; guards the
unrolled CC twin at whatever sf the bench runs).

Prints one JSON line: per-query engine/plain seconds + ratio.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from cdh_integrate_carbondata2_3_spark.queries import all_queries  # noqa: E402
from cdh_integrate_carbondata2_3_spark.session import get_spark  # noqa: E402
from cdh_integrate_carbondata2_3_spark.sources.registry import (  # noqa: E402
    TPCH_TABLES,
    register_views,
)

from bench import HEADLINE  # noqa: E402

# Queries where an engine/plain ratio would measure the wrong thing —
# each with the SPECIFIC reason, emitted per-row in the JSON so the
# no-ratio set is enumerable without reading this source.
NOT_COMPARABLE: dict[str, str] = {
    # contract-check oracles pin exact values + TRUE flags while the
    # engine also computes the sketches being checked
    "agg_hll_mergeable_rollup":
        "contract oracle: pins sketch bounds as constants; plain side "
        "would not build the sketch",
    "agg_cms_mergeable_rollup":
        "contract oracle: pins sketch bounds as constants; plain side "
        "would not build the sketch",
    "agg_cms_join_size":
        "contract oracle: pins sketch bounds as constants; plain side "
        "would not build the sketch",
    # corpus-pinned constant-table oracles (r10): "plain Spark" would
    # just evaluate a VALUES literal while the engine trains
    "text_bpe_train":
        "corpus-keyed pinned VALUES oracle; plain side is a literal "
        "while the engine trains the tokenizer",
    "text_unigram_train":
        "corpus-keyed pinned VALUES oracle; plain side is a literal "
        "while the engine trains the tokenizer",
    # lifecycle gates: the engine side CREATEs tables, writes
    # segments, runs DML/MV refresh end-to-end; the oracle is one
    # SELECT over raw parquet — the ratio would measure the
    # lifecycle, not query overhead
    "table_hilbert_prune":
        "lifecycle gate: builds TWO clustered tables (hilbert + "
        "zorder twin) in the timed path; see bench.py phase split",
    "table_delete_mor":
        "lifecycle gate: CREATE+LOAD+DELETE (mor sidecar) end-to-end "
        "vs one SELECT",
    "table_mv_ivm_delete":
        "lifecycle gate: CREATE+MV+DELETE+incremental refresh vs one "
        "SELECT",
    "table_mv_join_rewrite":
        "lifecycle gate: CREATE+star-join MV+refresh+rewrite vs one "
        "SELECT",
    "table_mv_subsumed_rollup":
        "lifecycle gate: CREATE+2-dim MV+subsumption rewrite vs one "
        "SELECT",
    "table_db_namespace":
        "lifecycle gate: CREATE DATABASE+tables+cross-db DML vs one "
        "SELECT",
    "table_orc_stats_prune":
        "lifecycle gate: CREATE+ADD SEGMENT(orc/csv, stats='scan')+ "
        "prune vs one SELECT",
    "table_mixed_compact":
        "lifecycle gate: CREATE+2x ADD SEGMENT+CUSTOM compaction vs "
        "one SELECT; see bench.py per-phase seconds",
    "stream_mv_staleness":
        "lifecycle gate: streams two CSV batches, creates+refreshes "
        "an MV vs one SELECT",
    "ml_logit_fit_calibrate":
        "oracle pins the calibrated holdout metrics as constants; "
        "plain side would not run IRLS",
    # codec gates: the engine encodes real WAV/PNG/JPEG/MP3/MP4 blobs
    # and decodes them with real parsers; the oracle recomputes the
    # synthetic generator formulas in closed-form SQL — a ratio would
    # compare a decoder to arithmetic, not engine overhead
    "multimodal_wav_decode":
        "codec gate: engine runs a real RIFF/WAVE decoder; oracle is "
        "the closed-form sample formula, not a decode",
    "multimodal_png_decode":
        "codec gate: engine runs a real zlib-inflate PNG decoder; "
        "oracle is the closed-form pixel formula, not a decode",
    "multimodal_jpeg_decode":
        "codec gate: engine runs a real Huffman+IDCT JPEG decoder; "
        "oracle is the closed-form pixel formula, not a decode",
    "multimodal_av_meta":
        "codec gate: engine parses real MP3 frames / MP4 boxes; "
        "oracle is the closed-form duration formula, not a parse",
}


def canon_rows(rows) -> tuple[int, list[str], str]:
    """Order-insensitive (rows AND columns) digest of a collect()
    result — same canonicalization contract as tools/check.py, over
    Row lists instead of pandas frames. Only internal consistency
    matters: both sides of a comparison go through this function."""
    if not rows:
        return 0, [], hashlib.md5(b"").hexdigest()
    cols = sorted(rows[0].__fields__)
    lines = sorted(
        "\x1f".join(str(r[c]) for c in cols) for r in rows)
    return (len(rows), cols,
            hashlib.md5("\x1e".join(lines).encode()).hexdigest())


def bench_one(spark, q, sf_dir: str) -> dict:
    """Time one query both sides; returns the row dict for the JSON.

    Factored out so tests can feed a Query with a deliberately
    diverging spark_oracle and assert the mismatch guard fires."""
    def timed(mk):
        t0 = time.time()
        rows = mk()
        return time.time() - t0, rows

    # two timed runs per side; min-of-2 is the headline protocol
    # (cold cache / first-plan cost excluded on BOTH sides), and
    # the FIRST run is reported separately as engine_cold_s so
    # the plan-construction memo's contribution to the ratio
    # stays visible (ADVICE r8: the memo amortizes engine-side
    # construction across runs while plain Spark re-parses its
    # SQL every run — cold-vs-min makes that trade explicit)
    # collect(), not count(): count() lets Catalyst PRUNE work
    # that doesn't affect row count — an oracle projecting scalar
    # subqueries (graph_triangle_count) collapses to a free
    # 1-row plan, and an aggregate oracle whose VALUES aren't
    # needed for the row count (the pagerank CTE chain) drops its
    # entire computation: the r8 "plain Spark" graph baselines
    # were pruned non-measurements. collect() forces every value
    # on both sides; results are gate-sized. The engine side adds
    # select("*") to break RDD identity: re-collecting the SAME
    # memoized DataFrame would reuse its completed shuffle stages
    # and skip real work — a fresh Dataset per run recomputes
    # everything while keeping the (legitimate) construction memo.
    runs = [timed(lambda: q.fn(spark, sf_dir).select("*").collect())
            for _ in range(2)]
    engine_cold, engine_s = runs[0][0], min(t for t, _ in runs)
    engine_rows = runs[-1][1]

    plain_s = None
    reason = None
    oracle_sql = q.spark_oracle or q.oracle
    if q.name in NOT_COMPARABLE:
        reason = NOT_COMPARABLE[q.name]
    elif not oracle_sql:
        reason = "no SQL oracle (rows-only gate)"
    else:
        # prefer the Spark-parseable twin when the DuckDB oracle uses
        # DuckDB-only syntax (VERDICT r9 next-round 2: the heavyweight
        # pipeline rows were no-ratio for exactly this reason)
        try:
            pruns = [timed(lambda: spark.sql(oracle_sql).collect())
                     for _ in range(2)]
        except Exception as e:
            msg = str(e).strip().splitlines()[0][:200] if str(e) else ""
            reason = f"plain side failed: {type(e).__name__}: {msg}"
        else:
            plain_s = min(t for t, _ in pruns)
            # ratio gate: the plain side must have computed the SAME
            # result, else it timed a different computation
            ec = canon_rows(engine_rows)
            pc = canon_rows(pruns[-1][1])
            if ec != pc:
                reason = (f"twin_mismatch: engine rows={ec[0]} "
                          f"hash={ec[2][:8]} vs plain rows={pc[0]} "
                          f"hash={pc[2][:8]}")
                plain_s = None

    # `is not None`, not truthiness: a legitimate 0.0 measurement
    # must keep its row (ratio still None — can't divide by zero —
    # but plain_spark_s stays visible; ADVICE r11)
    has_plain = plain_s is not None and plain_s > 0.0
    row = {
        "engine_s": round(engine_s, 3),
        "engine_cold_s": round(engine_cold, 3),
        "plain_spark_s": round(plain_s, 3) if plain_s is not None else None,
        "ratio": round(engine_s / plain_s, 2) if has_plain else None,
        "cold_ratio": (round(engine_cold / plain_s, 2)
                       if has_plain else None)}
    if reason is not None:
        row["no_ratio_reason"] = reason
    return row


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("baseline_bench")
    register_views(spark, sf_dir, TPCH_TABLES)
    qs = all_queries()

    # warmup — level the table-plan field: register_views above hands
    # the PLAIN side every table pre-registered, so the engine side
    # gets the same registry-level setup (first load_table per table
    # runs one schema-inference job; without this the engine's COLD
    # run pays it inside the timing while plain Spark never does —
    # the r9 sub-second cold-ratio artifact, VERDICT r9 item 7)
    from cdh_integrate_carbondata2_3_spark.sources.registry import (
        load_table)
    for t in TPCH_TABLES:
        load_table(spark, sf_dir, t)
    qs["q1_pricing_summary"].fn(spark, sf_dir).limit(1).collect()

    # optional subset: tools/baseline_bench.py <name> [name ...] —
    # the sf1 amortization rows (VERDICT r11 item 3) ratio-measure a
    # handful of near-budget gates at the 10× replica without paying
    # the full 71-row sweep there
    only = set(sys.argv[1:])
    names = [n for n in HEADLINE if not only or n in only]
    out = {}
    for name in names:
        out[name] = bench_one(spark, qs[name], sf_dir)
    comparable = [v for v in out.values() if v["ratio"] is not None]
    no_ratio = {k: v.get("no_ratio_reason",
                         "measured 0.0s on the plain side")
                for k, v in out.items() if v["ratio"] is None}
    print(json.dumps({
        "sf_dir": sf_dir,
        "queries": out,
        "comparable_rows": len(comparable),
        "no_ratio_rows": no_ratio,
        "median_ratio": sorted(v["ratio"] for v in comparable)[
            len(comparable) // 2] if comparable else None,
        "median_cold_ratio": sorted(
            v["cold_ratio"] for v in comparable)[
            len(comparable) // 2] if comparable else None,
    }))


if __name__ == "__main__":
    main()
