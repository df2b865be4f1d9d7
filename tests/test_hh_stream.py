"""Streaming heavy hitters (streaming/stateful.heavy_hitter_stream):
candidates accumulate across micro-batches in per-bucket state, the
final emissions cover every hot key, and downstream exact refine
matches a batch groupBy over the full stream."""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from cdh_integrate_carbondata2_3_spark.streaming.stateful import (
    heavy_hitter_stream)


def test_heavy_hitter_stream_candidates_and_refine(spark, tmp_path):
    latest: dict = {}
    src = tmp_path / "keys"
    src.mkdir()
    stream = (spark.readStream.format("json")
              .schema("key string").load(str(src)))

    def sink(df, _):
        for r in df.collect():
            latest[(r["bucket"], r["key"])] = r["lb"]

    q = (heavy_hitter_stream(stream, "key", m=32, buckets=4)
         .writeStream.foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    all_rows = []
    try:
        # batch 1: hot 'a' + unique noise; batch 2: hot 'b' + more 'a'
        b1 = ["a"] * 30 + [f"u{i}" for i in range(40)]
        b2 = ["b"] * 25 + ["a"] * 10 + [f"v{i}" for i in range(40)]
        for name, keys in (("b1", b1), ("b2", b2)):
            (src / f"{name}.json").write_text(
                "\n".join(json.dumps({"key": k}) for k in keys))
            all_rows.extend(keys)
            deadline = time.time() + 60
            q.processAllAvailable()
            while time.time() < deadline and not latest:
                time.sleep(1)
                q.processAllAvailable()
    finally:
        q.stop()
    cand = {k for _, k in latest}
    assert {"a", "b"} <= cand
    # state-carried count: 'a' spans both batches
    a_lb = max(v for (_, k), v in latest.items() if k == "a")
    assert a_lb >= 30                    # lower bound, never inflated
    # downstream exact refine over the candidates == full groupBy
    df = spark.createDataFrame([(k,) for k in all_rows], "key string")
    exact = {r["key"]: r["cnt"] for r in
             (df.filter(F.col("key").isin(list(cand)))
              .groupBy("key").agg(F.count(F.lit(1)).alias("cnt"))
              .orderBy(F.desc("cnt"), "key").limit(2)).collect()}
    assert exact == {"a": 40, "b": 25}


def test_heavy_hitter_stream_state_is_bounded(spark, tmp_path):
    """All-distinct stream: per-bucket summaries never exceed m."""
    rows: list = []
    src = tmp_path / "uniq"
    src.mkdir()
    stream = (spark.readStream.format("json")
              .schema("key string").load(str(src)))
    q = (heavy_hitter_stream(stream, "key", m=8, buckets=2)
         .writeStream.foreachBatch(
             lambda df, _: rows.extend(df.collect()))
         .option("checkpointLocation", str(tmp_path / "ck2")).start())
    try:
        keys = [f"x{i}" for i in range(480)] + ["hot"] * 20
        (src / "u.json").write_text(
            "\n".join(json.dumps({"key": k}) for k in keys))
        q.processAllAvailable()
    finally:
        q.stop()
    # uniform tails prune to nothing (sound: no key clears N_b/(m+1));
    # the hot key survives, and no emission ever exceeds m keys
    per_bucket: dict = {}
    for r in rows:
        per_bucket.setdefault(r["bucket"], set()).add(r["key"])
    assert any("hot" in v for v in per_bucket.values())
    assert all(len(v) <= 8 for v in per_bucket.values())
