"""Custom stateful streaming operator (applyInPandasWithState
sessionizer) — the engine surface SURVEY.md §2.9 maps to Spark's
stateful API (the reference's streaming layer is ingest-only).

Note: with ProcessingTimeTimeout the state store schedules batches
continuously, so ``processAllAvailable`` never settles — tests poll
the sink instead."""

from __future__ import annotations

import json
import time

from cdh_integrate_carbondata2_3_spark.streaming.stateful import sessionize_stream

GAP_S = 60
IDLE_MS = 600_000      # long idle timeout so only gap-closure emits


def _start(spark, tmp_path, out_rows):
    src = tmp_path / "events"
    src.mkdir()
    stream = (spark.readStream.format("json")
              .schema("user_id bigint, ts timestamp")
              .load(str(src)))
    q = (sessionize_stream(stream, gap_seconds=GAP_S,
                           idle_timeout_ms=IDLE_MS)
         .writeStream.foreachBatch(
             lambda df, _: out_rows.extend(df.collect()))
         .option("checkpointLocation", str(tmp_path / "ckpt")).start())
    return src, q


def _wait_rows(out_rows, n, deadline_s=90):
    deadline = time.time() + deadline_s
    while time.time() < deadline and len(out_rows) < n:
        time.sleep(0.5)
    return out_rows


def test_sessionize_stream_closes_on_gap(spark, tmp_path):
    out_rows: list = []
    src, q = _start(spark, tmp_path, out_rows)
    try:
        # batch 1: two events 10s apart → one OPEN session, nothing out
        (src / "b1.json").write_text("\n".join([
            json.dumps({"user_id": 1, "ts": "2024-01-01 00:00:00"}),
            json.dumps({"user_id": 1, "ts": "2024-01-01 00:00:10"}),
        ]))
        time.sleep(10)
        assert out_rows == []

        # batch 2: an event past the gap closes the first session
        (src / "b2.json").write_text(json.dumps(
            {"user_id": 1, "ts": "2024-01-01 01:00:00"}) + "\n")
        _wait_rows(out_rows, 1)
        assert len(out_rows) == 1
        s = out_rows[0]
        assert s["user_id"] == 1 and s["n_events"] == 2
        assert s["session_start"].isoformat() == "2024-01-01T00:00:00"
        assert s["session_end"].isoformat() == "2024-01-01T00:00:10"
    finally:
        q.stop()


def test_sessionize_multiple_users_and_sessions(spark, tmp_path):
    out_rows: list = []
    src, q = _start(spark, tmp_path, out_rows)
    try:
        # user 7: two sessions separated by a gap (first closes in-batch)
        # plus a trailing open session; user 8: one open session
        (src / "b1.json").write_text("\n".join([
            json.dumps({"user_id": 7, "ts": "2024-01-01 00:00:00"}),
            json.dumps({"user_id": 7, "ts": "2024-01-01 00:00:30"}),
            json.dumps({"user_id": 7, "ts": "2024-01-01 00:10:00"}),
            json.dumps({"user_id": 8, "ts": "2024-01-01 00:00:00"}),
        ]))
        _wait_rows(out_rows, 1)
        assert len(out_rows) == 1      # only user 7's first session closed
        s = out_rows[0]
        assert s["user_id"] == 7 and s["n_events"] == 2
        assert s["session_end"].isoformat() == "2024-01-01T00:00:30"
    finally:
        q.stop()


def test_near_dup_candidate_stream(spark, tmp_path):
    """Streaming banded-LSH near-dup: a duplicate pair is emitted the
    moment its second member arrives — including when the two members
    land in DIFFERENT micro-batches (bucket state persists)."""
    from cdh_integrate_carbondata2_3_spark.streaming.stateful import (
        near_dup_candidate_stream)
    out_rows: list = []
    src = tmp_path / "docs"
    src.mkdir()
    stream = (spark.readStream.format("json")
              .schema("doc_id bigint, text string")
              .load(str(src)))
    q = (near_dup_candidate_stream(stream, idle_timeout_ms=600_000)
         .writeStream.foreachBatch(
             lambda df, _: out_rows.extend(df.collect()))
         .option("checkpointLocation", str(tmp_path / "ckpt")).start())
    try:
        dup = "alpha beta gamma delta epsilon zeta"
        (src / "b1.json").write_text("\n".join([
            json.dumps({"doc_id": 1, "text": dup}),
            json.dumps({"doc_id": 2, "text": "totally different words"}),
        ]))
        time.sleep(10)
        assert out_rows == []             # nothing similar yet

        # second batch: an exact copy of doc 1 → candidate across batches
        (src / "b2.json").write_text(json.dumps(
            {"doc_id": 3, "text": dup}) + "\n")
        _wait_rows(out_rows, 1)
        pairs = {(r["id_a"], r["id_b"]) for r in out_rows}
        assert (1, 3) in pairs
        assert all(r["hamming"] == 0 for r in out_rows
                   if (r["id_a"], r["id_b"]) == (1, 3))
        assert (1, 2) not in pairs and (2, 3) not in pairs
    finally:
        q.stop()
