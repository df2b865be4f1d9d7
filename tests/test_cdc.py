"""CDC streamer tests (reference streamer tool semantics: change
stream → periodic keyed MERGE; docs scd-and-cdc-guide.md:136-210)."""

from __future__ import annotations

import json
import time

from cdh_integrate_carbondata2_3_spark.catalog.table import Table
from cdh_integrate_carbondata2_3_spark.streaming.cdc import (
    CDCStreamer,
    apply_cdc_batch,
)


def _target(spark, tmp_path):
    t = Table.create(spark, str(tmp_path / "t"), "id bigint, v string")
    t.insert(spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, v string"))
    return t


def test_apply_cdc_batch_upsert_delete(spark, tmp_path):
    t = _target(spark, tmp_path)
    batch = spark.createDataFrame(
        [(1, "a2", "update", 10), (3, "c", "insert", 11), (2, "b", "delete", 12)],
        "id bigint, v string, op_type string, seq int")
    apply_cdc_batch(t, batch, "id", order_col="seq")
    got = {(r["id"], r["v"]) for r in t.read().collect()}
    assert got == {(1, "a2"), (3, "c")}


def test_apply_cdc_batch_latest_wins(spark, tmp_path):
    t = _target(spark, tmp_path)
    batch = spark.createDataFrame(
        [(1, "old", "update", 1), (1, "new", "update", 9)],
        "id bigint, v string, op_type string, seq int")
    apply_cdc_batch(t, batch, "id", order_col="seq")
    got = dict((r["id"], r["v"]) for r in t.read().collect())
    assert got[1] == "new"


def test_cdc_file_stream(spark, tmp_path):
    t = _target(spark, tmp_path)
    drop_dir = tmp_path / "changes"
    drop_dir.mkdir()
    streamer = CDCStreamer(spark, t, "id", order_col="seq")
    q = streamer.start_file_source(
        str(drop_dir), "id bigint, v string, op_type string, seq int")
    try:
        (drop_dir / "c1.json").write_text("\n".join([
            json.dumps({"id": 2, "v": "", "op_type": "delete", "seq": 1}),
            json.dumps({"id": 5, "v": "e", "op_type": "insert", "seq": 2}),
        ]))
        deadline = time.time() + 60
        want = {(1, "a"), (5, "e")}
        while time.time() < deadline:
            q.processAllAvailable()
            got = {(r["id"], r["v"]) for r in t.read().collect()}
            if got == want:
                break
            time.sleep(1)
        assert got == want
    finally:
        streamer.stop()
