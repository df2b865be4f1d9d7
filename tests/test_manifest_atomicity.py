"""Manifest atomicity — SURVEY.md §7 hard part #1 (reference:
tablestatus + locks + recovery/tablestatus). Crash-mid-commit must
leave the previous manifest visible; concurrent writers serialize."""

from __future__ import annotations

import json
import os
import threading

import pytest

from cdh_integrate_carbondata2_3_spark.catalog.manifest import Manifest


def _mk(tmp_path) -> Manifest:
    m = Manifest(str(tmp_path / "t"))
    os.makedirs(str(tmp_path / "t"), exist_ok=True)
    m.init("id bigint", {})
    return m


def test_failed_mutate_leaves_manifest_unchanged(tmp_path):
    m = _mk(tmp_path)
    before = m.load()

    def bad(doc):
        doc["segments"].append({"boom": True})
        raise RuntimeError("crash mid-commit")

    with pytest.raises(RuntimeError):
        m.update(bad)
    after = m.load()
    assert after["segments"] == before["segments"]
    assert after["version"] == before["version"]


def test_manifest_json_always_parseable(tmp_path):
    """The status file is swapped by rename — a reader never sees a
    half-written file."""
    m = _mk(tmp_path)
    for i in range(20):
        m.update(lambda doc: doc["segments"].append(
            {"id": i, "status": "SUCCESS", "format": "parquet",
             "files": [], "load_time": 0.0, "source": "t"}))
        with open(m.status_path) as fh:
            json.load(fh)  # must always parse


def test_concurrent_updates_serialize(tmp_path):
    m = _mk(tmp_path)
    n_threads, n_each = 8, 10
    errors = []

    def worker(tid):
        try:
            for i in range(n_each):
                def mutate(doc):
                    doc["segments"].append(
                        {"id": len(doc["segments"]), "status": "SUCCESS",
                         "format": "parquet", "files": [],
                         "load_time": 0.0, "source": f"t{tid}"})
                m.update(mutate)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(n_threads)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errors
    doc = m.load()
    assert len(doc["segments"]) == n_threads * n_each
    # ids assigned under the lock are collision-free
    ids = [s["id"] for s in doc["segments"]]
    assert sorted(ids) == list(range(n_threads * n_each))
    assert doc["version"] == n_threads * n_each  # init is v0, each update +1


def test_version_history_kept(tmp_path):
    m = _mk(tmp_path)
    for i in range(3):
        m.update(lambda doc: None)
    hist = [f for f in os.listdir(m.meta_dir)
            if f.startswith("tablestatus.v")]
    assert len(hist) >= 3
