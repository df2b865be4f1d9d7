"""TrainReader (pycarbon make_reader analogue): epochs, deterministic
two-level shuffle, file-level sharding, batch assembly across file
boundaries, projection/filter pushdown — all Spark-free over a table
the SdkWriter committed."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from cdh_integrate_carbondata2_3_spark.ml import (
    TrainReader,
    make_reader,
    make_tf_dataset,
    make_torch_dataloader,
)
from cdh_integrate_carbondata2_3_spark.sdk import SdkWriter


@pytest.fixture()
def table(tmp_path) -> str:
    d = str(tmp_path / "t")
    w = SdkWriter(d, "id int, grp string")
    # 3 segments → 3 files, 30 rows total
    for seg in range(3):
        w.write_arrow(pa.table({
            "id": pa.array(range(seg * 10, seg * 10 + 10), pa.int32()),
            "grp": pa.array(["a" if i % 2 else "b" for i in range(10)])}))
    return d


def test_single_epoch_covers_all_rows(table):
    rows = list(make_reader(table))
    assert sorted(r["id"] for r in rows) == list(range(30))


def test_epochs_multiply(table):
    rows = list(make_reader(table, num_epochs=3))
    assert len(rows) == 90


def test_shuffle_deterministic_same_seed(table):
    a = [r["id"] for r in make_reader(table, shuffle=True, seed=7)]
    b = [r["id"] for r in make_reader(table, shuffle=True, seed=7)]
    assert a == b
    assert sorted(a) == list(range(30))
    assert a != sorted(a)  # actually shuffled


def test_shuffle_differs_across_epochs_and_seeds(table):
    two = [r["id"] for r in make_reader(table, shuffle=True, num_epochs=2)]
    assert two[:30] != two[30:]          # epoch reshuffle
    assert sorted(two[:30]) == sorted(two[30:])
    other = [r["id"] for r in make_reader(table, shuffle=True, seed=99)]
    assert other != two[:30]


def test_shards_partition_disjoint_and_complete(table):
    shards = [
        [r["id"] for r in make_reader(table, shard_index=i, num_shards=3)]
        for i in range(3)]
    assert all(len(s) == 10 for s in shards)  # 3 files round-robin
    assert sorted(x for s in shards for x in s) == list(range(30))


def test_batches_cross_file_boundaries(table):
    batches = list(make_reader(table, batch_size=12))
    assert [b.num_rows for b in batches] == [12, 12, 6]  # ragged tail
    assert isinstance(batches[0], pa.Table)
    ids = [i for b in batches for i in b.column("id").to_pylist()]
    assert ids == list(range(30))


def test_projection_and_filter(table):
    rows = list(make_reader(table, columns=["id"],
                            filter_expr=pc.field("id") < 5))
    assert all(set(r) == {"id"} for r in rows)
    assert sorted(r["id"] for r in rows) == [0, 1, 2, 3, 4]


def test_bad_shard_args_rejected(table):
    with pytest.raises(ValueError):
        TrainReader(table, shard_index=3, num_shards=3)
    with pytest.raises(ValueError):
        TrainReader(table, num_epochs=0)


def test_framework_adapters_stubbed(table):
    with pytest.raises(NotImplementedError, match="tensorflow"):
        make_tf_dataset(table)
    with pytest.raises(NotImplementedError, match="torch"):
        make_torch_dataloader(table)
