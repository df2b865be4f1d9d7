"""Training-loop reader over segment-managed tables (Spark-free).

Mirrors the reference's pycarbon surface (python/pycarbon/reader.py:26-60
``make_reader(dataset_url, num_epochs, shuffle, schema_fields,
is_batch, ...)`` and python/pycarbon/integration/{tensorflow,pytorch}.py)
re-expressed over our manifest + parquet: an epoch-aware, deterministic,
shardable iterator feeding a training loop directly from a table the
Spark engine (or SdkWriter) committed.

Scale design: sharding is FILE-level modulo assignment — each of
``num_shards`` workers opens only its own file subset (no coordination,
no overlap), which is the same contract a distributed data loader needs
at 100 TB. Shuffle is two-level (file order, then intra-file row
permutation), seeded per (seed, epoch, file) so every worker of every
restart sees the same order — reproducible training without a shuffle
service. Framework adapters are stubbed behind import-tries (no
TF/torch in this container); the iterator itself is the real, tested
plumbing.
"""

from __future__ import annotations

import random
from typing import Any, Iterator

import pyarrow as pa
import pyarrow.compute as pc

from .sdk import SdkReader


class TrainReader:
    """Iterator over table rows (or Arrow record batches) with epochs,
    deterministic two-level shuffle, and file-level sharding."""

    def __init__(self, table_dir: str, *, columns: list[str] | None = None,
                 num_epochs: int | None = 1, shuffle: bool = False,
                 seed: int = 42, batch_size: int | None = None,
                 shard_index: int = 0, num_shards: int = 1,
                 filter_expr: pc.Expression | None = None):
        if num_shards < 1 or not (0 <= shard_index < num_shards):
            raise ValueError("need 0 <= shard_index < num_shards")
        if num_epochs is not None and num_epochs < 1:
            raise ValueError("num_epochs must be >= 1 or None (infinite)")
        self._reader = SdkReader(table_dir, columns=columns,
                                 filter_expr=filter_expr)
        self.columns = columns
        self.num_epochs = num_epochs
        self.shuffle = shuffle
        self.seed = seed
        self.batch_size = batch_size
        self.shard_index = shard_index
        self.num_shards = num_shards

    # ------------------------------------------------------------- internals

    def _shard_files(self) -> list[tuple[str, str]]:
        files = [(p, rel) for p, rel, _ in self._reader._files()]
        return [f for i, f in enumerate(files)
                if i % self.num_shards == self.shard_index]

    def _epoch_tables(self, epoch: int) -> Iterator[pa.Table]:
        files = self._shard_files()
        # arithmetic seed mixing (not hash()) — deterministic across
        # processes/restarts regardless of PYTHONHASHSEED
        base = self.seed * 1_000_003 + epoch
        if self.shuffle:
            random.Random(base).shuffle(files)
        for fi, (path, rel) in enumerate(files):
            # _read_live applies merge-on-read delete deltas — the
            # training loop must not feed deleted rows either
            t = self._reader._read_live(path, rel)
            if self._reader.filter_expr is not None:
                t = t.filter(self._reader.filter_expr)
            if self.shuffle and t.num_rows > 1:
                idx = list(range(t.num_rows))
                random.Random(base * 1_000_003 + fi + 1).shuffle(idx)
                t = t.take(idx)
            if t.num_rows:
                yield t

    # ------------------------------------------------------------- iteration

    def __iter__(self) -> Iterator[Any]:
        epoch = 0
        carry: pa.Table | None = None
        while self.num_epochs is None or epoch < self.num_epochs:
            for t in self._epoch_tables(epoch):
                if self.batch_size is None:
                    yield from t.to_pylist()
                    continue
                carry = t if carry is None else pa.concat_tables([carry, t])
                while carry.num_rows >= self.batch_size:
                    yield carry.slice(0, self.batch_size)
                    carry = carry.slice(self.batch_size)
            epoch += 1
        if self.batch_size is not None and carry is not None and carry.num_rows:
            yield carry  # final ragged batch

    def __enter__(self) -> "TrainReader":
        return self

    def __exit__(self, *exc) -> bool:
        return False


def make_reader(table_dir: str, **kwargs) -> TrainReader:
    """pycarbon ``make_reader`` analogue (reference
    python/pycarbon/reader.py:26): epoch/shuffle/shard/batch options via
    keywords; yields dict rows, or ``pa.Table`` batches when
    ``batch_size`` is set (pycarbon's ``is_batch=True``)."""
    return TrainReader(table_dir, **kwargs)


def make_tf_dataset(table_dir: str, **kwargs):
    """pycarbon ``TensorFlow.make_dataset`` analogue
    (python/pycarbon/integration/tensorflow.py). TensorFlow is not
    available in this container — the adapter wraps the (real, tested)
    TrainReader generator in ``tf.data.Dataset.from_generator``."""
    try:
        import tensorflow as tf  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "tensorflow not installed; TrainReader itself is fully "
            "functional — wrap it in tf.data.Dataset.from_generator") from e
    reader = TrainReader(table_dir, **kwargs)
    return tf.data.Dataset.from_generator(lambda: iter(reader),
                                          output_types=None)


def make_torch_dataloader(table_dir: str, **kwargs):
    """pycarbon ``DataLoader`` analogue
    (python/pycarbon/integration/pytorch.py). torch is not available in
    this container — the adapter feeds TrainReader into a
    torch IterableDataset."""
    try:
        import torch  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "torch not installed; TrainReader itself is fully "
            "functional — iterate it from an IterableDataset") from e
    from torch.utils.data import DataLoader, IterableDataset

    reader = TrainReader(table_dir, **kwargs)

    class _Ds(IterableDataset):
        def __iter__(self):
            return iter(reader)

    return DataLoader(_Ds(), batch_size=None)
