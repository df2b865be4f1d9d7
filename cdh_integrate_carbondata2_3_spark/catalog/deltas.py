"""Driver/SDK-side view of merge-on-read delete deltas.

The Spark read path applies deltas as an anti-join (catalog/table.py
``_apply_deltas``); the no-Spark surfaces — the SDK reader and the
python ``USING carbondata`` datasource — apply the same sidecars as
pyarrow row masks via these helpers, so every reader of a mor table
agrees on the post-delete state. Reference analogue: every reader of
a carbon table consults the block's delete-delta bitmap
(core/.../mutate/DeleteDeltaBlockDetails).
"""

from __future__ import annotations

import os


def delete_positions(table_dir: str, doc: dict) -> dict[str, "object"]:
    """{table-relative file path → ascending numpy int64 positions
    deleted} from the manifest doc's delta entries. Empty when the
    table carries no deltas. Driver-side memory is O(deleted rows) —
    the same order as the sidecars themselves; horizontal compaction
    keeps that consolidated."""
    entries = doc.get("delete_deltas") or []
    if not entries:
        return {}
    import numpy as np
    import pyarrow.parquet as pq
    files: list = []
    poss: list = []
    for e in entries:
        t = pq.read_table(os.path.join(table_dir, e["path"]),
                          columns=["file", "pos"])
        files.append(t.column("file").to_numpy(zero_copy_only=False))
        poss.append(t.column("pos").to_numpy())
    f = np.concatenate(files)
    p = np.concatenate(poss)
    order = np.lexsort((p, f))
    f, p = f[order], p[order]
    out: dict[str, object] = {}
    if len(f) == 0:
        return out
    bounds = np.flatnonzero(f[1:] != f[:-1]) + 1
    for chunk_f, chunk_p in zip(np.split(f, bounds), np.split(p, bounds)):
        out[str(chunk_f[0])] = chunk_p
    return out


def filter_batch(batch, positions, start: int):
    """Drop the rows of an arrow Table/RecordBatch whose file-global
    position (``start`` + row offset) is in ``positions`` (ascending
    int64 array). Returns the (possibly unchanged) batch."""
    import numpy as np
    import pyarrow as pa
    n = len(batch)
    lo = np.searchsorted(positions, start, "left")
    hi = np.searchsorted(positions, start + n, "left")
    if lo == hi:
        return batch
    mask = np.ones(n, bool)
    mask[positions[lo:hi] - start] = False
    return batch.filter(pa.array(mask))
