"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference's streaming layer is ingest-only (SURVEY.md §2.9 — no
stateful compute), but a scale pipeline needs custom state machines;
Spark's ``applyInPandasWithState`` is the engine surface for them.
Here: per-key event-time sessionization with gap timeout — the
canonical custom stateful operator (batch analogue is the
``events_sessionize`` query).

State protocol per user key:
- state holds the open session (start, end, n_events);
- each micro-batch merges its events; any gap > ``gap_seconds``
  between consecutive events closes the earlier session (emitted
  downstream, append mode);
- a processing-time timeout closes an idle open session.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = ("user_id bigint, session_start timestamp, "
              "session_end timestamp, n_events int")
STATE_SCHEMA = "start long, end long, n int"


def sessionize_stream(events: DataFrame, gap_seconds: int = 1800,
                      idle_timeout_ms: int = 60_000) -> DataFrame:
    """events(user_id bigint, ts timestamp) → closed sessions.

    Sessions are closed (emitted) as soon as a later event proves the
    gap was exceeded, or when the key has been idle for
    ``idle_timeout_ms`` of processing time."""
    gap_us = gap_seconds * 1_000_000

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        if state.hasTimedOut:
            if state.exists:
                start, end, n = state.get
                state.remove()
                yield _session_df(user_id, start, end, n)
            return

        ts: list[int] = []
        for pdf in pdfs:
            ts.extend(int(t.value) // 1000          # ns → µs epoch
                      for t in pd.to_datetime(pdf["ts"]))
        ts.sort()
        if not ts:
            return
        if state.exists:
            start, end, n = state.get
        else:
            start, end, n = ts[0], ts[0], 0
            ts = ts[1:]
            n = 1
        closed = []
        for t in ts:
            if t - end > gap_us:
                closed.append((start, end, n))
                start, end, n = t, t, 1
            else:
                end, n = max(end, t), n + 1
        state.update((start, end, n))
        state.setTimeoutDuration(idle_timeout_ms)
        for s, e, c in closed:
            yield _session_df(user_id, s, e, c)

    def _session_df(user_id, start_us, end_us, n) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": [user_id],
            "session_start": [pd.Timestamp(start_us, unit="us")],
            "session_end": [pd.Timestamp(end_us, unit="us")],
            "n_events": [n],
        })

    return (events.groupBy("user_id")
            .applyInPandasWithState(fn, OUT_SCHEMA, STATE_SCHEMA, "append",
                                    GroupStateTimeout.ProcessingTimeTimeout))


# ---------------------------------------------------------------- near-dup
# Streaming near-duplicate candidate detection: banded SimHash LSH with
# per-bucket state. The batch dedup family (operators/dedup.py) needs
# the whole corpus; a streaming ingest pipeline wants candidates AS
# DOCUMENTS ARRIVE, across micro-batch boundaries — per-(band, value)
# state keeps the bucket's recent members, so a new document is
# compared only against its own buckets (the same occupancy math as
# batch: 2^(bits/bands) buckets per band bounds the verify fan-out).

_ND_OUT = ("band int, id_a bigint, id_b bigint, hamming int")
_ND_STATE = "ids string, sigs string"


def near_dup_candidate_stream(docs: DataFrame, id_col: str = "doc_id",
                              text_col: str = "text", *, bits: int = 32,
                              bands: int = 4, max_kept: int = 256,
                              idle_timeout_ms: int | None = 3_600_000
                              ) -> DataFrame:
    """docs stream (id, text) → (band, id_a, id_b, hamming) candidate
    pairs, emitted the moment the second member of a pair arrives —
    including across micro-batches (bucket state persists in the
    checkpoint). ``max_kept`` caps per-bucket state FIFO (the
    occupancy knob: a hot bucket degrades to comparing against the
    most recent members instead of blowing up state); idle buckets
    expire after ``idle_timeout_ms``. The same pair may surface from
    several bands — consumers dedup on (least, greatest) downstream,
    exactly like the batch banded join's ``.distinct()``.

    ``idle_timeout_ms=None`` disables the TTL (GroupStateTimeout
    NoTimeout). Use None for bounded replays (trigger=availableNow):
    with ProcessingTimeTimeout, Spark keeps scheduling no-data batches
    to evaluate timeouts and the drain never terminates (and pyspark's
    state-apply worker aborts in those no-data batches) — the TTL is
    for LONG-RUNNING streams, where those batches are the point."""
    from pyspark.sql import functions as F

    from ..operators.dedup import simhash_signature_col

    if bits % bands:
        raise ValueError("bits must divide evenly into bands")
    w = bits // bands
    toks = F.filter(F.split(F.trim(F.col(text_col)), " +"),
                    lambda t: t != F.lit(""))
    sig = simhash_signature_col(toks, bits)
    banded = (docs
              .select(F.col(id_col).alias("doc_id"), sig.alias("sim"))
              .select("doc_id", "sim", F.explode(F.array(*[
                  F.struct(
                      F.lit(b).alias("band"),
                      F.shiftrightunsigned(F.col("sim"), w * b)
                       .bitwiseAND(F.lit((1 << w) - 1)).alias("bv"))
                  for b in range(bands)])).alias("bk"))
              .select("doc_id", "sim", F.col("bk.band").alias("band"),
                      F.col("bk.bv").alias("bv")))

    def fn(key, pdfs, state: GroupState):
        band = int(key[0])
        if state.hasTimedOut:
            state.remove()
            return
        ids: list[int] = []
        sigs: list[int] = []
        if state.exists:
            s_ids, s_sigs = state.get
            if s_ids:
                ids = [int(x) for x in s_ids.split(",")]
                sigs = [int(x) for x in s_sigs.split(",")]
        seen = set(ids)
        out_rows = []
        for pdf in pdfs:
            for did, sim in zip(pdf["doc_id"], pdf["sim"]):
                did, sim = int(did), int(sim)
                if did in seen:
                    # at-least-once replay: already a member of this
                    # bucket — re-appending would double-emit its pairs
                    # and FIFO-evict genuine members
                    continue
                for prev_id, prev_sig in zip(ids, sigs):
                    out_rows.append((band, min(prev_id, did),
                                     max(prev_id, did),
                                     bin(prev_sig ^ sim).count("1")))
                ids.append(did)
                sigs.append(sim)
                seen.add(did)
        if len(ids) > max_kept:          # FIFO occupancy cap
            ids, sigs = ids[-max_kept:], sigs[-max_kept:]
        state.update((",".join(map(str, ids)), ",".join(map(str, sigs))))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        # yield in bounded chunks — keeps any single Arrow batch in the
        # state-apply protocol small even for a hot bucket's quadratic
        # pair burst (~45k rows from one 300-member bucket)
        for i in range(0, len(out_rows), 4096):
            yield pd.DataFrame(out_rows[i:i + 4096],
                               columns=["band", "id_a", "id_b", "hamming"])

    timeout_conf = (GroupStateTimeout.NoTimeout if idle_timeout_ms is None
                    else GroupStateTimeout.ProcessingTimeTimeout)
    return (banded.groupBy("band", "bv")
            .applyInPandasWithState(fn, _ND_OUT, _ND_STATE, "append",
                                    timeout_conf))


# ----------------------------------------------------------- heavy hitters
# Streaming frequent-items: the batch operator
# (operators/heavyhitters.py) summarizes per PARTITION; the streaming
# form summarizes per HASH BUCKET with the summary living in the
# state store, so the candidate set stays current as rows arrive —
# across micro-batches and restarts (checkpointed state). Same
# soundness: per bucket b, a key absent from the summary has
# count_b ≤ N_b/(m+1), so the union of survivors is a superset of
# every key with global count > N/(m+1) (pigeonhole over buckets).
# Exact top-k still comes from a downstream refine over the emitted
# candidates, exactly like the batch phase 3.

_HH_OUT = "bucket int, key string, lb bigint"
_HH_STATE = "keys string, counts string"
_HH_SEP = "\x1f"            # unit separator — safe for arbitrary keys


def heavy_hitter_stream(rows: DataFrame, col: str, *, m: int = 256,
                        buckets: int = 64) -> DataFrame:
    """Streaming Misra–Gries: ``rows[col]`` (string) hashes into
    ``buckets`` state groups, each keeping an ``m``-counter summary
    (mergeable merge-and-prune form). After every micro-batch each
    touched bucket re-emits its surviving (key, lower-bound count)
    rows — downstream keeps the latest per key (or just the distinct
    candidate keys) and refines exactly against the table. State is
    O(buckets × m) total, independent of rows or distinct keys."""
    from pyspark.sql import functions as F

    keyed = rows.select(
        F.col(col).cast("string").alias("key")).where(
        F.col("key").isNotNull()).select(
        "key", F.pmod(F.xxhash64("key"), F.lit(buckets))
        .cast("int").alias("bucket"))

    def fn(key, pdfs, state: GroupState):
        bucket = int(key[0])
        counts: dict = {}
        if state.exists:
            ks, cs = state.get
            if ks:
                counts = dict(zip(ks.split(_HH_SEP),
                                  map(int, cs.split(_HH_SEP))))
        for pdf in pdfs:
            for k, c in pdf["key"].value_counts().items():
                counts[k] = counts.get(k, 0) + int(c)
            if len(counts) > m:
                s = sorted(counts.values(), reverse=True)[m]
                counts = {k2: v - s for k2, v in counts.items() if v > s}
        state.update((_HH_SEP.join(counts),
                      _HH_SEP.join(str(v) for v in counts.values())))
        yield pd.DataFrame({"bucket": bucket,
                            "key": list(counts),
                            "lb": list(counts.values())})

    return (keyed.groupBy("bucket")
            .applyInPandasWithState(fn, _HH_OUT, _HH_STATE, "append",
                                    GroupStateTimeout.NoTimeout))
