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
