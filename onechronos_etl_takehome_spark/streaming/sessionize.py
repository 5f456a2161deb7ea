"""Custom stateful streaming operator: gap-based sessionization.

Spark has no built-in session operator with arbitrary per-session
aggregates, so this is the canonical ``applyInPandasWithState`` shape
(SURVEY.md §7 Phase 4): state = the open session per user; events
arrive in microbatches, sessions close when the gap exceeds
``gap_seconds`` (emitted immediately) or when event-time timeout fires
past the watermark (emitted on timeout).

Scale: state is one small tuple per active user, partitioned by
user_id; Arrow batches keep the Python hop amortized. The batch twin
is q18_user_sessions (plans/relational.py) — tests reconcile the two.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
STATE_SCHEMA = "start long, end long, n long"


def sessionize_stream(
    events: DataFrame,
    *,
    gap_seconds: int = 1800,
    watermark: str = "1 hour",
) -> DataFrame:
    """(user_id, session_start, session_end, n_events) per closed session."""

    gap_us = gap_seconds * 1_000_000

    def close_sessions(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start, end, n = state.get
            state.remove()
            yield _emit(user_id, [(start, end, n)])
            return

        ts_us: list[int] = []
        for pdf in batches:
            # event-time micros, sorted within the batch
            ts_us.extend(int(t.value // 1_000) for t in pd.to_datetime(pdf["ts"]))
        ts_us.sort()
        if not ts_us:
            return

        if state.exists:
            start, end, n = state.get
        else:
            start = end = ts_us[0]
            n = 0
            ts_us = ts_us  # first event still counted below

        closed: list[tuple[int, int, int]] = []
        for t in ts_us:
            if n > 0 and t - end > gap_us:
                closed.append((start, end, n))
                start, end, n = t, t, 1
            else:
                end = max(end, t)
                n += 1
        state.update((start, end, n))
        # close the trailing session once the watermark passes it
        state.setTimeoutTimestamp(end // 1000 + gap_seconds * 1000)
        if closed:
            yield _emit(user_id, closed)

    def _emit(user_id: int, sessions: list[tuple[int, int, int]]) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [user_id] * len(sessions),
                "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in sessions],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in sessions],
                "n_events": [n for _, _, n in sessions],
            }
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            close_sessions,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
