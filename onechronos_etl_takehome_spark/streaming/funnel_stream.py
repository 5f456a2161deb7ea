"""Custom stateful streaming operator: ordered-step window funnel.

Streaming twin of x07 (plans/llm_ops3.py): per user, track progress
through an ordered step sequence where every step must land within
``window_seconds`` of the FIRST step and at-or-after the previous one.
Spark has no built-in funnel, so this is the second canonical
``applyInPandasWithState`` shape next to sessionize.py: state = the
open funnel attempt (one timestamp per reached step).

Emission contract (append mode — each attempt yields exactly ONE row):
- the moment the final step lands → (user, step ts..., depth = n_steps);
- event-time timeout once the watermark passes ``s1 + window`` →
  the partial depth reached.
After emitting, state clears: a later step-1 event starts a NEW
attempt (the batch x07 computes only the first attempt; tests
reconcile on that prefix).

Scale: state is ``n_steps`` int64s per user with an open attempt,
partitioned by user — same bounded-state posture as sessionization.
Events for OTHER steps or outside the window mutate nothing.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def funnel_stream(
    events: DataFrame,
    step_types: list[str],
    *,
    window_seconds: int = 86400,
    watermark: str = "1 hour",
    type_col: str = "event_type",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(user_id, step1_ts..stepN_ts, funnel_depth) per closed attempt."""

    n_steps = len(step_types)
    if n_steps < 2:
        raise ValueError("funnel needs at least 2 steps")
    window_us = window_seconds * 1_000_000

    out_cols = [f"step{i + 1}_ts" for i in range(n_steps)]
    output_schema = (
        f"{user_col} long, "
        + ", ".join(f"{c} timestamp" for c in out_cols)
        + ", funnel_depth long"
    )
    # -1 = step not reached (state schema has no nullable contract)
    state_schema = ", ".join(f"s{i + 1} long" for i in range(n_steps))
    step_index = {t: i for i, t in enumerate(step_types)}

    def _emit(user_id: Any, steps: list[int]) -> pd.DataFrame:
        depth = sum(1 for s in steps if s >= 0)
        row: dict[str, list] = {user_col: [user_id]}
        for c, s in zip(out_cols, steps):
            row[c] = [pd.Timestamp(s, unit="us") if s >= 0 else pd.NaT]
        row["funnel_depth"] = [depth]
        return pd.DataFrame(row)

    def advance(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            steps = list(state.get)
            state.remove()
            yield _emit(user_id, steps)
            return

        ev: list[tuple[int, int]] = []  # (ts_us, step_idx)
        for pdf in batches:
            for t, typ in zip(pd.to_datetime(pdf[ts_col]), pdf[type_col]):
                idx = step_index.get(typ)
                if idx is not None:
                    ev.append((int(t.value // 1_000), idx))
        if not ev:
            return
        ev.sort()

        steps = list(state.get) if state.exists else [-1] * n_steps
        closed: list[list[int]] = []
        for ts_us, idx in ev:
            if steps[0] >= 0 and ts_us > steps[0] + window_us:
                # attempt expired in event time: close it, start fresh
                closed.append(steps)
                steps = [-1] * n_steps
            if idx == 0 and steps[0] < 0:
                steps[0] = ts_us
            elif (
                steps[0] >= 0
                and idx > 0
                and steps[idx] < 0
                and steps[idx - 1] >= 0
                and ts_us >= steps[idx - 1]
                and ts_us <= steps[0] + window_us
            ):
                steps[idx] = ts_us
                if idx == n_steps - 1:  # completed: emit now, reset
                    closed.append(steps)
                    steps = [-1] * n_steps
        if steps[0] >= 0:
            state.update(tuple(steps))
            # close the open attempt once the watermark passes its window
            state.setTimeoutTimestamp(steps[0] // 1000 + window_seconds * 1000)
        elif state.exists:
            state.remove()
        if closed:
            yield pd.concat([_emit(user_id, s) for s in closed], ignore_index=True)

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            advance,
            outputStructType=output_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
