"""Online rolling z-score anomaly detection — the streaming twin of
x12 (plans/llm_ops3.py).

State per user = the last ``history`` observed values (a bounded
deque), so memory is O(users · history) no matter how long the stream
runs. Each arriving event is scored against the CURRENT history
(events strictly before it), then pushed in — the online form of
x12's 10-to-1-preceding rows frame.

Semantics note (documented divergence from the batch form): history
order is event-time WITHIN a microbatch (each batch sorts by ts,
event_id) but PROCESSING order across batches — an event arriving
late lands after values that post-date it. That is the standard
online-detector contract; the batch x12 is the exact re-statement for
backfills. tests/test_anomaly_stream.py pins equality for in-order
arrival across a multi-batch split.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, event_id long, ts timestamp, value double, "
    "mean_hist double, std_hist double, zscore double"
)
STATE_SCHEMA = "vals array<double>"


def zscore_anomaly_stream(
    events: DataFrame,
    *,
    history: int = 10,
    min_history: int = 5,
    z: float = 3.0,
    watermark: str = "1 hour",
) -> DataFrame:
    """(user_id, event_id, ts, value, mean_hist, std_hist, zscore) per
    flagged event. Population moments over the trailing history, same
    formula as x12: var = (Σx² - (Σx)²/n)/n."""

    def score(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        prior = list(state.get[0]) if state.exists else []
        # Accumulate EVERY Arrow chunk before sorting: the group can
        # arrive as multiple pdfs (maxRecordsPerBatch, multiple map
        # outputs), and sorting chunks independently would score later
        # chunks against history containing values that post-date them
        # — per-batch event-time order is the documented contract.
        parts = [pdf.dropna(subset=["value"]) for pdf in batches]
        parts = [p for p in parts if len(p)]
        if parts:
            pdf = pd.concat(parts, ignore_index=True).sort_values(
                ["ts", "event_id"]
            )
            vals = pdf["value"].to_numpy(dtype=np.float64)
            allv = np.concatenate([np.asarray(prior, dtype=np.float64), vals])
            # windowed trailing sums via cumsum: history for position p
            # (in allv) is allv[max(0, p-history):p]
            cs = np.concatenate([[0.0], np.cumsum(allv)])
            cs2 = np.concatenate([[0.0], np.cumsum(allv * allv)])
            p = np.arange(len(prior), len(allv))
            lo = np.maximum(0, p - history)
            n = (p - lo).astype(np.float64)
            ok = n >= min_history
            s = cs[p] - cs[lo]
            ssq = cs2[p] - cs2[lo]
            with np.errstate(invalid="ignore", divide="ignore"):
                mean = s / n
                var = (ssq - s * s / n) / n
                std = np.sqrt(np.maximum(var, 0.0))
                zs = (vals - mean) / std
            flag = ok & (std > 0) & (np.abs(vals - mean) > z * std)
            # plain python floats: the state row pickles to the JVM,
            # which can't unpickle numpy scalars
            prior = [float(x) for x in allv[-history:]]
            if flag.any():
                sel = pdf[flag]
                yield pd.DataFrame(
                    {
                        "user_id": np.full(int(flag.sum()), user_id),
                        "event_id": sel["event_id"].to_numpy(),
                        "ts": sel["ts"].to_numpy(),
                        "value": vals[flag],
                        "mean_hist": mean[flag],
                        "std_hist": std[flag],
                        "zscore": zs[flag],
                    }
                )
        state.update((prior,))

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            score,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
