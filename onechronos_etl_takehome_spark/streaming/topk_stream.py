"""Streaming heavy hitters — the stateful twin of x03
(operators/sketches.py).

The batch form is two-pass (Misra-Gries candidates → exact recount);
a stream can't take a second pass, so the online form maintains the MG
summary itself as state and re-emits it every microbatch.

Sharding: values hash-partition across ``n_shards`` state groups, so
summary memory is O(n_shards · k_counters) and update work spreads
across the cluster. Every occurrence of a value lands in the same
shard, so the per-shard MG guarantee lifts to the stream: any value
with global frequency > n_total/(k_counters+1) is present in its
shard's summary (its shard sees all its occurrences and
n_shard ≤ n_total).

Emission contract (append mode): a shard re-emits its full current
summary after each microbatch that contributed at least one non-null
item, tagged with ``n_shard`` (items seen so far in the shard — then
strictly increasing, so rows are unique across batches and "latest
snapshot" = rows with the max n_shard per shard; a batch whose rows
for the shard are all NULL is skipped rather than re-emitting a
duplicate snapshot, and a batch whose items were ALL pruned by the MG
eviction leaves nothing to emit — its items still advance the n
carried by the NEXT emission, so "latest snapshot" remains correct
but may lag the true n_shard by the pruned batch). ``est_count``
is the MG counter: a lower bound on the value's true shard frequency,
within n_shard/(k_counters+1) of it. The exact final answer, when a
backfill is possible, is the batch x03 recount — tests pin that with
``k_counters`` ≥ distinct values the streamed counters ARE the exact
counts.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "shard int, value string, est_count long, n_shard long"
STATE_SCHEMA = "vals array<string>, counts array<long>, n long"


def heavy_hitter_stream(
    items: DataFrame,
    col: str,
    *,
    k_counters: int = 120,
    n_shards: int = 8,
) -> DataFrame:
    """(shard, value, est_count, n_shard) snapshot rows per microbatch.

    ``items`` is a streaming DataFrame; ``col`` the (string) value
    column. State per shard is one bounded MG summary (≤ ``k_counters``
    counters + the item count) — O(1) in stream length.
    """

    def update(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (shard,) = key
        if state.exists:
            vals, counts, n = state.get
            counters = dict(zip(vals, counts))
        else:
            counters, n = {}, 0
        batch_items = 0
        for pdf in batches:
            vc = pdf[col].dropna()
            n += len(vc)
            batch_items += len(vc)
            for value, count in vc.value_counts().items():
                counters[value] = counters.get(value, 0) + int(count)
            if len(counters) > k_counters:
                cutoff = sorted(counters.values(), reverse=True)[k_counters]
                counters = {
                    v: c - cutoff for v, c in counters.items() if c > cutoff
                }
        state.update(
            (list(counters.keys()), [int(c) for c in counters.values()], n)
        )
        # all-NULL batch: state unchanged and n_shard not advanced —
        # re-emitting would duplicate the previous snapshot rows.
        if counters and batch_items > 0:
            yield pd.DataFrame(
                {
                    "shard": int(shard),
                    "value": list(counters.keys()),
                    "est_count": [int(c) for c in counters.values()],
                    "n_shard": int(n),
                }
            )

    sharded = items.withColumn(
        "_shard", F.pmod(F.xxhash64(F.col(col)), F.lit(n_shards)).cast("int")
    )
    return sharded.groupBy("_shard").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
