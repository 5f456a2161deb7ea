"""Incremental rollup maintenance (hypertable-rollup pattern).

A rollup is an aggregate table (e.g. hourly event counts) kept current
as new data arrives, WITHOUT recomputing history: each increment batch
is partially aggregated to the rollup's grain, then merged into the
stored rollup by *summing* mergeable state (counts/sums) per key —
unlike ``sources.upsert`` where a matched update replaces the row.

Exactly-once: increment merges are not naturally idempotent (re-adding
a batch double-counts), so applications are recorded in a batch-id
ledger inside the versioned table directory; a replayed batch id is a
no-op. Combined with the atomic version-pointer publish this gives
exactly-once rollup maintenance over plain parquet — the same contract
a Delta ``foreachBatch MERGE`` provides, and what the streaming sink
(streaming/events_stream.write_stream_rollup) relies on under
failure-recovery replays.

Scale posture: one map-side partial aggregation of the (small)
increment + one join against the rollup (itself orders of magnitude
smaller than the fact data) + a copy-on-write version publish. History
is never rescanned.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.upsert import _latest_version, _publish, read_keyed_table

_LEDGER = "_APPLIED"


def _applied_batches(path: str) -> set[str]:
    ledger = os.path.join(path, _LEDGER)
    if not os.path.exists(ledger):
        return set()
    with open(ledger) as f:
        return {line.strip() for line in f if line.strip()}


def _record_batch(path: str, batch_id: str) -> None:
    with open(os.path.join(path, _LEDGER), "a") as f:
        f.write(f"{batch_id}\n")


def apply_increment(
    spark: SparkSession,
    path: str,
    increment: DataFrame,
    *,
    keys: list[str],
    sum_cols: list[str],
    batch_id: str,
) -> dict[str, object]:
    """Merge one pre-aggregated increment into the rollup at ``path``.

    ``increment`` must already be at the rollup grain (one row per key)
    with mergeable columns ``sum_cols`` (counts/sums — anything where
    merge = addition). Matched keys add; new keys insert. A ``batch_id``
    already in the ledger is skipped (idempotent replay).
    """
    if batch_id in _applied_batches(path):
        return {"version": _latest_version(path), "applied": False}

    version = _latest_version(path)
    if version is None:
        merged = increment
        next_version = 0
    else:
        target = read_keyed_table(spark, path)
        t, u = target.alias("t"), increment.alias("u")
        cond = [F.col(f"t.{k}").eqNullSafe(F.col(f"u.{k}")) for k in keys]
        merged = t.join(u, cond, "full_outer").select(
            *[
                F.coalesce(F.col(f"t.{k}"), F.col(f"u.{k}")).alias(k)
                for k in keys
            ],
            *[
                # cast back to the increment's type: decimal addition
                # widens precision (18,2)+(18,2)→(19,2), and the stored
                # schema must not drift a digit per applied batch.
                (
                    F.coalesce(F.col(f"t.{c}"), F.lit(0))
                    + F.coalesce(F.col(f"u.{c}"), F.lit(0))
                )
                .cast(dict(increment.dtypes)[c])
                .alias(c)
                for c in sum_cols
            ],
        )
        next_version = version + 1

    merged.write.mode("overwrite").parquet(os.path.join(path, f"v={next_version}"))
    _publish(path, next_version)
    _record_batch(path, batch_id)
    return {"version": next_version, "applied": True}


def hourly_event_rollup_increment(events: DataFrame) -> DataFrame:
    """Partial aggregation of raw events to the hourly rollup grain —
    the increment side for apply_increment (keys: window_start,
    event_type; mergeable: n, total_value as exact decimal)."""
    return (
        events.groupBy(
            F.date_format(
                F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss"
            ).alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("total_value"),
        )
    )
