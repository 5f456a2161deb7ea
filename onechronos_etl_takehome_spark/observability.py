"""Zero-cost-by-default candidate-count observability.

The fuzzy-dedup joins (LSH buckets, prefix filters, deletion /
pigeonhole signatures) are candidate-bound: wall time follows the
candidate-pair count, and superlinear candidate growth is invisible in
a wall-time-only bench until it is already a blowup.  This module lets
a harness attach a named row-count ``Observation`` at each operator's
candidate stage — computed inside the same job as the query (Spark
observed metrics ride the existing action; no second scan, no extra
shuffle) — without changing any operator signature.

Outside a ``capture_counts()`` block every hook is the identity
function, so production query plans are byte-identical to the
uninstrumented ones.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.observation import Observation

_SINK: dict[str, Observation] | None = None


def observe_count(tag: str, df: DataFrame) -> DataFrame:
    """Attach a row-count observation to ``df`` when a capture is
    active; identity otherwise.  Calling twice with the same tag (e.g.
    bench reps re-building the query) keeps the latest observation."""
    if _SINK is None:
        return df
    obs = Observation()
    _SINK[tag] = obs
    return df.observe(obs, F.count(F.lit(1)).alias("n"))


@contextmanager
def capture_counts() -> Iterator[dict[str, Observation]]:
    """Activate the hooks for the block; yields the tag→Observation
    sink.  Read counts with :func:`drain` AFTER the query's action has
    completed (``Observation.get`` blocks until the observed plan's
    first action finishes)."""
    global _SINK
    _SINK = {}
    try:
        yield _SINK
    finally:
        _SINK = None


def drain(sink: dict[str, Observation]) -> dict[str, int]:
    """Collect the observed counts (call after the action)."""
    return {tag: int(obs.get["n"]) for tag, obs in sink.items()}
