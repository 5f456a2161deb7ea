"""Leakage-safe train/val/test corpus splitting.

The last stage of every training-data pipeline: partition the corpus
into train/validation/test such that (a) proportions are deterministic
and reproducible, and (b) *duplicate documents never straddle splits*
— an exact dup of a training doc inside the eval split is test-set
leakage (the same failure class d09's decontamination targets, but
self-inflicted at split time).

Mechanism, 100-TB posture:

- the split is a pure scan-stage projection: a portable hash of the
  *group key* (not the doc id) compared against hex boundaries —
  zero shuffles to assign, no driver state, stable under re-runs and
  under adding/removing other rows (per-row hash, not ntile/rank).
- leakage safety comes from hashing the exact-dup group key (e.g. the
  md5 of normalized text): every member of a dup group shares the
  key, hence the hash, hence the split. Fuzzy-dup groups plug in the
  same way via ``dedup_components`` output (group representative id
  as the key) — one extra dimension-sized join, no new mechanism.
- weights are expressed in 1/256 granularity (first two hex chars of
  the md5), which keeps the boundary comparison a plain string
  compare that any engine evaluates identically — no float rounding,
  no modulo bias debates across hash widths.

Cross-engine: md5 + substring + string comparison only — DuckDB and
Spark agree byte-for-byte, so the catalog entry (t21) is fully
hash-matchable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_WEIGHTS: dict[str, int] = {"train": 230, "val": 13, "test": 13}
"""Split weights in 1/256 units (first-two-hex-chars granularity):
~89.8% / ~5.1% / ~5.1%."""


def _boundaries(weights: dict[str, int]) -> list[tuple[str, str]]:
    """(name, exclusive-upper-bound-hex) per split, cumulative."""
    if sum(weights.values()) != 256:
        raise ValueError(
            f"weights must sum to 256 (1/256 units), got {sum(weights.values())}"
        )
    out, acc = [], 0
    for name, w in weights.items():
        acc += w
        out.append((name, format(acc, "02x")))
    return out


def split_column(
    key: Column, *, weights: dict[str, int] | None = None, seed: str = "s1"
) -> Column:
    """Deterministic split label from a group key: compare the first
    two hex chars of md5(seed || key) against cumulative boundaries.
    The seed string namespaces re-splits (a new seed reshuffles)."""
    bucket = F.substring(F.md5(F.concat(F.lit(seed), key)), 1, 2)
    expr: Column | None = None
    bounds = _boundaries(weights or DEFAULT_WEIGHTS)
    for name, ub in reversed(bounds):
        expr = (
            F.lit(name)
            if expr is None
            else F.when(bucket < F.lit(ub), F.lit(name)).otherwise(expr)
        )
    return expr


def split_column_sql(
    key_sql: str, *, weights: dict[str, int] | None = None, seed: str = "s1"
) -> str:
    """The DuckDB-equivalent CASE expression (oracle builder)."""
    bounds = _boundaries(weights or DEFAULT_WEIGHTS)
    bucket = f"substring(md5('{seed}' || {key_sql}), 1, 2)"
    cases = "".join(
        f"WHEN {bucket} < '{ub}' THEN '{name}' "
        for name, ub in bounds[:-1]
    )
    return f"CASE {cases}ELSE '{bounds[-1][0]}' END"


def assign_split(
    df: DataFrame,
    group_key: Column,
    *,
    weights: dict[str, int] | None = None,
    seed: str = "s1",
    out_col: str = "split",
) -> DataFrame:
    """Append the split label, hashed on ``group_key`` so co-grouped
    rows (exact dups, fuzzy-dup cluster members, same-source shards)
    always land in the same split."""
    return df.withColumn(
        out_col, split_column(group_key, weights=weights, seed=seed)
    )
