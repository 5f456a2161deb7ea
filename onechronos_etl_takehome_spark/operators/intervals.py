"""Interval analytics: bucketed overlap self-join.

A naive interval-overlap join is an inequality join (``a.start <= b.end
AND b.start <= a.end``), which Spark can only execute as a broadcast /
cartesian nested loop — quadratic and unshardable.  The scale path is
the classic time-bin bucketing used by range-join implementations
(Databricks' range-join hints, GeoSpark-style 1-D tiling): explode each
interval into the fixed-width bins it touches, equi-join on the bin id
(hash-partitioned, shardable), then verify the exact overlap predicate
and dedup pairs that met in more than one bin.

Losslessness: two overlapping intervals share at least the bin
containing any overlap instant, so every true pair survives candidate
generation; the verify filter removes bin-mates that don't actually
overlap.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_overlap_pairs(
    df: DataFrame,
    id_col: str,
    start_col: str,
    end_col: str,
    *,
    bin_us: int,
    carry: Sequence[str] = (),
) -> DataFrame:
    """All pairs of overlapping intervals (inclusive endpoints).

    ``start_col``/``end_col`` are BIGINT epoch-microseconds with
    ``start <= end``; ``id_col`` must be unique per interval.  Returns
    one row per unordered pair (``id_a < id_b``) whose intervals
    overlap, with ``overlap_us = least(ends) − greatest(starts)`` (≥ 0;
    inclusive semantics, so touching intervals count with overlap 0)
    and every ``carry`` column duplicated as ``<c>_a`` / ``<c>_b``.

    Scale shape: bins fan each interval out ``⌈len/bin_us⌉+1`` ways; the
    pair join is an equi-join on the bin id; verify + pair-dedup run on
    candidates only.  ``bin_us`` trades fan-out (long intervals touch
    many bins) against bucket size (a hot bin is quadratic in its
    occupancy — same caveat as any LSH bucket; pick bins near the
    typical interval length).
    """
    from .util import truncate_lineage

    cols = [F.col(id_col).alias("_iid"),
            F.col(start_col).cast("long").alias("_s"),
            F.col(end_col).cast("long").alias("_e"),
            *[F.col(c) for c in carry]]
    # Both join sides read the interval frame; truncating its lineage
    # materializes the (interval-cardinality, i.e. already reduced)
    # input once instead of re-running the upstream plan — for q57
    # that upstream is a full sessionization window over events.
    base = truncate_lineage(df.select(*cols))
    binned = base.select(
        "*",
        F.explode(
            F.sequence(
                F.expr(f"_s div {bin_us}"), F.expr(f"_e div {bin_us}")
            )
        ).alias("_bin"),
    )
    a = binned.select(
        F.col("_bin"),
        F.col("_iid").alias("id_a"),
        F.col("_s").alias("_s_a"),
        F.col("_e").alias("_e_a"),
        *[F.col(c).alias(f"{c}_a") for c in carry],
    )
    b = binned.select(
        F.col("_bin"),
        F.col("_iid").alias("id_b"),
        F.col("_s").alias("_s_b"),
        F.col("_e").alias("_e_b"),
        *[F.col(c).alias(f"{c}_b") for c in carry],
    )
    cand = a.join(b, "_bin").filter(
        (F.col("id_a") < F.col("id_b"))
        & (F.col("_s_a") <= F.col("_e_b"))
        & (F.col("_s_b") <= F.col("_e_a"))
    )
    out_cols = [
        "id_a",
        "id_b",
        *[f"{c}_a" for c in carry],
        *[f"{c}_b" for c in carry],
        (
            F.least("_e_a", "_e_b") - F.greatest("_s_a", "_s_b")
        ).alias("overlap_us"),
    ]
    # A pair that shares k bins appears k times; all duplicates carry
    # identical payload (bounds ride the interval), so distinct() is
    # the pair-dedup.
    return cand.select(*out_cols).distinct()
