"""Cross-engine-exact arithmetic helpers.

Floating-point aggregation is order-dependent: SUM(double) differs in
the last ulp between engines (and between partitionings of the same
engine!), which breaks value-hash comparison against a SQL oracle and
makes results non-reproducible across cluster sizes. The fix: do the
arithmetic in DECIMAL (exact, order-independent) and cast the final
scalar to DOUBLE — converting the *same exact decimal* to double is
deterministic in every engine.

This is also the right call at 100 TB: decimal partial aggregation is
whole-stage-codegen'd JVM arithmetic (no Python), and results stop
depending on the number of shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: Column | str, precision: int = 12, scale: int = 2) -> Column:
    """Cast a (money-like) double column to an exact decimal."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def money_sum(col: Column, alias: str) -> Column:
    """Exact decimal SUM rendered as double (cross-engine stable)."""
    return F.sum(col).cast("double").alias(alias)


def ratio_avg(num: Column, alias: str) -> Column:
    """AVG as one double division of exact parts: CAST(SUM(dec) AS
    DOUBLE)/CAST(COUNT AS DOUBLE) — a single double op on identical
    inputs is bitwise-identical across engines, unlike AVG(double)."""
    return (F.sum(num).cast("double") / F.count(F.lit(1)).cast("double")).alias(alias)
