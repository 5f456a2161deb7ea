"""As-of (point-in-time) join.

Spark has no native AS OF join (DuckDB does; Flink/Pandas call it
merge_asof). The classic distributed implementation avoids the
correlated per-row scan entirely:

  union(left, right) → window over (by, ORDER BY ts, side, tie)
  → last(right_payload IGNORE NULLS) → keep left rows.

Cost model at scale: ONE shuffle on ``by`` + a sort within partitions —
same price as a co-partitioned join, no matter how many right rows
precede each left row. The naive alternative (inequality join + keep
rank 1) is O(|L|·|R|) per key and explodes on hot keys.

Semantics: for each left row, attach the payload of the right row with
the greatest ``ts`` such that right.ts <= left.ts (ties at equal ts
resolved toward the right row, then by ``tie_breakers`` descending-max).
Left rows with no prior right row keep NULL payloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    by: list[str],
    ts: str,
    right_cols: list[str],
    tie_breakers: list[str] | None = None,
) -> DataFrame:
    """Attach the most recent (by ``ts``) right payload to each left row.

    ``right`` must contain ``by + [ts] + right_cols``; ``tie_breakers``
    (subset of right_cols) disambiguate right rows sharing a timestamp —
    the row with the greatest tie-breaker wins, making the result
    deterministic regardless of partitioning.
    """
    tie_breakers = tie_breakers or []
    payload = F.struct(*[F.col(c) for c in right_cols]).alias("_asof_payload")
    r = right.select(*by, ts, payload).withColumn("_asof_side", F.lit(0))
    l = (
        left.withColumn("_asof_side", F.lit(1))
        .withColumn("_asof_payload", F.lit(None).cast(r.schema["_asof_payload"].dataType))
    )
    u = l.unionByName(r, allowMissingColumns=True)

    # Right rows sort before left rows at equal ts (side 0 < 1) so an
    # exactly-simultaneous right row is visible to the left row; among
    # simultaneous right rows the last (max tie-breaker) wins.
    order = [F.col(ts).asc(), F.col("_asof_side").asc()] + [
        F.col("_asof_payload")[c].asc_nulls_first() for c in tie_breakers
    ]
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn(
        "_asof_match", F.last("_asof_payload", ignorenulls=True).over(w)
    )
    out = matched.filter(F.col("_asof_side") == 1)
    for c in right_cols:
        out = out.withColumn(c, F.col("_asof_match")[c])
    return out.drop("_asof_side", "_asof_payload", "_asof_match")
