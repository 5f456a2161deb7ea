"""Bucketed tables: co-located, exchange-free joins.

At 100 TB the dominant cost of a fact-fact join (lineitem ⋈ orders) is
the shuffle. Writing both tables bucketed + sorted on the join key
pre-shuffles them ONCE at write time; every subsequent join reads
co-located buckets and skips the exchange entirely (SortMergeJoin with
no Exchange under it).

Bucket count rules of thumb: target ~128-512 MB per bucket at full
scale; both sides of a join must use the same count (or a divisor) for
bucket-wise joins to engage. Bucketing is a saveAsTable feature — the
bucket metadata lives in the catalog, so readers must go through
``spark.table``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_by: list[str],
    n_buckets: int,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_by)
    writer = writer.sortBy(*(sort_by or bucket_by))
    writer.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
