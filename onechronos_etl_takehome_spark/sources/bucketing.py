"""Bucketed table layout: the shuffle-elimination investment.

Spark's bucketed storage (``DataFrameWriter.bucketBy`` — hash-
partition rows into a fixed number of per-file buckets at WRITE time)
is the batch counterpart of x23's z-order clustering: pay one layout
pass when the table lands, and every subsequent equi-join or
aggregation on the bucket key skips its Exchange entirely, because
each scan partition already holds exactly one bucket's keys on both
sides. At 100 TB this is the difference between re-shuffling a fact
table per query and never shuffling it again — the standard warehouse
posture for fact-to-dim and fact-to-fact joins on stable keys.

Mechanics: ``bucketBy(n, key)`` + ``sortBy(key)`` + ``saveAsTable``
(bucketed tables need the session catalog — plain ``parquet(path)``
drops the bucket spec). Reads come back through ``spark.table``;
Catalyst then plans SortMergeJoin with NO Exchange on either side
(tests/test_bucketing.py and tests/test_round5_ops.py assert the
executed plan). Bucket count rules of thumb: target ~128-512 MB per
bucket at full scale; both sides of a join must use the same count
(or a divisor) for bucket-wise joins to engage. An explicit ``path``
makes the table external, so re-registration in a fresh session is a
metadata operation over the surviving files.
"""

from __future__ import annotations

import os
import threading
import uuid

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_by: list[str],
    n_buckets: int,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Materialize ``df`` as a bucketed+sorted parquet table in the
    session catalog (managed, or external when ``path`` is given;
    overwrite replaces both catalog entry and files)."""
    spark = df.sparkSession
    if mode == "overwrite":
        spark.sql(f"DROP TABLE IF EXISTS {table}")
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_by)
    writer = writer.sortBy(*(sort_by or bucket_by))
    if path is not None:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


# One bucketed layout per (Spark application, sf_dir): the names and
# paths carry a uuid minted at write time, so two CONCURRENT
# processes (the driver and a local bench, say) each land their own
# files instead of racing a fixed /tmp path on drop/recreate; sibling
# sessions inside one application (spark.newSession() shares the
# catalog and this process's cache) reuse one layout, serialized by
# the lock.
_LAYOUT_CACHE: dict[tuple[str, str], tuple[str, str]] = {}
_LAYOUT_LOCK = threading.Lock()


def bucketed_pair(
    spark: SparkSession,
    sf_dir: str,
    *,
    n_buckets: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """(customer, orders) read back from bucketed tables keyed on
    custkey — the co-located join fixture. The layout write runs once
    per (application, sf_dir); subsequent calls reuse the registered
    tables (the amortization that makes the layout pay for itself).
    Paths and table names are uuid-scoped per write, never a shared
    fixed /tmp location (concurrent sessions must not clobber each
    other's files)."""
    from .tables import load_table

    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir))
    with _LAYOUT_LOCK:
        if key in _LAYOUT_CACHE:
            cust_t, ord_t = _LAYOUT_CACHE[key]
            if spark.catalog.tableExists(cust_t) and spark.catalog.tableExists(
                ord_t
            ):
                return read_bucketed(spark, cust_t), read_bucketed(spark, ord_t)
        uid = uuid.uuid4().hex[:12]
        cust_t, ord_t = f"cust_bkt_{uid}", f"ord_bkt_{uid}"
        base = f"/tmp/spark_graft_buckets_{key[0]}_{uid}"
        write_bucketed(
            load_table(spark, sf_dir, "customer"),
            cust_t,
            bucket_by=["c_custkey"],
            n_buckets=n_buckets,
            path=os.path.join(base, "customer"),
        )
        write_bucketed(
            load_table(spark, sf_dir, "orders"),
            ord_t,
            bucket_by=["o_custkey"],
            n_buckets=n_buckets,
            path=os.path.join(base, "orders"),
        )
        _LAYOUT_CACHE[key] = (cust_t, ord_t)
    return read_bucketed(spark, cust_t), read_bucketed(spark, ord_t)
