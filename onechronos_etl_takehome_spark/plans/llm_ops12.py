"""Round-11 operator batch: partition columns and deletion vectors
inside the ACID log.

- **Partition columns** (x50): ``create_table(partition_by=...)`` —
  Hive-style value directories declared IN the txlog, partition values
  in every add action, manifest-level pruning BEFORE footer stats,
  every DML preserving the layout (round-10 verdict item 5;
  ``sources/txlog.py``).

- **Deletion vectors** (x51): merge-on-read DELETE — a delete commit
  writes per-file row-position masks instead of rewriting files; reads
  mask through the DV; OPTIMIZE materializes (round-10 verdict item 4;
  ``sources/txlog.py``).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import pin_semantics
from ..sources.tables import load_table
from .catalog import register

# ---------------------------------------------------------------------------
# x50 — txlog PARTITION COLUMNS: layout declared in the log, pruning
# resolved from manifest partition values, DML preserving the layout
# ---------------------------------------------------------------------------

_X50_CUT = "1997-01-01"

# Three legs over the partitioned lifecycle (create pre-cut half
# partitioned by status / append post-cut half / copy-on-write delete
# of every 50th orderkey):
#   tag 0 — latest table grouped by the partition column;
#   tag 1 — a partition-pruned AND stats-pruned read ('F' rows above a
#           price floor), aggregated: the hash match proves the pruned
#           scan loses nothing;
#   tag 2 — time travel to v0 (the pre-append, pre-delete snapshot).
_X50_ORACLE = f"""
    WITH t AS (
      SELECT CAST(o_orderkey AS BIGINT) AS orderkey,
             o_orderstatus AS status,
             CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents,
             o_orderdate AS d
      FROM orders),
    live AS (SELECT * FROM t WHERE orderkey % 50 <> 0)
    SELECT CAST(0 AS BIGINT) AS tag, status,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM live GROUP BY status
    UNION ALL
    SELECT 1, 'F-hi', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(cents) AS BIGINT)
    FROM live WHERE status = 'F' AND cents >= 15000000
    UNION ALL
    SELECT 2, status, CAST(COUNT(*) AS BIGINT),
           CAST(SUM(cents) AS BIGINT)
    FROM t WHERE d < DATE '{_X50_CUT}' GROUP BY status
"""


@register("x50_txlog_partitioned", oracle=_X50_ORACLE)
def x50_txlog_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARTITION COLUMNS declared in the ACID log
    (``txlog.create_table(partition_by=...)`` — the single most
    common layout knob in real lakehouse tables, round-10 verdict
    item 5): data files live under Hive-style ``status=X``
    directories, each add action records its typed partition values,
    and the values merge into the manifest stats as exact ``[v, v]``
    ranges — so partition predicates prune AT THE MANIFEST, before
    footer stats, through every read surface. The lifecycle here:
    create the pre-cut half partitioned by status (clustered on cents
    within), append the post-cut half, copy-on-write delete every
    50th orderkey — appends and rewrites all restage through the
    partition spec, so the layout survives DML. Tag 0 aggregates the
    latest table by the partition column; tag 1 reads with a
    partition predicate AND a cents floor (both pruning levers; the
    gate additionally pins the poisoned-pruned-file file-set proof,
    tests/test_round11_ops.py); tag 2 time-travels to v0. Declaring
    partition columns bumps the protocol to reader 3 / writer 4 so
    layout-unaware engines refuse rather than drop the column.

    Scale: partition pruning is listing-level — a day-partitioned
    100-TB table opens only the requested days' manifest entries; the
    cents clustering then prunes within each partition (x32 proved
    this outside the log; this witness moves it INSIDE the ACID
    table)."""
    import tempfile

    from ..sources import txlog

    pin_semantics(spark)
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("long").alias("orderkey"),
        F.col("o_orderstatus").alias("status"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        "o_orderdate",
    )
    path = tempfile.mkdtemp(prefix=f"txlog_x50_{uuid.uuid4().hex[:8]}_")
    cut = F.lit(_X50_CUT).cast("date")
    cols = ["orderkey", "status", "cents"]
    txlog.create_table(
        orders.filter(F.col("o_orderdate") < cut).select(*cols),
        path,
        partition_by="status",
        cluster_by="cents",
        cluster_files=4,
    )
    txlog.append(
        orders.filter(F.col("o_orderdate") >= cut).select(*cols), path
    )
    txlog.delete_where(spark, path, F.col("orderkey") % 50 == 0)

    latest = txlog.read_table(spark, path)
    tag0 = latest.groupBy("status").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("total_cents"),
    ).select(F.lit(0).cast("long").alias("tag"), "*")
    pruned = txlog.read_table(
        spark, path, where="status = 'F' AND cents >= 15000000"
    )
    tag1 = pruned.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("total_cents"),
    ).select(
        F.lit(1).cast("long").alias("tag"),
        F.lit("F-hi").alias("status"),
        "*",
    )
    tag2 = txlog.read_table(spark, path, version=0).groupBy("status").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("total_cents"),
    ).select(F.lit(2).cast("long").alias("tag"), "*")
    return tag0.unionByName(tag1).unionByName(tag2)

# ---------------------------------------------------------------------------
# x51 — DELETION VECTORS: merge-on-read DELETE, stacked masks, reads
# through the mask, time travel past it
# ---------------------------------------------------------------------------

# Two stacked DV deletes over the clustered orders table:
#   v1 masks orderkey % 61 == 0, v2 masks cents % 7 == 0 — the second
#   vector carries the first's dead set (one live descriptor per file).
#   tag 0 — latest table grouped by status (both masks applied);
#   tag 1 — a stats-pruned read (cents floor) THROUGH the masks;
#   tag 2 — time travel to v0: the masks don't exist there.
_X51_ORACLE = """
    WITH t AS (
      SELECT CAST(o_orderkey AS BIGINT) AS orderkey,
             o_orderstatus AS status,
             CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders),
    live AS (
      SELECT * FROM t WHERE orderkey % 61 <> 0 AND cents % 7 <> 0)
    SELECT CAST(0 AS BIGINT) AS tag, status,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM live GROUP BY status
    UNION ALL
    SELECT 1, 'hi', CAST(COUNT(*) AS BIGINT), CAST(SUM(cents) AS BIGINT)
    FROM live WHERE cents >= 20000000
    UNION ALL
    SELECT 2, status, CAST(COUNT(*) AS BIGINT), CAST(SUM(cents) AS BIGINT)
    FROM t GROUP BY status
"""


@register("x51_txlog_deletion_vectors", oracle=_X51_ORACLE)
def x51_txlog_deletion_vectors(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MERGE-ON-READ DELETE via deletion vectors
    (``txlog.delete_where(mode="dv")`` — Delta/Iceberg's v2 answer to
    copy-on-write amplification, round-10 verdict item 4): a delete
    commit writes the matched rows' PHYSICAL positions as ``dv-*``
    parquet and re-adds each touched file with a descriptor; no data
    file rewrites. Reads anti-join the mask (``_metadata.row_index``
    provenance Spark-side; a boolean filter on the pyarrow
    format-reader path); bytes written scale with the DELETED ROW
    COUNT — the gate pins a ≥10× drop at 0.1% selectivity
    (tests/test_round11_ops.py), plus hash equality against a CoW
    delete of the same predicate and CDF equality across modes. This
    witness stacks TWO DV deletes (the second vector carries the
    first's dead set, so exactly one descriptor generation is live
    per file) and hash-matches three legs against a relational
    recomputation: the masked table, a stats-PRUNED read through the
    masks (manifest stats stay valid supersets), and a time travel to
    v0 where no mask exists. DV tables require protocol reader 4 /
    writer 5 — an unaware engine would resurrect deleted rows, so it
    refuses (pinned).

    Scale: a 0.1%-selectivity delete on a 100-TB table writes ~0.1%
    of a column (positions), not 100% of every touched file — the
    dominant write-amplification a user feels on big tables. OPTIMIZE
    materializes masks back into clean files as just another
    transaction."""
    import tempfile

    from ..sources import txlog

    pin_semantics(spark)
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("long").alias("orderkey"),
        F.col("o_orderstatus").alias("status"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    path = tempfile.mkdtemp(prefix=f"txlog_x51_{uuid.uuid4().hex[:8]}_")
    txlog.create_table(
        orders, path, cluster_by="cents", cluster_files=6
    )
    txlog.delete_where(
        spark, path, F.col("orderkey") % 61 == 0, mode="dv"
    )
    txlog.delete_where(spark, path, F.col("cents") % 7 == 0, mode="dv")

    latest = txlog.read_table(spark, path)
    tag0 = latest.groupBy("status").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("total_cents"),
    ).select(F.lit(0).cast("long").alias("tag"), "*")
    tag1 = txlog.read_table(
        spark, path, where="cents >= 20000000"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("total_cents"),
    ).select(
        F.lit(1).cast("long").alias("tag"), F.lit("hi").alias("status"), "*"
    )
    tag2 = txlog.read_table(spark, path, version=0).groupBy("status").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("total_cents"),
    ).select(F.lit(2).cast("long").alias("tag"), "*")
    return tag0.unionByName(tag1).unionByName(tag2)
