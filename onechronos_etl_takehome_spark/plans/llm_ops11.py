"""Round-10 operator batch: the txlog as a full lakehouse table.

- **Streaming change data feed** (x48): DML commits consumable as a
  STREAM — ``spark.readStream.format("txlog").option("readChangeFeed",
  "true")`` emits ``(_version, _change, *cols)`` rows per commit, the
  continuous form of batch ``txlog.change_feed`` (round-9 verdict
  item 2; ``streaming/txlog_source.py``).

- **Column mapping** (x49): RENAME/DROP COLUMN as metadata-only
  commits — stable physical names, logical→physical manifest map,
  protocol-gated (round-9 verdict item 4; ``sources/txlog.py``).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import pin_semantics
from ..sources.tables import load_table
from .catalog import register

# ---------------------------------------------------------------------------
# x48 — streaming CHANGE DATA FEED: an availableNow drain of the CDF
# stream over a create/append/delete/merge lifecycle
# ---------------------------------------------------------------------------

_X48_CUT = "1997-01-01"

# The full-history feed of the four-commit lifecycle, recomputed
# relationally: v0/v1 inserts are the two load halves; v2 deletes the
# P-status rows (copy-on-write — carried survivors must cancel); v3 is
# the MERGE: matched keys (%97, still live) surface as delete-old +
# insert-new, unmatched keys (%97 rows deleted at v2) as insert-only.
_X48_ORACLE = f"""
    WITH t AS (
      SELECT CAST(o_orderkey AS BIGINT) AS orderkey,
             o_orderstatus AS status,
             CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_cents,
             o_orderdate AS d
      FROM orders)
    SELECT CAST(0 AS BIGINT) AS version, 'insert' AS change,
           orderkey, status, price_cents
    FROM t WHERE d < DATE '{_X48_CUT}'
    UNION ALL
    SELECT 1, 'insert', orderkey, status, price_cents
    FROM t WHERE d >= DATE '{_X48_CUT}'
    UNION ALL
    SELECT 2, 'delete', orderkey, status, price_cents
    FROM t WHERE status = 'P'
    UNION ALL
    SELECT 3, 'delete', orderkey, status, price_cents
    FROM t WHERE orderkey % 97 = 0 AND status <> 'P'
    UNION ALL
    SELECT 3, 'insert', orderkey, status, price_cents + 100000
    FROM t WHERE orderkey % 97 = 0
"""


@register("x48_txlog_cdf_stream", oracle=_X48_ORACLE)
def x48_txlog_cdf_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DML commits consumed as a STREAM (``streaming/txlog_source.py``
    with ``option("readChangeFeed", "true")`` — Delta's option, same
    name): after create → append → copy-on-write delete → MERGE, an
    availableNow drain of the CDF stream must deliver EXACTLY the
    row-level history — creates and appends as tagged ``insert``
    scans (one partition per added file, zero diff work), the delete
    as ``delete`` rows with the rewrite's carried survivors CANCELLED,
    and the merge as delete-old + insert-new for matched keys plus
    insert-only for keys whose rows were already gone. The oracle
    recomputes all five legs relationally from raw orders, so the
    hash match proves the streamed multiset diff is exact — the
    continuous form of x37/x40's batch feed. Streamed == batch
    change_feed, restart-without-redelivery, rate-limited drains, and
    OPTIMIZE-invisibility are pinned in tests/test_round10_ops.py.

    Scale: planning is manifest metadata; an append-only commit
    streams as ordinary file scans; a DML commit's diff reads only
    the files THAT COMMIT touched (never the table) — the same read
    amplification Delta pays for CDF without change files."""
    import tempfile

    from ..sources import txlog
    from ..streaming.txlog_source import TxlogStreamSource

    pin_semantics(spark)
    spark.dataSource.register(TxlogStreamSource)
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("long").alias("orderkey"),
        F.col("o_orderstatus").alias("status"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias(
            "price_cents"
        ),
        "o_orderdate",
    )
    path = tempfile.mkdtemp(prefix=f"txlog_x48_{uuid.uuid4().hex[:8]}_")
    cut = F.lit(_X48_CUT).cast("date")
    cols = ["orderkey", "status", "price_cents"]
    txlog.create_table(
        orders.filter(F.col("o_orderdate") < cut).select(*cols), path
    )
    txlog.append(
        orders.filter(F.col("o_orderdate") >= cut).select(*cols), path
    )
    txlog.delete_where(spark, path, F.col("status") == "P")
    txlog.merge_upsert(
        spark,
        path,
        orders.filter(F.col("orderkey") % 97 == 0).select(
            "orderkey",
            "status",
            (F.col("price_cents") + 100000).alias("price_cents"),
        ),
        ["orderkey"],
    )
    out = tempfile.mkdtemp(prefix=f"txlog_x48_out_{uuid.uuid4().hex[:8]}_")
    ckpt = tempfile.mkdtemp(prefix=f"txlog_x48_ck_{uuid.uuid4().hex[:8]}_")
    q = (
        spark.readStream.format("txlog")
        .option("path", path)
        .option("readChangeFeed", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        # a timed-out drain would leave a PARTIAL feed on disk —
        # surface loudly instead of hashing it (the x41 contract)
        q.stop()
        raise TimeoutError("x48 availableNow CDF drain did not finish")
    return spark.read.parquet(out).select(
        F.col("_version").alias("version"),
        F.col("_change").alias("change"),
        "orderkey",
        "status",
        "price_cents",
    )

# ---------------------------------------------------------------------------
# x49 — column mapping: RENAME/DROP COLUMN as metadata-only commits
# ---------------------------------------------------------------------------

_X49_CUT = "1997-01-01"

# Three legs over the mapped lifecycle:
#   tag 0 — the FULL table at latest read through the RENAMED column
#           (pre-rename files resolve via the logical→physical map;
#           post-rename files staged under the stable physical name);
#   tag 1 — time travel to the pre-rename version, read through the
#           ORIGINAL column name (the create half only);
#   tag 2 — schema-width pin: the dropped column is hidden at latest
#           (3 columns) but visible to pre-drop time travel (4).
_X49_ORACLE = f"""
    WITH t AS (
      SELECT o_orderstatus AS status,
             CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents,
             o_orderdate AS d
      FROM orders)
    SELECT CAST(0 AS BIGINT) AS tag, status,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM t GROUP BY status
    UNION ALL
    SELECT 1, status, CAST(COUNT(*) AS BIGINT),
           CAST(SUM(cents) AS BIGINT)
    FROM t WHERE d < DATE '{_X49_CUT}' GROUP BY status
    UNION ALL
    SELECT 2, 'cols', 3, 4
"""


@register("x49_txlog_column_mapping", oracle=_X49_ORACLE)
def x49_txlog_column_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RENAME/DROP COLUMN on the ACID table as METADATA-ONLY commits
    (``txlog.rename_column``/``drop_column`` — Delta's column
    mapping): files keep stable PHYSICAL names forever, manifests map
    logical → physical, so a rename rewrites ZERO files. The lifecycle
    here: create the pre-cut half under ``o_totalprice_cents``,
    RENAME it to ``price_cents``, append the post-cut half under the
    NEW name (staged under the old physical name — pinned in
    tests/test_round10_ops.py), then DROP the ``prio`` column. Tag 0
    aggregates the whole table through the renamed column — its hash
    match against the oracle's recomputation from the unsplit source
    proves pre-rename files resolve exactly through the mapping. Tag
    1 time-travels to the pre-rename version and reads the ORIGINAL
    name. Tag 2 pins DROP semantics: 3 columns at latest, 4 at the
    pre-drop version. Rename/drop bump the protocol to reader 2 /
    writer 3, so mapping-unaware engines refuse rather than misread
    (tests pin both refusals and the dropped-physical tombstone).

    Scale: a rename on a 100-TB table is ONE manifest commit; reads
    add a single projection node; footer stats stay physically keyed
    so file pruning keeps working through the rename."""
    import tempfile

    from ..sources import txlog

    pin_semantics(spark)
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("long").alias("orderkey"),
        F.col("o_orderstatus").alias("status"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias(
            "o_totalprice_cents"
        ),
        F.col("o_orderpriority").alias("prio"),
        "o_orderdate",
    )
    path = tempfile.mkdtemp(prefix=f"txlog_x49_{uuid.uuid4().hex[:8]}_")
    cut = F.lit(_X49_CUT).cast("date")
    txlog.create_table(
        orders.filter(F.col("o_orderdate") < cut).select(
            "orderkey", "status", "o_totalprice_cents", "prio"
        ),
        path,
    )
    v_rename = txlog.rename_column(
        spark, path, "o_totalprice_cents", "price_cents"
    )
    txlog.append(
        orders.filter(F.col("o_orderdate") >= cut).select(
            "orderkey",
            "status",
            F.col("o_totalprice_cents").alias("price_cents"),
            "prio",
        ),
        path,
    )
    v_drop = txlog.drop_column(spark, path, "prio")

    latest = txlog.read_table(spark, path)
    tag0 = latest.groupBy("status").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("price_cents").cast("long").alias("total_cents"),
    ).select(F.lit(0).cast("long").alias("tag"), "*")
    pre_rename = txlog.read_table(spark, path, version=v_rename - 1)
    tag1 = pre_rename.groupBy("status").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("o_totalprice_cents").cast("long").alias("total_cents"),
    ).select(F.lit(1).cast("long").alias("tag"), "*")
    n_now = len(latest.columns)
    n_pre_drop = len(
        txlog.read_table(spark, path, version=v_drop - 1).columns
    )
    tag2 = spark.createDataFrame(
        [(2, "cols", n_now, n_pre_drop)],
        "tag long, status string, n_orders long, total_cents long",
    )
    return tag0.unionByName(tag1).unionByName(tag2)
