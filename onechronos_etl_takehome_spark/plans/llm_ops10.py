"""Round-7 operator batch: ACID table format + cross-container media.

- **Transactional table + time travel** (x34): the Delta/Iceberg
  commit-protocol shape engine-native (``sources/txlog.py``): a
  file-level action log (add/remove per FILE), snapshot reads
  reconstructed from metadata only, append commits, copy-on-write
  DELETE that rewrites only the files containing matching rows, and
  optimistic concurrency via POSIX exclusive-create (a real
  two-writer race is exercised in tests/test_txlog.py). x34 builds a
  table in three commits (create / append / delete) and hash-matches
  a snapshot read at EVERY version against a DuckDB oracle that
  recomputes each state from the raw table — the cross-engine proof
  that append, delete, and snapshot-isolation semantics are exact,
  and the time-travel witness nothing else in the catalog carries.

- **Cross-container video near-dup** (m13, in plans/llm_ops9.py):
  one binaryFile scan over a mixed .avi/.mp4 corpus — the MP4 member
  decoded by the round-7 ISO-BMFF box walk (``operators/mp4.py``).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import pin_semantics
from ..sources.tables import load_table
from .catalog import register

# ---------------------------------------------------------------------------
# x34 — transactional table: commit log, copy-on-write delete, time travel
# ---------------------------------------------------------------------------

_X34_CUT = "1997-01-01"

# Each branch recomputes one SNAPSHOT of the table from the raw orders
# rows: v0 = the initial load (pre-cutoff), v1 = after the append
# (everything), v2 = after the copy-on-write delete of F-status rows.
# Decimal sum → double at the edge; counts BIGINT (functions/exact.py).
_X34_ORACLE = f"""
    SELECT 0 AS version,
      CAST(COUNT(*) AS BIGINT) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
      CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
    FROM orders WHERE o_orderdate < DATE '{_X34_CUT}'
    UNION ALL
    SELECT 1,
      CAST(COUNT(*) AS BIGINT),
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE),
      CAST(COUNT(DISTINCT o_custkey) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 2,
      CAST(COUNT(*) AS BIGINT),
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE),
      CAST(COUNT(DISTINCT o_custkey) AS BIGINT)
    FROM orders WHERE o_orderstatus <> 'F'
    UNION ALL
    SELECT 3,
      CAST(COUNT(*) AS BIGINT),
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE),
      CAST(COUNT(DISTINCT o_custkey) AS BIGINT)
    FROM orders WHERE o_orderstatus <> 'F'
"""


@register("x34_txlog_time_travel", oracle=_X34_ORACLE)
def x34_txlog_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACID table lifecycle, hash-matched at every version: create the
    table from pre-1997 orders (commit 0), append the rest (commit 1),
    copy-on-write DELETE the F-status rows (commit 2 — only files
    containing matches are rewritten; survivors carry by reference),
    then TIME-TRAVEL read all three snapshots and aggregate each. The
    oracle recomputes the three states from the raw table, so the
    hash match proves the log fold, the append, the rewrite, and
    snapshot isolation are all value-exact.

    Round 8 adds the VACUUM leg (version tag 3): after vacuuming down
    to the latest version, the latest snapshot must still read
    value-exact (its oracle branch duplicates version 2's), and the
    vacuumed versions 0/1 must RAISE rather than silently misread —
    the leg is only emitted when they do, so a broken raise contract
    shows up as a driver row-count mismatch. The pre-vacuum snapshots
    are materialized eagerly (4 aggregate rows, driver-side) because
    vacuum physically deletes the files a lazy plan would re-scan —
    exactly the ordering a real maintenance pipeline observes.
    Zero retention is safe here: single-writer witness, no concurrent
    stager (vacuum's default 24 h window is the production guard).

    Table path is uuid-scoped per invocation (the x24 concurrent-
    session lesson) — the commit protocol's real concurrency story is
    exercised separately by the two-writer race in tests/test_txlog.py.

    Scale: the log is metadata-plane (one JSON per commit, one action
    per FILE); snapshot resolution never touches data; the delete's
    provenance scan collects one row per TOUCHED FILE, not per row
    (see sources/txlog.py for the full posture notes)."""
    import tempfile

    from ..sources import txlog

    pin_semantics(spark)
    orders = load_table(spark, sf_dir, "orders")
    path = tempfile.mkdtemp(prefix=f"txlog_x34_{uuid.uuid4().hex[:8]}_")
    cut = F.lit(_X34_CUT).cast("date")
    txlog.create_table(orders.filter(F.col("o_orderdate") < cut), path)
    txlog.append(orders.filter(F.col("o_orderdate") >= cut), path)
    txlog.delete_where(spark, path, F.col("o_orderstatus") == "F")

    def snap(v: int, tag: int):
        t = txlog.read_table(spark, path, version=v)
        return t.agg(
            F.lit(tag).cast("int").alias("version"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
            F.count_distinct("o_custkey").cast("long").alias("n_customers"),
        ).select("version", "n_orders", "total_price", "n_customers")

    # materialize pre-vacuum: vacuum deletes the very files a lazy
    # snapshot plan would re-scan at the driver's collect
    rows = [
        r
        for v in (0, 1, 2)
        for r in snap(v, v).collect()
    ]
    txlog.vacuum(path, keep_versions=1, retention_seconds=0)
    stale_raise = True
    for stale in (0, 1):
        try:
            txlog.read_table(spark, path, version=stale).count()
            stale_raise = False  # must never happen post-vacuum
        except ValueError:
            pass  # the delete-everything edge: zero live files
        except Exception:
            pass  # missing data files surface loudly, never misread
    if stale_raise:
        rows += snap(2, 3).collect()  # retained version reads exactly
    return spark.createDataFrame(
        rows,
        "version int, n_orders long, total_price double, n_customers long",
    )


# ---------------------------------------------------------------------------
# x35 — file-pruned MERGE INTO (upsert) on the transactional table
# ---------------------------------------------------------------------------

# Oracle recomputes the merged state relationally: update rows win
# wholesale for matched keys, inserts land, untouched rows pass
# through. Balances in integer cents via FLOOR (floor, not cast —
# functions/exact.py; both engines round toward -inf).
_X35_ORACLE = """
    WITH t AS (
      SELECT CAST(c_custkey AS BIGINT) AS custkey,
             CAST(c_nationkey AS BIGINT) AS nationkey,
             c_mktsegment AS mktsegment,
             CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS bal_cents
      FROM customer),
    u AS (
      SELECT custkey, nationkey, 'UPSERTED' AS mktsegment,
             bal_cents + 12345 AS bal_cents
      FROM t WHERE custkey % 10 = 0
      UNION ALL
      SELECT custkey + 10000000, nationkey, 'INSERTED', bal_cents
      FROM t WHERE custkey % 10 = 0)
    SELECT * FROM u
    UNION ALL
    SELECT t.* FROM t
    WHERE t.custkey NOT IN (SELECT custkey FROM u)
"""


@register("x35_txlog_merge", oracle=_X35_ORACLE)
def x35_txlog_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO on the ACID table (``sources/txlog.py:merge_upsert``):
    every 10th customer gets a wholesale row replacement (segment →
    'UPSERTED', balance bumped in integer cents) and a shifted-key
    'INSERTED' twin; the merged table reads back row-for-row equal to
    the relational recomputation — update-wins, insert, and
    pass-through semantics all inside the hash.

    The scale story is FILE pruning: the update keys join the
    snapshot once by provenance (``input_file_name``), only files
    CONTAINING matched keys rewrite (their unmatched rows survive an
    anti-join), every other file carries by reference — pinned
    structurally in tests/test_txlog.py (a key-range-split table
    whose untouched range keeps its exact file names)."""
    import tempfile

    from ..sources import txlog

    pin_semantics(spark)
    t = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("custkey"),
        F.col("c_nationkey").cast("long").alias("nationkey"),
        F.col("c_mktsegment").alias("mktsegment"),
        F.floor(F.col("c_acctbal") * 100).cast("long").alias("bal_cents"),
    )
    tenth = t.filter(F.col("custkey") % 10 == 0)
    updates = tenth.select(
        "custkey",
        "nationkey",
        F.lit("UPSERTED").alias("mktsegment"),
        (F.col("bal_cents") + 12345).alias("bal_cents"),
    ).unionByName(
        tenth.select(
            (F.col("custkey") + 10_000_000).alias("custkey"),
            "nationkey",
            F.lit("INSERTED").alias("mktsegment"),
            "bal_cents",
        )
    )
    path = tempfile.mkdtemp(prefix=f"txlog_x35_{uuid.uuid4().hex[:8]}_")
    txlog.create_table(t, path)
    txlog.merge_upsert(spark, path, updates, ["custkey"])
    return txlog.read_table(spark, path).select(
        "custkey", "nationkey", "mktsegment", "bal_cents"
    )


# ---------------------------------------------------------------------------
# x36 — stats-based data skipping (file-granular min/max pruning)
# ---------------------------------------------------------------------------

_X36_LO, _X36_HI = "1995-06-01", "1995-09-30"

_X36_ORACLE = f"""
    SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
      CAST(COUNT(*) AS BIGINT) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        AS total_price
    FROM orders
    WHERE o_orderdate BETWEEN DATE '{_X36_LO}' AND DATE '{_X36_HI}'
    GROUP BY 1
"""


@register("x36_txlog_data_skipping", oracle=_X36_ORACLE)
def x36_txlog_data_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stats-based DATA SKIPPING on the ACID table: orders land
    range-clustered on ``o_orderdate`` (``cluster_by`` — each data
    file covers a narrow date range, and ``_stage_data`` lifts each
    file's min/max from the parquet FOOTER into the commit manifest),
    then a four-month range read resolves the file list against the
    MANIFEST stats — files whose [min, max] cannot intersect the
    bounds are never opened. The file-granular sibling of x32's
    Hive-directory pruning, and the skipping index every table format
    (Delta/Iceberg) ships; the gate additionally asserts the pruned
    fraction and that pruned-scan == full-scan row-for-row
    (tests/test_txlog.py). The oracle recomputes the aggregate from
    the raw table — the hash match proves skipping is an I/O
    optimization, never a semantic change.

    Round 9: the predicate is written ONCE. ``where=`` takes the same
    SQL text ``.filter`` would and derives BOTH the file pruning
    (compiled against manifest stats, ``sources/pruning.py`` — the
    date-literal-vs-ISO-stat comparison is type-aware, so the old
    hand-widened boundary bound is gone) and the semantic row filter.
    The gate pins auto-derived == hand-fed file lists, including an
    OR-of-ranges predicate the skip_where dict could never express
    (tests/test_round9_ops.py).

    Scale: pruning is a driver-side fold over manifest stats (one
    row per FILE, the metadata plane); at 100 TB this is the
    difference between opening a season and opening a decade."""
    import tempfile

    from ..sources import txlog

    pin_semantics(spark)
    orders = load_table(spark, sf_dir, "orders")
    path = tempfile.mkdtemp(prefix=f"txlog_x36_{uuid.uuid4().hex[:8]}_")
    # explicit file count: deterministic layout whatever the session's
    # shuffle parallelism (a vanilla 200-partition session would
    # otherwise cut 200 sliver files)
    txlog.create_table(
        orders, path, cluster_by="o_orderdate", cluster_files=32
    )
    t = txlog.read_table(
        spark,
        path,
        where=(
            f"o_orderdate BETWEEN DATE '{_X36_LO}' AND DATE '{_X36_HI}'"
        ),
    )
    return (
        t.groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("order_month")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )


# ---------------------------------------------------------------------------
# x37 — change data feed (row-level changes derived from the log)
# ---------------------------------------------------------------------------

_X37_CUT = "1997-01-01"

# The feed for (v0, v2]: v1's inserts are the appended post-cutoff
# rows; v2's deletes are the F-status rows of the full table (the CoW
# rewrite's carried-over survivors must cancel and never appear).
_X37_ORACLE = f"""
    SELECT 1 AS version, 'insert' AS change,
      CAST(o_orderkey AS BIGINT) AS orderkey, o_orderstatus AS status,
      CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_cents
    FROM orders WHERE o_orderdate >= DATE '{_X37_CUT}'
    UNION ALL
    SELECT 2, 'delete',
      CAST(o_orderkey AS BIGINT), o_orderstatus,
      CAST(FLOOR(o_totalprice * 100) AS BIGINT)
    FROM orders WHERE o_orderstatus = 'F'
"""


@register("x37_txlog_change_feed", oracle=_X37_ORACLE)
def x37_txlog_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHANGE DATA FEED off the ACID table (``sources/txlog.py:
    change_feed``): after create → append → copy-on-write delete, the
    feed for versions (0, 2] must contain EXACTLY the appended rows
    as v1 inserts and the deleted rows as v2 deletes — nothing for
    the delete's carried-over survivors, because the per-commit
    multiset diff (``exceptAll`` of added vs removed files) cancels
    them. The oracle recomputes both change sets relationally from
    the raw table; the hash match proves row-level CDC can be derived
    from the commit log alone, with each commit reading only the
    files it touched. The compaction-is-CDF-invisible and
    incremental-consumer contracts are pinned in tests/test_txlog.py
    and tests/test_txlog_stream.py."""
    import tempfile

    from ..sources import txlog

    pin_semantics(spark)
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("long").alias("orderkey"),
        F.col("o_orderstatus").alias("status"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
        "o_orderdate",
    )
    path = tempfile.mkdtemp(prefix=f"txlog_x37_{uuid.uuid4().hex[:8]}_")
    cut = F.lit(_X37_CUT).cast("date")
    txlog.create_table(orders.filter(F.col("o_orderdate") < cut), path)
    txlog.append(orders.filter(F.col("o_orderdate") >= cut), path)
    txlog.delete_where(spark, path, F.col("status") == "F")
    return txlog.change_feed(spark, path, from_version=0).select(
        F.col("_version").cast("int").alias("version"),
        F.col("_change").alias("change"),
        "orderkey",
        "status",
        "price_cents",
    )


# ---------------------------------------------------------------------------
# x38 — OPTIMIZE ZORDER: multi-dimensional data skipping from one layout
# ---------------------------------------------------------------------------

_X38_OK = (10_000, 14_999)  # l_orderkey probe
_X38_PK = (100, 179)  # l_partkey probe

_X38_ORACLE = f"""
    SELECT 'orderkey_range' AS probe,
      CAST(COUNT(*) AS BIGINT) AS n_rows,
      CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem
    WHERE l_orderkey BETWEEN {_X38_OK[0]} AND {_X38_OK[1]}
    UNION ALL
    SELECT 'partkey_range',
      CAST(COUNT(*) AS BIGINT),
      CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
    FROM lineitem
    WHERE l_partkey BETWEEN {_X38_PK[0]} AND {_X38_PK[1]}
"""


@register("x38_txlog_zorder_skipping", oracle=_X38_ORACLE)
def x38_txlog_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE ZORDER on the ACID table: lineitem lands unclustered,
    one ``compact(zorder_by=['l_orderkey', 'l_partkey'])`` transaction
    rewrites the live set along a Morton curve (``layout.py:
    zorder_frame`` — the x23 machinery as a LOG COMMIT), and then
    range probes on EACH dimension read through manifest-stats
    skipping — the multi-column pruning a linear sort cannot give
    (sorting by orderkey leaves every file spanning all partkeys).
    Both probes hash-match the raw-table oracle; the gate additionally
    asserts nonzero file pruning on both dimensions from the one
    layout (tests/test_txlog.py). l_quantity sums as BIGINT (integer
    quantities — functions/exact.py)."""
    import tempfile

    from ..sources import txlog

    pin_semantics(spark)
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").cast("long").alias("l_orderkey"),
        F.col("l_partkey").cast("long").alias("l_partkey"),
        F.col("l_quantity").cast("long").alias("l_quantity"),
    )
    path = tempfile.mkdtemp(prefix=f"txlog_x38_{uuid.uuid4().hex[:8]}_")
    txlog.create_table(li, path)
    txlog.compact(
        spark,
        path,
        zorder_by=["l_orderkey", "l_partkey"],
        zorder_files=16,
        target_bytes=1,  # force the rewrite regardless of file sizes
    )

    def probe(label: str, col: str, lo: int, hi: int) -> DataFrame:
        t = txlog.read_table(spark, path, skip_where={col: (lo, hi)})
        return (
            t.filter(F.col(col).between(lo, hi))
            .agg(
                F.lit(label).alias("probe"),
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum("l_quantity").cast("long").alias("sum_qty"),
            )
            .select("probe", "n_rows", "sum_qty")
        )

    return probe("orderkey_range", "l_orderkey", *_X38_OK).unionByName(
        probe("partkey_range", "l_partkey", *_X38_PK)
    )


# ---------------------------------------------------------------------------
# x39 — null-count data skipping (IS NULL / IS NOT NULL file pruning)
# ---------------------------------------------------------------------------

# `open_price` is NULL exactly for 'O'-status orders; clustering on
# o_orderstatus makes files status-pure, so the null-count index alone
# decides which files an IS NOT NULL scan opens. The oracle recomputes
# the aggregate from the raw table.
_X39_ORACLE = """
    SELECT o_orderstatus AS status,
      CAST(COUNT(*) AS BIGINT) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        AS closed_price
    FROM orders WHERE o_orderstatus <> 'O'
    GROUP BY o_orderstatus
"""


@register("x39_txlog_null_skipping", oracle=_X39_ORACLE)
def x39_txlog_null_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-COUNT data skipping on the ACID table (round-8): manifests
    carry per-column null counts lifted from the parquet footers
    alongside min/max, and ``skip_where={col: "is_not_null"}`` prunes
    every file whose rows are ALL NULL in that column (null_count ==
    rows) without opening it — the IS NULL / IS NOT NULL sibling of
    x36's range skipping, and the same index Delta uses for null
    predicates. The table lands status-clustered with ``open_price``
    NULL exactly on 'O' orders, so 'O'-pure files are all-null and the
    null-count index alone decides the file list; the gate asserts
    nonzero pruning AND that pruned-scan == full-scan
    (tests/test_txlog.py round-8 class). The oracle recomputes the
    non-O aggregate from the raw table — the hash match proves null
    skipping is an I/O optimization, never a semantic change.

    Round 9: single-predicate form — ``where="open_price IS NOT
    NULL"`` states the filter once and the null-count pruning is
    derived from it (auto == hand-fed pinned in
    tests/test_round9_ops.py)."""
    import tempfile

    from ..sources import txlog

    pin_semantics(spark)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus",
        "o_totalprice",
        F.when(
            F.col("o_orderstatus") == "O", F.lit(None).cast("double")
        )
        .otherwise(F.col("o_totalprice").cast("double"))
        .alias("open_price"),
    )
    path = tempfile.mkdtemp(prefix=f"txlog_x39_{uuid.uuid4().hex[:8]}_")
    txlog.create_table(
        orders, path, cluster_by="o_orderstatus", cluster_files=8
    )
    t = txlog.read_table(spark, path, where="open_price IS NOT NULL")
    return (
        t.groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("closed_price"),
        )
    )


# ---------------------------------------------------------------------------
# x40 — incremental CDF consumer: v0 snapshot + feed == latest snapshot
# ---------------------------------------------------------------------------

_X40_CUT = "1997-01-01"

# Final state after create(pre-cut) + append(rest) + delete(P-status),
# recomputed relationally — the state an incremental consumer must
# reach by applying the feed to the v0 snapshot.
_X40_ORACLE = """
    SELECT o_orderstatus AS status,
      CAST(COUNT(*) AS BIGINT) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        AS total_price
    FROM orders WHERE o_orderstatus <> 'P'
    GROUP BY o_orderstatus
"""


@register("x40_txlog_incremental_consumer", oracle=_X40_ORACLE)
def x40_txlog_incremental_consumer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The table-as-stream-source contract, end-to-end: a downstream
    consumer that saw the v0 snapshot and then ONLY the change data
    feed must converge to the latest snapshot. After create(pre-1997)
    / append(rest) / copy-on-write delete('P'), the consumer state is
    ``v0 rows ∪ feed inserts ∖ feed deletes`` (multiset — exceptAll,
    matching the feed's own multiset semantics), and its aggregate
    hash-matches the oracle's relational recomputation of the final
    state. This is the incremental==rebuild proof (x27's SCD2 shape)
    for the txlog: if the feed ever dropped a change, double-counted
    a copy-on-write carry-over, or mis-tagged a version, the consumer
    would diverge. Scale: the consumer never re-reads untouched
    files — each feed commit reads only the files it touched
    (sources/txlog.py:change_feed)."""
    import tempfile

    from ..sources import txlog

    pin_semantics(spark)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", F.col("o_totalprice").cast("double").alias(
            "o_totalprice"
        ), "o_orderdate"
    )
    path = tempfile.mkdtemp(prefix=f"txlog_x40_{uuid.uuid4().hex[:8]}_")
    cut = F.lit(_X40_CUT).cast("date")
    txlog.create_table(orders.filter(F.col("o_orderdate") < cut), path)
    txlog.append(orders.filter(F.col("o_orderdate") >= cut), path)
    txlog.delete_where(spark, path, F.col("o_orderstatus") == "P")

    cols = ["o_orderstatus", "o_totalprice", "o_orderdate"]
    base = txlog.read_table(spark, path, version=0).select(*cols)
    feed = txlog.change_feed(spark, path, from_version=0)
    ins = feed.filter(F.col("_change") == "insert").select(*cols)
    dels = feed.filter(F.col("_change") == "delete").select(*cols)
    state = base.unionByName(ins).exceptAll(dels)
    return state.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_price"),
    )


# ---------------------------------------------------------------------------
# x41 — txlog streaming SOURCE: a stream drain delivers the exact table
# ---------------------------------------------------------------------------

_X41_ORACLE = """
    SELECT CAST(o_orderkey AS BIGINT) AS orderkey,
      o_orderstatus AS status,
      CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_cents
    FROM orders
"""


@register("x41_txlog_stream_source", oracle=_X41_ORACLE)
def x41_txlog_stream_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The txlog table consumed as a Structured Streaming SOURCE
    (``streaming/txlog_source.py``, Spark 4 Python Data Source API)
    and hash-matched row-for-row: orders land in the table across two
    commits, ``spark.readStream.format("txlog")`` drains it with an
    availableNow trigger into parquet, and the drained result must
    equal the raw table exactly — offsets are commit versions, each
    microbatch reads only the files its commits added, executors
    yield Arrow RecordBatches. The restart/exactly-once/append-only
    contracts are pinned in tests/test_txlog_source.py; this row is
    the driver-visible value-exactness proof."""
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
    )
    path = tempfile.mkdtemp(prefix=f"txlog_x41_{uuid.uuid4().hex[:8]}_")
    txlog.create_table(orders.filter(F.col("orderkey") % 2 == 0), path)
    txlog.append(orders.filter(F.col("orderkey") % 2 == 1), path)
    out = tempfile.mkdtemp(prefix=f"txlog_x41_out_{uuid.uuid4().hex[:8]}_")
    ckpt = tempfile.mkdtemp(prefix=f"txlog_x41_ck_{uuid.uuid4().hex[:8]}_")
    q = (
        spark.readStream.format("txlog")
        .option("path", path)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        # a timed-out drain would leave the stream running while we
        # read a PARTIAL output directory — surface loudly instead of
        # returning a flaky row count (round-8 advice)
        q.stop()
        raise TimeoutError("x41 availableNow drain did not finish in 300s")
    return spark.read.parquet(out).select(
        "orderkey", "status", "price_cents"
    )


# ---------------------------------------------------------------------------
# x42 — txlog BATCH format reader: version + timestamp time travel, as-of
# schema on an evolved history
# ---------------------------------------------------------------------------

_X42_CUT = "1997-01-01"

# Tags 0-2 are the three lifecycle snapshots (create pre-cut / append
# rest WITH a new column / CoW-delete F-status) read through
# spark.read.format("txlog").option("version", v); tags 3-5 re-read
# the same snapshots through option("timestampAsOf", t) with commit
# timestamps captured between commits; tag 6 duplicates tag 2 and is
# emitted only when a pre-history timestamp RAISES (the x34 pattern —
# a broken raise contract shows up as a driver row-count mismatch).
# n_cols pins AS-OF SCHEMA: the evolved column must be absent at v0.
_X42_ORACLE = f"""
    WITH base AS (
      SELECT o_orderstatus AS status,
             CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents,
             o_orderdate
      FROM orders),
    v0 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(cents) AS BIGINT) AS total_cents,
             CAST(3 AS BIGINT) AS n_cols
      FROM base WHERE o_orderdate < DATE '{_X42_CUT}'),
    v1 AS (
      SELECT CAST(COUNT(*) AS BIGINT), CAST(SUM(cents) AS BIGINT),
             CAST(4 AS BIGINT)
      FROM base),
    v2 AS (
      SELECT CAST(COUNT(*) AS BIGINT), CAST(SUM(cents) AS BIGINT),
             CAST(4 AS BIGINT)
      FROM base WHERE status <> 'F')
    SELECT 0 AS tag, * FROM v0
    UNION ALL SELECT 1, * FROM v1
    UNION ALL SELECT 2, * FROM v2
    UNION ALL SELECT 3, * FROM v0
    UNION ALL SELECT 4, * FROM v1
    UNION ALL SELECT 5, * FROM v2
    UNION ALL SELECT 6, * FROM v2
"""


@register("x42_txlog_batch_reader", oracle=_X42_ORACLE)
def x42_txlog_batch_reader(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The txlog BATCH format reader, hash-matched across the whole
    lifecycle: ``spark.read.format("txlog")`` with ``version`` time
    travel (tags 0-2), ``timestampAsOf`` time travel (tags 3-5 — the
    Delta "AS OF timestamp" resolution: newest commit at-or-before
    the requested time, with between-commit timestamps resolving
    DOWN), and AS-OF SCHEMA on an evolved history (the append adds a
    ``o_clerk_code`` column; the v0 read must have 3 columns, later
    reads 4 — ``n_cols`` carries the proof into the hash). Tag 6 is
    emitted only if a pre-history timestamp RAISES, so the error
    contract is inside the row count. The round-8 batch reader had
    only gate coverage (round-8 verdict gap #3); this is its driver
    witness, with the x40/x41 streaming twins covering the stream
    half.

    Scale: reader planning is metadata-only — one input partition per
    live file from the manifest fold; executors read their file with
    pyarrow into Arrow batches (streaming/txlog_source.py)."""
    import tempfile
    import time

    from ..sources import txlog
    from ..streaming.txlog_source import TxlogStreamSource

    pin_semantics(spark)
    spark.dataSource.register(TxlogStreamSource)
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("status"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        "o_orderdate",
    )
    path = tempfile.mkdtemp(prefix=f"txlog_x42_{uuid.uuid4().hex[:8]}_")
    cut = F.lit(_X42_CUT).cast("date")
    txlog.create_table(orders.filter(F.col("o_orderdate") < cut), path)
    t0 = time.time()
    # the append EVOLVES the schema (new column) — as-of reads at v0
    # must not see it
    txlog.append(
        orders.filter(F.col("o_orderdate") >= cut).withColumn(
            "o_clerk_code", F.lit("C9")
        ),
        path,
    )
    t1 = time.time()
    txlog.delete_where(spark, path, F.col("status") == "F")
    t2 = time.time()

    def snap(tag: int, **opt) -> DataFrame:
        r = spark.read.format("txlog").option("path", path)
        for k, v in opt.items():
            r = r.option(k, v)
        df = r.load()
        return df.agg(
            F.lit(tag).cast("int").alias("tag"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("total_cents"),
            F.lit(len(df.columns)).cast("long").alias("n_cols"),
        ).select("tag", "n_orders", "total_cents", "n_cols")

    out = snap(0, version=0)
    out = out.unionByName(snap(1, version=1))
    out = out.unionByName(snap(2, version=2))
    # between-commit timestamps resolve DOWN to the newest commit at
    # or before them: t0/t1 were captured after commits 0/1 and
    # before the next commit, t2 after the last
    out = out.unionByName(snap(3, timestampAsOf=t0))
    out = out.unionByName(snap(4, timestampAsOf=t1))
    out = out.unionByName(snap(5, timestampAsOf=t2))
    try:
        snap(-1, timestampAsOf=t0 - 3600).collect()
    except Exception:
        out = out.unionByName(snap(6))  # raise contract holds
    return out


# ---------------------------------------------------------------------------
# x43 — metadata-only COUNT(*): manifests answer counts, zero files opened
# ---------------------------------------------------------------------------

_X43_ORACLE = """
    SELECT 0 AS version, CAST(COUNT(*) AS BIGINT) AS n_rows FROM orders
    UNION ALL
    SELECT 1, CAST(COUNT(*) AS BIGINT)
    FROM orders WHERE o_orderstatus <> 'F'
    UNION ALL
    SELECT 2,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
        WHERE o_orderstatus <> 'F')
      + (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
          WHERE o_orderstatus = 'P')
"""


@register("x43_txlog_metadata_count", oracle=_X43_ORACLE)
def x43_txlog_metadata_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only COUNT(*) (``txlog.table_count``): every commit
    stamps per-file row counts from the staged parquet footers, so a
    bare count is a fold over manifests — ZERO data files opened (the
    Iceberg manifest-count trick; a 100-TB ``SELECT COUNT(*)`` costs
    one JSON replay instead of a table scan). Witness lifecycle:
    create(all orders) → CoW-delete('F') → append('P' rows again),
    counted at every version; the oracle recomputes each count
    relationally, so the hash match proves the folded counts stay
    exact through create/delete/append history. The zero-files-opened
    claim is pinned structurally in the gate: the count still answers
    after every data file is MOVED AWAY (tests/test_round9_ops.py).
    """
    import tempfile

    from ..sources import txlog

    pin_semantics(spark)
    orders = load_table(spark, sf_dir, "orders")
    path = tempfile.mkdtemp(prefix=f"txlog_x43_{uuid.uuid4().hex[:8]}_")
    txlog.create_table(orders, path)
    txlog.delete_where(spark, path, F.col("o_orderstatus") == "F")
    txlog.append(orders.filter(F.col("o_orderstatus") == "P"), path)
    rows = [
        (v, txlog.table_count(path, version=v)) for v in (0, 1, 2)
    ]
    return spark.createDataFrame(rows, "version int, n_rows long")


# ---------------------------------------------------------------------------
# x44 — format-reader FILTER PUSHDOWN: spark.read.format("txlog") +
# .filter() derives file pruning from the query predicate (Spark 4.1
# Python Data Source pushFilters), zero skipping API
# ---------------------------------------------------------------------------

_X44_CUT = "1997-06-01"

# Tags 0-2: the same post-cut slice read through three predicate
# shapes the reader's pushFilters must each compile onto the manifest
# stats — SQL-text range (0), Column-API IN + > conjunction (1), and
# NOT-of-< (2, the compiler's exact TRUE-row negation). Tag 3 re-runs
# the tag-0 read AFTER every pre-cut file has been overwritten with
# garbage bytes and is emitted only if a FULL-scan read of the
# poisoned table raises — together they prove the filtered reads
# never open the pruned files (x42's raise-contract pattern: a broken
# prune shows up as a driver row-count mismatch or a failed query,
# never a silent pass).
_X44_ORACLE = f"""
    WITH base AS (
      SELECT o_orderstatus AS status,
             CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents,
             o_orderdate
      FROM orders),
    post AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(cents) AS BIGINT) AS total_cents
      FROM base WHERE o_orderdate >= DATE '{_X44_CUT}'),
    picky AS (
      SELECT CAST(COUNT(*) AS BIGINT), CAST(SUM(cents) AS BIGINT)
      FROM base
      WHERE o_orderdate >= DATE '{_X44_CUT}'
        AND status IN ('P', 'O') AND cents > 15000000)
    SELECT 0 AS tag, * FROM post
    UNION ALL SELECT 1, * FROM picky
    UNION ALL SELECT 2, * FROM post
    UNION ALL SELECT 3, * FROM post
"""


@register("x44_txlog_filter_pushdown", oracle=_X44_ORACLE)
def x44_txlog_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-derived file pruning through the FORMAT reader: the user
    writes ``spark.read.format("txlog").load().filter(...)`` — no
    ``where=``/``skip_where`` API at all — and Spark 4.1's Python
    Data Source ``pushFilters`` hands the conjuncts to the reader,
    which compiles them onto the manifest min/max/null stats
    (sources/pruning.py) and plans only the files that MAY contain a
    TRUE row. Every filter is also kept Spark-side, so pruning is
    pure I/O elision — a wrong prune is structurally impossible.

    The witness table is range-clustered on o_orderdate so pre-cut
    files are prunable; after tags 0-2 capture three predicate shapes
    (SQL range / Column IN+> / NOT-of-<), every PRE-CUT data file is
    overwritten with garbage and tag 3 re-reads the post-cut slice —
    it can only succeed if the reader truly skipped those files, and
    it is emitted only when a full-scan read of the poisoned table
    RAISES (proof the poison is real). At 100 TB this is the path a
    BI user's dashboard filter takes: predicate → manifest stats →
    read amplification proportional to the slice, not the table.

    Scale: planning stays metadata-only (one manifest fold, no
    footer reads); pruning work is O(files), not O(rows)."""
    import os
    import tempfile

    from ..sources import txlog
    from ..streaming.txlog_source import TxlogStreamSource

    pin_semantics(spark)
    spark.dataSource.register(TxlogStreamSource)
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("status"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        "o_orderdate",
    )
    path = tempfile.mkdtemp(prefix=f"txlog_x44_{uuid.uuid4().hex[:8]}_")
    txlog.create_table(
        orders, path, cluster_by="o_orderdate", cluster_files=8
    )

    def fmt():
        return spark.read.format("txlog").option("path", path).load()

    def agg(tag: int, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(tag).cast("int").alias("tag"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("cents").cast("long").alias("total_cents"),
        ).select("tag", "n_rows", "total_cents")

    cut_sql = f"o_orderdate >= DATE '{_X44_CUT}'"
    out = agg(0, fmt().filter(cut_sql))
    out = out.unionByName(
        agg(
            1,
            fmt().filter(
                (F.col("o_orderdate") >= F.lit(_X44_CUT).cast("date"))
                & F.col("status").isin("P", "O")
                & (F.col("cents") > 15_000_000)
            ),
        )
    )
    out = out.unionByName(
        agg(2, fmt().filter(f"NOT (o_orderdate < DATE '{_X44_CUT}')"))
    )
    # poison every PRE-CUT file (the set the predicate prunes); the
    # compiled-pruning twin computes it from the same stats the
    # reader uses
    _, pruned = txlog.pruned_files(spark, path, cut_sql)
    for f in pruned:
        with open(os.path.join(path, f), "wb") as fh:
            fh.write(b"poisoned by x44: a pruned file must never be read")
    try:
        fmt().count()  # full scan MUST hit the poison
    except Exception:
        out = out.unionByName(agg(3, fmt().filter(cut_sql)))
    return out


# ---------------------------------------------------------------------------
# x45 — format WRITER: df.write.format("txlog") append/overwrite +
# writeStream exactly-once appends (streaming/txlog_writer.py)
# ---------------------------------------------------------------------------

_X45_CUT = "1997-01-01"

# Tags 0-1: create-by-append (pre-cut) then a SCHEMA-EVOLVING append
# (post-cut + o_clerk_code) — n_cols proves the manifest stamped the
# UNION schema. Tag 2: overwrite with the P-status slice — count
# proves the whole prior live set was removed in ONE atomic commit,
# n_cols proves schema REPLACE. Tag 3: version-1 time travel AFTER
# the overwrite — history intact. All four snapshots are read back
# through spark.read.format("txlog"), so the witness round-trips the
# registered source: format write → manifest → format read.
_X45_ORACLE = f"""
    WITH base AS (
      SELECT o_orderstatus AS status,
             CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents,
             o_orderdate
      FROM orders),
    v0 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(cents) AS BIGINT) AS total_cents,
             CAST(3 AS BIGINT) AS n_cols
      FROM base WHERE o_orderdate < DATE '{_X45_CUT}'),
    v1 AS (
      SELECT CAST(COUNT(*) AS BIGINT), CAST(SUM(cents) AS BIGINT),
             CAST(4 AS BIGINT)
      FROM base),
    v2 AS (
      SELECT CAST(COUNT(*) AS BIGINT), CAST(SUM(cents) AS BIGINT),
             CAST(3 AS BIGINT)
      FROM base WHERE status = 'P')
    SELECT 0 AS tag, * FROM v0
    UNION ALL SELECT 1, * FROM v1
    UNION ALL SELECT 2, * FROM v2
    UNION ALL SELECT 3, * FROM v1
"""


@register("x45_txlog_format_writer", oracle=_X45_ORACLE)
def x45_txlog_format_writer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WRITE side of the registered data source:
    ``df.write.format("txlog").mode("append"|"overwrite")`` — executors
    stream Arrow batches into collision-free parquet files (stats
    lifted from each task's own footer, so format-written files prune
    like API-written ones), the driver lands ONE atomic manifest.
    Append unions the schema (evolution carried, tag 1's n_cols=4);
    overwrite removes the whole prior live set and replaces the
    schema in one commit (tag 2); the log keeps history (tag 3 reads
    the pre-overwrite table by version). The streaming twin —
    ``writeStream.format("txlog")`` exactly-once by batch_id — is
    pinned in tests/test_round9_ops.py (replay-skip + restart-delta).

    Scale: data never touches the driver — the driver's commit work
    is O(files) action dicts + one atomic JSON rename, identical to
    every other txlog commit path."""
    import tempfile

    from ..streaming.txlog_source import TxlogStreamSource

    pin_semantics(spark)
    spark.dataSource.register(TxlogStreamSource)
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("status"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        "o_orderdate",
    )
    path = tempfile.mkdtemp(prefix=f"txlog_x45_{uuid.uuid4().hex[:8]}_") + "/t"
    cut = F.lit(_X45_CUT).cast("date")

    def w(df: DataFrame, mode: str) -> None:
        df.write.format("txlog").option("path", path).mode(mode).save()

    w(orders.filter(F.col("o_orderdate") < cut), "append")  # creates v0
    w(
        orders.filter(F.col("o_orderdate") >= cut).withColumn(
            "o_clerk_code", F.lit("C9")
        ),
        "append",
    )
    w(orders.filter(F.col("status") == "P"), "overwrite")

    def snap(tag: int, version: int) -> DataFrame:
        df = (
            spark.read.format("txlog")
            .option("path", path)
            .option("version", version)
            .load()
        )
        return df.agg(
            F.lit(tag).cast("int").alias("tag"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("cents").cast("long").alias("total_cents"),
            F.lit(len(df.columns)).cast("long").alias("n_cols"),
        ).select("tag", "n_rows", "total_cents", "n_cols")

    out = snap(0, 0)
    out = out.unionByName(snap(1, 1))
    out = out.unionByName(snap(2, 2))
    out = out.unionByName(snap(3, 1))  # history survives the overwrite
    return out


# ---------------------------------------------------------------------------
# x46 — DESCRIBE HISTORY: per-commit op/row-metrics audit from the
# manifests alone (txlog.table_history)
# ---------------------------------------------------------------------------

# The projection keeps exactly the layout-independent columns: version
# and op are structural; rows_written/rows_deleted are exact row
# counts the oracle recomputes relationally. files_added/removed and
# ts are real in the API but partition-count/wall-clock dependent, so
# the witness leaves them to the gate pins (test_round9_ops.py).
_X46_ORACLE = """
    SELECT CAST(0 AS BIGINT) AS version, 'create' AS op,
           CAST(COUNT(*) AS BIGINT) AS rows_written,
           CAST(NULL AS BIGINT) AS rows_deleted
    FROM orders
    UNION ALL
    SELECT 1, 'append',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
             WHERE o_orderstatus = 'P'),
           CAST(NULL AS BIGINT)
    UNION ALL
    SELECT 2, 'delete', CAST(NULL AS BIGINT),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
             WHERE o_orderstatus = 'F')
    UNION ALL
    SELECT 3, 'write-append',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
             WHERE o_orderstatus = 'O'),
           CAST(NULL AS BIGINT)
"""


@register("x46_txlog_table_history", oracle=_X46_ORACLE)
def x46_txlog_table_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``txlog.table_history`` — Delta's DESCRIBE HISTORY twin: one
    row per commit from the manifests alone, zero data files opened.
    The lifecycle mixes every write surface: API create, API append,
    copy-on-write DELETE, and a ``df.write.format("txlog")`` append —
    and the history's op labels plus exact rows_written/rows_deleted
    metrics hash-match the relational recomputation of each step.
    At 100 TB this is the table's audit log: what changed, by which
    op, at what write amplification — O(commits) driver-side JSON.

    Scale: the history fold never opens a data file; row metrics were
    stamped at commit time from staged parquet footers."""
    import tempfile

    from ..sources import txlog
    from ..streaming.txlog_source import TxlogStreamSource

    pin_semantics(spark)
    spark.dataSource.register(TxlogStreamSource)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = tempfile.mkdtemp(prefix=f"txlog_x46_{uuid.uuid4().hex[:8]}_")
    txlog.create_table(orders, path)
    txlog.append(orders.filter(F.col("o_orderstatus") == "P"), path)
    txlog.delete_where(spark, path, F.col("o_orderstatus") == "F")
    (
        orders.filter(F.col("o_orderstatus") == "O")
        .write.format("txlog")
        .option("path", path)
        .mode("append")
        .save()
    )
    return txlog.table_history(spark, path).select(
        "version", "op", "rows_written", "rows_deleted"
    )


# ---------------------------------------------------------------------------
# x47 — CHECK constraints: declared once, enforced on every
# data-adding commit path (sources/constraints.py)
# ---------------------------------------------------------------------------

# Tags tell the enforcement story in row counts the oracle recomputes:
# 0 = table after a conforming append under an active constraint
# (positive totals only); 1 = the table is UNCHANGED after a violating
# append RAISED (emitted only when it does raise — x42's pattern);
# 2 = after drop_constraint the same rows land (count includes them);
# 3 = adding a constraint the existing table violates RAISES and
# commits nothing (emitted only on raise; count proves no commit).
_X47_ORACLE = """
    WITH pos AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n
      FROM orders WHERE o_totalprice > 0),
    neg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n
      FROM orders WHERE o_orderstatus = 'F')
    SELECT 0 AS tag, (SELECT n FROM pos) + (SELECT n FROM pos) AS n_rows
    UNION ALL
    SELECT 1, (SELECT n FROM pos) + (SELECT n FROM pos)
    UNION ALL
    SELECT 2, (SELECT n FROM pos) + (SELECT n FROM pos)
                + (SELECT n FROM neg)
    UNION ALL
    SELECT 3, (SELECT n FROM pos) + (SELECT n FROM pos)
                + (SELECT n FROM neg)
"""


@register("x47_txlog_check_constraints", oracle=_X47_ORACLE)
def x47_txlog_check_constraints(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Delta-style CHECK constraints on the txlog table
    (``constraints.add_constraint``): declared once in the log,
    validated against the existing table at declaration, enforced on
    every subsequent data-adding commit — a violating append raises
    ``ConstraintViolation`` and commits NOTHING (tag 1 hash-proves
    the table is row-identical after the failed write; its staged
    files are unlinked). ``drop_constraint`` re-opens the gate
    (tag 2), and adding a constraint the existing data violates
    raises without committing (tag 3). The constraint set is itself
    time-travelable (newest manifest carrying ``constraints`` wins —
    the schema-field pattern), and add/drop appear in table_history.

    The witness uses a sign constraint over a derived cents column:
    the conforming stream is the positive-total orders twice, the
    violating batch is the F-status rows with NEGATED totals.

    Scale: zero cost when no constraints exist; with them, ONE count
    over the just-staged files per write — never a table rescan."""
    import tempfile

    from ..sources import constraints as C
    from ..sources import txlog

    pin_semantics(spark)
    pos = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 0
    ).select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    neg = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        (-F.floor(F.col("o_totalprice") * 100)).cast("long").alias("cents"),
    )
    path = tempfile.mkdtemp(prefix=f"txlog_x47_{uuid.uuid4().hex[:8]}_")
    txlog.create_table(pos, path)
    C.add_constraint(spark, path, "positive_cents", "cents > 0")
    txlog.append(pos, path)  # conforming: lands

    def n(tag: int) -> DataFrame:
        return spark.createDataFrame(
            [(tag, txlog.table_count(path))], "tag int, n_rows long"
        )

    out = n(0)
    try:
        txlog.append(neg, path)  # violating: must raise, commit nothing
    except C.ConstraintViolation:
        out = out.unionByName(n(1))
    C.drop_constraint(spark, path, "positive_cents")
    txlog.append(neg, path)  # gate re-opened: same rows land
    out = out.unionByName(n(2))
    try:
        # the table now HOLDS negative cents: re-adding must raise
        # at declaration time and commit nothing
        C.add_constraint(spark, path, "positive_cents", "cents > 0")
    except C.ConstraintViolation:
        out = out.unionByName(n(3))
    return out
