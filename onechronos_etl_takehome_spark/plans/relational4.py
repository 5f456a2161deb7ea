"""Relational surface, batch 4: the remaining classic TPC-H shapes —
market-share ratio of conditional sums (Q8), revenue-share HAVING
against an in-plan global aggregate (Q11), and scalar-subquery filter
plus anti-join (Q22) — adapted to the testdata schema (no partsupp
table, no phone/comment columns)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import dec
from ..session import pin_semantics
from ..sources.tables import load_table
from .catalog import register


def _volume() -> F.Column:
    """Exact decimal revenue volume: extendedprice * (1 - discount)."""
    return dec("l_extendedprice") * (F.lit(1) - dec("l_discount", 3, 2))


_VOLUME_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (1 - CAST(l_discount AS DECIMAL(3,2)))"
)


@register(
    "q51_nation_market_share",
    oracle=f"""
    SELECT yr,
      COALESCE(CAST(SUM(CASE WHEN supp_nation = 'NATION_2'
                             THEN volume END) AS DOUBLE), 0.0)
        / CAST(SUM(volume) AS DOUBLE) AS mkt_share,
      CAST(SUM(volume) AS DOUBLE) AS total_volume
    FROM (
      SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
        n1.n_name AS supp_nation, {_VOLUME_SQL} AS volume
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      JOIN region ON n2.n_regionkey = r_regionkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO')
    GROUP BY yr
    """,
)
def q51_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q8 shape: per-year share of a market (PROMO parts sold to
    # ASIA customers) captured by one supplier nation — a ratio of a
    # conditional decimal sum over the total, as ONE double division.
    # The conditional sum uses when→NULL (not else-0) so no cross-engine
    # type promotion is involved; COALESCE restores 0 for empty years.
    pin_semantics(spark)
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = F.broadcast(
        n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    )
    n2 = F.broadcast(
        n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region"))
    )
    supp_vol = F.sum(F.when(F.col("supp_nation") == "NATION_2", _volume()))
    total_vol = F.sum(_volume())
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n1, s.s_nationkey == F.col("n1_key"))
        .join(n2, c.c_nationkey == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n2_region") == r.r_regionkey)
        .groupBy(F.year("o_orderdate").alias("yr"))
        .agg(
            F.coalesce(
                supp_vol.cast("double"), F.lit(0.0)
            ).alias("_supp"),
            total_vol.cast("double").alias("total_volume"),
        )
        .select(
            "yr",
            (F.col("_supp") / F.col("total_volume")).alias("mkt_share"),
            "total_volume",
        )
    )


@register(
    "q52_important_brands",
    oracle=f"""
    WITH brand_rev AS (
      SELECT p_brand, SUM({_VOLUME_SQL}) AS rev_dec
      FROM lineitem JOIN part ON p_partkey = l_partkey
      GROUP BY p_brand)
    SELECT p_brand, CAST(rev_dec AS DOUBLE) AS revenue
    FROM brand_rev,
      (SELECT SUM(rev_dec) AS total_dec FROM brand_rev) g
    WHERE CAST(rev_dec AS DOUBLE) > CAST(total_dec AS DOUBLE) * 0.02
    """,
)
def q52_important_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q11 shape (adapted — no partsupp table): keep groups whose
    # aggregate exceeds a fraction of the GLOBAL aggregate. The global
    # total is an in-plan 1-row aggregate cross-joined back (broadcast),
    # not a driver-side collect — one pass over the fact table feeds
    # both sums. Threshold compare happens on doubles derived from the
    # same exact decimals on both engines.
    pin_semantics(spark)
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    brand_rev = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(F.sum(_volume()).alias("rev_dec"))
    )
    total = brand_rev.agg(F.sum("rev_dec").alias("total_dec"))
    return (
        brand_rev.crossJoin(F.broadcast(total))
        .filter(
            F.col("rev_dec").cast("double")
            > F.col("total_dec").cast("double") * F.lit(0.02)
        )
        .select("p_brand", F.col("rev_dec").cast("double").alias("revenue"))
    )


@register(
    "q54_sole_delayed_supplier",
    oracle="""
    WITH sl AS (
      SELECT DISTINCT l_orderkey, l_suppkey
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY),
    al AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM sl l1 JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE EXISTS (SELECT 1 FROM al l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM sl l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q54_sole_delayed_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q21 shape (adapted — ship-delay stands in for the missing
    # receipt/commit dates): suppliers who were the ONLY late shipper
    # on a multi-supplier order. The signature pattern is the double
    # correlated self-reference — EXISTS (another supplier on the
    # order) AND NOT EXISTS (another LATE supplier on the order) —
    # expressed as a semi-join + anti-join over two distinct
    # (orderkey, suppkey) sets, both shuffled once on orderkey.
    pin_semantics(spark)
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    late = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    all_supp = l.select("l_orderkey", "l_suppkey").distinct()
    l1 = late.alias("l1")
    others = all_supp.alias("l2")
    other_late = late.alias("l3")
    sole_late = (
        l1.join(
            others,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            "left_semi",
        ).join(
            other_late,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
            "left_anti",
        )
    )
    return (
        sole_late.join(F.broadcast(s), F.col("l1.l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )


@register(
    "q53_wealthy_inactive_customers",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS v
      FROM customer WHERE c_acctbal > 0.0)
    SELECT c_mktsegment,
      COUNT(*) AS n_customers,
      CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
    FROM customer, avg_bal
    WHERE c_acctbal > v
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    """,
)
def q53_wealthy_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q22 shape: scalar-subquery threshold (average balance of
    # in-the-black customers, one double division of exact parts) +
    # NOT EXISTS anti-join against a filtered fact, aggregated by
    # segment. The scalar is a broadcast 1-row aggregate; the anti-join
    # side is pre-filtered so only urgent orders shuffle.
    pin_semantics(spark)
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(dec("c_acctbal")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("v")
    )
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("v"))
        .join(urgent, c.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(dec("c_acctbal")).cast("double").alias("total_bal"),
        )
    )


@register(
    "q55_priority_metrics_unpivot",
    oracle="""
    WITH m AS (
      SELECT o_orderpriority,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
          AS sum_total,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
          / CAST(COUNT(*) AS DOUBLE) AS avg_total,
        CAST(COUNT(*) AS DOUBLE) AS n_orders
      FROM orders GROUP BY o_orderpriority)
    SELECT o_orderpriority, 'sum_total' AS metric, sum_total AS value FROM m
    UNION ALL
    SELECT o_orderpriority, 'avg_total', avg_total FROM m
    UNION ALL
    SELECT o_orderpriority, 'n_orders', n_orders FROM m
    """,
)
def q55_priority_metrics_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): wide per-priority metric columns → long
    (priority, metric, value) rows — the inverse of q28's pivot and the
    standard reshape before charting/feature stores. Spark's native
    unpivot keeps it one projection over the aggregate (no UNION of
    re-scans, which is what the SQL oracle must spell)."""
    pin_semantics(spark)
    o = load_table(spark, sf_dir, "orders")
    wide = o.groupBy("o_orderpriority").agg(
        F.sum(dec("o_totalprice", 14, 2)).cast("double").alias("sum_total"),
        (
            F.sum(dec("o_totalprice", 14, 2)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avg_total"),
        F.count(F.lit(1)).cast("double").alias("n_orders"),
    )
    return wide.unpivot(
        ids=["o_orderpriority"],
        values=["sum_total", "avg_total", "n_orders"],
        variableColumnName="metric",
        valueColumnName="value",
    )


_Q56_SQL = """
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
    FROM customer c,
    LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 2
    ) o
    WHERE c.c_mktsegment = 'BUILDING'
    """


@register("q56_lateral_top_orders", oracle=_Q56_SQL)
def q56_lateral_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery: each BUILDING customer's two
    priciest orders. The same text runs on both engines (DuckDB
    executes the oracle verbatim); Catalyst decorrelates the lateral
    limit into a ranked window under the hood — the per-group top-k
    a warehouse user writes as LATERAL instead of ROW_NUMBER (q05
    witnesses the window spelling)."""
    from ..sources.tables import register_views

    pin_semantics(spark)
    register_views(spark, sf_dir)
    return spark.sql(_Q56_SQL)


# ---------------------------------------------------------------------------
# q57 — interval overlap join: cross-user concurrent sessions
# ---------------------------------------------------------------------------

_Q57_SQL = """
    WITH g AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
             THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
      SELECT user_id, ts_us,
        SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                          ROWS UNBOUNDED PRECEDING) AS sno
      FROM g),
    sess AS (
      SELECT user_id, sno,
             MIN(ts_us) AS s_us, MAX(ts_us) AS e_us
      FROM s GROUP BY user_id, sno),
    pairs AS (
      SELECT a.user_id AS user_a, b.user_id AS user_b,
             LEAST(a.e_us, b.e_us) - GREATEST(a.s_us, b.s_us) AS ov
      FROM sess a JOIN sess b
        ON a.user_id < b.user_id
       AND a.s_us <= b.e_us AND b.s_us <= a.e_us)
    SELECT user_a, user_b,
           CAST(COUNT(*) AS BIGINT) AS n_overlaps,
           CAST(SUM(ov) AS BIGINT) AS total_overlap_us
    FROM pairs GROUP BY user_a, user_b
    """


@register("q57_concurrent_sessions", oracle=_Q57_SQL)
def q57_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join: which user pairs were on the site at
    the same time, and for how long.  Sessions are q18's 30-minute-gap
    sessionization (integer-µs bounds); the overlap join is the
    bucketed range join (operators/intervals.py) — explode each session
    into the 6-hour time bins it touches, equi-join on the bin, verify
    the exact predicate, dedup pairs — where the oracle (and a naive
    Spark plan) writes the quadratic inequality join.  Hash-match
    proves the binning lossless; inclusive endpoints (touching sessions
    count with overlap 0) on both sides."""
    pin_semantics(spark)
    from ..operators.intervals import interval_overlap_pairs

    e = load_table(spark, sf_dir, "events")
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_us = F.lag(F.unix_micros("ts")).over(w)
    is_new = F.when(
        prev_us.isNull() | ((F.unix_micros("ts") - prev_us) > 1_800_000_000), 1
    ).otherwise(0)
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = (
        e.select(
            "user_id",
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            is_new.alias("is_new"),
        )
        .withColumn("sno", F.sum("is_new").over(wrun))
        .groupBy("user_id", "sno")
        .agg(F.min("ts_us").alias("s_us"), F.max("ts_us").alias("e_us"))
        # interval ids must be unique AND monotone in user_id so the
        # operator's id_a < id_b pair order implies user_a <= user_b;
        # sno is 1-based and far below the 2^20 packing headroom.
        .select(
            (F.col("user_id") * F.lit(1 << 20) + F.col("sno")).alias("sid"),
            "user_id",
            "s_us",
            "e_us",
        )
    )
    pairs = interval_overlap_pairs(
        sess,
        "sid",
        "s_us",
        "e_us",
        bin_us=21_600_000_000,  # 6 h ≈ typical session length ceiling
        carry=["user_id"],
    )
    return (
        pairs.filter(F.col("user_id_a") != F.col("user_id_b"))
        .groupBy(
            F.col("user_id_a").alias("user_a"),
            F.col("user_id_b").alias("user_b"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_overlaps"),
            F.sum("overlap_us").cast("long").alias("total_overlap_us"),
        )
    )
