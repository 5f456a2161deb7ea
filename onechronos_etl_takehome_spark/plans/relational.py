"""Relational query surface (SURVEY.md §2 generalized; Phase 2 of §7).

The reference's relational footprint is projections/filters/left joins/
dedup (SURVEY.md §2.2-2.4); a user of a real engine needs the full
surface: aggregation, windows, rollup, set ops, semi/anti joins, range
joins, as-of joins, string/date/JSON functions, top-k. Each query here
is an operator-coverage witness: idiomatic DataFrame code on the Spark
side, ANSI SQL oracle on the DuckDB side.

Scale notes are inline per query; the common ones:
- dimension joins (region/nation/customer-at-small-SF) are broadcast —
  `F.broadcast` hints where Catalyst's 10 MB threshold may not see it;
- aggregates are partial (map-side combine) automatically via groupBy;
- every scan takes pushed filters + pruned columns (verified via
  .explain("formatted") — PushedFilters/ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.exact import dec, money_sum, ratio_avg
from ..session import pin_semantics
from ..sources.tables import load_table
from .catalog import register

# ---------------------------------------------------------------------------
# q01: scan → filter → groupBy agg (TPC-H Q1 shape). Reference parity:
# generalizes the groupBy/agg the reference lacks (SURVEY.md §2.4 notes
# "no groupBy().agg() anywhere").
# ---------------------------------------------------------------------------


@register(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l_discount AS DECIMAL(3,2)))
               * (1 + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE) AS sum_charge,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
        / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
        / CAST(COUNT(*) AS DOUBLE) AS avg_price,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_semantics(spark)
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp")
    )
    disc_price = dec("l_extendedprice") * (F.lit(1) - dec("l_discount", 3, 2))
    charge = disc_price * (F.lit(1) + dec("l_tax", 3, 2))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        money_sum(dec("l_quantity"), "sum_qty"),
        money_sum(dec("l_extendedprice"), "sum_base_price"),
        money_sum(disc_price, "sum_disc_price"),
        money_sum(charge, "sum_charge"),
        ratio_avg(dec("l_quantity"), "avg_qty"),
        ratio_avg(dec("l_extendedprice"), "avg_price"),
        F.count(F.lit(1)).alias("count_order"),
    )


# ---------------------------------------------------------------------------
# q02: multi-way equi-join snowflake rollup — broadcast dims.
# ---------------------------------------------------------------------------


@register(
    "q02_revenue_by_nation",
    oracle="""
    SELECT r_name, n_name,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
      COUNT(*) AS num_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE o_orderstatus = 'F'
    GROUP BY r_name, n_name
    """,
)
def q02_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_semantics(spark)
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    # nation/region are tiny at every SF: force broadcast so the only
    # shuffle is the orders⋈customer key exchange + final agg.
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.groupBy("r_name", "n_name").agg(
        money_sum(dec("o_totalprice"), "revenue"),
        F.count(F.lit(1)).alias("num_orders"),
    )


# ---------------------------------------------------------------------------
# q03: join + agg + deterministic top-k (TPC-H Q3 shape).
# ---------------------------------------------------------------------------


@register(
    "q03_top_revenue_orders",
    oracle="""
    SELECT l_orderkey,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue,
      strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
      o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1999-01-01'
      AND l_shipdate > TIMESTAMP '1999-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q03_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_semantics(spark)
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1999-01-01").cast("timestamp")
    )
    revenue = dec("l_extendedprice") * (F.lit(1) - dec("l_discount", 3, 2))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(money_sum(revenue, "revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        # revenue is decimal-exact on both engines → identical sort keys;
        # l_orderkey breaks ties deterministically. TakeOrderedAndProject
        # keeps top-k distributed (no global sort materialization).
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q04: EXISTS / left-semi join with correlated range predicate.
# ---------------------------------------------------------------------------


@register(
    "q04_order_priority_late",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    """,
)
def q04_order_priority_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_semantics(spark)
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    semi = o.join(
        l,
        (o.o_orderkey == l.l_orderkey)
        & (l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


# ---------------------------------------------------------------------------
# q05: window function — top-N orders per customer (deterministic ties).
# ---------------------------------------------------------------------------


@register(
    "q05_top_orders_per_customer",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice, rn FROM (
      SELECT c_custkey, c_name, o_orderkey, o_totalprice,
        ROW_NUMBER() OVER (
          PARTITION BY c_custkey
          ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders JOIN customer ON o_custkey = c_custkey)
    WHERE rn <= 3
    """,
)
def q05_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_semantics(spark)
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


# ---------------------------------------------------------------------------
# q06: selective scan-aggregate (TPC-H Q6 shape) — pushdown witness.
# ---------------------------------------------------------------------------


@register(
    "q06_promo_revenue",
    oracle="""
    SELECT
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue,
      COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q06_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_semantics(spark)
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.03, 0.07))
        & (F.col("l_quantity") < 24)
    )
    return l.agg(
        money_sum(dec("l_extendedprice") * dec("l_discount", 3, 2), "revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# q07: left outer join + two-level aggregation (TPC-H Q13 shape).
# ---------------------------------------------------------------------------


@register(
    "q07_customer_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey)
    GROUP BY c_count
    """,
)
def q07_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_semantics(spark)
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------------------
# q08: ROLLUP grouping sets.
# ---------------------------------------------------------------------------


@register(
    "q08_rollup_returns",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n_lines,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def q08_rollup_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_semantics(spark)
    l = load_table(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_lines"),
        money_sum(dec("l_quantity"), "sum_qty"),
    )


# ---------------------------------------------------------------------------
# q09: distinct aggregates alongside plain aggregates.
# ---------------------------------------------------------------------------


@register(
    "q09_nation_customer_stats",
    oracle="""
    SELECT n_name,
      COUNT(DISTINCT c_mktsegment) AS n_segments,
      COUNT(*) AS n_customers,
      CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def q09_nation_customer_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_semantics(spark)
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.countDistinct("c_mktsegment").alias("n_segments"),
            F.count(F.lit(1)).alias("n_customers"),
            money_sum(dec("c_acctbal"), "total_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# q10: conditional aggregation (manual pivot) over events.
# ---------------------------------------------------------------------------


@register(
    "q10_daily_event_pivot",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
      CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
      CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views,
      CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
        AS purchases,
      CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT)
        AS signups,
      CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors,
      CAST(SUM(CASE WHEN event_type = 'purchase'
                    THEN CAST(value AS DECIMAL(14,2)) ELSE 0 END) AS DOUBLE)
        AS purchase_value
    FROM events
    GROUP BY 1
    """,
)
def q10_daily_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_semantics(spark)
    e = load_table(spark, sf_dir, "events")

    def flag(t: str) -> F.Column:
        return F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).cast("long")

    return e.groupBy(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
    ).agg(
        flag("click").alias("clicks"),
        flag("view").alias("views"),
        flag("purchase").alias("purchases"),
        flag("signup").alias("signups"),
        flag("error").alias("errors"),
        F.sum(
            F.when(F.col("event_type") == "purchase", dec("value", 14, 2)).otherwise(
                F.lit(0)
            )
        )
        .cast("double")
        .alias("purchase_value"),
    )


# ---------------------------------------------------------------------------
# q11: string function library.
# ---------------------------------------------------------------------------


@register(
    "q11_part_strings",
    oracle="""
    SELECT p_partkey,
      UPPER(p_brand) AS brand_u,
      SUBSTR(p_name, 1, 8) AS name_prefix,
      CAST(LENGTH(p_name) AS BIGINT) AS name_len,
      CONCAT(p_brand, ':', p_type) AS brand_type
    FROM part
    WHERE p_name LIKE '%gold%' OR p_size >= 40
    """,
)
def q11_part_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_semantics(spark)
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%gold%") | (F.col("p_size") >= 40)
    )
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").cast("long").alias("name_len"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
    )


# ---------------------------------------------------------------------------
# q12: date functions — month bucketing.
# ---------------------------------------------------------------------------


@register(
    "q12_monthly_order_volume",
    oracle="""
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
      COUNT(*) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY 1
    """,
)
def q12_monthly_order_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_semantics(spark)
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        money_sum(dec("o_totalprice"), "revenue"),
    )


# ---------------------------------------------------------------------------
# q13: JSON extraction from a string column.
# ---------------------------------------------------------------------------


@register(
    "q13_json_props",
    oracle="""
    SELECT event_type,
      CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT)
        AS sum_k,
      COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def q13_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_semantics(spark)
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("int")).alias("sum_k"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# q14: set operations (UNION distinct).
# ---------------------------------------------------------------------------


@register(
    "q14_vip_customer_keys",
    oracle="""
    SELECT c_custkey FROM customer
      WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 9000
    UNION
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 450000
    """,
)
def q14_vip_customer_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_semantics(spark)
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    a = c.filter((F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 9000)).select(
        "c_custkey"
    )
    b = o.filter(F.col("o_totalprice") > 450000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return a.union(b).distinct()


# ---------------------------------------------------------------------------
# q15: EXCEPT (set difference) + anti join in one pair of queries.
# ---------------------------------------------------------------------------


@register(
    "q15_building_without_open_orders",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def q15_building_without_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_semantics(spark)
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return a.subtract(b)


@register(
    "q16_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def q16_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_semantics(spark)
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# ---------------------------------------------------------------------------
# q17: range join (equi key + interval band predicate).
# ---------------------------------------------------------------------------


@register(
    "q17_shipments_within_60d",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_lines
    FROM lineitem JOIN orders
      ON l_orderkey = o_orderkey
     AND l_shipdate >= o_orderdate
     AND l_shipdate < o_orderdate + INTERVAL 60 DAY
    GROUP BY o_orderpriority
    """,
)
def q17_shipments_within_60d(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_semantics(spark)
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    # Equi-key carries the hash join; the band predicate is a post-join
    # filter — no nested-loop blowup at scale.
    joined = l.join(
        o,
        (l.l_orderkey == o.o_orderkey)
        & (l.l_shipdate >= o.o_orderdate)
        & (l.l_shipdate < o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
    )
    return joined.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_lines"))


# ---------------------------------------------------------------------------
# q18: sessionization — gap-based session assignment via window lag.
# Batch twin of the streaming session operator (streaming/).
# ---------------------------------------------------------------------------


@register(
    "q18_user_sessions",
    oracle="""
    WITH g AS (
      SELECT user_id, event_id,
        CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
             THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT user_id,
      CAST(SUM(is_new) AS BIGINT) AS n_sessions,
      COUNT(*) AS n_events
    FROM g GROUP BY user_id
    """,
)
def q18_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_semantics(spark)
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Integer microsecond arithmetic on both engines — no float drift.
    prev_us = F.lag(F.unix_micros("ts")).over(w)
    is_new = F.when(
        prev_us.isNull() | ((F.unix_micros("ts") - prev_us) > 1_800_000_000), 1
    ).otherwise(0)
    return (
        e.select("user_id", "event_id", is_new.alias("is_new"))
        .groupBy("user_id")
        .agg(
            F.sum("is_new").cast("long").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# q19: as-of join — for each purchase, the latest prior view per user.
# Spark lacks a native as-of join; operators/asof.py implements it as a
# union + last(ignorenulls) window (single shuffle, no correlated scan).
# ---------------------------------------------------------------------------


@register(
    "q19_purchase_last_view_asof",
    oracle="""
    WITH ranked AS (
      SELECT p.event_id, p.user_id, v.event_id AS view_event_id,
        ROW_NUMBER() OVER (
          PARTITION BY p.event_id
          ORDER BY v.ts DESC, v.event_id DESC) AS rn
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
        ON v.user_id = p.user_id AND v.ts <= p.ts)
    SELECT event_id, user_id, view_event_id FROM ranked WHERE rn = 1
    """,
)
def q19_purchase_last_view_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_semantics(spark)
    from ..operators.asof import asof_join

    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_event_id")
    )
    out = asof_join(
        purchases,
        views,
        by=["user_id"],
        ts="ts",
        right_cols=["view_event_id"],
        tie_breakers=["view_event_id"],
    )
    return out.select("event_id", "user_id", "view_event_id")
