"""Relational surface, batch 3: percent-of-total windows, min-per-group
subqueries, disjunctive predicate pushdown, NOT LIKE / NOT IN
anti-patterns — the remaining TPC-H-shaped operator witnesses."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.exact import dec, money_sum
from ..session import pin_semantics
from ..sources.tables import load_table
from .catalog import register


@register(
    "q39_nation_revenue_share",
    oracle="""
    WITH nat AS (
      SELECT n_name,
        SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev_dec
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name)
    SELECT n_name, CAST(rev_dec AS DOUBLE) AS revenue,
      CAST(rev_dec AS DOUBLE) / CAST(SUM(rev_dec) OVER () AS DOUBLE) AS share
    FROM nat
    """,
)
def q39_nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Percent-of-total: unpartitioned window over an aggregate. The
    # total must be summed in DECIMAL through the window — summing the
    # per-nation doubles would be order-dependent and diverge between
    # engines in the last ulp.
    pin_semantics(spark)
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    nat = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(dec("o_totalprice")).alias("rev_dec"))
    )
    w = Window.partitionBy()
    return nat.select(
        "n_name",
        F.col("rev_dec").cast("double").alias("revenue"),
        (
            F.col("rev_dec").cast("double")
            / F.sum("rev_dec").over(w).cast("double")
        ).alias("share"),
    )


@register(
    "q40_poorest_supplier_per_nation",
    oracle="""
    SELECT n_name, s.s_suppkey, s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation ON s.s_nationkey = n_nationkey
    WHERE s.s_acctbal = (
      SELECT MIN(s2.s_acctbal) FROM supplier s2
      WHERE s2.s_nationkey = s.s_nationkey)
    """,
)
def q40_poorest_supplier_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Correlated MIN subquery (TPC-H Q2 shape) ≡ windowed min + equality
    # filter — keeps ALL tied rows, unlike row_number top-1.
    pin_semantics(spark)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("s_nationkey")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .withColumn("_min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("_min_bal"))
        .select("n_name", "s_suppkey", "s_name", "s_acctbal")
    )


@register(
    "q41_promo_revenue_share",
    oracle="""
    SELECT
      100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
        THEN CAST(l_extendedprice AS DECIMAL(12,2))
             * (1 - CAST(l_discount AS DECIMAL(3,2)))
        ELSE 0 END) AS DOUBLE)
      / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
        AS promo_pct,
      COUNT(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1997-02-01'
    """,
)
def q41_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q14: conditional share of revenue.
    pin_semantics(spark)
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-02-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = dec("l_extendedprice") * (F.lit(1) - dec("l_discount", 3, 2))
    joined = l.join(p, l.l_partkey == p.p_partkey)
    return joined.agg(
        (
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))).cast(
                "double"
            )
            / F.sum(rev).cast("double")
        ).alias("promo_pct"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q42_disjunctive_bands",
    oracle="""
    SELECT COUNT(*) AS n,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size <= 10 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size <= 20 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size <= 30 AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q42_disjunctive_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q19 shape: OR-of-conjunctions across both join sides —
    # Catalyst extracts the common l_quantity/p_size bounds for pushdown.
    pin_semantics(spark)
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    joined = l.join(p, l.l_partkey == p.p_partkey)
    band = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 10)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size") <= 20)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 30)
           & F.col("l_quantity").between(20, 30))
    )
    return joined.filter(band).agg(
        F.count(F.lit(1)).alias("n"),
        money_sum(dec("l_extendedprice"), "revenue"),
    )


@register(
    "q44_null_safe_join",
    oracle="""
    WITH keyed AS (
      SELECT event_id,
        CASE WHEN value < 1 THEN NULL ELSE event_type END AS k
      FROM events)
    SELECT a.k AS k, COUNT(*) AS n_pairs
    FROM keyed a JOIN keyed b
      ON a.k IS NOT DISTINCT FROM b.k AND a.event_id < b.event_id
    GROUP BY a.k
    """,
)
def q44_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Null-safe equality (<=> / IS NOT DISTINCT FROM): NULL keys match
    # each other — a plain equi-join silently drops them.
    pin_semantics(spark)
    e = load_table(spark, sf_dir, "events")
    keyed = e.select(
        "event_id",
        F.when(F.col("value") < 1, F.lit(None))
        .otherwise(F.col("event_type"))
        .alias("k"),
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    return (
        a.join(
            b,
            F.col("a.k").eqNullSafe(F.col("b.k"))
            & (F.col("a.event_id") < F.col("b.event_id")),
        )
        .groupBy(F.col("a.k").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "q45_nation_revenue_quartiles",
    oracle="""
    WITH nat AS (
      SELECT n_name,
        SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev_dec
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name)
    SELECT n_name, CAST(rev_dec AS DOUBLE) AS revenue,
      CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
      CUME_DIST() OVER w AS cume
    FROM nat
    WINDOW w AS (ORDER BY rev_dec DESC, n_name)
    """,
)
def q45_nation_revenue_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ntile + cume_dist over a decimal-exact ordering (ties broken by
    # name → identical ranking both engines; cume_dist = rational
    # count/count, one double division).
    pin_semantics(spark)
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    nat = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(dec("o_totalprice")).alias("rev_dec"))
    )
    w = Window.orderBy(F.col("rev_dec").desc(), F.col("n_name"))
    return nat.select(
        "n_name",
        F.col("rev_dec").cast("double").alias("revenue"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.cume_dist().over(w).alias("cume"),
    )


@register(
    "q46_nation_trade_flows",
    oracle="""
    SELECT supp_nation, cust_nation, yr,
      CAST(SUM(volume) AS DOUBLE) AS revenue, COUNT(*) AS n
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        CAST(year(l_shipdate) AS INTEGER) AS yr,
        CAST(l_extendedprice AS DECIMAL(12,2))
          * (1 - CAST(l_discount AS DECIMAL(3,2))) AS volume
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE n1.n_name IN ('NATION_1', 'NATION_2')
        AND n2.n_name IN ('NATION_1', 'NATION_2')
        AND n1.n_name <> n2.n_name)
    GROUP BY supp_nation, cust_nation, yr
    """,
)
def q46_nation_trade_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q7 shape: 6-way join with a dimension used twice under
    # different aliases (supplier nation vs customer nation).
    pin_semantics(spark)
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = F.broadcast(n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("NATION_1", "NATION_2")))
    n2 = F.broadcast(n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_1", "NATION_2")))
    volume = dec("l_extendedprice") * (F.lit(1) - dec("l_discount", 3, 2))
    return (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n1, s.s_nationkey == F.col("n1_key"))
        .join(n2, c.c_nationkey == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("yr"),
        )
        .agg(
            F.sum(volume).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "q47_trailing_30d_spend",
    oracle="""
    SELECT o_orderkey, o_custkey,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
        PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
        RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS DOUBLE)
        AS trailing_30d
    FROM orders
    """,
)
def q47_trailing_30d_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Time-based RANGE frame: all orders of the customer within the
    # trailing 30 days (inclusive), regardless of row count — ordered
    # by epoch seconds so both engines share the numeric frame. Decimal
    # sum → frame-order independent.
    pin_semantics(spark)
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-2_592_000, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("trailing_30d"),
    )


@register(
    "q48_price_moments",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
        COUNT(*) AS n,
        SUM(CAST(l_quantity AS DECIMAL(12,0))) AS sq,
        SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
                 AS DECIMAL(16,0))) AS sp,
        SUM(CAST(l_quantity AS DECIMAL(12,0))
            * CAST(l_quantity AS DECIMAL(12,0))) AS sqq,
        SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
                 AS DECIMAL(16,0))
            * CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
                   AS DECIMAL(16,0))) AS spp,
        SUM(CAST(l_quantity AS DECIMAL(12,0))
            * CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
                   AS DECIMAL(16,0))) AS sqp
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, n,
      (CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE)
         / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE) AS var_qty,
      sqrt((CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE)
         / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE)) / 100.0
        AS stddev_price,
      (CAST(sqp AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sp AS DOUBLE)
         / CAST(n AS DOUBLE))
        / sqrt((CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE)
                / CAST(n AS DOUBLE))
             * (CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE)
                / CAST(n AS DOUBLE))) AS corr_qty_price
    FROM m
    """,
)
def q48_price_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance / stddev / correlation computed from exact decimal
    moments. Built-in stddev/corr stream doubles through Welford-style
    updates whose result depends on partition order — fine for
    statistics, fatal for reproducibility gates.

    All moments are scale-0 decimals (prices in integer cents): casting
    a scale-0 decimal to double is a SINGLE integer→double rounding in
    every engine, whereas scaled decimals go through value/10^scale —
    two roundings that diverge in the last ulp between engines. Unit
    factors (100, 100²) are restored in double afterwards; they cancel
    entirely in the correlation."""
    pin_semantics(spark)
    l = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("decimal(12,0)")
    p = (dec("l_extendedprice") * 100).cast("decimal(16,0)")
    m = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).alias("sq"),
        F.sum(p).alias("sp"),
        F.sum(q * q).alias("sqq"),
        F.sum(p * p).alias("spp"),
        F.sum(q * p).alias("sqp"),
    )
    nd = F.col("n").cast("double")
    sq, sp = F.col("sq").cast("double"), F.col("sp").cast("double")
    sqq, spp, sqp = (
        F.col("sqq").cast("double"),
        F.col("spp").cast("double"),
        F.col("sqp").cast("double"),
    )
    css_q = sqq - sq * sq / nd
    css_p = spp - sp * sp / nd
    return m.select(
        "l_returnflag",
        "n",
        (css_q / (F.col("n") - 1).cast("double")).alias("var_qty"),
        (F.sqrt(css_p / (F.col("n") - 1).cast("double")) / 100.0).alias(
            "stddev_price"
        ),
        ((sqp - sq * sp / nd) / F.sqrt(css_q * css_p)).alias("corr_qty_price"),
    )


@register(
    "q49_null_handling_functions",
    oracle="""
    SELECT c_custkey,
      NULLIF(c_mktsegment, 'BUILDING') AS seg_or_null,
      COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'SUPPRESSED') AS seg_display,
      CASE WHEN NULLIF(c_mktsegment, 'BUILDING') IS NULL
           THEN 0 ELSE 1 END AS is_visible
    FROM customer
    """,
)
def q49_null_handling_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_semantics(spark)
    c = load_table(spark, sf_dir, "customer")
    seg_or_null = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    return c.select(
        "c_custkey",
        seg_or_null.alias("seg_or_null"),
        F.coalesce(seg_or_null, F.lit("SUPPRESSED")).alias("seg_display"),
        F.when(seg_or_null.isNull(), 0).otherwise(1).alias("is_visible"),
    )


@register(
    "q50_filtered_aggregates",
    oracle="""
    SELECT o_orderpriority,
      COUNT(*) AS n_total,
      COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
           FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS finished_revenue
    FROM orders GROUP BY o_orderpriority
    """,
)
def q50_filtered_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    # FILTER-clause aggregates ≡ count/sum over when(): one pass, no
    # self-join — the idiomatic conditional-aggregation form.
    pin_semantics(spark)
    o = load_table(spark, sf_dir, "orders")
    is_f = F.col("o_orderstatus") == "F"
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(is_f, 1)).alias("n_finished"),
        F.sum(F.when(is_f, dec("o_totalprice"))).cast("double").alias(
            "finished_revenue"
        ),
    )


@register("x02_approx_percentiles")  # t-digest/GK sketch → rows-only
def x02_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx: mergeable quantile sketch (map-side partials)
    vs q22's exact interpolated percentile — the 100-TB path for
    quantiles. Accuracy bounded in tests/test_sketches.py."""
    pin_semantics(spark)
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", [0.5, 0.9, 0.99], 10_000).alias(
            "approx_pcts"
        ),
        F.percentile("l_extendedprice", F.lit(0.5)).alias("exact_p50"),
    )


@register(
    "q43_types_excluding_suppliers",
    oracle="""
    SELECT p_type, p_brand,
      COUNT(DISTINCT s_suppkey) AS n_suppliers
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE p_type NOT LIKE 'PROMO%'
      AND s_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_type, p_brand
    """,
)
def q43_types_excluding_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q16 shape: NOT LIKE + NOT IN (both NULL-free here → the
    # anti-join rewrite is safe).
    pin_semantics(spark)
    p = load_table(spark, sf_dir, "part").filter(~F.col("p_type").like("PROMO%"))
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    bad = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    good = s.join(bad, "s_suppkey", "left_anti")
    return (
        p.join(l, p.p_partkey == l.l_partkey)
        .join(good, l.l_suppkey == good.s_suppkey)
        .groupBy("p_type", "p_brand")
        .agg(F.countDistinct("s_suppkey").alias("n_suppliers"))
    )
