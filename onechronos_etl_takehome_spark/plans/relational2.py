"""Relational surface, batch 2: grouping sets, set ops, percentiles,
window frames, array/string aggregation, regexp, scalar subqueries,
pivot, rank-based top-k.

Same cross-engine exactness discipline as relational.py: decimal math
for re-aggregated doubles, BIGINT casts for counts, deterministic
orderings for any LIMIT/rank."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.exact import dec, money_sum
from ..session import pin_semantics
from ..sources.tables import load_table
from .catalog import register


@register(
    "q20_cube_order_stats",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
)
def q20_cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_semantics(spark)
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        money_sum(dec("o_totalprice"), "revenue"),
    )


@register(
    "q21_active_building_customers",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def q21_active_building_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_semantics(spark)
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return a.intersect(b)


@register(
    "q22_quantity_percentiles",
    oracle="""
    SELECT l_returnflag,
      quantile_cont(l_quantity, 0.5) AS p50,
      quantile_cont(l_quantity, 0.9) AS p90,
      CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
      CAST(MAX(l_quantity) AS DOUBLE) AS max_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q22_quantity_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spark `percentile` and DuckDB `quantile_cont` both implement the
    # linear-interpolation continuous quantile; on integral doubles the
    # interpolation arithmetic is identical.
    pin_semantics(spark)
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", F.lit(0.5)).alias("p50"),
        F.percentile("l_quantity", F.lit(0.9)).alias("p90"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


@register(
    "q23_customer_status_sets",
    oracle="""
    SELECT c_custkey,
      array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
      COUNT(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey
    """,
)
def q23_customer_status_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The distinct-status set is emitted as a ','-joined string: identical
    # semantics (sets are sorted first) and hashable by pandas-side
    # canonicalizers, unlike array<string> output.
    pin_semantics(spark)
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey")
        .agg(
            F.array_join(F.sort_array(F.collect_set("o_orderstatus")), ",").alias(
                "statuses"
            ),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "q24_part_name_regexp",
    oracle="""
    SELECT p_partkey,
      regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
      CASE WHEN regexp_matches(p_name, '^(gold|silver)') THEN 1 ELSE 0 END
        AS is_metal_first
    FROM part
    """,
)
def q24_part_name_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_semantics(spark)
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
        F.when(F.col("p_name").rlike(r"^(gold|silver)"), 1)
        .otherwise(0)
        .alias("is_metal_first"),
    )


@register(
    "q25_rolling_customer_spend",
    oracle="""
    SELECT o_orderkey, o_custkey,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
        AS rolling_spend,
      CAST(COUNT(*) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_in_frame
    FROM orders
    """,
)
def q25_rolling_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Decimal SUM over the frame → frame-order independent, exact.
    pin_semantics(spark)
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("rolling_spend"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_in_frame"),
    )


@register(
    "q26_order_gaps",
    oracle="""
    SELECT o_orderkey, o_custkey,
      lag(o_orderkey) OVER w AS prev_orderkey,
      lead(o_orderkey) OVER w AS next_orderkey,
      first_value(o_orderkey) OVER w AS first_orderkey
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q26_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_semantics(spark)
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
        F.first("o_orderkey").over(w).alias("first_orderkey"),
    )


@register(
    "q27_above_average_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > (
      SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE)
      FROM orders)
    """,
)
def q27_above_average_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scalar subquery as a broadcast cross join of a 1-row aggregate —
    # the distributed equivalent of a correlated-free scalar subquery.
    pin_semantics(spark)
    o = load_table(spark, sf_dir, "orders")
    avg_df = o.agg(
        (F.sum(dec("o_totalprice")).cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "_avg"
        )
    )
    return (
        o.crossJoin(F.broadcast(avg_df))
        .filter(F.col("o_totalprice") > F.col("_avg"))
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "q28_segment_status_pivot",
    oracle="""
    SELECT c_mktsegment,
      CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
        AS f_orders,
      CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT)
        AS o_orders,
      CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT)
        AS p_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def q28_segment_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Native pivot API (values enumerated → single-pass, no extra scan).
    pin_semantics(spark)
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    piv = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "c_mktsegment",
        F.coalesce(F.col("F"), F.lit(0)).cast("long").alias("f_orders"),
        F.coalesce(F.col("O"), F.lit(0)).cast("long").alias("o_orders"),
        F.coalesce(F.col("P"), F.lit(0)).cast("long").alias("p_orders"),
    )


@register(
    "q29_priciest_parts_ranked",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice, rnk FROM (
      SELECT p_brand, p_partkey, p_retailprice,
        CAST(RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC)
             AS BIGINT) AS rnk
      FROM part)
    WHERE rnk <= 3
    """,
)
def q29_priciest_parts_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    # rank() (with gaps) rather than row_number: ties all surface, so
    # the result is deterministic without a tie-breaker.
    pin_semantics(spark)
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc())
    return p.select(
        "p_brand",
        "p_partkey",
        "p_retailprice",
        F.rank().over(w).cast("long").alias("rnk"),
    ).filter(F.col("rnk") <= 3)


@register(
    "q30_nation_name_roster",
    oracle="""
    SELECT n_name,
      string_agg(s_name, ',' ORDER BY s_name) AS suppliers,
      COUNT(*) AS n_suppliers
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def q30_nation_name_roster(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_semantics(spark)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.array_join(F.sort_array(F.collect_list("s_name")), ",").alias(
                "suppliers"
            ),
            F.count(F.lit(1)).alias("n_suppliers"),
        )
    )


@register(
    "q31_small_quantity_revenue",
    oracle="""
    WITH thresholds AS (
      SELECT l_partkey AS t_partkey,
        0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE)) AS threshold
      FROM lineitem GROUP BY l_partkey)
    SELECT
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
        AS avg_yearly,
      COUNT(*) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN thresholds ON t_partkey = l_partkey
    WHERE p_brand = 'Brand#1' AND l_quantity < threshold
    """,
)
def q31_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q17 shape: the correlated scalar subquery (per-part average)
    # decorrelates into an aggregate + equi-join — Catalyst does the
    # same rewrite for a SQL-spelled correlated subquery.
    pin_semantics(spark)
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    thresholds = l.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (
            F.lit(0.2)
            * (
                F.sum(dec("l_quantity")).cast("double")
                / F.count(F.lit(1)).cast("double")
            )
        ).alias("threshold")
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(thresholds, l.l_partkey == thresholds.t_partkey)
        .filter(F.col("l_quantity") < F.col("threshold"))
        .agg(
            (F.sum(dec("l_extendedprice")).cast("double") / 7.0).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q32_large_volume_orders",
    oracle="""
    SELECT c_custkey, o_orderkey,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey, o_orderkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150
    """,
)
def q32_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_semantics(spark)
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "o_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("_q"))
        .filter(F.col("_q") > 150)
        .select(
            "c_custkey", "o_orderkey", F.col("_q").cast("double").alias("total_qty")
        )
    )


@register(
    "q33_user_event_extremes",
    oracle="""
    SELECT user_id,
      arg_min(event_id, ts) AS first_event_id,
      arg_max(event_id, ts) AS last_event_id,
      COUNT(*) AS n_events
    FROM events GROUP BY user_id
    """,
)
def q33_user_event_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    # min_by/max_by ≡ DuckDB arg_min/arg_max; ts is micros-unique per
    # user in this data, so the argmax is well-defined cross-engine.
    pin_semantics(spark)
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.min_by("event_id", "ts").alias("first_event_id"),
        F.max_by("event_id", "ts").alias("last_event_id"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "q34_f_minus_urgent_multiset",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def q34_f_minus_urgent_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    # EXCEPT ALL: multiset difference (duplicates subtract one-for-one),
    # vs q15's distinct EXCEPT.
    pin_semantics(spark)
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return a.exceptAll(b)


@register(
    "q35_doc_array_ops",
    oracle="""
    SELECT doc_id,
      list_contains(string_split(text, ' '), 'the') AS has_the,
      array_to_string((string_split(text, ' '))[1:5], ' ') AS first5,
      CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_unique
    FROM documents
    """,
)
def q35_doc_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_semantics(spark)
    d = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    return d.select(
        "doc_id",
        F.array_contains(words, "the").alias("has_the"),
        F.concat_ws(" ", F.slice(words, 1, 5)).alias("first5"),
        F.size(F.array_distinct(words)).cast("long").alias("n_unique"),
    )


@register(
    "q36_orders_by_weekday",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
      CAST(isodow(o_orderdate) - 1 AS INTEGER) AS dow_mon0,
      COUNT(*) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
    FROM orders GROUP BY 1, 2
    """,
)
def q36_orders_by_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    # weekday(): 0=Monday in Spark ≡ isodow-1 in DuckDB.
    pin_semantics(spark)
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(
        F.year("o_orderdate").alias("yr"),
        F.weekday("o_orderdate").alias("dow_mon0"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        money_sum(dec("o_totalprice"), "revenue"),
    )


@register(
    "q37_sql_entrypoint",
    oracle="""
    SELECT r_name,
      COUNT(*) AS n_customers,
      CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_balance
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def q37_sql_entrypoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's raw-SQL surface: users run spark.sql over the
    registered views (sources/tables.register_views) — same text a
    warehouse user would write, Catalyst plans it like the DataFrame
    API (broadcasts, pushdown identical)."""
    from ..sources.tables import register_views

    pin_semantics(spark)
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT r_name,
          COUNT(*) AS n_customers,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_balance
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
        """
    )


@register(
    "q38_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
      CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
           AS BIGINT) AS gid,
      COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def q38_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Explicit GROUPING SETS + GROUPING() markers (disambiguates real
    # NULL group keys from subtotal rows) via the SQL surface.
    from ..sources.tables import register_views

    pin_semantics(spark)
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
          CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
               AS BIGINT) AS gid,
          COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "d05_deterministic_dedup",
    oracle="""
    SELECT user_id, event_type, MIN(event_id) AS event_id
    FROM events GROUP BY user_id, event_type
    """,
)
def d05_deterministic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # deterministic_dedup keeps the min-event_id row per key — unlike
    # dropDuplicates, rerun/partitioning can't change survivors; the
    # oracle is the equivalent MIN-per-group.
    from ..operators.dedup import deterministic_dedup

    pin_semantics(spark)
    e = load_table(spark, sf_dir, "events")
    return deterministic_dedup(
        e, ["user_id", "event_type"], [F.col("event_id")]
    ).select("user_id", "event_type", "event_id")


@register(
    "v01_validate_lineitem",
    oracle="""
    SELECT l_orderkey, l_linenumber,
      COALESCE(array_to_string(list_filter([
        CASE WHEN NOT (l_quantity > 0 AND l_quantity <= 45)
             THEN 'QUANTITY_OUT_OF_RANGE' END,
        CASE WHEN NOT (l_extendedprice > 0) THEN 'PRICE_INVALID' END,
        CASE WHEN NOT (l_discount >= 0 AND l_discount <= 0.08)
             THEN 'DISCOUNT_OUT_OF_RANGE' END
      ], x -> x IS NOT NULL), ', '), '') AS exception_type,
      (l_quantity > 0 AND l_quantity <= 45)
        AND (l_extendedprice > 0)
        AND (l_discount >= 0 AND l_discount <= 0.08) AS is_valid
    FROM lineitem
    """,
)
def v01_validate_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The declarative rules engine (pipeline/rules.py) applied outside
    the reconciliation pipeline — same accumulate-exceptions shape the
    reference hardcodes (etl_pipeline.py:167-218), arbitrary table."""
    from ..pipeline.rules import TypeRule, apply_rules

    pin_semantics(spark)
    l = load_table(spark, sf_dir, "lineitem")
    type_rules = [
        TypeRule(
            "QUANTITY_OUT_OF_RANGE",
            lambda: (F.col("l_quantity") > 0) & (F.col("l_quantity") <= 45),
        ),
        TypeRule("PRICE_INVALID", lambda: F.col("l_extendedprice") > 0),
        TypeRule(
            "DISCOUNT_OUT_OF_RANGE",
            lambda: (F.col("l_discount") >= 0) & (F.col("l_discount") <= 0.08),
        ),
    ]
    out = apply_rules(l, type_rules=type_rules, detail_rules=[])
    return out.select(
        "l_orderkey",
        "l_linenumber",
        F.array_join("exception_types", ", ").alias("exception_type"),
        "is_valid",
    )
