"""LLM-data-pipeline + analytics queries, round 4 continued (batch f).

Graph structure (degree-oriented triangle counting), interval overlap
(bucketed range self-join over sessionized events), single-pass data
profiling (Deequ-style constraint suite), bounded-lag EWMA smoothing,
and interpolation-free bigram LM scoring.  All five are DuckDB-oracled
hash-matched; the cross-engine exactness tricks are the established
ones (integer aggregates, fixed-order double tails, integer-µs time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.graph import triangle_stats
from ..operators.intervals import interval_overlap_pairs
from ..operators.text import tokens
from ..session import pin_semantics
from ..sources.tables import load_table
from .catalog import register


# ---------------------------------------------------------------------------
# x19 — triangle census of the part co-occurrence graph
# ---------------------------------------------------------------------------

_X19_ORACLE = """
    WITH pl AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM pl a JOIN pl b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    ends AS (SELECT u AS n FROM edges UNION ALL SELECT v FROM edges),
    deg AS (SELECT n, COUNT(*) AS d FROM ends GROUP BY n),
    tri AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
      FROM edges e1
      JOIN edges e2 ON e2.u = e1.v
      JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v),
    st AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
             CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS n_wedges
      FROM deg),
    ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM edges)
    SELECT n_nodes, n_edges, n_wedges, n_triangles,
           CASE WHEN n_wedges > 0
                THEN 3.0 * CAST(n_triangles AS DOUBLE)
                     / CAST(n_wedges AS DOUBLE)
                ELSE 0.0 END AS global_clustering
    FROM st CROSS JOIN ne CROSS JOIN tri
    """


@register("x19_triangle_count", oracle=_X19_ORACLE)
def x19_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the "parts bought together" graph (an edge
    joins two parts that share an order).  The Spark plan is the
    degree-oriented wedge join (operators/graph.py) — out-degrees
    bounded by O(√m) after orientation, so the wedge fan-out is
    O(m^1.5) instead of Σ deg² — while the oracle counts id-ordered
    triangles with plain joins; the hash-match proves the orientation
    exact.  Community structure / co-occurrence density is the usual
    first screen on an interaction graph before heavier clustering."""
    pin_semantics(spark)
    li = load_table(spark, sf_dir, "lineitem")
    pl = li.select("l_orderkey", "l_partkey").distinct()
    a = pl.select("l_orderkey", F.col("l_partkey").alias("u"))
    b = pl.select("l_orderkey", F.col("l_partkey").alias("v"))
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )
    return triangle_stats(edges)


# ---------------------------------------------------------------------------
# x20 — bounded-lag EWMA smoothing of per-user event values
# ---------------------------------------------------------------------------

# The half-weight EWMA over the last 4 observations, written as ONE
# fixed-order arithmetic expression: multiplications by 0.5/0.25/0.125
# are exact (exponent shifts), additions are left-folded in the same
# textual order in both engines, and missing lags contribute exact-zero
# terms with their weights removed from the denominator.  Result: the
# same IEEE ops in the same order → bit-identical doubles, no decimal
# quantization needed.

_X20_ORACLE = """
    WITH o AS (
      SELECT event_id, user_id, value,
        lag(value, 1) OVER w AS l1,
        lag(value, 2) OVER w AS l2,
        lag(value, 3) OVER w AS l3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT event_id, user_id,
      (((value + 0.5 * COALESCE(l1, 0.0)) + 0.25 * COALESCE(l2, 0.0))
        + 0.125 * COALESCE(l3, 0.0))
      / (((1.0 + CASE WHEN l1 IS NULL THEN 0.0 ELSE 0.5 END)
          + CASE WHEN l2 IS NULL THEN 0.0 ELSE 0.25 END)
         + CASE WHEN l3 IS NULL THEN 0.0 ELSE 0.125 END) AS ewma
    FROM o
    """


@register("x20_ewma_smoothing", oracle=_X20_ORACLE)
def x20_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA (half-life decay over the 4 most recent events) —
    the standard smoothing pass before thresholding a noisy metric
    stream.  A bounded-lag formulation instead of the recursive one:
    the recursion needs either an iterative driver loop or a stateful
    UDF, while 4 explicit lags are one window pass, whole-stage
    codegen, and (with power-of-two weights and a fixed fold order)
    bitwise cross-engine reproducible.  One shuffle on user_id."""
    pin_semantics(spark)
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    l1, l2, l3 = (F.lag("value", i).over(w) for i in (1, 2, 3))
    num = (
        (F.col("value") + F.lit(0.5) * F.coalesce(l1, F.lit(0.0)))
        + F.lit(0.25) * F.coalesce(l2, F.lit(0.0))
    ) + F.lit(0.125) * F.coalesce(l3, F.lit(0.0))
    den = (
        (
            F.lit(1.0)
            + F.when(l1.isNull(), F.lit(0.0)).otherwise(F.lit(0.5))
        )
        + F.when(l2.isNull(), F.lit(0.0)).otherwise(F.lit(0.25))
    ) + F.when(l3.isNull(), F.lit(0.0)).otherwise(F.lit(0.125))
    return e.select(
        "event_id", "user_id", (num / den).alias("ewma")
    )


# ---------------------------------------------------------------------------
# x21 — single-pass data profiling + constraint suite (Deequ-style)
# ---------------------------------------------------------------------------

_X21_ORACLE = """
    WITH m AS (
      SELECT
        CAST(COUNT(*) AS BIGINT) AS n_rows,
        CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS v_null_key,
        CAST(SUM(CASE WHEN l_quantity IS NULL
                      OR l_quantity < 1 OR l_quantity > 50
                 THEN 1 ELSE 0 END) AS BIGINT) AS v_qty,
        CAST(SUM(CASE WHEN l_discount IS NULL
                      OR l_discount < 0.0 OR l_discount > 0.1
                 THEN 1 ELSE 0 END) AS BIGINT) AS v_disc,
        CAST(SUM(CASE WHEN l_returnflag IS NULL
                      OR l_returnflag NOT IN ('A', 'N', 'R')
                 THEN 1 ELSE 0 END) AS BIGINT) AS v_flag,
        CAST(SUM(CASE WHEN l_shipdate IS NULL
                      OR l_shipdate < DATE '1992-01-01'
                      OR l_shipdate > DATE '1998-12-31'
                 THEN 1 ELSE 0 END) AS BIGINT) AS v_ship,
        CAST(COUNT(*) - COUNT(DISTINCT l_orderkey * 8 + l_linenumber)
             AS BIGINT) AS v_pk
      FROM lineitem)
    SELECT c.constraint_name, m.n_rows, c.n_violations,
           c.n_violations = 0 AS passed
    FROM m, LATERAL (VALUES
      ('orderkey_not_null', v_null_key),
      ('quantity_in_1_50', v_qty),
      ('discount_in_0_01', v_disc),
      ('returnflag_domain', v_flag),
      ('shipdate_in_range', v_ship),
      ('pk_orderkey_linenumber_unique', v_pk)
    ) AS c(constraint_name, n_violations)
    """


@register("x21_profile_constraints", oracle=_X21_ORACLE)
def x21_profile_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style data-quality gate: six constraints (completeness,
    two numeric ranges, a domain check, a date range, and a composite
    primary-key uniqueness check) evaluated in ONE aggregation pass
    over lineitem — map-side partials, no per-constraint scans — then
    unpivoted to a (constraint, n_rows, n_violations, passed) report.
    Violation counters are null-inclusive (an un-checkable row is a
    violation, the conservative gate); the PK check counts rows minus
    distinct packed keys (l_linenumber < 8, so orderkey·8+linenumber
    is an exact integer pack on both engines)."""
    pin_semantics(spark)
    li = load_table(spark, sf_dir, "lineitem")

    def viol(cond):  # null-inclusive violation counter
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    q, d, fl, sd = (F.col(c) for c in
                    ("l_quantity", "l_discount", "l_returnflag", "l_shipdate"))
    one = li.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        viol(F.col("l_orderkey").isNull()).alias("v_null_key"),
        viol(q.isNull() | (q < 1) | (q > 50)).alias("v_qty"),
        viol(d.isNull() | (d < 0.0) | (d > 0.1)).alias("v_disc"),
        viol(fl.isNull() | ~fl.isin("A", "N", "R")).alias("v_flag"),
        viol(
            sd.isNull()
            | (sd < F.lit("1992-01-01").cast("date"))
            | (sd > F.lit("1998-12-31").cast("date"))
        ).alias("v_ship"),
        (
            F.count(F.lit(1))
            - F.countDistinct(
                F.col("l_orderkey") * 8 + F.col("l_linenumber")
            )
        ).cast("long").alias("v_pk"),
    )
    report = one.select(
        "n_rows",
        F.expr(
            "stack(6, "
            "'orderkey_not_null', v_null_key, "
            "'quantity_in_1_50', v_qty, "
            "'discount_in_0_01', v_disc, "
            "'returnflag_domain', v_flag, "
            "'shipdate_in_range', v_ship, "
            "'pk_orderkey_linenumber_unique', v_pk) "
            "AS (constraint_name, n_violations)"
        ),
    )
    return report.select(
        "constraint_name",
        "n_rows",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )


# ---------------------------------------------------------------------------
# t18 — bigram LM typicality (micro-averaged conditional probability)
# ---------------------------------------------------------------------------

_T18_ORACLE = """
    WITH tok AS (
      SELECT doc_id, pos, tok
      FROM (SELECT doc_id,
                   unnest(string_split(text, ' ')) AS tok,
                   generate_subscripts(string_split(text, ' '), 1) AS pos
            FROM documents)),
    bg AS (
      SELECT a.doc_id, a.tok AS w1, b.tok AS w2
      FROM tok a JOIN tok b
        ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
    bfreq AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY w1, w2),
    pfreq AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY w1)
    SELECT bg.doc_id,
      CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      CAST(SUM(f.c12) AS BIGINT) AS sum_bigram_tf,
      CAST(SUM(p.c1) AS BIGINT) AS sum_prefix_tf,
      CAST(SUM(f.c12) AS DOUBLE) / CAST(SUM(p.c1) AS DOUBLE)
        AS micro_cond_prob
    FROM bg
    JOIN bfreq f ON bg.w1 = f.w1 AND bg.w2 = f.w2
    JOIN pfreq p ON bg.w1 = p.w1
    GROUP BY bg.doc_id
    """


@register("t18_bigram_lm_score", oracle=_T18_ORACLE)
def t18_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram LM typicality per document — the
    sequence-aware sibling of t15's unigram score (a doc of common
    words in an unusual order now scores low).  Score is the
    micro-averaged conditional probability Σc(w1,w2)/Σc(w1·) — a ratio
    of two exact BIGINT sums with one final double division, chosen
    over the classical mean-log form for the same reason as t15/t17:
    libm-log sums cannot hash-match across engines, integer ratios can.
    Plan shape: tokenize once, build bigrams JVM-side with
    transform+slice (no posexplode self-join), ONE exploded bigram
    frame feeds both frequency tables, per-doc scoring is one groupBy."""
    pin_semantics(spark)
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    # zip each token with its successor: [w1 w2, w2 w3, ...]
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    bg = docs.select(
        "doc_id", F.explode(bigrams).alias("_bg")
    ).select(
        "doc_id",
        F.col("_bg").alias("bigram"),
        F.split("_bg", " ").getItem(0).alias("w1"),
    )
    bfreq = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("_c12"))
    pfreq = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("_c1"))
    scored = (
        bg.join(bfreq, "bigram")
        .join(pfreq, "w1")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("_c12").cast("long").alias("sum_bigram_tf"),
            F.sum("_c1").cast("long").alias("sum_prefix_tf"),
        )
    )
    return scored.select(
        "doc_id",
        "n_bigrams",
        "sum_bigram_tf",
        "sum_prefix_tf",
        (
            F.col("sum_bigram_tf").cast("double")
            / F.col("sum_prefix_tf").cast("double")
        ).alias("micro_cond_prob"),
    )


# ---------------------------------------------------------------------------
# x22 — sequence packing (concat-order offsets on the distributed
# prefix sum)
# ---------------------------------------------------------------------------

_X22_ORACLE = """
    WITH t AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents),
    c AS (
      SELECT doc_id, n_tokens,
        CAST(SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
             - n_tokens AS BIGINT) AS start_offset
      FROM t)
    SELECT doc_id, n_tokens, start_offset,
           CAST(start_offset // 256 AS BIGINT) AS seq_id,
           (start_offset % 256) + n_tokens > 256 AS crosses_boundary
    FROM c
    """


@register("x22_sequence_packing", oracle=_X22_ORACLE)
def x22_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining sequence packing, the bookkeeping pass: concatenate
    documents in deterministic doc_id order and assign each its token
    start offset and the capacity-256 training sequence it opens
    in (concat-then-chunk packing; ``crosses_boundary`` marks docs a
    loader must split across sequences).  The cumulative offset is the
    two-pass bucketed prefix sum (operators/sampling.py — per-bucket
    windows + broadcast bucket offsets, no global single-task window),
    the same machinery x16/x17 witness for sampling and percentiles,
    here witnessed for the packing shape every LLM data loader needs.
    All columns are exact integers / booleans."""
    pin_semantics(spark)
    from ..operators.sampling import prefix_sum
    from ..operators.text import token_count

    cap = 256
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    )
    cum = prefix_sum(docs, "doc_id", "n_tokens", "cum_tokens")
    start = F.col("cum_tokens") - F.col("n_tokens")
    return cum.select(
        "doc_id",
        "n_tokens",
        start.alias("start_offset"),
        F.expr(f"(cum_tokens - n_tokens) div {cap}").alias("seq_id"),
        ((start % cap) + F.col("n_tokens") > cap).alias("crosses_boundary"),
    )
