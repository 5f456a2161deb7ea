"""LLM-data-pipeline queries, round 4 continued.

Character-level fuzzy matching (deletion-neighborhood edit-distance
join), BM25 sparse retrieval, and systematic PPS weighted sampling on
a distributed prefix sum. All three are DuckDB-oracled hash-matched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sampling import systematic_pps_sample
from ..operators.strings import edit_distance_join
from ..operators.text import bm25_topk
from ..session import pin_semantics
from ..sources.tables import load_table
from .catalog import register


# ---------------------------------------------------------------------------
# d17 — edit-distance join (FastSS deletion neighborhoods)
# ---------------------------------------------------------------------------

_D17_ORACLE = """
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
    FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    """


@register("d17_edit_distance_pairs", oracle=_D17_ORACLE)
def d17_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level fuzzy join: every customer-name pair within
    edit distance 1 (typo'd IDs / entity resolution). The Spark plan is
    the lossless FastSS deletion-neighborhood signature join
    (operators/strings.py) — candidates from a signature equi-join,
    exact ``levenshtein`` verify on survivors only — while the oracle
    brute-forces all pairs; hash-match proves the blocking lossless.
    Integer distances, no float anywhere."""
    pin_semantics(spark)
    cust = load_table(spark, sf_dir, "customer")
    return edit_distance_join(cust, "c_custkey", "c_name")


# ---------------------------------------------------------------------------
# t16 — BM25 retrieval
# ---------------------------------------------------------------------------

_T16_TERMS = ("hash", "merge", "vector", "filter")


def _t16_oracle(k1: float = 1.2, b: float = 0.75, topk: int = 10) -> str:
    terms = ", ".join(f"'{t}'" for t in _T16_TERMS)
    # Literal constants rendered from the same Python floats the Spark
    # side uses, so both engines evaluate the identical fixed-order
    # double expression (then quantize to DECIMAL(28,12) pre-SUM).
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents),
    dl AS (SELECT doc_id, COUNT(*) AS dl_n FROM tok GROUP BY doc_id),
    stats AS (SELECT COUNT(*) AS n_docs, SUM(dl_n) AS sum_dl FROM dl),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf_n FROM tok
           WHERE token IN ({terms}) GROUP BY doc_id, token),
    dfreq AS (SELECT token, COUNT(*) AS df_n FROM tf GROUP BY token),
    scored AS (
      SELECT t.doc_id,
        SUM(CAST(
          ((CAST(n_docs AS DOUBLE) - CAST(df_n AS DOUBLE) + 0.5)
             / (CAST(df_n AS DOUBLE) + 0.5))
          * ((CAST(tf_n AS DOUBLE) * CAST({k1 + 1.0!r} AS DOUBLE))
             / (CAST(tf_n AS DOUBLE) + CAST({k1!r} AS DOUBLE)
                * (CAST({1.0 - b!r} AS DOUBLE) + CAST({b!r} AS DOUBLE)
                   * (CAST(dl_n AS DOUBLE)
                      / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
          AS DECIMAL(28,12))) AS score_dec
      FROM tf t JOIN dfreq USING (token) JOIN dl USING (doc_id)
      CROSS JOIN stats
      GROUP BY t.doc_id)
    SELECT doc_id, CAST(score_dec AS DOUBLE) AS score,
           CAST(rn AS BIGINT) AS rank
    FROM (SELECT doc_id, score_dec,
                 ROW_NUMBER() OVER (ORDER BY score_dec DESC, doc_id) AS rn
          FROM scored)
    WHERE rn <= {topk}
    """


@register("t16_bm25_topk", oracle=_t16_oracle())
def t16_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 sparse retrieval over the documents corpus for a fixed
    query-term bag — the scorer used to mine topic-relevant training
    data. Rational Robertson idf (no libm log → cross-engine exact; see
    operators/text.py:bm25_topk), decimal-quantized per-term partials,
    TakeOrdered shortlist."""
    pin_semantics(spark)
    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, "doc_id", "text", list(_T16_TERMS))


# ---------------------------------------------------------------------------
# x16 — systematic PPS weighted sample
# ---------------------------------------------------------------------------

_X16_N = 100

_X16_ORACLE = f"""
    WITH w AS (
      SELECT o_orderkey, CAST(floor(o_totalprice * 100) AS BIGINT) AS wt
      FROM orders),
    c AS (SELECT o_orderkey, wt,
            SUM(wt) OVER (ORDER BY o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cum
          FROM w),
    t AS (SELECT SUM(wt) AS total FROM w)
    SELECT o_orderkey, wt AS weight,
           CAST((cum * {_X16_N}) // total
                - ((cum - wt) * {_X16_N}) // total AS BIGINT) AS multiplicity
    FROM c CROSS JOIN t
    WHERE (cum * {_X16_N}) // total > ((cum - wt) * {_X16_N}) // total
    """


@register("x16_weighted_sample", oracle=_X16_ORACLE)
def x16_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic probability-proportional-to-size sample of orders
    weighted by total price (integer cents): exactly 100 draws, heavy
    rows drawn with multiplicity. The oracle's single global window IS
    the semantics; the Spark plan computes the identical prefix sum
    with the two-pass bucketed shape (operators/sampling.py) — no
    global single-task window — and hash-matches it."""
    pin_semantics(spark)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("wt"),
    )
    return systematic_pps_sample(orders, "o_orderkey", "wt", _X16_N)


# ---------------------------------------------------------------------------
# e02 — sliding event-time windows
# ---------------------------------------------------------------------------

_E02_ORACLE = """
    SELECT strftime(make_timestamp(
             ((CAST(floor(epoch(ts)) AS BIGINT) // 7200 - k) * 7200)
             * 1000000), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total_value
    FROM events CROSS JOIN (SELECT unnest([0, 1, 2]) AS k)
    GROUP BY 1, 2
    """


@register("e02_sliding_event_windows", oracle=_E02_ORACLE)
def e02_sliding_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (6h window, 2h slide): count, distinct
    users, and exact-decimal value sum per (window, event_type). The
    e-family's overlap witness next to e01's tumbling hour — Spark
    explodes each event into its 3 covering windows JVM-side
    (``F.window``); the oracle derives the same epoch-aligned starts
    with integer arithmetic."""
    from ..functions.exact import dec, money_sum

    pin_semantics(spark)
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "6 hours", "2 hours").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            money_sum(dec("value", 14, 2), "total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n",
            "n_users",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# x17 — exact weighted percentiles on the distributed prefix sum
# ---------------------------------------------------------------------------

_X17_PCTS = (50, 90, 99)

_X17_ORACLE = f"""
    WITH w AS (
      SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents,
             CAST(floor(l_quantity) AS BIGINT) AS wt,
             l_orderkey, l_linenumber
      FROM lineitem),
    c AS (SELECT cents, wt,
            SUM(wt) OVER (ORDER BY cents, l_orderkey, l_linenumber
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cum
          FROM w),
    t AS (SELECT SUM(wt) AS total FROM w)
    SELECT CAST(pct AS BIGINT) AS pct,
           CAST(MIN(cents) AS DOUBLE) / 100.0 AS value
    FROM c CROSS JOIN t
    CROSS JOIN (SELECT unnest([{', '.join(map(str, _X17_PCTS))}]) AS pct)
    WHERE cum * 100 >= pct * total
    GROUP BY 1
    """


@register("x17_weighted_percentiles", oracle=_X17_ORACLE)
def x17_weighted_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantity-weighted price percentiles over lineitem
    (weighted median / p90 / p99): the smallest price whose cumulative
    quantity reaches pct% of total — integer threshold math, no float
    interpolation. q22 witnesses unweighted exact percentiles via a
    global sort; this is the WEIGHTED form on the bucketed two-pass
    prefix sum (operators/sampling.py) — no global window, no full
    sort — and it hash-matches the oracle's single-window restatement."""
    pin_semantics(spark)
    from ..operators.sampling import weighted_percentiles

    li = load_table(spark, sf_dir, "lineitem").select(
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.floor(F.col("l_quantity")).cast("long").alias("wt"),
        "l_orderkey",
        "l_linenumber",
    )
    out = weighted_percentiles(
        li, "cents", "wt", list(_X17_PCTS),
        tiebreak_cols=["l_orderkey", "l_linenumber"],
    )
    return out.select(
        F.col("pct").cast("long").alias("pct"),
        (F.col("value").cast("double") / F.lit(100.0)).alias("value"),
    )


# ---------------------------------------------------------------------------
# d18 — PassJoin generalized edit-distance join (tau = 2)
# ---------------------------------------------------------------------------

_D18_ORACLE = """
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
    FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 2
    """


@register("d18_passjoin_pairs", oracle=_D18_ORACLE)
def d18_passjoin_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance join generalized past k=1: every customer-name
    pair within levenshtein 2 via PassJoin segment signatures
    (operators/strings.py:passjoin_pairs — pigeonhole segments +
    bounded-shift substring probes, exact verify). Hash-matching the
    brute-force oracle proves the blocking lossless at tau=2; the
    ``max_seg_df`` posting cap is the scale lever for ubiquitous-
    prefix skew (capped form pinned as a subset in tests)."""
    pin_semantics(spark)
    from ..operators.strings import passjoin_pairs

    cust = load_table(spark, sf_dir, "customer")
    return passjoin_pairs(cust, "c_custkey", "c_name", tau=2)


# ---------------------------------------------------------------------------
# d19 — end-to-end entity resolution (block → fuzzy match → cluster →
# survivor)
# ---------------------------------------------------------------------------

_D19_ORACLE = """
    WITH pairs AS (
      SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
      FROM customer a JOIN customer b
        ON a.c_custkey < b.c_custkey
       AND a.c_nationkey = b.c_nationkey
       AND levenshtein(a.c_name, b.c_name) <= 1),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs),
    reach AS (
      WITH RECURSIVE r(node, root) AS (
        SELECT c_custkey, c_custkey FROM customer
        UNION
        SELECT e.dst, r.root FROM r JOIN edges e ON e.src = r.node)
      SELECT * FROM r),
    comps AS (SELECT node AS c_custkey, MIN(root) AS entity_id
              FROM reach GROUP BY node),
    members AS (
      SELECT comps.entity_id, c.c_custkey, c.c_name, c.c_acctbal
      FROM comps JOIN customer c USING (c_custkey))
    SELECT m.entity_id, n.n_members,
           m.c_custkey AS survivor_custkey, m.c_name AS survivor_name
    FROM (SELECT entity_id, c_custkey, c_name,
                 ROW_NUMBER() OVER (PARTITION BY entity_id
                                    ORDER BY c_acctbal DESC, c_custkey)
                   AS rn
          FROM members) m
    JOIN (SELECT entity_id, CAST(COUNT(*) AS BIGINT) AS n_members
          FROM members GROUP BY entity_id) n USING (entity_id)
    WHERE rn = 1
    """


@register("d19_entity_resolution", oracle=_D19_ORACLE)
def d19_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution, the composition a master-data /
    corpus-identity pipeline ships: block on nation → PassJoin fuzzy
    name match (tau=1, the blocking key riding every signature —
    operators/strings.py) → transitive closure (d07's checkpointed
    min-label propagation) → one survivor per entity by account
    balance (tie: smallest key). Every stage is individually oracled
    elsewhere (d18, d07, d13); this row hash-matches the composition
    itself, entity ids and survivors included."""
    pin_semantics(spark)
    from pyspark.sql.window import Window

    from ..operators import dedup as dd
    from ..operators.strings import passjoin_pairs

    cust = load_table(spark, sf_dir, "customer")
    pairs = passjoin_pairs(
        cust, "c_custkey", "c_name", tau=1, block_col="c_nationkey"
    ).select("id_a", "id_b")
    comps = dd.dedup_components(
        cust.select("c_custkey"), pairs, id_col="c_custkey"
    )
    members = comps.join(cust, "c_custkey").select(
        F.col("canonical_id").alias("entity_id"),
        "c_custkey",
        "c_name",
        "c_acctbal",
    )
    w = Window.partitionBy("entity_id").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    sizes = members.groupBy("entity_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )
    return (
        members.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .join(sizes, "entity_id")
        .select(
            "entity_id",
            "n_members",
            F.col("c_custkey").alias("survivor_custkey"),
            F.col("c_name").alias("survivor_name"),
        )
    )


# ---------------------------------------------------------------------------
# x18 — association mining (pairwise support / confidence / lift)
# ---------------------------------------------------------------------------

_X18_ORACLE = """
    WITH baskets AS (
      SELECT DISTINCT user_id, event_type FROM events),
    n AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
          FROM events),
    singles AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_a
      FROM baskets GROUP BY event_type),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(COUNT(*) AS BIGINT) AS n_ab
      FROM baskets a JOIN baskets b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2)
    SELECT type_a, type_b, n_ab,
           CAST(n_ab AS DOUBLE) / CAST(n_users AS DOUBLE) AS support,
           CAST(n_ab AS DOUBLE) / CAST(sa.n_a AS DOUBLE) AS confidence,
           (CAST(n_ab AS DOUBLE) * CAST(n_users AS DOUBLE))
             / (CAST(sa.n_a AS DOUBLE) * CAST(sb.n_a AS DOUBLE)) AS lift
    FROM pairs
    JOIN singles sa ON type_a = sa.event_type
    JOIN singles sb ON type_b = sb.event_type
    CROSS JOIN n
    """


@register("x18_basket_lift", oracle=_X18_ORACLE)
def x18_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining over per-user event baskets:
    pairwise co-occurrence support, confidence and lift (the Apriori
    pair tier — "users who trigger A also trigger B"). Exact integer
    counts; each metric is a fixed-order double expression on exact
    operands (single divisions, one product pair for lift), so the
    whole rule table hash-matches. Scale shape: distinct baskets, one
    per-user self-join bounded by basket width (|event types|, not
    corpus size), broadcast singles/totals."""
    pin_semantics(spark)
    ev = load_table(spark, sf_dir, "events")
    baskets = ev.select("user_id", "event_type").distinct()
    n_users = ev.agg(
        F.countDistinct("user_id").cast("long").alias("n_users")
    )
    singles = baskets.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_a")
    )
    a, b = baskets.alias("a"), baskets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
    )
    sa = F.broadcast(singles.select(F.col("event_type").alias("type_a"),
                                    F.col("n_a").alias("_na")))
    sb = F.broadcast(singles.select(F.col("event_type").alias("type_b"),
                                    F.col("n_a").alias("_nb")))
    n_ab_d = F.col("n_ab").cast("double")
    return (
        pairs.join(sa, "type_a")
        .join(sb, "type_b")
        .crossJoin(F.broadcast(n_users))
        .select(
            "type_a",
            "type_b",
            "n_ab",
            (n_ab_d / F.col("n_users").cast("double")).alias("support"),
            (n_ab_d / F.col("_na").cast("double")).alias("confidence"),
            (
                (n_ab_d * F.col("n_users").cast("double"))
                / (F.col("_na").cast("double") * F.col("_nb").cast("double"))
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# t17 — Moore–Lewis domain data selection
# ---------------------------------------------------------------------------

_T17_IN = ("src0", "src1")

_T17_ORACLE = f"""
    WITH tok AS (
      SELECT doc_id,
             CAST(source IN {_T17_IN} AS BIGINT) AS is_in,
             unnest(string_split(text, ' ')) AS token
      FROM documents),
    vocab AS (
      SELECT token, SUM(is_in) AS c_in, SUM(1 - is_in) AS c_out
      FROM tok GROUP BY token),
    totals AS (SELECT SUM(c_in) AS t_in, SUM(c_out) AS t_out FROM vocab)
    SELECT doc_id,
      CAST(COUNT(*) AS BIGINT) AS n_tokens,
      CAST(SUM(c_in) AS BIGINT) AS sum_tf_in,
      CAST(SUM(c_out) AS BIGINT) AS sum_tf_out,
      CAST(SUM(c_in) AS DOUBLE)
        / (CAST(COUNT(*) AS DOUBLE) * (SELECT CAST(t_in AS DOUBLE) FROM totals))
      - CAST(SUM(c_out) AS DOUBLE)
        / (CAST(COUNT(*) AS DOUBLE) * (SELECT CAST(t_out AS DOUBLE) FROM totals))
        AS ml_score
    FROM tok JOIN vocab USING (token)
    GROUP BY doc_id
    """


@register("t17_domain_selection", oracle=_T17_ORACLE)
def t17_domain_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain data selection (Moore–Lewis-shaped, probability domain):
    per-document in-domain-vs-general typicality over the corpus's own
    token distributions, with sources src0/src1 as the in-domain seed.
    Exact integer aggregates + fixed-order double arithmetic (see
    operators/text.py:domain_selection_scores)."""
    pin_semantics(spark)
    from ..operators.text import domain_selection_scores

    docs = load_table(spark, sf_dir, "documents")
    return domain_selection_scores(
        docs, "doc_id", "text", "source", list(_T17_IN)
    )
