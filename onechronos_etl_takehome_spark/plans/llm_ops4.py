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
