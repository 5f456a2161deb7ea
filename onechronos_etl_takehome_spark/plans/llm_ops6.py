"""LLM-data-pipeline + analytics queries, round 4 continued (batch h).

Two new capability families:

- **Recursive queries** (q58): Spark 4's native ``WITH RECURSIVE``
  (SPARK-24497) runs bounded-hop BFS over a derived graph *inside the
  engine* — no driver-side iteration loop.  The big-graph path for
  unbounded components remains ``operators/dedup.connected_components``
  (star-contraction); the recursive CTE is the right tool for
  dimension-sized graphs and bounded-depth reachability, where each
  iteration is one small shuffle and the frontier fits the cluster
  trivially.
- **Embedding compression** (s06): symmetric per-vector int8
  quantization, the storage-reduction pass run before shipping
  embeddings to an ANN index / feature store.  Pure JVM higher-order
  expressions — no explode, no shuffle, fuses into the scan stage.

Both are DuckDB-oracled hash-matched: the recursive CTE text is
engine-portable ANSI, and the quantizer uses the explicit
``floor(x*127/scale + 0.5)`` rounding formula so the int8 codes are
bit-identical IEEE-double results in both engines (plain ``round()``
would hinge on each engine's tie convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import quantize_int8
from ..session import pin_semantics
from ..sources.tables import load_table
from .catalog import register


# ---------------------------------------------------------------------------
# q58 — recursive CTE: bounded-hop reachability over the nation
# trade-flow graph
# ---------------------------------------------------------------------------

# Edges = directed supplier-nation → customer-nation flows with
# above-half-average volume (integer-only threshold arithmetic:
# COUNT(*) * 1200 > |lineitem|, i.e. count > avg/2 over the 25×24
# directed pairs — sf-invariant selectivity with no float divide; the
# stricter ×600 form left the graph edgeless-from-the-source at the
# driver SFs, a vacuous 1-row witness).  The anchor is MIN(src) —
# NATION_0 is not a supplier nation at every sf, so a literal source
# can be isolated by data accident.  The recursive member enumerates
# bounded walks (hops < 3); the final aggregate folds walks into
# min-hop distance + walk count per nation (25 rows, hop depths 0-2
# at the driver SFs — pinned non-vacuous by the BFS model test).
_Q58_EDGES_SQL = """
    SELECT sn.n_name AS src, cn.n_name AS dst
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE sn.n_name <> cn.n_name
    GROUP BY sn.n_name, cn.n_name
    HAVING COUNT(*) * 1200 > (SELECT COUNT(*) FROM lineitem)
"""

_Q58_RECURSE_SQL = """
    WITH RECURSIVE reach(nation, hops) AS (
      SELECT MIN(src), 0 FROM {edges}
      UNION ALL
      SELECT e.dst, r.hops + 1
      FROM reach r JOIN {edges} e ON e.src = r.nation
      WHERE r.hops < 3
    )
    SELECT nation, CAST(MIN(hops) AS BIGINT) AS min_hops,
           CAST(COUNT(*) AS BIGINT) AS n_walks
    FROM reach
    GROUP BY nation
"""

# The DuckDB oracle runs the identical logic as ONE statement (edges as
# an inline CTE — DuckDB materializes CTEs, so no re-execution there).
_Q58_SQL = _Q58_RECURSE_SQL.replace("WITH RECURSIVE", "WITH RECURSIVE edges AS (%s)," % _Q58_EDGES_SQL, 1).format(edges="edges")


@register("q58_recursive_reachability", oracle=_Q58_SQL)
def q58_recursive_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native recursive-CTE BFS (min-hop + bounded-walk census).

    Spark executes the recursion as iterative UNION-ALL rounds — each
    round joins the previous frontier (tiny: nation-sized) against the
    edge list.  Spark 4.1 does NOT materialize a non-recursive CTE
    referenced from the recursive member: an inline ``edges`` CTE
    re-ran the whole 6-way fact join every iteration (measured 2.9 s →
    0.9 s at sf0.1).  So the fact scan runs exactly once here: the
    aggregated edge frame (dimension-sized by construction) is eagerly
    local-checkpointed — the same lineage-truncation pattern as the
    x19/x14 graph frames — and the recursion runs over the
    checkpointed view.  The bounded-hop guard makes termination and
    the walk census deterministic in both engines.

    100-TB posture: recursion over a dimension-sized derived graph is
    the correct use of recursive CTEs at scale; unbounded-depth
    components over billion-edge graphs go to the star-contraction
    solver (``operators/dedup.connected_components``) instead.  The
    DuckDB oracle is the identical single statement (DuckDB
    materializes CTEs, so no re-execution on that side).
    """
    from ..sources.tables import register_views

    pin_semantics(spark)
    register_views(spark, sf_dir)
    edges = spark.sql(_Q58_EDGES_SQL).localCheckpoint(eager=True)
    edges.createOrReplaceTempView("q58_edges")
    return spark.sql(_Q58_RECURSE_SQL.format(edges="q58_edges"))


# ---------------------------------------------------------------------------
# s06 — symmetric int8 embedding quantization
# ---------------------------------------------------------------------------

_S06_ORACLE = """
    WITH base AS (
      SELECT vec_id,
        list_max(list_transform(embedding,
                                x -> abs(CAST(x AS DOUBLE)))) AS scale,
        embedding
      FROM embeddings
      -- mirror of the Spark-side guard: an empty/NULL vector has no
      -- components to unnest here, while Spark would still emit a row
      -- (NULL scale, zero checksums) — drop them identically on both
      -- engines so the hash compare can never diverge on degenerate
      -- vectors.
      WHERE embedding IS NOT NULL AND len(embedding) > 0
    ), ex AS (
      SELECT vec_id, scale,
        unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS x,
        generate_subscripts(embedding, 1) AS i
      FROM base
    ), q AS (
      SELECT vec_id, scale, i,
        CAST(coalesce(floor(x * 127.0 / nullif(scale, 0.0) + 0.5), 0)
             AS BIGINT) AS qv
      FROM ex
    )
    SELECT vec_id, scale,
      CAST(SUM(qv) AS BIGINT) AS q_sum,
      CAST(SUM(qv * qv) AS BIGINT) AS q_sq_sum,
      CAST(SUM(qv * i) AS BIGINT) AS q_wsum,
      CAST(COUNT(*) AS BIGINT) AS n_dims
    FROM q
    GROUP BY vec_id, scale
"""


@register("s06_quantize_embeddings", oracle=_S06_ORACLE)
def s06_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8-quantize every embedding; emit per-vector integer checksums.

    The engine-native output is ``(vec_id, scale, q: array<int>)``
    (:func:`operators.similarity.quantize_int8`); the driver compare
    can't hash array cells, so this witness folds the codes into
    order-sensitive integer checksums (sum, sum of squares,
    position-weighted sum) — any single wrong component at any position
    changes at least one checksum.  All arithmetic stays in the scan's
    codegen stage: transform/aggregate higher-order expressions, zero
    shuffles, zero Python.

    The oracle unnests instead (DuckDB has no positional fold), but the
    per-component rounding expression is textually identical — the
    explicit floor(+0.5) formula in fixed IEEE-double order — so the
    checksums are exact matches, not tolerances.
    """
    pin_semantics(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    # Degenerate (NULL/empty) vectors: Spark would emit a row with a
    # NULL scale and zero/-1 checksums while the oracle's unnest emits
    # nothing — filter identically on both sides (see _S06_ORACLE).
    emb = emb.where(
        F.col("embedding").isNotNull() & (F.size("embedding") > 0)
    )
    qdf = quantize_int8(emb, "vec_id", "embedding")
    zero = F.lit(0).cast("bigint")
    as_long = lambda c: c.cast("bigint")  # noqa: E731
    return qdf.select(
        "vec_id",
        "scale",
        F.aggregate("q", zero, lambda a, x: a + as_long(x)).alias("q_sum"),
        F.aggregate("q", zero, lambda a, x: a + as_long(x) * as_long(x)).alias(
            "q_sq_sum"
        ),
        F.aggregate(
            F.transform("q", lambda x, i: as_long(x) * (as_long(i) + 1)),
            zero,
            lambda a, x: a + x,
        ).alias("q_wsum"),
        F.size("q").cast("bigint").alias("n_dims"),
    )


# ---------------------------------------------------------------------------
# t19 — trained BPE tokenization stats
# ---------------------------------------------------------------------------


@register("t19_bpe_tokenize")  # iterative merge training + greedy encode
def t19_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a BPE vocab on a bounded driver sample, encode the corpus.

    Rows-only BY DESIGN: BPE merge learning is an iterative rewrite
    system and the encoder a greedy lowest-rank loop — neither is
    expressible in SQL, so no DuckDB oracle exists; semantics are
    pinned against a pure-python full-corpus model in
    tests/test_round4h_ops.py instead.  Deterministic end to end
    (hash-ordered sample, lexicographic merge tie-breaks), so the
    rows-only check still sees a stable row set.

    100-TB posture: training samples once to the driver (the IVF
    posture — NOT one shuffle per merge); encoding is one Arrow-batched
    pass with per-batch word memoization, embarrassingly parallel.
    """
    from ..operators.bpe import bpe_token_stats, train_bpe

    pin_semantics(spark)
    docs = load_table(spark, sf_dir, "documents")
    merges = train_bpe(docs, "text", n_merges=200, sample_n=2000)
    return bpe_token_stats(docs, "doc_id", "text", merges)


# ---------------------------------------------------------------------------
# t20 — model-assisted classification (trained quality/lang scorer)
# ---------------------------------------------------------------------------


@register("t20_quality_classifier")  # iterative gradient training
def t20_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a logistic scorer on a driver sample, score the corpus.

    The model-assisted filtering stage of published LLM pipelines
    (GPT-3's CommonCrawl LR filter, RefinedWeb's fastText gates): the
    weak label is t13's Gopher rule-battery verdict, and the model
    distills the hard AND-of-thresholds gate into a soft quality score
    (~90% agreement vs the ~53% majority baseline on the testdata — a
    genuinely learned signal, pinned loosely in tests).  Rows-only BY
    DESIGN: iterative gradient training has no SQL expression;
    determinism (hash-ordered sample, fixed float64 iteration
    schedule) plus the distributed==numpy scoring-equality test in
    tests/test_round4h_ops.py pin semantics.

    100-TB posture: training touches one bounded driver sample;
    scoring is a scan-stage JVM projection (featurize + dot product +
    sigmoid), embarrassingly parallel, zero Python workers.  The
    label join is by doc_id (featurize and the gate both derive from
    the same scan, so AQE plans it as a local shuffle at worst).
    """
    from ..operators.classifier import featurize, score, train_logreg
    from ..operators.quality import gopher_quality

    pin_semantics(spark)
    docs = load_table(spark, sf_dir, "documents")
    labels = gopher_quality(docs, "doc_id", "text").select(
        "doc_id", F.col("passes_gopher").cast("int").alias("label")
    )
    feats = featurize(docs, "text").join(labels, "doc_id")
    w, b = train_logreg(feats, "label", "doc_id")
    return score(feats, w, b).select(
        "doc_id", "label", "predicted", "score"
    )
