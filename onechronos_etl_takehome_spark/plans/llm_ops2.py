"""LLM-training-data pipeline queries, round 2.

Decontamination, document chunking, PII redaction, balanced quota
sampling, and exact heavy hitters via a Misra-Gries candidate sketch —
the remaining staples of a large-scale corpus-prep pipeline. All five
are DuckDB-oracled (the sketch in x03 only prunes work; its output is
exact, so it hash-compares).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.exact import dec
from ..operators import dedup as dd
from ..operators import text as tx
from ..operators.bloom import bloom_semi_join
from ..operators.sketches import heavy_hitters
from ..operators.skew import salted_join
from ..session import pin_semantics
from ..sources.tables import load_table
from .catalog import register
from .llm_ops import _SH_SQL

# Deterministic benchmark split for the decontamination demo: every
# 20th doc plays the held-out eval set, the rest are the corpus.
_BENCH_PRED = "doc_id % 20 = 0"


@register(
    "d09_decontaminate",
    oracle=f"""
    WITH sh AS ({_SH_SQL}),
    bench_sh AS (
      SELECT DISTINCT shingle FROM sh WHERE {_BENCH_PRED}),
    corpus_sh AS (
      SELECT doc_id, shingle FROM sh WHERE NOT ({_BENCH_PRED})),
    sizes AS (
      SELECT doc_id, COUNT(*) AS n_shingles FROM corpus_sh GROUP BY doc_id),
    hits AS (
      SELECT doc_id, COUNT(*) AS n_contaminated
      FROM corpus_sh JOIN bench_sh USING (shingle) GROUP BY doc_id)
    SELECT doc_id, CAST(n_contaminated AS BIGINT) AS n_contaminated,
      CAST(n_shingles AS BIGINT) AS n_shingles,
      CAST(n_contaminated AS DOUBLE) / CAST(n_shingles AS DOUBLE)
        AS contamination
    FROM hits JOIN sizes USING (doc_id)
    """,
)
def d09_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: corpus docs sharing n-gram shingles
    with a (broadcast) benchmark set. n=3 matches the testdata's tiny
    vocabulary; production uses n~13 for the same plan shape."""
    pin_semantics(spark)
    docs = load_table(spark, sf_dir, "documents")
    is_bench = F.col("doc_id") % 20 == 0
    return dd.contamination_stats(
        docs.filter(~is_bench), docs.filter(is_bench), "doc_id", "text", n=3
    )


_CHUNK = 120


@register(
    "t09_chunk_documents",
    oracle=f"""
    SELECT doc_id, CAST(i - 1 AS BIGINT) AS chunk_idx,
      substr(text, (i - 1) * {_CHUNK} + 1, {_CHUNK}) AS chunk,
      CAST(LENGTH(substr(text, (i - 1) * {_CHUNK} + 1, {_CHUNK})) AS BIGINT)
        AS chunk_len
    FROM documents,
      unnest(generate_series(1,
        CAST(ceil(LENGTH(text) / {_CHUNK}.0) AS BIGINT))) AS t(i)
    """,
)
def t09_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width character chunking (context-window packing shape):
    one row per chunk via sequence+explode — a JVM-side one-to-many
    projection, no UDF, no shuffle."""
    pin_semantics(spark)
    docs = load_table(spark, sf_dir, "documents")
    n_chunks = F.ceil(F.length("text") / F.lit(float(_CHUNK))).cast("int")
    chunk = F.expr(f"substring(text, chunk_idx * {_CHUNK} + 1, {_CHUNK})")
    return (
        docs.select(
            "doc_id",
            "text",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            chunk.alias("chunk"),
            F.length(chunk).cast("long").alias("chunk_len"),
        )
    )


# The testdata corpus carries no real PII, so the demo synthesizes a
# deterministic contact string from doc_id/source — identically on
# both engines — and redacts that. The operator under test is the
# regex machinery (tx.PII_PATTERNS), not the synthesis.
_CONTACT_SQL = """
  concat('contact user', CAST(doc_id AS VARCHAR), ' at user',
         CAST(doc_id AS VARCHAR), '@', source, '.example.com or +1-555-',
         lpad(CAST(doc_id * 7 % 10000 AS VARCHAR), 4, '0'), ' ssn 123-45-',
         lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'))
"""


def _pii_oracle() -> str:
    email, phone, ssn = (tx.PII_PATTERNS[k] for k in ("email", "phone", "ssn"))
    redacted = "contact"
    for pattern, placeholder in (email, phone, ssn):
        redacted = f"regexp_replace({redacted}, '{pattern}', '{placeholder}', 'g')"
    counts = ", ".join(
        f"CAST(len(regexp_extract_all(contact, '{pat}')) AS BIGINT) AS n_{kind}"
        for kind, (pat, _) in tx.PII_PATTERNS.items()
    )
    return f"""
    WITH pii AS (SELECT doc_id, {_CONTACT_SQL} AS contact FROM documents)
    SELECT doc_id, {redacted} AS redacted, {counts} FROM pii
    """


@register("t10_pii_redaction", oracle=_pii_oracle())
def t10_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_semantics(spark)
    docs = load_table(spark, sf_dir, "documents")
    doc_id = F.col("doc_id").cast("string")
    contact = F.concat(
        F.lit("contact user"), doc_id,
        F.lit(" at user"), doc_id, F.lit("@"), F.col("source"),
        F.lit(".example.com or +1-555-"),
        F.lpad((F.col("doc_id") * 7 % 10000).cast("string"), 4, "0"),
        F.lit(" ssn 123-45-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    with_pii = docs.select("doc_id", contact.alias("contact"))
    counts = tx.pii_counts(F.col("contact"))
    return with_pii.select(
        "doc_id",
        tx.redact_pii(F.col("contact")).alias("redacted"),
        *[col.alias(f"n_{kind}") for kind, col in counts.items()],
    )


_QUOTA = 40


@register(
    "t11_quota_sample",
    oracle=f"""
    SELECT doc_id, lang, CAST(rn AS BIGINT) AS sample_rank FROM (
      SELECT doc_id, lang, ROW_NUMBER() OVER (PARTITION BY lang
        ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents)
    WHERE rn <= {_QUOTA}
    """,
)
def t11_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-balanced sample: at most ``_QUOTA`` docs per language,
    chosen by content-hash order — deterministic across engines,
    reruns, and cluster sizes (unlike rand()-based sampleBy), which is
    what per-language data budgets in corpus mixing need."""
    pin_semantics(spark)
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= _QUOTA)
        .select("doc_id", "lang", F.col("rn").cast("long").alias("sample_rank"))
    )


@register("d10_embedding_neardup_clustered")  # k-means bucketing → recall<1,
def d10_embedding_neardup_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    # rows-only check; recall bounded vs exact d06 in tests.
    """SemDeDup-shaped embedding near-dup: k-means clusters bound the
    pairwise term (the 100-TB path; d06 is its exact oracle).

    Registered threshold matches d06's 0.35 (the testdata embeddings
    are near-orthogonal, so a production 0.95 threshold matches zero
    pairs and the rows-only check would witness nothing); operator
    default stays 0.95. n_assign=2 (multi-probe) because at low
    thresholds pairs are far from collinear and hard assignment splits
    them — the planted-dup test pins recall at the production
    threshold. chunk_size=1024 runs the blocked (mega-cluster-safe)
    pairing, so the witnessed plan is the one that survives degenerate
    cluster sizes (pair-set equality vs the unblocked form is pinned
    in tests/test_round4_ops.py)."""
    from ..operators.similarity import embedding_neardup_clustered

    pin_semantics(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_neardup_clustered(
        emb,
        id_col="vec_id",
        vec_col="embedding",
        threshold=0.35,
        n_assign=2,
        driver_sample=1024,
        chunk_size=1024,
    )


_TW, _TS = 30, 20  # token window width, stride (overlap = width - stride)


@register(
    "t12_token_window_chunks",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS tokens,
        len(string_split(text, ' ')) AS n_tok
      FROM documents)
    SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
      CAST(i * {_TS} AS BIGINT) AS start_token,
      array_to_string(array_slice(tokens, i * {_TS} + 1, i * {_TS} + {_TW}), ' ')
        AS chunk,
      CAST(len(array_slice(tokens, i * {_TS} + 1, i * {_TS} + {_TW})) AS BIGINT)
        AS n_chunk_tokens
    FROM toks, unnest(generate_series(0,
      greatest(CAST(ceil((n_tok - {_TW}) / {_TS}.0) AS BIGINT), 0))) AS t(i)
    """,
)
def t12_token_window_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding token-window chunking with overlap (width 30, stride
    20) — the standard context-window packing shape for LLM training:
    consecutive chunks share width-stride tokens so no boundary
    context is lost. sequence+explode+slice, all JVM-side."""
    pin_semantics(spark)
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_starts = F.greatest(
        F.ceil((F.size(toks) - F.lit(_TW)) / F.lit(float(_TS))).cast("long"),
        F.lit(0),
    )
    exploded = docs.select(
        "doc_id",
        toks.alias("_toks"),
        F.explode(F.sequence(F.lit(0), n_starts)).alias("chunk_idx"),
    )
    piece = F.slice("_toks", F.col("chunk_idx") * _TS + 1, _TW)
    return exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        (F.col("chunk_idx") * _TS).cast("long").alias("start_token"),
        F.concat_ws(" ", piece).alias("chunk"),
        F.size(piece).cast("long").alias("n_chunk_tokens"),
    )


_HH_DENOM = 30


@register(
    "x04_group_regression",
    oracle="""
    WITH pts AS (
      SELECT lang,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS x,
        CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS y
      FROM documents),
    s AS (
      SELECT lang, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
        SUM(x * y) AS sxy, SUM(x * x) AS sxx
      FROM pts GROUP BY lang)
    SELECT lang,
      CAST(n * sxy - sx * sy AS DOUBLE)
        / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
      (CAST(sy AS DOUBLE) - CAST(n * sxy - sx * sy AS DOUBLE)
        / CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE))
        / CAST(n AS DOUBLE) AS intercept,
      CAST(n AS BIGINT) AS n
    FROM s
    """,
)
def x04_group_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language linear fit of unique tokens vs total tokens, via
    the closed form over INTEGER-EXACT sums (Σx, Σy, Σxy, Σx² are
    BIGINTs — aggregation-order-independent) with the two double
    divisions at the edge, so it hash-matches cross-engine. The
    grouped-map applyInPandas twin (operators/groupfit.py) is the
    escape hatch for models without a closed form; tests pin both
    paths to 1e-9 agreement."""
    pin_semantics(spark)
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    pts = docs.select(
        "lang",
        F.size(toks).cast("long").alias("x"),
        F.size(F.array_distinct(toks)).cast("long").alias("y"),
    )
    s = pts.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    ) / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    return s.select(
        "lang",
        slope.alias("slope"),
        intercept.alias("intercept"),
        F.col("n").cast("long").alias("n"),
    )


@register(
    "x03_heavy_hitters",
    oracle=f"""
    WITH words AS (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents),
    tot AS (SELECT COUNT(*) AS n FROM words),
    counts AS (SELECT word, COUNT(*) AS n_occurrences FROM words GROUP BY word)
    SELECT word, CAST(n_occurrences AS BIGINT) AS n_occurrences
    FROM counts, tot WHERE n_occurrences * {_HH_DENOM} > tot.n
    """,
)
def x03_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Words with frequency > 1/30 of the token stream, found via
    per-batch Misra-Gries candidates + exact recount (operators/
    sketches.py) — exact integer-math output, so it hash-compares
    despite the sketch in the middle."""
    pin_semantics(spark)
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.explode(F.split("text", " ")).alias("word"))
    return heavy_hitters(words, "word", threshold_denom=_HH_DENOM)


@register(
    "x06_salted_skew_join",
    oracle="""
    SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_nationkey
    """,
)
def x06_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-tolerant fact⋈dim equi-join: events.user_id is power-law
    (hot users own a disproportionate share of rows) and the dimension
    is replicated across salt buckets (operators/skew.py) so each hot
    key's rows land in ``salt_buckets`` shuffle partitions instead of
    one straggler task. Salting is invisible in the result — the oracle
    is the plain join — and exact equality with the unsalted join is
    pinned in tests/test_round4_ops.py. Use when the dimension is too
    big to broadcast AND one key dominates beyond what AQE's skew
    splitting handles (it cannot split a single key's partition when
    the join requires co-location); broadcast remains the first choice
    whenever the dim fits in memory."""
    pin_semantics(spark)
    e = load_table(spark, sf_dir, "events").select("user_id", "value")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )
    joined = salted_join(e, c, ["user_id"], salt_buckets=8)
    return joined.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec("value", 18, 6)).cast("double").alias("total_value"),
    )


@register(
    "x05_bloom_semi_join",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
        AS total_price
    FROM orders
    WHERE o_custkey IN (
      SELECT c_custkey FROM customer
      WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 1000)
    GROUP BY o_orderpriority
    """,
)
def x05_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective fact⋈dim semi join with an explicit Bloom prefilter on
    the probe side (operators/bloom.py): non-matching orders are
    dropped before the exchange, the exact semi join removes the false
    positives, so the result is identical to the plain semi join while
    shuffle volume shrinks to ~selectivity of the probe."""
    pin_semantics(spark)
    orders = load_table(spark, sf_dir, "orders")
    building = (
        load_table(spark, sf_dir, "customer")
        .where((F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 1000))
        .select("c_custkey")
    )
    joined = bloom_semi_join(
        orders, building, "o_custkey", "c_custkey", n_bits=1 << 17
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(dec("o_totalprice")).cast("double").alias("total_price"),
    )
