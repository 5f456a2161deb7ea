"""LLM-data-pipeline queries, round 4.

Quality gating (Gopher rule battery), in-document repetition filters,
cross-document duplicated-span detection (exact substring dedup at
n-gram granularity), and an ordered-step window funnel over events.
All four are DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as dd
from ..operators import quality as ql
from ..operators.funnel import window_funnel
from ..session import pin_semantics
from ..sources.tables import load_table
from .catalog import register

_TOKS = "string_split(text, ' ')"


def _pos_grams_sql(n: int) -> str:
    """Positional word n-grams per doc (pos 1-based), docs with >= n
    words only — DuckDB twin of dedup.positional_shingles. Multiple
    unnests in one SELECT zip element-wise, keeping pos aligned with
    its gram."""
    parts = ", ".join(f"t[i+{k}]" for k in range(n))
    return f"""
      SELECT doc_id,
        unnest(generate_series(1, len(t) - {n - 1})) AS pos,
        unnest(list_transform(generate_series(1, len(t) - {n - 1}),
          i -> concat_ws(' ', {parts}))) AS gram
      FROM (SELECT doc_id, {_TOKS} AS t FROM documents)
      WHERE len(t) >= {n}
    """


# ---------------------------------------------------------------------------
# t13: Gopher lexical quality gate
# ---------------------------------------------------------------------------

_STOP_SQL = "['the', 'a', 'of', 'and', 'to', 'in']"

# Per-doc lexical metrics — the shared CTE body for t13 and d13.
_T13_METRICS_SQL = f"""
  SELECT doc_id,
    CAST(len({_TOKS}) AS BIGINT) AS n_words,
    CAST(len(text) - (len({_TOKS}) - 1) AS DOUBLE) / len({_TOKS})
      AS mean_word_len,
    CAST(len(regexp_extract_all(text, '#'))
         + len(regexp_extract_all(text, '\\.\\.\\.')) AS DOUBLE)
      / len({_TOKS}) AS symbol_ratio,
    CAST(len(list_filter({_TOKS}, t -> regexp_matches(t, '[A-Za-z]')))
      AS DOUBLE) / len({_TOKS}) AS alpha_frac,
    CAST(len(list_intersect(list_distinct({_TOKS}), {_STOP_SQL}))
      AS BIGINT) AS n_stopwords
  FROM documents
"""

# Rule booleans over the metric columns — single source for the gate,
# the verdict, and d13's quality score.
_RULES_SQL: dict[str, str] = {
    "ok_words": f"n_words BETWEEN {ql.MIN_WORDS} AND {ql.MAX_WORDS}",
    "ok_word_len": (
        f"mean_word_len BETWEEN {ql.MIN_MEAN_WORD_LEN}"
        f" AND {ql.MAX_MEAN_WORD_LEN}"
    ),
    "ok_symbols": f"symbol_ratio <= {ql.MAX_SYMBOL_RATIO}",
    "ok_alpha": f"alpha_frac >= {ql.MIN_ALPHA_FRAC}",
    "ok_stopwords": f"n_stopwords >= {ql.MIN_DISTINCT_STOPWORDS}",
}

_T13_ORACLE = f"""
WITH m AS ({_T13_METRICS_SQL})
SELECT *,
  {", ".join(f"({e}) AS {n}" for n, e in _RULES_SQL.items())},
  {" AND ".join(f"({e})" for e in _RULES_SQL.values())} AS passes_gopher
FROM m
"""


@register("t13_gopher_quality", oracle=_T13_ORACLE)
def t13_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style per-document lexical quality gate (Rae et al. 2021
    §A1.1): metrics, per-rule booleans, and the combined verdict. Pure
    scan-stage Column expressions — no shuffle."""
    pin_semantics(spark)
    docs = load_table(spark, sf_dir, "documents")
    return ql.gopher_quality(docs, "doc_id", "text")


# ---------------------------------------------------------------------------
# t14: repetition filters
# ---------------------------------------------------------------------------


def _grams_nopos_sql(n: int) -> str:
    parts = ", ".join(f"t[i+{k}]" for k in range(n))
    return f"""
      SELECT doc_id,
        unnest(list_transform(generate_series(1, len(t) - {n - 1}),
          i -> concat_ws(' ', {parts}))) AS gram
      FROM (SELECT doc_id, {_TOKS} AS t FROM documents)
      WHERE len(t) >= {n}
    """


_T14_ORACLE = f"""
WITH c2 AS (
  SELECT doc_id, gram, count(*) AS cnt
  FROM ({_grams_nopos_sql(2)}) GROUP BY doc_id, gram),
top2 AS (
  SELECT doc_id, max(cnt * len(gram)) AS ch
  FROM c2 WHERE cnt >= 2 GROUP BY doc_id),
c3 AS (
  SELECT doc_id, gram, count(*) AS cnt
  FROM ({_grams_nopos_sql(3)}) GROUP BY doc_id, gram),
dup3 AS (
  SELECT doc_id, sum(cnt * len(gram)) AS ch
  FROM c3 WHERE cnt >= 2 GROUP BY doc_id)
SELECT d.doc_id,
  CAST(len(d.text) AS BIGINT) AS n_chars_text,
  CAST(coalesce(top2.ch, 0) AS BIGINT) AS top2gram_chars,
  CAST(coalesce(dup3.ch, 0) AS BIGINT) AS dup3gram_chars,
  CAST(coalesce(top2.ch, 0) AS DOUBLE) / len(d.text) AS top2gram_frac,
  CAST(coalesce(dup3.ch, 0) AS DOUBLE) / len(d.text) AS dup3gram_frac,
  CAST(coalesce(top2.ch, 0) AS DOUBLE) / len(d.text)
    <= {ql.MAX_TOP2GRAM_FRAC} AS ok_top2gram,
  CAST(coalesce(dup3.ch, 0) AS DOUBLE) / len(d.text)
    <= {ql.MAX_DUP3GRAM_FRAC} AS ok_dup3gram
FROM documents d
LEFT JOIN top2 USING (doc_id) LEFT JOIN dup3 USING (doc_id)
"""


@register("t14_repetition_stats", oracle=_T14_ORACLE)
def t14_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-document repetition metrics (Gopher repetition family):
    chars in the most frequent 2-gram, chars across duplicated
    3-grams, each as a fraction of document length, with pass flags."""
    pin_semantics(spark)
    docs = load_table(spark, sf_dir, "documents")
    return ql.repetition_stats(docs, "doc_id", "text")


# ---------------------------------------------------------------------------
# d12: cross-document duplicated n-gram spans
# ---------------------------------------------------------------------------

_D12_N = 8

_D12_ORACLE = f"""
WITH gp AS ({_pos_grams_sql(_D12_N)}),
cross_grams AS (
  SELECT gram FROM gp GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
dup AS (SELECT doc_id, pos FROM gp JOIN cross_grams USING (gram)),
lagged AS (
  SELECT doc_id, pos,
    lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev_pos
  FROM dup),
isl AS (
  SELECT doc_id, pos,
    SUM(CASE WHEN pos - prev_pos > {_D12_N} THEN 1 ELSE 0 END)
      OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM lagged)
SELECT doc_id,
  CAST(MIN(pos) AS BIGINT) AS span_start,
  CAST(MAX(pos) + {_D12_N - 1} AS BIGINT) AS span_end,
  CAST(MAX(pos) + {_D12_N - 1} - MIN(pos) + 1 AS BIGINT) AS span_tokens,
  CAST(COUNT(*) AS BIGINT) AS n_dup_grams
FROM isl GROUP BY doc_id, island
"""


@register("d12_duplicate_ngram_spans", oracle=_D12_ORACLE)
def d12_duplicate_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring dedup at word-8-gram granularity (Lee et al.
    2022): maximal per-doc token spans whose every covering 8-gram also
    appears in another document — the spans a corpus-prep pipeline cuts
    or down-weights."""
    pin_semantics(spark)
    docs = load_table(spark, sf_dir, "documents")
    return dd.duplicate_ngram_spans(docs, "doc_id", "text", n=_D12_N)


# ---------------------------------------------------------------------------
# x07: ordered-step window funnel over events
# ---------------------------------------------------------------------------

_X07_ORACLE = """
WITH v AS (
  SELECT user_id, min(ts) AS s1 FROM events
  WHERE event_type = 'view' GROUP BY user_id),
c AS (
  SELECT e.user_id, min(e.ts) AS s2, min(v.s1) AS s1
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts >= v.s1
    AND e.ts <= v.s1 + INTERVAL '24 hours'
  GROUP BY e.user_id),
p AS (
  SELECT e.user_id, min(e.ts) AS s3
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= c.s2
    AND e.ts <= c.s1 + INTERVAL '24 hours'
  GROUP BY e.user_id)
SELECT v.user_id,
  strftime(v.s1, '%Y-%m-%d %H:%M:%S') AS step1_ts,
  strftime(c.s2, '%Y-%m-%d %H:%M:%S') AS step2_ts,
  strftime(p.s3, '%Y-%m-%d %H:%M:%S') AS step3_ts,
  CAST(1 + CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END
         + CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END AS BIGINT)
    AS funnel_depth
FROM v LEFT JOIN c ON v.user_id = c.user_id
       LEFT JOIN p ON v.user_id = p.user_id
"""


@register("x07_window_funnel", oracle=_X07_ORACLE)
def x07_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view -> click -> purchase funnel per user, every step within 24
    hours of the user's first view and at-or-after the previous step
    (earliest-anchor semantics — stricter than ClickHouse's
    max-chain-over-any-start; see operators/funnel.py). One row per
    user who viewed;
    funnel_depth in 1..3."""
    pin_semantics(spark)
    ev = load_table(spark, sf_dir, "events")
    steps = [
        F.col("event_type") == "view",
        F.col("event_type") == "click",
        F.col("event_type") == "purchase",
    ]
    out = window_funnel(ev, "user_id", "ts", steps, "INTERVAL 24 HOURS")
    return out.select(
        "user_id",
        F.date_format("step1_ts", "yyyy-MM-dd HH:mm:ss").alias("step1_ts"),
        F.date_format("step2_ts", "yyyy-MM-dd HH:mm:ss").alias("step2_ts"),
        F.date_format("step3_ts", "yyyy-MM-dd HH:mm:ss").alias("step3_ts"),
        "funnel_depth",
    )


# ---------------------------------------------------------------------------
# d13: quality-aware survivor selection
# ---------------------------------------------------------------------------


def _d13_oracle() -> str:
    """Fuzzy components (d11's CTE chain) x quality score (t13's rule
    battery): per component keep the highest-scoring doc, doc_id as the
    deterministic tie-break."""
    from .llm_ops import _d03_oracle

    score = " + ".join(f"CAST({e} AS INT)" for e in _RULES_SQL.values())
    return f"""
    WITH pairs AS ({_d03_oracle(max_bucket_size=50)}),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs),
    reach AS (
      WITH RECURSIVE r(node, root) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, r.root FROM r JOIN edges e ON e.src = r.node)
      SELECT * FROM r),
    comps AS (
      SELECT node AS doc_id, MIN(root) AS canonical_id
      FROM reach GROUP BY node),
    q AS (
      SELECT doc_id, CAST({score} AS BIGINT) AS q_score
      FROM ({_T13_METRICS_SQL})),
    scored AS (
      SELECT c.canonical_id, c.doc_id, q.q_score,
        row_number() OVER (
          PARTITION BY c.canonical_id
          ORDER BY q.q_score DESC, c.doc_id ASC) AS rn,
        count(*) OVER (PARTITION BY c.canonical_id) AS nm
      FROM comps c JOIN q USING (doc_id))
    SELECT canonical_id, doc_id AS survivor_id,
      q_score AS survivor_score, CAST(nm AS BIGINT) AS n_members
    FROM scored WHERE rn = 1
    """


@register("d13_quality_aware_survivors", oracle=_d13_oracle())
def d13_quality_aware_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy dedup with quality-aware survivorship: instead of d11's
    min-id survivor, each near-dup component keeps its highest-quality
    member (most Gopher rules passed; doc_id breaks ties) — what a
    corpus pipeline actually wants to keep from a duplicate cluster.
    One row per component, singletons included."""
    from pyspark.sql.window import Window

    pin_semantics(spark)
    docs = load_table(spark, sf_dir, "documents")
    pairs = dd.minhash_dedup_pairs(
        docs, "doc_id", "text", n=3, num_hashes=32, bands=8, threshold=0.5,
        max_bucket_size=50, hash_family="md5",
    )
    comps = dd.dedup_components(docs, pairs, id_col="doc_id")
    scored = comps.join(ql.gopher_score(docs, "doc_id", "text"), "doc_id")
    part = Window.partitionBy("canonical_id")
    ranked = scored.select(
        "canonical_id",
        "doc_id",
        "q_score",
        F.row_number()
        .over(part.orderBy(F.desc("q_score"), F.asc("doc_id")))
        .alias("rn"),
        F.count(F.lit(1)).over(part).cast("long").alias("n_members"),
    )
    return ranked.filter(F.col("rn") == 1).select(
        "canonical_id",
        F.col("doc_id").alias("survivor_id"),
        F.col("q_score").alias("survivor_score"),
        "n_members",
    )


# ---------------------------------------------------------------------------
# d14: incremental dedup against a persisted corpus index
# ---------------------------------------------------------------------------

_D14_NEW_PRED = "doc_id % 5 = 0"  # every 5th doc plays the daily increment


def _d14_oracle() -> str:
    from .llm_ops import minhash_buckets_sql

    return f"""
    WITH {minhash_buckets_sql(32, 8)}
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM buckets a JOIN buckets b
      ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
    WHERE a.{_D14_NEW_PRED} OR b.{_D14_NEW_PRED}
    """


@register("d14_incremental_dedup", oracle=_d14_oracle())
def d14_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental fuzzy dedup: the corpus is LSH-indexed once
    (minhash_buckets — at 100 TB that index persists, partitioned by
    band) and only the increment is shingled/hashed; candidates are
    bucket collisions touching at least one new doc. The oracle
    recomputes the same md5-family buckets over the whole table and
    filters to pairs with a new side — per-doc signatures are
    independent, so index-then-probe must equal recompute-then-filter
    (the invariant tests/test_round4_ops.py pins through a parquet
    round-trip)."""
    pin_semantics(spark)
    docs = load_table(spark, sf_dir, "documents")
    new = F.expr(_D14_NEW_PRED)
    kw = dict(n=3, num_hashes=32, bands=8, hash_family="md5")
    index = dd.minhash_buckets(docs.filter(~new), "doc_id", "text", **kw)
    return dd.incremental_minhash_candidates(
        docs.filter(new), index, "doc_id", "text", **kw
    )


# ---------------------------------------------------------------------------
# x08: weekly cohort retention
# ---------------------------------------------------------------------------

_X08_ORACLE = """
WITH first_seen AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
  FROM events GROUP BY user_id),
cohort_sizes AS (
  SELECT cohort_week, count(*) AS cohort_size
  FROM first_seen GROUP BY cohort_week),
active AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events),
cells AS (
  SELECT f.cohort_week,
    date_diff('day', f.cohort_week, a.week) / 7 AS week_offset,
    count(*) AS n_active
  FROM active a JOIN first_seen f USING (user_id)
  GROUP BY 1, 2)
SELECT strftime(c.cohort_week, '%Y-%m-%d') AS cohort_week,
  CAST(c.week_offset AS BIGINT) AS week_offset,
  CAST(c.n_active AS BIGINT) AS n_active,
  CAST(s.cohort_size AS BIGINT) AS cohort_size,
  CAST(c.n_active AS DOUBLE) / s.cohort_size AS retention
FROM cells c JOIN cohort_sizes s USING (cohort_week)
"""


@register("x08_cohort_retention", oracle=_X08_ORACLE)
def x08_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users bucketed by the week they
    first appear, each cell = how many are active N weeks later (and
    the retained fraction). Two groupBys keyed on user then
    (cohort, offset) — both shuffle-partitioned, no window over the
    full history, scales to any event volume."""
    pin_semantics(spark)
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    cohort_sizes = first_seen.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("week")
    ).distinct()
    cells = (
        active.join(first_seen, "user_id")
        .select(
            "cohort_week",
            (F.datediff("week", "cohort_week") / 7).cast("long").alias(
                "week_offset"
            ),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    )
    return cells.join(cohort_sizes, "cohort_week").select(
        F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
        "week_offset",
        "n_active",
        "cohort_size",
        (F.col("n_active").cast("double") / F.col("cohort_size")).alias(
            "retention"
        ),
    )


_T15_ORACLE = """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents),
    vocab AS (SELECT token, COUNT(*) AS c FROM tok GROUP BY token),
    tot AS (SELECT COUNT(*) AS t FROM tok)
    SELECT doc_id,
      CAST(COUNT(*) AS BIGINT) AS n_tokens,
      CAST(SUM(v.c) AS BIGINT) AS sum_tf,
      CAST(SUM(v.c) AS DOUBLE)
        / (CAST(COUNT(*) AS DOUBLE)
           * (SELECT CAST(t AS DOUBLE) FROM tot)) AS mean_token_prob
    FROM tok JOIN vocab v USING (token)
    GROUP BY doc_id
    """


@register("t15_unigram_lm_score", oracle=_T15_ORACLE)
def t15_unigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained unigram LM quality score (CCNet-style): how
    typical each document's words are under the corpus's own token
    distribution. The oracled columns are exact-integer aggregates with
    one final double division (cross-engine bitwise-stable); the
    operator's ``log_probs=True`` form adds avg-logprob/perplexity for
    production thresholds (Spark-deterministic, not SQL-hashable —
    pinned in tests/test_round4_ops.py instead)."""
    pin_semantics(spark)
    from ..operators.text import unigram_lm_scores

    docs = load_table(spark, sf_dir, "documents")
    return unigram_lm_scores(docs, "doc_id", "text")


@register("s05_cosine_topk_pq")  # approximate (recall<1) → rows-only check
def s05_cosine_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jégou et al., PAMI'11): vectors
    compress to 8 one-byte codes (32× vs float32), queries score the
    code frame with a broadcast lookup table, and only the per-query
    shortlist joins back to raw vectors for an EXACT rerank — the
    memory tier of IVF-PQ, which is how a 100-TB embedding corpus's
    search index fits in cluster RAM. Recall bounded vs s01 in
    tests/test_sketches.py; training/encode/shortlist are all
    deterministic (seeded driver-sample k-means, lexsort tie-breaks),
    so the rows-only driver check is stable."""
    from ..operators.similarity import cosine_topk_pq

    pin_semantics(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    corpus = emb.select(
        F.col("vec_id").alias("corpus_id"), F.col("embedding").alias("corpus_vec")
    )
    return cosine_topk_pq(
        queries, corpus, k=5, n_subspaces=8, n_codes=16, rerank=50
    ).select("query_id", "corpus_id", "score", "rank")


_X10_ORACLE = """
    WITH bounds AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1
      FROM events GROUP BY user_id),
    days AS (
      SELECT user_id,
        CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                    CAST(d1 AS TIMESTAMP),
                                    INTERVAL 1 DAY)) AS DATE) AS day
      FROM bounds),
    ranked AS (
      SELECT user_id, CAST(ts AS DATE) AS day, value,
        ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                           ORDER BY ts DESC, event_id DESC) AS rn
      FROM events),
    counts AS (
      SELECT user_id, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    joined AS (
      SELECT d.user_id, d.day, COALESCE(c.n, 0) AS n_events, r.value AS day_last
      FROM days d
      LEFT JOIN counts c ON d.user_id = c.user_id AND d.day = c.day
      LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) r
        ON d.user_id = r.user_id AND d.day = r.day)
    SELECT user_id, strftime(day, '%Y-%m-%d') AS day, n_events,
      last_value(day_last IGNORE NULLS) OVER (
        PARTITION BY user_id ORDER BY day
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill_value
    FROM joined
    """


@register("x10_resample_ffill", oracle=_X10_ORACLE)
def x10_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity time-series resampling with forward fill: every user
    gets one row per calendar day between their first and last event
    (gap days materialized via sequence+explode), carrying that day's
    event count and the latest observed ``value`` so far — the
    gap-filling/resample primitive behind feature backfills and
    metric dashboards. The day's representative value is the
    (ts, event_id)-max row via one struct-max aggregate (no window
    over the raw events); the fill is last-ignorenulls over an
    unbounded-preceding rows frame.

    Scale: sequence+explode emits span-length rows per user (no
    cross join against a calendar dimension), the fill window
    partitions by user — one shuffle each, both AQE-coalesced; the
    double ``value`` is a passthrough (never re-aggregated), so the
    oracle hash matches exactly."""
    pin_semantics(spark)
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    day = F.to_date("ts")
    daily = e.groupBy("user_id", day.alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.max(F.struct(F.col("ts"), F.col("event_id"), F.col("value")))[
            "value"
        ].alias("day_last"),
    )
    days = (
        e.groupBy("user_id")
        .agg(F.min(day).alias("d0"), F.max(day).alias("d1"))
        .select(
            "user_id",
            F.explode(
                F.sequence(F.col("d0"), F.col("d1"), F.expr("interval 1 day"))
            ).alias("day"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    # fill over the DATE column first; the string render replaces it
    # afterwards (same-select alias would shadow the window's orderBy)
    return (
        days.join(daily, ["user_id", "day"], "left")
        .withColumn("ffill_value", F.last("day_last", ignorenulls=True).over(w))
        .select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
            "ffill_value",
        )
    )


_X11_ORACLE = """
    WITH g AS (
      SELECT user_id, event_type, ts, event_id,
        CASE WHEN LAG(ts) OVER w IS NULL
                  OR ts - LAG(ts) OVER w > INTERVAL 5 MINUTE
             THEN 1 ELSE 0 END AS new_burst
      FROM events
      WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)),
    b AS (
      SELECT *, SUM(new_burst) OVER (
        PARTITION BY user_id, event_type ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS burst
      FROM g),
    r AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id, event_type, burst ORDER BY ts, event_id) AS rn,
        CAST(COUNT(*) OVER (PARTITION BY user_id, event_type, burst) AS BIGINT)
          AS burst_size
      FROM b)
    SELECT user_id, event_type,
      strftime(ts, '%Y-%m-%d %H:%M:%S') AS first_ts,
      event_id AS first_event_id, burst_size
    FROM r WHERE rn = 1
    """


@register("x11_burst_throttle_dedup", oracle=_X11_ORACLE)
def x11_burst_throttle_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst collapse / event throttling: within (user, event_type),
    consecutive events closer than 5 minutes chain into one burst
    (session-start semantics — gap measured to the previous event, so
    a burst extends while the stream stays dense); only the first
    event of each burst survives, with the burst's size. The standard
    client-retry / duplicate-webhook collapse.

    One window partitioning (user_id, event_type) carries the lag, the
    cumulative burst id, the in-burst rank AND the burst size — the
    burst-level count rides the same sort via a second pass over the
    (user, type, burst) keys, no extra exchange (burst is a prefix
    refinement of the sort order)."""
    pin_semantics(spark)
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    # unix_micros, not cast-to-long: the long cast truncates sub-second
    # precision, while the oracle's `ts - LAG(ts) > INTERVAL 5 MINUTE`
    # compares at full precision.
    gap_new = (
        F.lag("ts").over(w).isNull()
        | (
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
            > 300_000_000
        )
    ).cast("int")
    wb = w.rowsBetween(Window.unboundedPreceding, 0)
    bursts = (
        e.withColumn("_new", gap_new)
        .withColumn("burst", F.sum("_new").over(wb))
    )
    wburst = Window.partitionBy("user_id", "event_type", "burst")
    return (
        bursts.withColumn("rn", F.row_number().over(wburst.orderBy("ts", "event_id")))
        .withColumn("burst_size", F.count(F.lit(1)).over(wburst).cast("long"))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
            F.col("event_id").alias("first_event_id"),
            "burst_size",
        )
    )


_X12_ORACLE = """
    WITH d AS (
      SELECT user_id, event_id, ts, CAST(value AS DECIMAL(14,2)) AS dv
      FROM events WHERE value IS NOT NULL),
    m AS (
      SELECT user_id, event_id, ts, dv,
        CAST(SUM(dv) OVER w AS DOUBLE) AS s_d,
        CAST(SUM(dv * dv) OVER w AS DOUBLE) AS ssq_d,
        CAST(COUNT(dv) OVER w AS DOUBLE) AS n_d
      FROM d
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)),
    z AS (
      SELECT user_id, event_id, ts, dv, n_d,
        s_d / n_d AS mean_hist,
        sqrt((ssq_d - s_d * s_d / n_d) / n_d) AS std_hist
      FROM m WHERE n_d >= 5)
    SELECT user_id, event_id,
      strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
      CAST(dv AS DOUBLE) AS value_q, mean_hist, std_hist,
      (CAST(dv AS DOUBLE) - mean_hist) / std_hist AS zscore
    FROM z
    WHERE std_hist > 0
      AND abs(CAST(dv AS DOUBLE) - mean_hist) > 3 * std_hist
    """


@register("x12_rolling_zscore_anomalies", oracle=_X12_ORACLE)
def x12_rolling_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity rolling anomaly detection: each event's value is
    compared against the trailing-10-event history (EXCLUDING itself —
    a 10-to-1-preceding rows frame), flagging |value - mean| > 3·std
    with at least 5 history points. The standard streaming-metrics
    outlier gate, batch form.

    Cross-engine exactness for re-aggregated moments: values quantize
    to DECIMAL(14,2); the frame's SUM(dv) and SUM(dv²) are exact
    decimals, and mean/variance/z are computed by the IDENTICAL
    sequence of double operations on those exact inputs in both
    engines — so even sqrt and division match bitwise and the driver
    hash-compares the full float output. One window partitioning
    (user) carries every aggregate."""
    pin_semantics(spark)
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    dv = F.col("value").cast("decimal(14,2)")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-10, -1)
    )
    m = e.select(
        "user_id",
        "event_id",
        "ts",
        dv.alias("dv"),
    ).select(
        "*",
        F.sum("dv").over(w).cast("double").alias("s_d"),
        F.sum(F.col("dv") * F.col("dv")).over(w).cast("double").alias("ssq_d"),
        F.count("dv").over(w).cast("double").alias("n_d"),
    )
    z = (
        m.filter(F.col("n_d") >= 5)
        .withColumn("mean_hist", F.col("s_d") / F.col("n_d"))
        .withColumn(
            "std_hist",
            F.sqrt(
                (F.col("ssq_d") - F.col("s_d") * F.col("s_d") / F.col("n_d"))
                / F.col("n_d")
            ),
        )
    )
    vq = F.col("dv").cast("double")
    return (
        z.filter(
            (F.col("std_hist") > 0)
            & (F.abs(vq - F.col("mean_hist")) > 3 * F.col("std_hist"))
        )
        .select(
            "user_id",
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
            vq.alias("value_q"),
            "mean_hist",
            "std_hist",
            ((vq - F.col("mean_hist")) / F.col("std_hist")).alias("zscore"),
        )
    )


_X13_ORACLE = """
    WITH seq AS (
      SELECT user_id, event_type,
        LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          AS prev_type
      FROM events),
    trans AS (
      SELECT prev_type, event_type AS next_type,
        CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY 1, 2),
    outdeg AS (
      SELECT prev_type, CAST(SUM(n) AS BIGINT) AS total
      FROM trans GROUP BY prev_type)
    SELECT t.prev_type, t.next_type, t.n,
      CAST(t.n AS DOUBLE) / CAST(o.total AS DOUBLE) AS p_next
    FROM trans t JOIN outdeg o USING (prev_type)
    """


@register("x13_event_transitions", oracle=_X13_ORACLE)
def x13_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-transition matrix (the Markov view behind
    user-journey / next-action analytics): per user, consecutive
    event-type pairs under (ts, event_id) order; globally, each
    (prev → next) count and its row-conditional probability
    p(next | prev) = n / out-degree — one BIGINT division rendered as
    a single double op, so the full matrix hash-matches. One window
    shuffle on user, one aggregate on the pair key; the out-degree
    total is a second aggregate over the (small) matrix itself, not
    the events."""
    pin_semantics(spark)
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    outdeg = trans.groupBy("prev_type").agg(
        F.sum("n").cast("long").alias("total")
    )
    return trans.join(F.broadcast(outdeg), "prev_type").select(
        "prev_type",
        "next_type",
        "n",
        (F.col("n").cast("double") / F.col("total").cast("double")).alias(
            "p_next"
        ),
    )


def _x14_oracle(iters: int = 5, scale: int = 10**9) -> str:
    """Fixed-iteration PageRank unrolled as chained CTEs (no recursive
    aggregation — many engines, DuckDB included, restrict aggregates in
    recursive terms; a FIXED iteration count needs no recursion).
    All-integer arithmetic (see x14 docstring) — `//` here, `div` in
    Spark — so both engines produce identical BIGINT ranks."""
    layers = []
    for k in range(1, iters + 1):
        layers.append(f"""
    r{k} AS (
      SELECT n.node,
        (15 * CAST({scale} AS BIGINT)) // (100 * (SELECT COUNT(*) FROM nodes))
          + COALESCE(s.contrib, 0) AS rank
      FROM nodes n LEFT JOIN (
        SELECT e.next_type AS node,
          CAST(SUM((85 * ((r.rank * e.n) // o.total)) // 100) AS BIGINT)
            AS contrib
        FROM r{k - 1} r
        JOIN edges e ON e.prev_type = r.node
        JOIN outdeg o ON o.prev_type = r.node
        GROUP BY 1) s ON s.node = n.node)""")
    return f"""
    WITH seq AS (
      SELECT user_id, event_type,
        LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          AS prev_type
      FROM events),
    edges AS (
      SELECT prev_type, event_type AS next_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2),
    outdeg AS (
      SELECT prev_type, CAST(SUM(n) AS BIGINT) AS total
      FROM edges GROUP BY prev_type),
    nodes AS (SELECT DISTINCT event_type AS node FROM events),
    r0 AS (SELECT node, CAST(CAST({scale} AS BIGINT) // (SELECT COUNT(*) FROM nodes) AS BIGINT)
             AS rank FROM nodes),{",".join(layers)}
    SELECT node, rank AS rank_scaled,
      CAST(rank AS DOUBLE) / {scale}.0 AS rank
    FROM r{iters}
    """


@register("x14_pagerank_states", oracle=_x14_oracle())
def x14_pagerank_states(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the event-type transition graph (which states are
    central in user journeys) — the iterative-graph computation class
    beyond connected components (d07), with a FULLY EXACT oracle.

    Floating-point PageRank cannot hash-match across engines (per-node
    contribution sums are order-dependent doubles), so ranks live in an
    integer domain: rank is a BIGINT scaled by 1e9, the teleport term
    is (15·scale)//(100·N), and each edge contributes
    (85·((rank·n)//outdeg))//100 — integer floor division at every
    step, identical in Spark (`div`) and DuckDB (`//`). Five
    iterations, unrolled in the oracle as chained CTEs (fixed K needs
    no recursion). Dangling-node mass is dropped (the standard
    simplification), deterministically on both sides.

    Scale shape: the graph aggregates once from the events scan; each
    iteration is a join of the rank frame against the edge list plus
    one aggregate — the d07 components loop's shape, with the same
    per-round checkpoint posture for long chains."""
    pin_semantics(spark)
    from pyspark.sql.window import Window

    scale, iters = 10**9, 5
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    outdeg = edges.groupBy("prev_type").agg(
        F.sum("n").cast("long").alias("total")
    )
    # Same lifecycle discipline as dedup_components: the (tiny —
    # |event_types|²-row) graph and node frames are cached for the
    # loop, each iteration's ranks are CHECKPOINTED (truncating the
    # otherwise 5-join-deep lineage), and the caches are released in
    # finally — the returned frame reads only the final checkpoint.
    graph = edges.join(outdeg, "prev_type").cache()
    nodes = e.select(F.col("event_type").alias("node")).distinct().cache()

    def _truncate(df: DataFrame) -> DataFrame:
        sc = df.sparkSession.sparkContext
        if sc.getCheckpointDir() is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    try:
        n_nodes = nodes.count()
        tele = (15 * scale) // (100 * n_nodes)
        ranks = nodes.select(
            "node", F.lit(scale // n_nodes).cast("long").alias("rank")
        )
        for _ in range(iters):
            contrib = (
                graph.join(ranks, graph["prev_type"] == ranks["node"])
                .select(
                    F.col("next_type").alias("node"),
                    F.expr("(85 * ((rank * n) div total)) div 100").alias("_c"),
                )
                .groupBy("node")
                .agg(F.sum("_c").cast("long").alias("contrib"))
            )
            ranks = _truncate(
                nodes.join(contrib, "node", "left").select(
                    "node",
                    (F.lit(tele) + F.coalesce("contrib", F.lit(0)))
                    .cast("long")
                    .alias("rank"),
                )
            )
        return ranks.select(
            "node",
            F.col("rank").alias("rank_scaled"),
            (F.col("rank").cast("double") / F.lit(float(scale))).alias("rank"),
        )
    finally:
        graph.unpersist()
        nodes.unpersist()


_X15_ORACLE = """
    WITH cutoff AS (
      SELECT MIN(ts) + INTERVAL 15 DAY AS c FROM events),
    old AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total_value
      FROM events WHERE ts < (SELECT c FROM cutoff) GROUP BY user_id),
    new AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total_value
      FROM events GROUP BY user_id)
    SELECT COALESCE(o.user_id, n.user_id) AS user_id,
      CASE WHEN o.user_id IS NULL THEN 'insert'
           WHEN n.user_id IS NULL THEN 'delete'
           WHEN o.n_events IS DISTINCT FROM n.n_events
                OR o.total_value IS DISTINCT FROM n.total_value
             THEN 'update'
           ELSE 'unchanged' END AS change_type,
      o.n_events AS n_events_old, n.n_events AS n_events_new,
      o.total_value AS total_value_old, n.total_value AS total_value_new
    FROM old o FULL OUTER JOIN new n ON o.user_id = n.user_id
    """


@register("x15_snapshot_diff", oracle=_X15_ORACLE)
def x15_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC snapshot diff: the per-user profile at day-15 vs today,
    every key classified insert/update/delete/unchanged with both
    versions of the compared columns (operators/diff.snapshot_diff —
    one full-outer join, null-safe comparison). Profile aggregates use
    decimal money math so both snapshots and the oracle agree
    bitwise."""
    pin_semantics(spark)
    from ..functions.exact import dec
    from ..operators.diff import snapshot_diff

    e = load_table(spark, sf_dir, "events")
    cutoff = e.agg(
        (F.min("ts") + F.expr("INTERVAL 15 DAY")).alias("c")
    )

    def profile(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(dec("value", 14, 2)).cast("double").alias("total_value"),
        )

    old = profile(
        e.join(F.broadcast(cutoff)).filter(F.col("ts") < F.col("c")).drop("c")
    )
    return snapshot_diff(old, profile(e), ["user_id"])
