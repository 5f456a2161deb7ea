"""Round-6 operator batch: lakehouse maintenance + corpus hygiene.

Four capability families a 100-TB engine needs that the catalog
didn't witness yet, plus a retrieval post-processing pass:

- **Small-file compaction planning** (x29): the OPTIMIZE /
  rewrite-data-files planner — bin-pack a file inventory into
  target-sized rewrite groups off an exclusive running-byte prefix
  (``operators/compaction.py:compaction_plan``). Pure metadata-plane:
  input is one row per FILE, never the data; the prefix sum rides the
  bucketed two-pass machinery (t22/x16), no single-task window.

- **ANALYZE-style column statistics** (x31): per-column row/null
  counts, exact NDV, min/max, equi-depth quartile boundaries for the
  cost-based optimizer (``compaction.py:column_stats``). One unpivoted
  input pass + one dimension-sized cumulative window over the integer
  cents grid — never a per-column scan, never a global row sort.

- **Incremental aggregate maintenance** (x30): the IVM / partial-
  aggregate-merge contract — maintain a monthly rollup by merging a
  pre-aggregated BASE (history) with a freshly aggregated DELTA
  (new partition) instead of rebuilding: re-aggregatable stats only
  (count → sum, sum → sum, min/max → min/max), the exact shape every
  incremental materialized view and streaming upsert sink relies on.
  The oracle is the single-pass full rebuild, so the hash match IS
  the incremental == batch proof (the x27 discipline, here for
  aggregates; the cutoff splits a month mid-way on purpose so merged
  groups genuinely span both sides).

- **Corpus-wide segment dedup** (t25): the C4/CCNet line-level dedup
  primitive — drop every repeated ``seg``-token segment except its
  first corpus occurrence and reassemble documents
  (``operators/text.py:segment_dedup``). First-occurrence selection
  is a grouped MIN over a packed (doc, idx) key — map-side combine,
  hot segments never funnel through one task. Complements d12 (which
  REPORTS duplicated spans; this one rewrites the corpus) and
  d01/d05 (document-level exact dedup; this is sub-document).

- **MMR diversity re-rank** (s08): maximal marginal relevance over a
  dense retriever's shortlist (``operators/fusion.py:mmr_rerank``) —
  rows-only, because the greedy argmax recurrence (each pick changes
  every remaining candidate's diversity penalty) is not expressible
  in set-based SQL; pinned instead by a brute-force numpy replay and
  invariance tests (tests/test_round6b_ops.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import dec
from ..operators.compaction import column_stats, compaction_plan
from ..operators.util import truncate_lineage
from ..session import pin_semantics
from ..sources.tables import load_table
from .catalog import register

# ---------------------------------------------------------------------------
# x29 — small-file compaction planner
# ---------------------------------------------------------------------------

_X29_TARGET = 131072  # 128 KiB demo target; production: 128 MiB-1 GiB

_X29_ORACLE = f"""
    WITH files AS (
      SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS file_id,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(64 + LENGTH(COALESCE(props, ''))) AS BIGINT) AS bytes
      FROM events GROUP BY 1),
    c AS (
      SELECT file_id, n_rows, bytes,
        SUM(bytes) OVER (ORDER BY file_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - bytes AS prior
      FROM files)
    SELECT file_id, n_rows, bytes,
      CAST(prior // {_X29_TARGET} AS BIGINT) AS bin_id
    FROM c
    """


@register("x29_compaction_plan", oracle=_X29_ORACLE)
def x29_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction (OPTIMIZE) planner over a daily-file inventory
    simulated from events (one "file" per event date; bytes = a fixed
    per-row overhead + payload length — the stand-in for the size
    column a real table catalog provides). Output is the per-file
    rewrite assignment: consecutive days pack into ~128 KiB bins, so
    clustering by date survives the rewrite."""
    pin_semantics(spark)
    ev = load_table(spark, sf_dir, "events")
    day = F.to_date("ts")
    files = ev.groupBy(day.alias("_day")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.lit(64) + F.length(F.coalesce("props", F.lit(""))))
        .cast("long")
        .alias("bytes"),
    ).select(
        F.date_format("_day", "yyyy-MM-dd").alias("file_id"),
        F.datediff("_day", F.lit("1970-01-01").cast("date")).alias("_ord"),
        "n_rows",
        "bytes",
    )
    # the inventory is metadata-sized (one row per file); materialize it
    # once so prefix_sum's range/local/totals branches don't re-run the
    # events scan+agg each (the x25 lesson: 4 scans -> 1)
    files = truncate_lineage(files)
    plan = compaction_plan(
        files,
        order_key="_ord",
        target_bytes=_X29_TARGET,
        carry_cols=["n_rows"],
    )
    return plan.select("file_id", "n_rows", "bytes", "bin_id")


# ---------------------------------------------------------------------------
# x30 — incremental aggregate maintenance (merge base + delta)
# ---------------------------------------------------------------------------

# Mid-month cutoff ON PURPOSE: July 1998 exists in both base and
# delta, so the merge provably combines partial aggregates rather
# than concatenating disjoint groups.
_X30_CUTOFF = "1998-07-16"

_X30_ORACLE = """
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
      o_orderstatus AS status,
      CAST(COUNT(*) AS BIGINT) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
      CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
      CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
    FROM orders GROUP BY 1, 2
    """


def _x30_partial(orders: DataFrame) -> DataFrame:
    return orders.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias(
            "month"
        ),
        F.col("o_orderstatus").alias("status"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(dec("o_totalprice")).alias("_rev_dec"),
        F.min("o_totalprice").alias("_mn"),
        F.max("o_totalprice").alias("_mx"),
    )


@register("x30_rollup_ivm_merge", oracle=_X30_ORACLE)
def x30_rollup_ivm_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for a monthly rollup: BASE
    (orders before the cutoff) is pre-aggregated — standing in for
    yesterday's materialized state — and only the DELTA partition is
    aggregated fresh; the merge re-aggregates the union of partial
    states (count/sum/min/max are all re-aggregatable; the decimal
    revenue stays exact through both levels). Hash-matching the
    single-pass full-rebuild oracle proves incremental == batch —
    at 100 TB this is the difference between scanning one day and
    scanning the table."""
    pin_semantics(spark)
    orders = load_table(spark, sf_dir, "orders")
    cutoff = F.lit(_X30_CUTOFF).cast("timestamp")
    base = _x30_partial(orders.filter(F.col("o_orderdate") < cutoff))
    delta = _x30_partial(orders.filter(F.col("o_orderdate") >= cutoff))
    merged = (
        base.unionByName(delta)
        .groupBy("month", "status")
        .agg(
            F.sum("n_orders").cast("long").alias("n_orders"),
            F.sum("_rev_dec").alias("_rev_dec"),
            F.min("_mn").alias("_mn"),
            F.max("_mx").alias("_mx"),
        )
    )
    return merged.select(
        "month",
        "status",
        "n_orders",
        F.col("_rev_dec").cast("double").alias("revenue"),
        F.col("_mn").cast("double").alias("min_price"),
        F.col("_mx").cast("double").alias("max_price"),
    )


# ---------------------------------------------------------------------------
# x31 — ANALYZE-style column statistics
# ---------------------------------------------------------------------------

_X31_COLS = ("l_quantity", "l_extendedprice", "l_discount")

_X31_ORACLE = f"""
    WITH u AS (
      SELECT v.col_name, v.value
      FROM lineitem, LATERAL (VALUES
        {", ".join(f"('{c}', {c})" for c in _X31_COLS)}
      ) AS v(col_name, value)),
    g AS (
      SELECT col_name, CAST(floor(value * 100) AS BIGINT) AS cents,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM u WHERE value IS NOT NULL GROUP BY 1, 2),
    t AS (
      SELECT col_name, SUM(c) AS n, CAST(COUNT(*) AS BIGINT) AS ndv,
             MIN(cents) AS mn, MAX(cents) AS mx
      FROM g GROUP BY 1),
    nulls AS (
      SELECT col_name,
        CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_null
      FROM u GROUP BY 1),
    cum AS (
      SELECT col_name, cents,
        SUM(c) OVER (PARTITION BY col_name ORDER BY cents
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumc
      FROM g)
    SELECT t.col_name, CAST(t.n AS BIGINT) AS n, nulls.n_null, t.ndv,
      CAST(t.mn AS DOUBLE) / 100.0 AS min_value,
      CAST(t.mx AS DOUBLE) / 100.0 AS max_value,
      CAST(MIN(CASE WHEN cumc >= (t.n * 25 + 99) // 100 THEN cents END)
           AS DOUBLE) / 100.0 AS p25,
      CAST(MIN(CASE WHEN cumc >= (t.n * 50 + 99) // 100 THEN cents END)
           AS DOUBLE) / 100.0 AS p50,
      CAST(MIN(CASE WHEN cumc >= (t.n * 75 + 99) // 100 THEN cents END)
           AS DOUBLE) / 100.0 AS p75
    FROM cum JOIN t USING (col_name) JOIN nulls USING (col_name)
    GROUP BY t.col_name, t.n, nulls.n_null, t.ndv, t.mn, t.mx
    """


@register("x31_column_stats", oracle=_X31_ORACLE)
def x31_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CBO table statistics for three lineitem measures in one input
    pass (``operators/compaction.py:column_stats``): exact counts/NDV/
    min/max plus equi-depth quartile boundaries over the integer cents
    grid (x16/x25-proven ``floor(value·100)`` — lossless for this
    2-decimal data). Unlike x02 (approximate percentiles) and x21
    (constraint gate), this is the stats-collection pass itself —
    exact, grid-resolution, no global sort."""
    pin_semantics(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return column_stats(li, list(_X31_COLS))


# ---------------------------------------------------------------------------
# t25 — corpus-wide segment-level dedup (C4 line dedup)
# ---------------------------------------------------------------------------

_T25_SEG = 8
_T25_MAXSEGS = 64

_T25_ORACLE = f"""
    WITH segs AS (
      SELECT doc_id, CAST(i - 1 AS BIGINT) AS seg_idx,
        array_to_string(list_slice(string_split(text, ' '),
          (i - 1) * {_T25_SEG} + 1, (i - 1) * {_T25_SEG} + {_T25_SEG}),
          ' ') AS seg
      FROM documents,
        unnest(generate_series(1, CAST(ceil(
          len(string_split(text, ' ')) / {_T25_SEG}.0) AS BIGINT))) AS t(i)),
    p AS (
      SELECT doc_id, seg_idx, seg,
             doc_id * {_T25_MAXSEGS} + seg_idx AS pack
      FROM segs),
    f AS (SELECT seg, MIN(pack) AS first_pack FROM p GROUP BY seg)
    SELECT doc_id,
      CAST(COUNT(*) AS BIGINT) AS n_segs,
      CAST(SUM(CASE WHEN pack = first_pack THEN 1 ELSE 0 END) AS BIGINT)
        AS n_kept,
      COALESCE(string_agg(CASE WHEN pack = first_pack THEN seg END,
                          ' ' ORDER BY seg_idx), '') AS cleaned_text
    FROM p JOIN f USING (seg)
    GROUP BY doc_id
    """


@register("t25_segment_dedup", oracle=_T25_ORACLE)
def t25_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style corpus-wide segment dedup: every repeated 8-token
    segment is dropped except its first corpus occurrence, and
    documents are reassembled from the survivors
    (``operators/text.py:segment_dedup``). The sub-document rewrite
    complement of d01/d05 (doc-level dedup) and d12 (span REPORTING)."""
    pin_semantics(spark)
    docs = load_table(spark, sf_dir, "documents")
    return segment_dedup_catalog(docs)


def segment_dedup_catalog(docs: DataFrame) -> DataFrame:
    from ..operators.text import segment_dedup

    return segment_dedup(
        docs, "doc_id", "text", seg_tokens=_T25_SEG, max_segs=_T25_MAXSEGS
    )


# ---------------------------------------------------------------------------
# s08 — MMR diversity re-rank (rows-only: greedy recurrence, not SQL)
# ---------------------------------------------------------------------------


@register("s08_mmr_rerank")  # greedy argmax recurrence → rows-only check
def s08_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR (λ=0.7) over the exact cosine top-20 shortlist of s01's
    query set — the diversity pass between retrieval and a context
    window. Rows-only because each greedy pick re-prices every
    remaining candidate (a sequential recurrence SQL cannot express);
    pinned by the brute-force numpy replay + invariance tests in
    tests/test_round6b_ops.py. Deterministic: shortlist is exact,
    ties break on (−relevance, corpus_id)."""
    pin_semantics(spark)
    from ..operators.fusion import mmr_rerank
    from ..operators.similarity import cosine_topk_bruteforce

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    corpus = emb.select(
        F.col("vec_id").alias("corpus_id"),
        F.col("embedding").alias("corpus_vec"),
    )
    shortlist = cosine_topk_bruteforce(queries, corpus, k=20).select(
        "query_id", "corpus_id", "score"
    )
    with_vecs = shortlist.join(corpus, "corpus_id")
    return mmr_rerank(with_vecs, k=10, lam=0.7).orderBy("query_id", "rank")


# ---------------------------------------------------------------------------
# s09 — IVF-PQ (IVFADC) approximate top-k (rows-only: recall < 1)
# ---------------------------------------------------------------------------


@register("s09_cosine_topk_ivfpq")  # approximate (recall<1) → rows-only
def s09_cosine_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production billion-vector ANN shape: IVF routing × PQ
    asymmetric-distance codes × exact rerank, composing s03's cluster
    index with s05's code index (recall bounded vs s01 in
    tests/test_round6b_ops.py; training is deterministic, so the
    rows-only driver check is stable across runs)."""
    pin_semantics(spark)
    from ..operators.similarity import cosine_topk_ivfpq

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    corpus = emb.select(
        F.col("vec_id").alias("corpus_id"),
        F.col("embedding").alias("corpus_vec"),
    )
    return cosine_topk_ivfpq(queries, corpus, k=5).select(
        "query_id", "corpus_id", "score", "rank"
    )


# ---------------------------------------------------------------------------
# t26 — incremental segment dedup (delta vs a persisted segment index)
# ---------------------------------------------------------------------------

_T26_NEW_FROM = 400  # doc_id >= this = the "new batch"

# The oracle is t25's global first-occurrence semantics restricted to
# the new batch — legal because old packs are strictly smaller than
# new packs (doc_id-ordered), so "first occurrence anywhere" and
# "absent from the old index, first within the delta" coincide.
_T26_ORACLE = f"""
    WITH segs AS (
      SELECT doc_id, CAST(i - 1 AS BIGINT) AS seg_idx,
        array_to_string(list_slice(string_split(text, ' '),
          (i - 1) * {_T25_SEG} + 1, (i - 1) * {_T25_SEG} + {_T25_SEG}),
          ' ') AS seg
      FROM documents,
        unnest(generate_series(1, CAST(ceil(
          len(string_split(text, ' ')) / {_T25_SEG}.0) AS BIGINT))) AS t(i)),
    p AS (
      SELECT doc_id, seg_idx, seg,
             doc_id * {_T25_MAXSEGS} + seg_idx AS pack
      FROM segs),
    f AS (SELECT seg, MIN(pack) AS first_pack FROM p GROUP BY seg)
    SELECT doc_id,
      CAST(COUNT(*) AS BIGINT) AS n_segs,
      CAST(SUM(CASE WHEN pack = first_pack THEN 1 ELSE 0 END) AS BIGINT)
        AS n_kept,
      COALESCE(string_agg(CASE WHEN pack = first_pack THEN seg END,
                          ' ' ORDER BY seg_idx), '') AS cleaned_text
    FROM p JOIN f USING (seg)
    WHERE doc_id >= {_T26_NEW_FROM}
    GROUP BY doc_id
    """


@register("t26_incremental_segment_dedup", oracle=_T26_ORACLE)
def t26_incremental_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental twin of t25 (the d14 discipline, sub-document):
    only the DELTA batch is exploded and cleaned — its segments check
    against the persisted first-occurrence index of the already-
    ingested corpus (here rebuilt from the old docs; in production the
    index from the last run persists, partitioned by segment hash) and
    against earlier occurrences within the delta itself. The oracle is
    the FULL-CORPUS t25 semantics restricted to the delta, so the hash
    match proves incremental == batch. At 100 TB the delta explode is
    a day's ingest, not the corpus."""
    pin_semantics(spark)
    from ..operators.text import segment_dedup_incremental, segment_index

    docs = load_table(spark, sf_dir, "documents")
    is_new = F.col("doc_id") >= _T26_NEW_FROM
    index = segment_index(
        docs.filter(~is_new),
        "doc_id",
        "text",
        seg_tokens=_T25_SEG,
        max_segs=_T25_MAXSEGS,
    )
    return segment_dedup_incremental(
        docs.filter(is_new),
        index,
        "doc_id",
        "text",
        seg_tokens=_T25_SEG,
        max_segs=_T25_MAXSEGS,
    )


# ---------------------------------------------------------------------------
# x32 — partition-pruned scan over a Hive-partitioned layout
# ---------------------------------------------------------------------------

_X32_LO, _X32_HI = "2024-01-08", "2024-01-14"

_X32_ORACLE = f"""
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS event_date,
      event_type,
      CAST(COUNT(*) AS BIGINT) AS n,
      CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total_value
    FROM events
    WHERE CAST(ts AS DATE) BETWEEN DATE '{_X32_LO}' AND DATE '{_X32_HI}'
    GROUP BY 1, 2
    """


@register("x32_partition_pruned_scan", oracle=_X32_ORACLE)
def x32_partition_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-range aggregation over the Hive-partitioned events layout
    (``sources/partitioned.py``): the ``event_date`` predicate resolves
    against the directory listing (``PartitionFilters`` in the scan,
    pruned-partition count asserted in tests/test_round6b_ops.py), so
    only 7 of 30 day directories are opened — on a 100-TB event table
    this is the difference between scanning a week and scanning
    years. Completes the layout-investment triad: x23 clusters within
    files, x24 buckets by key, x32 partitions by directory."""
    pin_semantics(spark)
    from ..sources.partitioned import partitioned_events

    ev = partitioned_events(spark, sf_dir)
    # partition discovery infers event_date as DATE — filter on the
    # date (that's what reaches PartitionFilters), render as string
    # only in the output per the cross-engine exactness rules
    lo, hi = (F.lit(s).cast("date") for s in (_X32_LO, _X32_HI))
    return (
        ev.filter(F.col("event_date").between(lo, hi))
        .groupBy(
            F.date_format("event_date", "yyyy-MM-dd").alias("event_date"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(dec("value", 14, 2)).cast("double").alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# x33 — schema-evolution read (mergeSchema over a column-added layout)
# ---------------------------------------------------------------------------

_X33_CUT = "2024-01-16"  # files before this date predate the 'value' column

_X33_ORACLE = f"""
    SELECT event_type,
      CAST(COUNT(*) AS BIGINT) AS n,
      CAST(SUM(CASE WHEN CAST(ts AS DATE) >= DATE '{_X33_CUT}'
                    THEN 0 ELSE 1 END) AS BIGINT) AS n_legacy,
      CAST(SUM(CASE WHEN CAST(ts AS DATE) >= DATE '{_X33_CUT}'
                    THEN CAST(value AS DECIMAL(14,2)) END) AS DOUBLE)
        AS sum_value
    FROM events
    GROUP BY event_type
    """


@register("x33_schema_evolution_read", oracle=_X33_ORACLE)
def x33_schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution, the lakehouse way: the events table is
    re-materialized as two parquet generations — files BEFORE the
    cutover predate the ``value`` column (it simply isn't in their
    schema), files after carry it — and read back through ONE
    ``mergeSchema`` scan, which back-fills the missing column with
    NULLs. The aggregation proves the semantics: legacy-file rows
    count into ``n_legacy`` and contribute NULL (not 0) to
    ``sum_value``, matching the oracle's recomputation from the
    unsplit source. At 100 TB this is how a new column ships without
    rewriting years of history."""
    pin_semantics(spark)
    from ..sources.partitioned import evolved_events

    ev = evolved_events(spark, sf_dir, cutover=_X33_CUT)
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("value").isNull().cast("long"))
        .cast("long")
        .alias("n_legacy"),
        F.sum(dec("value", 14, 2)).cast("double").alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# m12 — cross-codec video near-dup (rows-only: RIFF/JPEG parsing)
# ---------------------------------------------------------------------------


@register("m12_crosscodec_video_neardup")  # container+codec decode → rows-only
def m12_crosscodec_video_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-codec video near-dup: each planted twin is the SAME
    footage re-encoded as Motion-JPEG (trimmed lead frame) — JPEG
    quantization perturbs every frame dHash by a few bits, so m10's
    exact containment join finds ZERO pairs (asserted in the gate)
    while the banded-Hamming frame matching
    (``operators/video.py:video_match_pairs_tolerant``, 8×8-bit
    pigeonhole bands, lossless to 7 bits) recovers exactly the planted
    twins at containment ≥ 0.85. The detector a real platform needs:
    re-uploads never come back in the original codec. Rows-only BY
    DESIGN (SQL cannot parse RIFF containers or JPEG entropy streams);
    pinned by the exact-vs-tolerant contrast + planted-twin recovery
    in tests/test_round6c_ops.py.

    Round 9: the composite-key arity self-selects from the corpus
    size — ``n_videos`` comes from a metadata-cheap id count (no
    decode), and past the measured ~6,200-video crossover the join
    switches to 3-chunk keys, killing the arity-2 cross-video
    birthday term (67× measured cut) before it can dominate."""
    from ..operators import video as vid

    pin_semantics(spark)
    docs = load_table(spark, sf_dir, "documents")
    n_videos = docs.filter(F.col("doc_id") % 10 == 0).count()
    payloads = vid.demo_crosscodec_video_payloads(docs, "doc_id")
    return vid.video_match_pairs_tolerant(
        payloads, min_containment=0.6, n_videos=n_videos
    )


# ---------------------------------------------------------------------------
# m13 — cross-CONTAINER video near-dup from disk (rows-only: ISO-BMFF)
# ---------------------------------------------------------------------------


@register("m13_crosscontainer_video_neardup")  # ISO-BMFF box walk → rows-only
def m13_crosscontainer_video_neardup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The video pipeline end-to-end FROM DISK across TWO container
    families: one ``binaryFile`` scan over a mixed corpus where each
    planted twin's even member is a raw-DIB ``.avi`` and the odd
    member the SAME footage (lead frame trimmed) as an MJPEG ``.mp4``
    (the ISO-BMFF box walk + full stsc/stco/stsz sample-table
    resolution in ``operators/mp4.py``). The per-payload container
    sniff inside ``video_fingerprints`` means ONE Arrow-batched
    decode stage serves both families; matching is the same tolerant
    banded-Hamming frame join as m12 (raw-vs-JPEG pixels drift every
    frame hash a few bits, so exact containment finds zero). Pair set
    is pinned equal to m12's in the gate (same scenes, same trim,
    container-invariant hashes). Rows-only BY DESIGN (SQL cannot read
    a binary file tree, parse RIFF or ISO-BMFF containers, or decode
    JPEG entropy streams)."""
    from ..operators import video as vid
    from ..sources.readers import read_binary_dir

    pin_semantics(spark)
    corpus = vid.materialize_demo_video_corpus(sf_dir)
    import os

    # corpus size from the directory listing — metadata, no decode;
    # keeps m13's arity choice in lockstep with m12's (pair-set
    # equality between the two is a gate pin)
    n_videos = sum(
        1 for f in os.listdir(corpus) if f.endswith((".avi", ".mp4"))
    )
    payloads = read_binary_dir(spark, corpus, glob="*.{avi,mp4}").select(
        F.regexp_extract("id", r"doc_(\d+)\.(avi|mp4)$", 1)
        .cast("long")
        .alias("id"),
        "content",
        "modality",
    )
    return vid.video_match_pairs_tolerant(
        payloads, min_containment=0.6, n_videos=n_videos
    )
