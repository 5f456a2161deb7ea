"""Round-5 operator batch: data layout + corpus splitting.

Two capability families a 100-TB training-data pipeline needs that the
catalog didn't witness yet:

- **Z-order layout** (x23): Morton-interleaved multi-column sort keys
  (the clustering behind Delta/Iceberg ``OPTIMIZE ZORDER BY``) so
  parquet min-max pruning works on EVERY clustered column at once.
  The witness computes the key as pure shift/mask integer arithmetic
  (identical formula both engines — hash-matched) and measures the
  clustering quality it buys: per-z-bucket coordinate spans, which
  collapse from ~full-domain (hash layout) to tiny hyper-rectangles.
- **Leakage-safe splits** (t21): deterministic train/val/test
  assignment hashed on the exact-dup GROUP key, so duplicate
  documents can never straddle splits (self-inflicted test-set
  contamination — the split-time complement of d09's decontamination).
  Portable md5-hex-boundary bucketing → fully hash-matched oracle.

Both are scan-stage projections + one aggregation: no new shuffle
shapes, nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.splits import assign_split, split_column_sql
from ..sources.layout import zorder_key, zorder_key_sql
from ..session import pin_semantics
from ..sources.tables import load_table
from .catalog import register

# ---------------------------------------------------------------------------
# x23 — z-order layout clustering
# ---------------------------------------------------------------------------

# 5-bit 32×32 grid, bucket at the top 3 bits of each dim (zkey >> 4):
# 64 buckets of ≤4×4 cells — every bucket's span is ≤3 in BOTH
# dimensions vs the 0-31 domain, which is the whole pruning argument.
_X23_BITS = 5
_X23_ZSQL = zorder_key_sql(
    ["l_partkey % 32", "l_suppkey % 32"], bits=_X23_BITS
)

_X23_ORACLE = f"""
    WITH keyed AS (
      SELECT l_partkey % 32 AS px, l_suppkey % 32 AS sx,
             {_X23_ZSQL} AS zkey
      FROM lineitem
    )
    SELECT CAST(zkey >> 4 AS BIGINT) AS z_bucket,
      CAST(COUNT(*) AS BIGINT) AS n_rows,
      CAST(MIN(px) AS BIGINT) AS part_lo,
      CAST(MAX(px) AS BIGINT) AS part_hi,
      CAST(MIN(sx) AS BIGINT) AS supp_lo,
      CAST(MAX(sx) AS BIGINT) AS supp_hi,
      CAST(MAX(px) - MIN(px) AS BIGINT) AS part_span,
      CAST(MAX(sx) - MIN(sx) AS BIGINT) AS supp_span
    FROM keyed
    GROUP BY 1
"""


@register("x23_zorder_layout", oracle=_X23_ORACLE)
def x23_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering witness: Morton key over (l_partkey,
    l_suppkey) on a 32×32 grid, bucketed at the top z-bits (zkey >> 4
    — the file-boundary granularity ``write_zordered`` would
    range-partition on), with per-bucket min/max coordinate spans.

    The spans ARE the scan-pruning story: every z-bucket covers a ≤4×4
    hyper-rectangle in BOTH dimensions (span ≤ 3 vs the 0-31 domain —
    the per-bucket part_span/supp_span columns prove it), so a
    predicate on either column eliminates ~7/8 of buckets by min-max
    alone; a single-column sort gets tight spans in one dimension and
    full-domain spans in the other. The key is pure shift/mask codegen
    (sources/layout.py:zorder_key) — identical arithmetic as the
    oracle, hence hash-matched.
    """
    pin_semantics(spark)
    li = load_table(spark, sf_dir, "lineitem")
    keyed = li.select(
        (F.col("l_partkey") % 32).alias("px"),
        (F.col("l_suppkey") % 32).alias("sx"),
    ).withColumn("zkey", zorder_key(["px", "sx"], bits=_X23_BITS))
    return (
        keyed.groupBy(
            F.shiftright("zkey", 4).cast("bigint").alias("z_bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("px").cast("bigint").alias("part_lo"),
            F.max("px").cast("bigint").alias("part_hi"),
            F.min("sx").cast("bigint").alias("supp_lo"),
            F.max("sx").cast("bigint").alias("supp_hi"),
            (F.max("px") - F.min("px")).cast("bigint").alias("part_span"),
            (F.max("sx") - F.min("sx")).cast("bigint").alias("supp_span"),
        )
    )


# ---------------------------------------------------------------------------
# m05/m06 — content-defined chunking (CDC) + CDC near-dup join
# ---------------------------------------------------------------------------

# 8-byte window, '0' boundary prefix (1/16 of positions → ~16-byte
# mean chunks — sized to this corpus's ~300-byte docs; a media corpus
# would use a longer mask for KB-scale chunks).  The chunk extraction
# CTE chain is the exact SQL mirror of operators/multimodal.py:
# cdc_chunk_arrays — same md5-over-hex-substring arithmetic, so every
# chunk hash matches bit-for-bit.
_CDC_EXTRACT_SQL = """
    p AS (SELECT doc_id AS id, hex(CAST(text AS BLOB)) AS h
          FROM documents WHERE text IS NOT NULL AND len(text) > 0),
    b AS (
      SELECT id, h, CAST(len(h)/2 AS INT) AS n,
        list_filter(generate_series(8, CAST(len(h)/2 AS INT)),
                    p -> md5(substring(h, (p-8)*2+1, 16)) LIKE '0%') AS bpos
      FROM p),
    e AS (
      SELECT id, h, n,
        CASE WHEN len(bpos) > 0 AND bpos[-1] = n THEN bpos
             ELSE list_append(bpos, n) END AS ends
      FROM b),
    s AS (
      SELECT id, h, n, ends,
        list_transform(generate_series(1, len(ends)),
          i -> CASE WHEN i = 1 THEN 1 ELSE ends[i-1] + 1 END) AS starts
      FROM e),
    c AS (
      SELECT id, n, ends, starts,
        list_transform(generate_series(1, len(ends)),
          i -> md5(substring(h, (starts[i]-1)*2+1,
                             (ends[i]-starts[i]+1)*2))) AS chs
      FROM s)
"""

_M05_ORACLE = f"""
    WITH {_CDC_EXTRACT_SQL}
    SELECT id, CAST(n AS BIGINT) AS n_bytes,
      CAST(len(chs) AS BIGINT) AS n_chunks,
      md5(array_to_string(chs, '')) AS cdc_digest,
      CAST(list_max(list_transform(generate_series(1, len(ends)),
                                   i -> ends[i] - starts[i] + 1))
           AS BIGINT) AS max_chunk_bytes
    FROM c
"""


@register("m05_cdc_chunks", oracle=_M05_ORACLE)
def m05_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking witness: per-doc chunk count, an
    order-sensitive digest over the chunk-hash sequence, and the max
    chunk size — all from ``cdc_chunk_arrays``'s pure-Column pipeline
    (boundaries chosen by a rolling content hash, so byte inserts
    re-align within one window instead of shifting every later chunk
    — the property m04's fixed blocks lack, pinned by the
    shift-robustness test). Hash-matched: the boundary predicate and
    chunk hashes are the same md5-over-hex arithmetic in both engines.
    """
    from ..operators import multimodal as mm

    pin_semantics(spark)
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    ch = mm.cdc_chunk_arrays(
        mm.attach_binary(docs, "doc_id", "text"), boundary_prefix="0"
    )
    return ch.select(
        "id",
        "n_bytes",
        F.size("chashes").cast("bigint").alias("n_chunks"),
        F.md5(F.array_join("chashes", "")).alias("cdc_digest"),
        F.array_max("chunk_sizes").cast("bigint").alias("max_chunk_bytes"),
    )


_M06_ORACLE = f"""
    WITH {_CDC_EXTRACT_SQL},
    ch AS (SELECT id, unnest(list_distinct(chs)) AS chash FROM c),
    sizes AS (SELECT id, COUNT(*) AS n FROM ch GROUP BY id),
    inter AS (
      SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS cnt
      FROM ch a JOIN ch b ON a.chash = b.chash AND a.id < b.id
      GROUP BY 1, 2)
    SELECT id_a, id_b, CAST(cnt AS BIGINT) AS shared_chunks,
      CAST(cnt AS DOUBLE) / CAST(LEAST(na.n, nb.n) AS DOUBLE) AS containment
    FROM inter
    JOIN sizes na ON id_a = na.id
    JOIN sizes nb ON id_b = nb.id
    WHERE CAST(cnt AS DOUBLE) / CAST(LEAST(na.n, nb.n) AS DOUBLE) >= 0.5
"""


@register("m06_cdc_neardup", oracle=_M06_ORACLE)
def m06_cdc_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate binary payloads by shared CONTENT-DEFINED chunks
    — the same inverted-index + containment join as m04, fed by CDC
    fingerprints, so append/insert/truncate duplication that shifts
    byte offsets still collides (rsync/restic-style dedup). Shares
    m04's posture notes: posting-cap lever (``max_block_df``) for
    ubiquitous-chunk skew, exact containment arithmetic both engines.
    """
    from ..operators import multimodal as mm

    pin_semantics(spark)
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    return mm.cdc_chunk_neardup(
        mm.attach_binary(docs, "doc_id", "text"),
        boundary_prefix="0",
        min_containment=0.5,
    )


@register("m07_cdc_gear_fast")  # sequential min/max bounds → rows-only
def m07_cdc_gear_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production CDC fast path: vectorized gear rolling hash with
    true min/max chunk bounds (``operators/multimodal.py:
    cdc_gear_chunks``). Rows-only BY DESIGN: the min/max suppression
    is a sequential constraint (each accepted boundary depends on the
    previous accepted one) that no per-position SQL predicate can
    express — the md5 twin m05 carries the cross-engine hash match
    for the chunk-extraction arithmetic, and m07 is pinned against an
    independent iterative pure-python gear implementation plus chunk
    bound/shift-robustness properties in tests/test_round5_ops.py."""
    from ..operators import multimodal as mm

    pin_semantics(spark)
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    return mm.cdc_gear_chunks(mm.attach_binary(docs, "doc_id", "text"))


@register("m08_image_dhash_neardup")  # binary image decode → rows-only
def m08_image_dhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image near-dup: REAL image decode (BMP, plus odd
    groups' noisy twins as 4:2:0 quality-100 JPEG — the lossy
    re-encode case, through the pure-numpy subsampled decoder) →
    64-bit dHash → banded pigeonhole Hamming join
    (``operators/multimodal.py:
    image_dhash``/``dhash_near_pairs`` — same blocking scheme as the
    SimHash text path: ham ≤ bands-1 guarantees an intact 16-bit
    chunk, so candidates come from equality joins, never all-pairs).
    Rows-only BY DESIGN (SQL cannot parse image containers); the
    fixture stream plants one noisy near-dup pair per scene group,
    the gate pins the banded join's pair set against a brute-force
    Hamming scan, and tests/test_round13_ops.py pins the pair set
    unchanged vs the all-BMP corpus."""
    from ..operators import multimodal as mm

    pin_semantics(spark)
    docs = load_table(spark, sf_dir, "documents")
    payloads = mm.demo_noisy_image_payloads(docs, "doc_id")
    return mm.dhash_near_pairs(mm.image_dhash(payloads), max_hamming=3, bands=4)


@register("m11_binaryfile_image_neardup")  # disk ingestion → rows-only
def m11_binaryfile_image_neardup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The multimodal pipeline end-to-end FROM DISK: the lineage
    starts at a real ``binaryFile`` scan (``sources/readers.py:
    read_binary_dir`` — distributed file listing, pathGlobFilter
    pruning BEFORE bytes are read) over a materialized MIXED-FORMAT
    corpus (scenes land as .png, .bmp, and — odd groups' noisy twins —
    4:2:0 quality-100 .jpg: the PNG leg exercises the real
    zlib-inflate decoder, the JPEG leg the subsampled huffman+IDCT
    decoder), then the same decode → dHash → banded Hamming join as
    m08. The bytes are identical to m08's synthesized stream
    (``materialize_demo_image_corpus``; lossless containers share
    pixels, the lossy JPEG leg shares the deterministic encoder), so
    the gate pins m11's pair set == m08's — proving the disk path,
    all three containers, and the in-query path are the same
    operator. Rows-only BY DESIGN (SQL cannot read a binary file
    tree, let alone parse image containers)."""
    from ..operators import multimodal as mm

    pin_semantics(spark)
    corpus = mm.materialize_demo_image_corpus(sf_dir)
    # shared ingest construction — the lineage test asserts on THIS
    # helper's plan, so the query cannot drift to demo synthesis
    # without failing it (round-14 advice)
    payloads = mm.binaryfile_image_payloads(spark, corpus)
    return mm.dhash_near_pairs(mm.image_dhash(payloads), max_hamming=3, bands=4)


@register("m09_audio_landmark_match")  # FFT fingerprints → rows-only
def m09_audio_landmark_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup by spectral-peak landmark constellation
    (``operators/audio.py``): real WAV decode → vectorized STFT →
    (anchor, target, Δt) landmark hashes → the shared inverted-index
    containment join. Rows-only BY DESIGN (SQL has no FFT); pinned by
    scale/noise/hop-shift invariance properties and a brute-force
    match check in tests/test_round5_ops.py. The fixture stream
    plants one re-captured (attenuated + noisy + shifted) twin per
    song group; measured separation at sf0.01: twins ≥ 0.94
    containment, different songs ≤ ~0.33 — the 0.6 threshold sits in
    the gap."""
    from ..operators import audio as au

    pin_semantics(spark)
    docs = load_table(spark, sf_dir, "documents")
    payloads = au.demo_noisy_audio_payloads(docs, "doc_id")
    return au.audio_match_pairs(payloads, min_containment=0.6)


@register("m10_video_neardup")  # RIFF/AVI container decode → rows-only
def m10_video_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video near-dup by frame-constellation containment
    (``operators/video.py``): REAL minimal-AVI decode (RIFF chunk walk
    → raw-DIB frames) → per-frame 64-bit dHash → the shared
    inverted-index containment join. Completes the multimodal triad
    (m08 image, m09 audio, m10 video). Rows-only BY DESIGN (SQL cannot
    parse RIFF containers); pinned by an exact container round-trip, a
    brute-force set-intersection replay, and trim/append/noise
    robustness in tests/test_round5_ops.py. The fixture plants one
    re-cut re-encoded twin per scene group (lead frame trimmed, outro
    appended, off-lattice pixel noise): twins share 7 of 8 frame
    hashes → containment 0.875; distinct scenes share ~0 — the 0.6
    threshold sits in the gap."""
    from ..operators import video as vid

    pin_semantics(spark)
    docs = load_table(spark, sf_dir, "documents")
    payloads = vid.demo_noisy_video_payloads(docs, "doc_id")
    return vid.video_match_pairs(payloads, min_containment=0.6)


# ---------------------------------------------------------------------------
# x25 — distribution drift monitor (windowed histogram shift)
# ---------------------------------------------------------------------------

# DuckDB accumulates the cross products in HUGEINT (SUM(BIGINT) is
# already int128) — the exact twin of the Spark side's DECIMAL(38,0)
# per the huge-accumulator rule; l1_num reports the final cast of the
# exact integer to DOUBLE on both engines, and tvd NULL-guards the
# group-absent-from-one-window case identically on both.
_X25_ORACLE = """
    WITH cutoff AS (SELECT MIN(ts) + INTERVAL 15 DAY AS c FROM events),
    v AS (
      SELECT event_type,
        CAST(floor(value * 100) AS BIGINT) AS cents,
        ts >= (SELECT c FROM cutoff) AS is_b
      FROM events),
    mx AS (SELECT MAX(cents) AS maxc FROM v),
    g AS (
      SELECT event_type,
        GREATEST(0, LEAST(9, (cents * 10) // (maxc + 1))) AS bin,
        SUM(CASE WHEN is_b THEN 0 ELSE 1 END) AS n_a_bin,
        SUM(CASE WHEN is_b THEN 1 ELSE 0 END) AS n_b_bin
      FROM v CROSS JOIN mx GROUP BY 1, 2),
    t AS (SELECT event_type, SUM(n_a_bin) AS na, SUM(n_b_bin) AS nb
          FROM g GROUP BY 1)
    SELECT g.event_type AS event_type,
      CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
      CAST(SUM(CASE WHEN n_a_bin > 0 THEN 1 ELSE 0 END) AS BIGINT)
        AS bins_a,
      CAST(SUM(CASE WHEN n_b_bin > 0 THEN 1 ELSE 0 END) AS BIGINT)
        AS bins_b,
      CAST(SUM(ABS(n_a_bin * nb - n_b_bin * na)) AS DOUBLE) AS l1_num,
      CASE WHEN na > 0 AND nb > 0 THEN
        CAST(SUM(ABS(n_a_bin * nb - n_b_bin * na)) AS DOUBLE)
          / (2.0 * na * nb)
      END AS tvd
    FROM g JOIN t USING (event_type)
    GROUP BY g.event_type, na, nb
"""


@register("x25_distribution_drift", oracle=_X25_ORACLE)
def x25_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift monitor (``operators/drift.py``): per
    event type, the total-variation distance between the value
    histograms of the first 15 days and the rest — the PSI-style
    retraining gate of a continuously-fed pipeline, in the catalog's
    log-free all-integer form (exact BIGINT L1 numerator over the
    common denominator; one final double division mirrored
    operand-for-operand). Complements x21 (one snapshot's constraints)
    and x12 (per-point anomalies): this watches the SHAPE move between
    windows. Planted-shift separation is pinned in
    tests/test_round5_ops.py; the catalog row hash-matches the oracle
    on the naturally-split (≈no-drift) corpus.

    Round 6: switched to the single-pass flagged-column core — the
    window membership is a boolean column over ONE events scan (plus
    the 1-row cutoff broadcast), fixing the round-5 plan defect where
    the two-frame form re-executed the input ~6× (12 scans / 8 BNLJ
    → 2 scans)."""
    from ..operators.drift import histogram_drift_flagged

    pin_semantics(spark)
    e = load_table(spark, sf_dir, "events")
    cutoff = e.agg((F.min("ts") + F.expr("INTERVAL 15 DAY")).alias("c"))
    flagged = e.join(F.broadcast(cutoff)).withColumn(
        "is_b", F.col("ts") >= F.col("c")
    )
    return histogram_drift_flagged(flagged, "value", ["event_type"], "is_b")


# ---------------------------------------------------------------------------
# t22 — budgeted corpus mixing (per-domain token quotas)
# ---------------------------------------------------------------------------

# per-source token budget: a deterministic function of the source id
# so every domain exercises a different fill level at test scale
_T22_BUDGET_SQL = "(200 + 37 * CAST(substring(source, 4) AS INT))"
# deterministic selection priority: 48-bit integer from the md5 hex
# (portable VALUE: Spark computes it via conv(,16,10), DuckDB via a
# 0x-prefixed cast — different syntax, bit-identical result)
_T22_PRI_SQL = (
    "CAST(concat('0x', substring(md5('mix1' || CAST(doc_id AS VARCHAR)),"
    " 1, 12)) AS BIGINT)"
)

_T22_ORACLE = f"""
    WITH d AS (
      SELECT doc_id, source,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        {_T22_PRI_SQL} AS pri,
        {_T22_BUDGET_SQL} AS budget
      FROM documents
      WHERE text IS NOT NULL
    ), c AS (
      SELECT *, SUM(n_tok) OVER (
        PARTITION BY source ORDER BY pri, doc_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM d
    )
    SELECT source,
      CAST(MIN(budget) AS BIGINT) AS budget_tokens,
      CAST(COUNT(*) FILTER (WHERE cum - n_tok < budget) AS BIGINT)
        AS n_docs_selected,
      CAST(COALESCE(SUM(n_tok) FILTER (WHERE cum - n_tok < budget), 0)
           AS BIGINT) AS tokens_selected,
      CAST(COUNT(*) AS BIGINT) AS n_docs_total
    FROM c
    GROUP BY source
"""


@register("t22_corpus_mixing", oracle=_T22_ORACLE)
def t22_corpus_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budgeted corpus mixing: fill each domain's TOKEN quota (the
    data-mixture stage of LLM training — so-many-tokens of web vs
    code vs books) with a deterministic hash-ordered running total;
    a doc is selected while its domain's cumulative count is under
    budget (the boundary doc crosses it, matching the usual
    take-until-full loader).

    Scale: the running totals ride the bucketed two-pass prefix sum
    (``operators/sampling.py:prefix_sum`` with ``partition_cols`` —
    independent sums per domain, parallel across domains AND key
    buckets, no single-task window even inside one giant domain).
    The hash priority makes the selection stable under corpus
    append: a new doc displaces at most the boundary docs of its own
    domain, never reshuffling other domains.
    """
    from ..operators.sampling import prefix_sum
    from ..operators.text import token_count

    pin_semantics(spark)
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    base = docs.select(
        "doc_id",
        "source",
        token_count(F.col("text")).alias("n_tok"),
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("mix1"), F.col("doc_id").cast("string"))),
                1,
                12,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("pri"),
        (
            F.lit(200)
            + F.lit(37) * F.substring("source", 4, 10).cast("int")
        ).alias("budget"),
    )
    cum = prefix_sum(
        base,
        "pri",
        "n_tok",
        "cum",
        partition_cols=["source"],
        tiebreak_cols=["doc_id"],
    )
    sel = F.col("cum") - F.col("n_tok") < F.col("budget")
    return cum.groupBy("source").agg(
        F.min("budget").cast("bigint").alias("budget_tokens"),
        F.sum(sel.cast("int")).cast("bigint").alias("n_docs_selected"),
        F.coalesce(F.sum(F.when(sel, F.col("n_tok"))), F.lit(0))
        .cast("bigint")
        .alias("tokens_selected"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs_total"),
    )


# ---------------------------------------------------------------------------
# t23 — k-anonymity release gate
# ---------------------------------------------------------------------------

_T23_K = 10

_T23_ORACLE = f"""
    WITH sized AS (
      SELECT c_custkey, c_nationkey, c_mktsegment,
        COUNT(*) OVER (PARTITION BY c_nationkey, c_mktsegment) AS k
      FROM customer
    ), anon AS (
      SELECT CASE WHEN k >= {_T23_K} THEN c_nationkey END AS nationkey,
             CASE WHEN k >= {_T23_K} THEN c_mktsegment END AS mktsegment,
             (k < {_T23_K}) AS suppressed
      FROM sized
    )
    SELECT CAST(nationkey AS BIGINT) AS nationkey, mktsegment,
      CAST(COUNT(*) AS BIGINT) AS n_rows,
      bool_and(suppressed) AS suppressed
    FROM anon
    GROUP BY nationkey, mktsegment
"""


@register("t23_k_anonymize", oracle=_T23_ORACLE)
def t23_k_anonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity release gate over quasi-identifiers (nation ×
    market segment, k=10): combinations covering < k rows are
    SUPPRESSED (quasi columns nulled, rows retained) — the
    re-identification complement of t10's direct-PII redaction
    (``operators/privacy.py:k_anonymize``). The witness is the
    released table at full group granularity: every surviving
    (nation, segment) equivalence class with its exact size — each
    class size IS its k, so one row mis-suppressed flips a group in
    or out of the release — plus the single all-NULL bucket holding
    the suppressed rows (279 of 1,500 at sf0.01). One window
    exchange + scan-stage whens; fully hash-matched.
    """
    from ..operators.privacy import k_anonymize

    pin_semantics(spark)
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    anon = k_anonymize(
        cust, ["c_nationkey", "c_mktsegment"], k=_T23_K
    )
    return anon.groupBy(
        F.col("c_nationkey").cast("bigint").alias("nationkey"),
        F.col("c_mktsegment").alias("mktsegment"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.expr("bool_and(suppressed)").alias("suppressed"),
    )


# ---------------------------------------------------------------------------
# x24 — bucketed co-located join (shuffle elimination by layout)
# ---------------------------------------------------------------------------

_X24_ORACLE = """
    SELECT c_mktsegment AS mktsegment,
      CAST(COUNT(*) AS BIGINT) AS n_orders,
      CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_buyers,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_mktsegment
"""


@register("x24_bucketed_join", oracle=_X24_ORACLE)
def x24_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located fact-to-dim join over BUCKETED storage
    (``sources/bucketing.py``): customer and orders land once as
    bucketBy(custkey)+sortBy tables, and the equi-join then plans with
    ZERO Exchange on either side (asserted on the executed plan in
    tests/test_round5_ops.py) — x23's z-order witness is min-max scan
    pruning; this is its join-side sibling, the layout investment that
    stops a 100-TB fact table from re-shuffling on every query. The
    result is layout-invariant, so the oracle runs on the raw parquet;
    the per-segment DECIMAL revenue re-aggregation makes it
    hash-exact."""
    from ..sources.bucketing import bucketed_pair

    pin_semantics(spark)
    cust, orders = bucketed_pair(spark, sf_dir)
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"])
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.countDistinct("c_custkey").cast("bigint").alias("n_buyers"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# s07 — hybrid retrieval with reciprocal-rank fusion
# ---------------------------------------------------------------------------

_S07_N = 50  # per-retriever shortlist length
_S07_K = 60  # classic RRF smoothing constant
_S07_TOPK = 15


def _s07_oracle(k1: float = 1.2, b: float = 0.75) -> str:
    from .llm_ops import _cos_sql
    from .llm_ops4 import _T16_TERMS

    terms = ", ".join(f"'{t}'" for t in _T16_TERMS)
    # Sparse branch: t16's BM25 oracle verbatim (same rational idf,
    # same DECIMAL(28,12) per-term quantization — llm_ops4._t16_oracle)
    # with the query doc excluded and the shortlist widened to N.
    # Dense branch: s01's list_reduce cosine with vec 0 as the query.
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents WHERE doc_id <> 0),
    dl AS (SELECT doc_id, COUNT(*) AS dl_n FROM tok GROUP BY doc_id),
    stats AS (SELECT COUNT(*) AS n_docs, SUM(dl_n) AS sum_dl FROM dl),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf_n FROM tok
           WHERE token IN ({terms}) GROUP BY doc_id, token),
    dfreq AS (SELECT token, COUNT(*) AS df_n FROM tf GROUP BY token),
    sscored AS (
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
      GROUP BY t.doc_id),
    stop_ AS (
      SELECT doc_id, rn FROM (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY score_dec DESC, doc_id) AS rn
        FROM sscored)
      WHERE rn <= {_S07_N}),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    dscored AS (
      SELECT vec_id AS doc_id, {_cos_sql('qv', 'embedding')} AS dscore
      FROM embeddings CROSS JOIN q WHERE vec_id <> 0),
    dtop AS (
      SELECT doc_id, rn FROM (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY dscore DESC, doc_id) AS rn
        FROM dscored)
      WHERE rn <= {_S07_N}),
    fused AS (
      SELECT COALESCE(d.doc_id, s.doc_id) AS doc_id,
             d.rn AS dense_rank, s.rn AS sparse_rank,
             COALESCE(1000000000000 // ({_S07_K} + d.rn), 0)
             + COALESCE(1000000000000 // ({_S07_K} + s.rn), 0) AS rrf_score
      FROM dtop d FULL JOIN stop_ s ON d.doc_id = s.doc_id)
    SELECT doc_id,
           CAST(dense_rank AS BIGINT) AS dense_rank,
           CAST(sparse_rank AS BIGINT) AS sparse_rank,
           CAST(rrf_score AS BIGINT) AS rrf_score,
           CAST(rn AS BIGINT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY rrf_score DESC, doc_id) AS rn
          FROM fused)
    WHERE rn <= {_S07_TOPK}
    """


@register("s07_hybrid_rrf", oracle=_s07_oracle())
def s07_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: fuse the dense top-50 (exact cosine vs the
    vec-0 query embedding — s01's scorer) and the sparse top-50 (t16's
    BM25 over the fixed term bag) with reciprocal-rank fusion
    (``operators/fusion.py:rrf_fuse``) — the standard way production
    search combines ANN and keyword retrieval without score
    calibration. Doc 0 (the dense query's own document) is excluded
    from both branches.

    Output is ALL-INTEGER (per-retriever ranks + the ``10^12 div
    (60+rank)`` fused score), so the whole pipeline hash-matches: the
    dense ranks via s01's proven float-identical cosine folds, the
    sparse ranks via t16's decimal-quantized BM25, the fusion via pure
    BIGINT division in both engines.

    Scale: each retriever reduces the corpus to a 50-row shortlist
    before the fusion ever runs — the RRF join and final window touch
    ≤100 rows (per query; ``rrf_fuse(query_cols=...)`` partitions for
    batch query workloads), so the fused stage costs nothing at any
    corpus size; the retrievers carry the scale story (s02-s05 swap in
    for s01 when the corpus outgrows brute force).
    """
    from ..operators.fusion import rrf_fuse
    from ..operators.text import bm25_topk
    from ..operators.similarity import cosine_topk_bruteforce
    from .llm_ops4 import _T16_TERMS

    pin_semantics(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") != 0)
    queries = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    corpus = emb.filter(F.col("vec_id") != 0).select(
        F.col("vec_id").alias("corpus_id"), F.col("embedding").alias("corpus_vec")
    )
    dense = cosine_topk_bruteforce(queries, corpus, k=_S07_N).select(
        F.col("corpus_id").alias("doc_id"), "rank"
    )
    sparse = bm25_topk(
        docs, "doc_id", "text", list(_T16_TERMS), topk=_S07_N
    ).select("doc_id", "rank")
    return rrf_fuse(
        [("dense", dense), ("sparse", sparse)],
        id_col="doc_id",
        k=_S07_K,
        topk=_S07_TOPK,
    )


# ---------------------------------------------------------------------------
# t21 — leakage-safe train/val/test split
# ---------------------------------------------------------------------------

_T21_SPLIT_SQL = split_column_sql("md5(text)", seed="s1")

_T21_ORACLE = f"""
    WITH labeled AS (
      SELECT doc_id, md5(text) AS grp, {_T21_SPLIT_SQL} AS split
      FROM documents
      WHERE text IS NOT NULL
    )
    SELECT split,
      CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(COUNT(DISTINCT grp) AS BIGINT) AS n_groups,
      CAST(SUM(CASE WHEN n_splits_of_group > 1 THEN 1 ELSE 0 END)
           AS BIGINT) AS leaked_docs
    FROM (
      SELECT doc_id, grp, split,
        COUNT(DISTINCT split) OVER (PARTITION BY grp) AS n_splits_of_group
      FROM labeled
    )
    GROUP BY split
"""


@register("t21_leakage_safe_split", oracle=_T21_ORACLE)
def t21_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split hashed on the exact-dup group
    key (md5 of text), plus the leakage audit: ``leaked_docs`` counts
    docs whose dup group spans >1 split — structurally zero here
    because the split is a pure function of the group key (the audit
    column PROVES the invariant rather than assuming it; an id-hashed
    split shows nonzero leaks on any corpus with dups).

    Scale: split assignment is a scan-stage projection; the audit is
    one groupBy over group keys. Fuzzy-group splitting reuses the same
    mechanism keyed on ``dedup_components`` representatives
    (test_round5_ops pins that composition).
    """
    pin_semantics(spark)
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    labeled = assign_split(
        docs.select("doc_id", F.md5("text").alias("grp")),
        F.col("grp"),
        seed="s1",
    )
    from pyspark.sql.window import Window

    audited = labeled.withColumn(
        "n_splits_of_group",
        F.size(
            F.collect_set("split").over(Window.partitionBy("grp"))
        ),
    )
    return audited.groupBy("split").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("grp").cast("bigint").alias("n_groups"),
        F.sum(
            F.when(F.col("n_splits_of_group") > 1, 1).otherwise(0)
        )
        .cast("bigint")
        .alias("leaked_docs"),
    )
