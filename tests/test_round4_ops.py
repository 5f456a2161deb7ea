"""Round-4 additions: salted skew join equivalence and the byte-aware
spread gate.

salted_join's contract is exact result equality with the plain join —
salting must be invisible (each left row carries exactly one salt,
each right row exists under every salt). Pinned here for inner and
left joins, duplicate keys on both sides, unmatched rows, and NULL
keys (which match in neither form).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from onechronos_etl_takehome_spark.operators.skew import salted_join
from onechronos_etl_takehome_spark.operators.util import spread


def _rows(df, cols):
    rows = [tuple(r[c] for c in cols) for r in df.collect()]
    return sorted(rows, key=lambda t: tuple((v is None, v) for v in t))


def _fixture(spark):
    # hot key 1 (power-law), duplicates on both sides, an unmatched
    # left key (99), an unmatched right key (7), and NULL keys on both
    left = spark.createDataFrame(
        [(1, i) for i in range(200)]
        + [(2, 1000), (2, 1001), (3, 2000), (99, 3000), (None, 4000)],
        "k int, lv int",
    )
    right = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d"), (7, "e"), (None, "f")],
        "k int, rv string",
    )
    return left, right


def test_salted_inner_matches_plain(spark):
    left, right = _fixture(spark)
    plain = left.join(right, ["k"], "inner")
    salted = salted_join(left, right, ["k"], how="inner", salt_buckets=8)
    assert sorted(salted.columns) == sorted(plain.columns)
    cols = plain.columns
    assert _rows(salted, cols) == _rows(plain, cols)


def test_salted_left_matches_plain(spark):
    left, right = _fixture(spark)
    plain = left.join(right, ["k"], "left")
    salted = salted_join(left, right, ["k"], how="left", salt_buckets=8)
    cols = plain.columns
    assert _rows(salted, cols) == _rows(plain, cols)


def test_salted_join_shuffles_not_broadcasts(spark):
    # The replicated dim must NOT be broadcast: a broadcast join makes
    # the salt spray a no-op (no shuffle on (key, salt) ever happens),
    # silently degrading to an R×-inflated broadcast build.
    left, right = _fixture(spark)
    plan = salted_join(left, right, ["k"])._jdf.queryExecution().toString()
    assert "BroadcastHashJoin" not in plan


def test_spread_bytes_cap_noop_on_small_scan(spark, tmp_path):
    # A scan far under bytes_per_split must come back untouched (no
    # repartition shuffle added for batch-amortized stages).
    p = str(tmp_path / "tiny.parquet")
    spark.range(100).write.parquet(p)
    df = spark.read.parquet(p)
    out = spread(df, bytes_per_split=8 << 20)
    assert out is df
    # the default (CPU-heavy) form still fans out to every core
    fanned = spread(df)
    assert fanned.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


# ---------------------------------------------------------------------------
# round-4b: quality gate, repetition stats, duplicate spans, funnel
# ---------------------------------------------------------------------------

from onechronos_etl_takehome_spark.operators import quality as ql
from onechronos_etl_takehome_spark.operators.dedup import duplicate_ngram_spans
from onechronos_etl_takehome_spark.operators.funnel import window_funnel


def test_gopher_rules_fire_individually(spark):
    long_ok = " ".join(["the", "a"] + ["word"] * 60)  # passes everything
    short = "the a word"  # fails ok_words only
    symbols = " ".join(["the", "a"] + ["word"] * 60 + ["#"] * 20)  # symbols
    no_stops = " ".join(["word"] * 60)  # fails ok_stopwords
    docs = spark.createDataFrame(
        [(1, long_ok), (2, short), (3, symbols), (4, no_stops)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ql.gopher_quality(docs, "doc_id", "text").collect()}
    assert out[1]["passes_gopher"]
    assert not out[2]["ok_words"] and out[2]["ok_stopwords"]
    assert not out[3]["ok_symbols"]
    assert not out[4]["ok_stopwords"] and out[4]["ok_words"]


def test_repetition_stats_hand_computed(spark):
    # "x y x y x y": 2-grams = [x y, y x, x y, y x, x y] → top "x y"
    # cnt=3 len=3 → 9 chars of 11; 3-grams = [x y x, y x y, x y x, y x y]
    # → both duplicated: (2*5)+(2*5) = 20 chars.
    docs = spark.createDataFrame([(1, "x y x y x y")], "doc_id long, text string")
    r = ql.repetition_stats(docs, "doc_id", "text").collect()[0]
    assert r["n_chars_text"] == 11
    assert r["top2gram_chars"] == 9
    assert r["dup3gram_chars"] == 20
    assert not r["ok_top2gram"] and not r["ok_dup3gram"]


def test_repetition_stats_no_repeats_and_short_doc(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "xy")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in
            ql.repetition_stats(docs, "doc_id", "text").collect()}
    assert rows[1]["top2gram_chars"] == 0 and rows[1]["dup3gram_chars"] == 0
    # doc 2 is shorter than every n: still present, all-zero metrics
    assert rows[2]["top2gram_chars"] == 0 and rows[2]["ok_top2gram"]


def test_duplicate_ngram_spans_islands(spark):
    # docs 1 and 2 share tokens 1-4 ("p q r s") and tokens 8-10 via a
    # second shared run; gap > n splits the coverage into two islands.
    d1 = "p q r s A B C t u v"
    d2 = "p q r s X Y Z t u v"
    docs = spark.createDataFrame([(1, d1), (2, d2)], "doc_id long, text string")
    out = duplicate_ngram_spans(docs, "doc_id", "text", n=3).collect()
    spans = sorted((r["doc_id"], r["span_start"], r["span_end"]) for r in out)
    # shared 3-grams: positions 1-2 ("p q r","q r s") and 8 ("t u v")
    # per doc → islands [1..4] and [8..10].
    assert spans == [(1, 1, 4), (1, 8, 10), (2, 1, 4), (2, 8, 10)]
    toks = {(r["doc_id"], r["span_start"]): r["span_tokens"] for r in out}
    assert toks[(1, 1)] == 4 and toks[(1, 8)] == 3


def test_duplicate_ngram_spans_merges_adjacent_windows(spark):
    # one long shared run → ONE span covering it, not per-gram rows
    shared = " ".join(f"w{i}" for i in range(12))
    docs = spark.createDataFrame(
        [(1, shared + " aa bb"), (2, shared + " cc dd")],
        "doc_id long, text string",
    )
    out = duplicate_ngram_spans(docs, "doc_id", "text", n=8).collect()
    spans = sorted((r["doc_id"], r["span_start"], r["span_end"]) for r in out)
    assert spans == [(1, 1, 12), (2, 1, 12)]


def test_window_funnel_semantics(spark):
    rows = [
        # u1: full funnel in order, within window
        (1, "2024-01-01 00:00:00", "view"),
        (1, "2024-01-01 01:00:00", "click"),
        (1, "2024-01-01 02:00:00", "purchase"),
        # u2: click BEFORE first view → depth 1
        (2, "2024-01-01 01:00:00", "click"),
        (2, "2024-01-01 02:00:00", "view"),
        # u3: purchase before click → depth 2 (order matters)
        (3, "2024-01-01 00:00:00", "view"),
        (3, "2024-01-01 00:30:00", "purchase"),
        (3, "2024-01-01 01:00:00", "click"),
        # u4: click outside the 24h window → depth 1
        (4, "2024-01-01 00:00:00", "view"),
        (4, "2024-01-02 00:00:01", "click"),
        # u5: no view at all → absent from output
        (5, "2024-01-01 00:00:00", "click"),
        # u6: click exactly AT first-view ts and at window edge ok
        (6, "2024-01-01 00:00:00", "view"),
        (6, "2024-01-01 00:00:00", "click"),
        (6, "2024-01-02 00:00:00", "purchase"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts_s string, event_type string")
    ev = ev.select("user_id", F.to_timestamp("ts_s").alias("ts"), "event_type")
    steps = [
        F.col("event_type") == "view",
        F.col("event_type") == "click",
        F.col("event_type") == "purchase",
    ]
    out = window_funnel(ev, "user_id", "ts", steps, "INTERVAL 24 HOURS")
    depth = {r["user_id"]: r["funnel_depth"] for r in out.collect()}
    assert depth == {1: 3, 2: 1, 3: 2, 4: 1, 6: 3}


def test_quality_aware_survivor_overrides_min_id(spark):
    # Two exact-duplicate clusters with DIFFERENT quality members: the
    # higher-id doc passes more Gopher rules and must win over min-id.
    good = " ".join(["the", "a"] + ["word"] * 60)  # passes all rules
    bad = "the a word"  # fails ok_words
    docs = spark.createDataFrame(
        [(1, bad), (2, good), (10, good), (11, bad)],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2), (10, 11)], "id_a long, id_b long")
    from onechronos_etl_takehome_spark.operators.dedup import dedup_components
    from onechronos_etl_takehome_spark.operators.quality import gopher_score
    from pyspark.sql.window import Window

    comps = dedup_components(docs, pairs, id_col="doc_id")
    scored = comps.join(gopher_score(docs, "doc_id", "text"), "doc_id")
    part = Window.partitionBy("canonical_id")
    ranked = scored.select(
        "canonical_id", "doc_id", "q_score",
        F.row_number().over(
            part.orderBy(F.desc("q_score"), F.asc("doc_id"))).alias("rn"),
    )
    winners = {r["canonical_id"]: r["doc_id"]
               for r in ranked.filter("rn = 1").collect()}
    # cluster {1,2}: doc 2 (good) beats min-id 1; cluster {10,11}:
    # doc 10 wins on quality AND happens to be min-id.
    assert winners == {1: 2, 10: 10}


def test_incremental_minhash_matches_full_corpus(spark, tmp_path):
    # Index a corpus, then probe an increment against the PERSISTED
    # index: corpus-pairs ∪ incremental-pairs must equal the pairs of
    # a from-scratch run over corpus ∪ increment (no cap).
    from onechronos_etl_takehome_spark.operators.dedup import (
        incremental_minhash_candidates,
        minhash_buckets,
        minhash_lsh_candidates,
    )
    from onechronos_etl_takehome_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    corpus = docs.filter("doc_id % 5 != 0")
    increment = docs.filter("doc_id % 5 = 0")
    kw = dict(n=3, num_hashes=16, bands=4, hash_family="xxhash64")

    idx_path = str(tmp_path / "minhash_index")
    minhash_buckets(corpus, "doc_id", "text", **kw).write.partitionBy(
        "band"
    ).parquet(idx_path)
    index = spark.read.parquet(idx_path)

    inc_pairs = {
        (r.id_a, r.id_b)
        for r in incremental_minhash_candidates(
            increment, index, "doc_id", "text", **kw
        ).collect()
    }
    old_pairs = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_candidates(corpus, "doc_id", "text", **kw).collect()
    }
    full_pairs = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_candidates(docs, "doc_id", "text", **kw).collect()
    }
    # every incremental pair touches a new doc; no old-old pair leaks in
    new_ids = {r.doc_id for r in increment.select("doc_id").collect()}
    assert all(a in new_ids or b in new_ids for a, b in inc_pairs)
    assert inc_pairs | old_pairs == full_pairs
    assert inc_pairs, "increment produced no candidates - vacuous test"


def test_blocked_cluster_pairs_match_unblocked(spark):
    # chunked (mega-cluster-safe) within-cluster pairing must produce
    # exactly the unchunked pair set, including across chunk boundaries
    # (chunk_size=4 forces many cross-chunk units on 200 vectors)
    from onechronos_etl_takehome_spark.operators.similarity import (
        embedding_neardup_clustered,
    )
    from onechronos_etl_takehome_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    kw = dict(
        id_col="vec_id", vec_col="embedding", threshold=0.3,
        n_clusters=4, n_iters=2, n_assign=2,
    )
    plain = {
        (r.id_a, r.id_b, round(r.score, 12))
        for r in embedding_neardup_clustered(emb, **kw).collect()
    }
    blocked = {
        (r.id_a, r.id_b, round(r.score, 12))
        for r in embedding_neardup_clustered(emb, chunk_size=4, **kw).collect()
    }
    assert blocked == plain and plain, "pair sets differ (or vacuous)"


def test_prefix_jaccard_matches_inverted_index(spark):
    # The prefix filter is LOSSLESS: result set must equal the full
    # inverted-index join exactly — pairs, ids, and scores.
    from onechronos_etl_takehome_spark.operators import dedup as dd
    from onechronos_etl_takehome_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    full = {
        (r.id_a, r.id_b, r.jaccard)
        for r in dd.ngram_jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=0.5
        ).collect()
    }
    pref = {
        (r.id_a, r.id_b, r.jaccard)
        for r in dd.prefix_jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=0.5
        ).collect()
    }
    assert pref == full and full, "pair sets differ (or vacuous)"


def test_prefix_candidates_shrink_and_cover(spark):
    # The point of the operator: candidate pairs must be a (much)
    # smaller superset of the true pair set. At sf0.001 the shrink is
    # ~10x; assert a conservative 2x so testdata regen can't flake it.
    from onechronos_etl_takehome_spark.operators import dedup as dd
    from onechronos_etl_takehome_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    sh = dd._exploded_shingles(docs, "doc_id", "text", 3)
    full_cands = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .count()
    )
    cands = dd.prefix_filter_candidates(docs, "doc_id", "text", n=3, threshold=0.5)
    n_cands = cands.count()
    assert n_cands * 2 <= full_cands, (n_cands, full_cands)
    true_pairs = {
        (r.id_a, r.id_b)
        for r in dd.ngram_jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=0.5
        ).collect()
    }
    cand_pairs = {(r.id_a, r.id_b) for r in cands.collect()}
    assert true_pairs <= cand_pairs


def test_prefix_jaccard_short_and_identical_docs(spark):
    # Degenerate shapes: single-shingle docs (prefix length 1 must
    # still index them), identical docs (J=1.0), and a sub-threshold
    # pair that a lossy filter might admit but the verify must drop.
    from onechronos_etl_takehome_spark.operators import dedup as dd

    docs = spark.createDataFrame(
        [
            (1, "tiny doc"),                      # < n words: 1 shingle
            (2, "tiny doc"),                      # identical twin
            (3, "alpha beta gamma delta epsilon"),
            (4, "alpha beta gamma delta zeta"),   # J = 2/4 = 0.5
            (5, "unrelated words entirely here now"),
        ],
        "doc_id int, text string",
    )
    got = {
        (r.id_a, r.id_b, round(r.jaccard, 9))
        for r in dd.prefix_jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=0.5
        ).collect()
    }
    assert got == {(1, 2, 1.0), (3, 4, 0.5)}


def test_unigram_lm_hand_computed(spark):
    # corpus: "a a b" (doc 1), "b c" (doc 2). T=5; c(a)=2, c(b)=2, c(c)=1.
    # doc1: n=3, sum_tf = 2+2+2 = 6, mean = 6/(3*5) = 0.4
    # doc2: n=2, sum_tf = 2+1 = 3, mean = 3/(2*5) = 0.3
    from onechronos_etl_takehome_spark.operators.text import unigram_lm_scores

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id int, text string"
    )
    got = {
        r.doc_id: (r.n_tokens, r.sum_tf, r.mean_token_prob)
        for r in unigram_lm_scores(docs, "doc_id", "text").collect()
    }
    assert got == {1: (3, 6, 0.4), 2: (2, 3, 0.3)}


def test_unigram_lm_log_probs(spark):
    # avg_logprob = mean ln P(w); doc1: (2*ln(2/5)+ln(2/5))/3 = ln(0.4),
    # doc2: (ln(0.4)+ln(0.2))/2. perplexity = exp(-avg_logprob).
    import math

    from onechronos_etl_takehome_spark.operators.text import unigram_lm_scores

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id int, text string"
    )
    got = {
        r.doc_id: (r.avg_logprob, r.perplexity)
        for r in unigram_lm_scores(
            docs, "doc_id", "text", log_probs=True
        ).collect()
    }
    assert got[1][0] == pytest.approx(math.log(0.4), abs=1e-9)
    assert got[2][0] == pytest.approx(
        (math.log(0.4) + math.log(0.2)) / 2, abs=1e-9
    )
    assert got[1][1] == pytest.approx(2.5, abs=1e-6)
    # repartitioning must not change the decimal-summed logprob at all
    again = {
        r.doc_id: (r.avg_logprob, r.perplexity)
        for r in unigram_lm_scores(
            docs.repartition(7), "doc_id", "text", log_probs=True
        ).collect()
    }
    assert again == got


def test_prefix_candidates_bounded_under_boilerplate(spark):
    """The asymptotic case for prefix filtering: shared boilerplate
    makes the full inverted index quadratic (every doc pair sharing a
    boilerplate shingle materializes df² fan-out rows), while
    high-df shingles never enter rare-first prefixes — candidate count
    must stay far below the quadratic pair count. Measured at sf0.01
    with a 24-token block appended to EVERY doc: full-index fan-out
    54k → 5.6M rows (103×), prefix candidates 27 → 307."""
    from onechronos_etl_takehome_spark.operators import dedup as dd
    from onechronos_etl_takehome_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    boiler_text = " ".join(f"bp{i}" for i in range(24))
    boiler = docs.withColumn(
        "text", F.concat_ws(" ", F.col("text"), F.lit(boiler_text))
    )
    n_docs = docs.count()
    quad_pairs = n_docs * (n_docs - 1) // 2  # every pair shares boilerplate

    def fanout(d):
        sh = dd._exploded_shingles(d, "doc_id", "text", 3)
        return (
            sh.groupBy("shingle")
            .count()
            .agg(F.sum(F.col("count") * F.col("count")))
            .collect()[0][0]
        )

    base_fan, boil_fan = fanout(docs), fanout(boiler)
    assert boil_fan > 50 * base_fan  # the inverted index went quadratic
    boil_cands = dd.prefix_filter_candidates(
        boiler, "doc_id", "text", n=3, threshold=0.5
    ).count()
    assert boil_cands * 100 <= quad_pairs, (boil_cands, quad_pairs)
    # and the filtered pipeline is still exact on the boilerplate corpus
    full = {
        (r.id_a, r.id_b, r.jaccard)
        for r in dd.ngram_jaccard_pairs(
            boiler, "doc_id", "text", n=3, threshold=0.5
        ).collect()
    }
    pref = {
        (r.id_a, r.id_b, r.jaccard)
        for r in dd.prefix_jaccard_pairs(
            boiler, "doc_id", "text", n=3, threshold=0.5
        ).collect()
    }
    assert pref == full


def test_resample_ffill_semantics(spark):
    # u1: events on day 1 and day 4 → gap days 2-3 carry day-1's value,
    # n_events 0; day-4 row uses the LATEST (ts, event_id) value.
    # u2: single event → single row, its own value.
    # u3: first day has NULL value → ffill stays NULL until day 2.
    rows = [
        (100, "2024-01-01 10:00:00", 1, "view", 1.5),
        (101, "2024-01-04 09:00:00", 1, "view", 2.5),
        (102, "2024-01-04 09:00:00", 1, "view", 3.5),  # same ts, higher id wins
        (103, "2024-02-01 00:00:00", 2, "click", 9.0),
        (104, "2024-03-01 00:00:00", 3, "view", None),
        (105, "2024-03-02 00:00:00", 3, "view", 7.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, event_type string, value double"
    )
    import tempfile

    path = tempfile.mkdtemp(prefix="x10_")
    ev.select(
        "event_id", F.to_timestamp("ts_s").alias("ts"), "user_id",
        "event_type", "value", F.lit(None).cast("string").alias("props"),
    ).write.mode("overwrite").parquet(path + "/events.parquet")
    from onechronos_etl_takehome_spark.plans import QUERIES

    got = {
        (r.user_id, r.day): (r.n_events, r.ffill_value)
        for r in QUERIES["x10_resample_ffill"](spark, path).collect()
    }
    assert got == {
        (1, "2024-01-01"): (1, 1.5),
        (1, "2024-01-02"): (0, 1.5),
        (1, "2024-01-03"): (0, 1.5),
        (1, "2024-01-04"): (2, 3.5),
        (2, "2024-02-01"): (1, 9.0),
        (3, "2024-03-01"): (1, None),
        (3, "2024-03-02"): (1, 7.0),
    }


def test_burst_throttle_semantics(spark):
    # u1/view: events at 0, 4m, 8m chain into ONE burst (gap-to-previous
    # semantics) even though the third is 8m after the first; an event
    # at 20m starts a new burst. u1/click: independent partition.
    # Exactly-5-minute gap does NOT break a burst (strictly greater).
    import tempfile

    rows = [
        (1, "2024-01-01 00:00:00", 1, "view"),
        (2, "2024-01-01 00:04:00", 1, "view"),
        (3, "2024-01-01 00:08:00", 1, "view"),
        (4, "2024-01-01 00:20:00", 1, "view"),
        (5, "2024-01-01 00:25:00", 1, "view"),  # exactly 5m -> same burst
        (6, "2024-01-01 00:00:00", 1, "click"),
    ]
    ev = spark.createDataFrame(rows, "event_id long, ts_s string, user_id long, event_type string")
    path = tempfile.mkdtemp(prefix="x11_")
    ev.select(
        "event_id", F.to_timestamp("ts_s").alias("ts"), "user_id", "event_type",
        F.lit(1.0).alias("value"), F.lit(None).cast("string").alias("props"),
    ).write.mode("overwrite").parquet(path + "/events.parquet")
    from onechronos_etl_takehome_spark.plans import QUERIES

    got = {
        (r.user_id, r.event_type, r.first_event_id): r.burst_size
        for r in QUERIES["x11_burst_throttle_dedup"](spark, path).collect()
    }
    assert got == {(1, "view", 1): 3, (1, "view", 4): 2, (1, "click", 6): 1}


def test_binary_chunk_neardup_append_shape(spark):
    # b = a + appended tail (block-aligned): containment 1.0 (every
    # block of a appears in b); c shares nothing. Payloads built from
    # 64-byte-aligned segments so fixed-offset blocks line up exactly.
    from onechronos_etl_takehome_spark.operators.multimodal import (
        binary_chunk_neardup,
    )

    seg = "x" * 64
    rows = [
        (1, seg * 4),             # 4 blocks... all identical 'x'*64
        (2, seg * 4 + "y" * 64),  # a + one new block
        (3, "z" * 200),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    from onechronos_etl_takehome_spark.operators.multimodal import attach_binary

    out = {
        (r.id_a, r.id_b): (r.shared_chunks, r.containment)
        for r in binary_chunk_neardup(
            attach_binary(docs, "doc_id", "text"), chunk_bytes=64
        ).collect()
    }
    # distinct-block sets: doc1 {x64} (1 block), doc2 {x64, y64} (2),
    # doc3 {z-blocks} — doc1 vs doc2 share the x-block: containment 1.0
    assert out == {(1, 2): (1, 1.0)}


def test_pagerank_states_mass_and_determinism(spark):
    # integer PageRank: ranks positive, total mass <= scale (floor
    # losses + dangling drop only ever REMOVE mass), and a repeat run
    # is bitwise identical (pure integer arithmetic).
    from onechronos_etl_takehome_spark.plans import QUERIES

    sf = "/root/testdata/sf0.001"
    rows = {r.node: r.rank_scaled for r in
            QUERIES["x14_pagerank_states"](spark, sf).collect()}
    assert len(rows) == 5 and all(v > 0 for v in rows.values())
    assert sum(rows.values()) <= 10**9
    again = {r.node: r.rank_scaled for r in
             QUERIES["x14_pagerank_states"](spark, sf).collect()}
    assert again == rows


def test_spread_bytes_cap_fans_out_in_memory_frames(spark):
    # inputFiles() == [] (in-memory relation) must fall back to core
    # count, not compute a 0-byte -> 1-split target that silently
    # disables the fan-out.
    df = spark.createDataFrame([(i,) for i in range(100)], "id long").coalesce(1)
    out = spread(df, bytes_per_split=8 << 20)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


def test_snapshot_diff_classification(spark):
    from onechronos_etl_takehome_spark.operators.diff import snapshot_diff

    old = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, None), (3, 30, "c"), (4, None, "d")],
        "k int, v int, s string",
    )
    new = spark.createDataFrame(
        [(1, 10, "a"),        # unchanged
         (2, 21, None),       # update (v changed; NULL==NULL not a change)
         (4, None, "dd"),     # update (NULL v unchanged, s changed)
         (5, 50, "e")],       # insert; k=3 deleted
        "k int, v int, s string",
    )
    got = {
        r.k: r.change_type
        for r in snapshot_diff(old, new, ["k"]).collect()
    }
    assert got == {1: "unchanged", 2: "update", 3: "delete", 4: "update", 5: "insert"}
    # filtered form drops the unchanged row only
    only = {r.k for r in
            snapshot_diff(old, new, ["k"], include_unchanged=False).collect()}
    assert only == {2, 3, 4, 5}


def test_binary_chunk_cap_sheds_uniform_blocks(spark):
    # zero-fill blocks shared by EVERY payload must leave the index
    # under the cap (pairs sharing only padding vanish), while a pair
    # sharing genuinely rare blocks survives with exact sizes.
    from onechronos_etl_takehome_spark.operators.multimodal import (
        attach_binary,
        binary_chunk_neardup,
    )

    pad = "0" * 64  # shared "padding" block in every payload
    rare = "R" * 64
    docs = spark.createDataFrame(
        [(i, pad + f"u{i}" * 32) for i in range(1, 7)]
        + [(10, pad + rare * 3), (11, pad + rare * 3)],
        "doc_id long, text string",
    )
    payloads = attach_binary(docs, "doc_id", "text")
    capped = {
        (r.id_a, r.id_b): r.containment
        for r in binary_chunk_neardup(
            payloads, chunk_bytes=64, max_block_df=4
        ).collect()
    }
    # only the rare-block pair survives; its containment still counts
    # ONLY in-index shared blocks but sizes are exact
    assert set(capped) == {(10, 11)}
    uncapped = {
        (r.id_a, r.id_b)
        for r in binary_chunk_neardup(payloads, chunk_bytes=64).collect()
    }
    assert (10, 11) in uncapped and len(uncapped) > 1
