"""Semantics tests for the round-2 LLM-pipeline operators.

Oracle parity (hash vs DuckDB) is covered by test_oracle_parity for
all five queries; these tests pin the *algorithmic guarantees* the
oracles can't express: the Misra-Gries superset property, chunk
reconstruction, contamination definition, and quota-sample balance.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from onechronos_etl_takehome_spark.operators.dedup import contamination_stats
from onechronos_etl_takehome_spark.operators.sketches import (
    heavy_hitters,
    misra_gries_candidates,
)
from onechronos_etl_takehome_spark.plans.catalog import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))


def test_misra_gries_candidates_superset(spark):
    """Every value above n/(k+1) must survive the sketch — the MG
    guarantee the exact recount relies on. Checked under a hostile
    partitioning (many small batches)."""
    words = (
        _docs(spark)
        .select(F.explode(F.split("text", " ")).alias("word"))
        .repartition(16)
    )
    k = 32
    total = words.count()
    exact = words.groupBy("word").count()
    must_keep = {
        r["word"] for r in exact.filter(F.col("count") * (k + 1) > total).collect()
    }
    kept = {
        r["word"]
        for r in misra_gries_candidates(words, "word", k_counters=k).collect()
    }
    assert must_keep <= kept


def test_heavy_hitters_exact_vs_groupby(spark):
    """The sketch only prunes: output == plain exact groupBy+filter."""
    words = _docs(spark).select(F.explode(F.split("text", " ")).alias("word"))
    total = words.count()
    exact = {
        (r["word"], r["n"])
        for r in words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") * 30 > total)
        .collect()
    }
    sketched = {
        (r["word"], r["n_occurrences"])
        for r in heavy_hitters(words, "word", threshold_denom=30).collect()
    }
    assert sketched == exact and exact


def test_chunks_reconstruct_documents(spark):
    """Concatenating a doc's chunks in order yields the original text."""
    chunks = QUERIES["t09_chunk_documents"](spark, SF_DIR)
    rebuilt = (
        chunks.groupBy("doc_id")
        .agg(
            F.concat_ws(
                "", F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk")))
                .getField("chunk")
            ).alias("rebuilt")
        )
    )
    docs = _docs(spark).select("doc_id", "text")
    mismatches = (
        rebuilt.join(docs, "doc_id")
        .filter(F.col("rebuilt") != F.col("text"))
        .count()
    )
    assert mismatches == 0
    # Every chunk but a doc's last is exactly full-width.
    not_last = chunks.withColumn(
        "max_idx", F.max("chunk_idx").over(Window.partitionBy("doc_id"))
    ).filter(F.col("chunk_idx") < F.col("max_idx"))
    assert not_last.filter(F.col("chunk_len") != 120).count() == 0


def test_contamination_bounds_and_definition(spark):
    """Contamination is hits/size in (0, 1]; a doc that IS a benchmark
    doc's duplicate must be flagged with contamination 1.0."""
    docs = _docs(spark).select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") < 5)
    # Corpus contains an exact copy of benchmark doc 0 under a new id.
    copy = bench.filter(F.col("doc_id") == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    corpus = docs.filter(F.col("doc_id") >= 5).unionByName(copy)
    stats = contamination_stats(corpus, bench, "doc_id", "text", n=3)
    rows = {r["doc_id"]: r for r in stats.collect()}
    flagged_copy = rows[100000]
    assert flagged_copy["contamination"] == 1.0
    for r in rows.values():
        assert 0.0 < r["contamination"] <= 1.0
        assert r["n_contaminated"] <= r["n_shingles"]


def test_quota_sample_balance(spark):
    per_lang = (
        QUERIES["t11_quota_sample"](spark, SF_DIR)
        .groupBy("lang")
        .count()
        .collect()
    )
    assert per_lang
    for r in per_lang:
        assert r["count"] <= 40
    # Deterministic: two runs pick the identical sample.
    a = {tuple(r) for r in QUERIES["t11_quota_sample"](spark, SF_DIR).collect()}
    b = {tuple(r) for r in QUERIES["t11_quota_sample"](spark, SF_DIR).collect()}
    assert a == b


def test_clustered_neardup_recall_on_planted_dups(spark):
    """The testdata embeddings are near-uniform (no pairs at 0.95 —
    d06 returns empty), so plant perturbed copies and require d10's
    cluster bucketing to recover them: a planted copy is nearly
    collinear with its source, so both must land in the same k-means
    cell except at exact cell boundaries."""
    from onechronos_etl_takehome_spark.operators.similarity import (
        cosine,
        embedding_neardup_clustered,
    )

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    base = emb.filter(F.col("vec_id") < 50).select("vec_id", "embedding")
    # Deterministic tiny perturbation: cosine(src, copy) ~ 0.9999.
    perturbed = base.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x * (1.0 + 0.0005 * ((i % 7) - 3.0)),
        ).alias("embedding"),
    )
    corpus = emb.select("vec_id", "embedding").unionByName(perturbed)

    found_rows = embedding_neardup_clustered(
        corpus, id_col="vec_id", vec_col="embedding", threshold=0.95
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in found_rows}
    planted = {(i, i + 100000) for i in range(50)}

    # Exact truth over the augmented corpus (all-pairs, small here).
    a = corpus.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = corpus.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    exact = {
        (r["id_a"], r["id_b"])
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("s"))
        .filter(F.col("s") >= 0.95)
        .collect()
    }
    assert planted <= exact  # the perturbation really is a near-dup
    assert found <= exact  # no false positives
    recall = len(found & planted) / len(planted)
    assert recall >= 0.9, f"planted-pair recall {recall}"


def test_groupfit_matches_closed_form(spark):
    """The grouped-map applyInPandas fit and the integer-exact closed
    form (x04) must agree to float tolerance per group."""
    from onechronos_etl_takehome_spark.operators.groupfit import (
        fit_linear_per_group,
    )

    docs = _docs(spark)
    toks = F.split("text", " ")
    pts = docs.select(
        "lang",
        F.size(toks).cast("long").alias("x"),
        F.size(F.array_distinct(toks)).cast("long").alias("y"),
    )
    fitted = {
        r["lang"]: (r["intercept"], r["slope"], r["n"])
        for r in fit_linear_per_group(pts, "lang", "x", "y").collect()
    }
    exact = {
        r["lang"]: (r["intercept"], r["slope"], r["n"])
        for r in QUERIES["x04_group_regression"](spark, SF_DIR).collect()
    }
    assert fitted.keys() == exact.keys() and fitted
    for lang, (fi, fs, fn) in fitted.items():
        ei, es, en = exact[lang]
        assert fn == en
        assert abs(fi - ei) < 1e-9 and abs(fs - es) < 1e-9, lang


def test_pii_redaction_removes_all_matches(spark):
    from onechronos_etl_takehome_spark.operators.text import PII_PATTERNS

    red = QUERIES["t10_pii_redaction"](spark, SF_DIR)
    leftovers = red
    for pattern, _ in PII_PATTERNS.values():
        leftovers = leftovers.filter(F.col("redacted").rlike(pattern))
    assert leftovers.count() == 0
    counted = red.filter(
        (F.col("n_email") == 1) & (F.col("n_phone") == 1) & (F.col("n_ssn") == 1)
    )
    assert counted.count() == red.count()
