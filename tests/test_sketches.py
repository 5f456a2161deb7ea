"""Accuracy bounds for approximate operators (sketches, ANN recall).

Approximate results can't hash-match an oracle; instead we bound their
error against the exact operator on the same data — the contract a
user of the approximate path actually cares about."""

from __future__ import annotations

from onechronos_etl_takehome_spark.plans.catalog import QUERIES

SF = "/root/testdata/sf0.01"


def test_approx_count_distinct_error_bound(spark):
    rows = QUERIES["x01_approx_sketches"](spark, SF).collect()
    assert rows
    for r in rows:
        rel_err = abs(r.approx_users - r.exact_users) / max(r.exact_users, 1)
        assert rel_err < 0.05, (r.event_type, r.approx_users, r.exact_users)


def test_approx_percentile_error_bound(spark):
    rows = QUERIES["x02_approx_percentiles"](spark, SF).collect()
    assert rows
    for r in rows:
        # the p50 sketch estimate must sit within 1% of the exact p50
        assert abs(r.approx_pcts[0] - r.exact_p50) / r.exact_p50 < 0.01


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.corpus_id)
    return out


def test_numpy_topk_equals_bruteforce(spark):
    exact = {
        (r.query_id, r.corpus_id): r.score
        for r in QUERIES["s01_cosine_topk"](spark, SF).collect()
    }
    fast = {
        (r.query_id, r.corpus_id): r.score
        for r in QUERIES["s04_cosine_topk_numpy"](spark, SF).collect()
    }
    assert exact.keys() == fast.keys()
    for key, s in exact.items():
        assert abs(fast[key] - s) < 1e-9  # BLAS vs sequential fold ulps


def test_ann_recall_vs_bruteforce(spark):
    exact = _topk_sets(QUERIES["s01_cosine_topk"](spark, SF))
    # Floors reflect the testdata: embeddings are near-uniform random
    # (measured intra-label cosine ≈ inter-label ≈ 0), the worst case
    # for any ANN. Honest 2-of-8-probe IVF recall here is ~0.45 — the
    # earlier 0.8 with untrained first-8-row centroids was an artifact
    # (queries 0-7 WERE the centroids, so their neighbors followed them
    # into their own probed cluster). Training is deterministic, so the
    # measured recall is exactly reproducible.
    for name, floor in [("s02_cosine_topk_lsh", 0.1), ("s03_cosine_topk_ivf", 0.4)]:
        approx = _topk_sets(QUERIES[name](spark, SF))
        hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
        total = sum(len(v) for v in exact.values())
        recall = hits / total
        print(f"{name} recall@5 = {recall:.3f}")
        assert recall >= floor, (name, recall)
        # structural invariants
        df = QUERIES[name](spark, SF)
        for r in df.collect():
            assert 1 <= r.rank <= 5 and r.query_id != r.corpus_id

def test_trained_ivf_recall_on_clustered_data(spark):
    """Where the corpus HAS cluster structure (the case IVF exists
    for), trained k-means centroids must reach >=0.9 recall@5 with
    2 probes — and beat untrained first-k-row centroids, which all
    come from one natural cluster when data arrives cluster-ordered."""
    import numpy as np
    from pyspark.sql import functions as F

    from onechronos_etl_takehome_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_ivf,
        train_ivf_centroids,
    )

    rng = np.random.RandomState(7)
    centers = rng.standard_normal((10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for c in range(10):
        for i in range(50):
            v = centers[c] + 0.15 * rng.standard_normal(64)
            rows.append((c * 50 + i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    corpus = df.select(
        F.col("vec_id").alias("corpus_id"), F.col("embedding").alias("corpus_vec")
    )
    queries = df.filter(F.col("vec_id") % 50 == 17).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )

    exact = _topk_sets(cosine_topk_bruteforce(queries, corpus, k=5))
    total = sum(len(v) for v in exact.values())

    def recall(centroids):
        approx = _topk_sets(
            cosine_topk_ivf(queries, corpus, k=5, n_probe=2, centroids=centroids)
        )
        return sum(len(exact[q] & approx.get(q, set())) for q in exact) / total

    trained = train_ivf_centroids(corpus, n_clusters=10, n_iters=5)
    untrained = corpus.orderBy("corpus_id").limit(10).select(
        F.col("corpus_id").alias("_cent_id"),
        F.col("corpus_vec").alias("_cent_vec"),
    )
    r_trained, r_untrained = recall(trained), recall(untrained)
    print(f"ivf clustered recall@5: trained={r_trained:.3f} untrained={r_untrained:.3f}")
    assert r_trained >= 0.9, r_trained
    assert r_trained > r_untrained, (r_trained, r_untrained)


def test_pq_recall_and_determinism(spark):
    """PQ shortlist recall on the near-uniform testdata (ANN worst
    case) measured 0.70 — floor at 0.5 so testdata regen can't flake
    it. Rerank scores are exact cosines, so every returned (q, c)
    score must equal the bruteforce score bitwise. Repartitioning must
    not change the result (lexsort tie-breaks in the batch shortlist).
    """
    from pyspark.sql import functions as F

    from onechronos_etl_takehome_spark.operators.similarity import cosine_topk_pq
    from onechronos_etl_takehome_spark.sources.tables import load_table

    exact_df = QUERIES["s01_cosine_topk"](spark, SF)
    exact_scores = {
        (r.query_id, r.corpus_id): r.score for r in exact_df.collect()
    }
    exact = _topk_sets(exact_df)
    pq_df = QUERIES["s05_cosine_topk_pq"](spark, SF)
    pq_rows = pq_df.collect()
    approx = {}
    for r in pq_rows:
        approx.setdefault(r.query_id, set()).add(r.corpus_id)
        assert 1 <= r.rank <= 5 and r.query_id != r.corpus_id
        if (r.query_id, r.corpus_id) in exact_scores:
            assert r.score == exact_scores[(r.query_id, r.corpus_id)]
    total = sum(len(v) for v in exact.values())
    recall = sum(len(exact[q] & approx.get(q, set())) for q in exact) / total
    print(f"s05_cosine_topk_pq recall@5 = {recall:.3f}")
    assert recall >= 0.5, recall

    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    corpus = emb.repartition(13).select(
        F.col("vec_id").alias("corpus_id"), F.col("embedding").alias("corpus_vec")
    )
    again = {
        (r.query_id, r.corpus_id, r.score, r.rank)
        for r in cosine_topk_pq(queries, corpus, k=5, rerank=50).collect()
    }
    assert again == {
        (r.query_id, r.corpus_id, r.score, r.rank) for r in pq_rows
    }
