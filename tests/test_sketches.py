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
    # Floors reflect the testdata: embeddings are near-uniform random,
    # the worst case for sign-LSH (weak angular structure); IVF with
    # 2-probe holds 0.8 here. Planted near-dup pairs (cosine>=0.95)
    # collide with prob ~1 in either variant.
    for name, floor in [("s02_cosine_topk_lsh", 0.1), ("s03_cosine_topk_ivf", 0.5)]:
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