"""Frequency-cap scale guards for fuzzy dedup.

Pathological corpora — shared boilerplate shingles, mass-duplicate
clusters — make inverted-index / LSH candidate generation quadratic.
The caps must shed that fan-out while keeping genuine near-dup pairs
whose similarity rests on non-boilerplate content.
"""

from __future__ import annotations

import pytest

from onechronos_etl_takehome_spark.operators.dedup import (
    minhash_dedup_pairs,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
)

BOILER = "all rights reserved by the company"
NEAR_A = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
NEAR_B = "alpha beta gamma delta epsilon zeta eta theta iota lam"


@pytest.fixture(scope="module")
def boiler_corpus(spark):
    """30 unrelated docs sharing a boilerplate suffix + 1 genuine
    near-dup pair (ids 100/101, Jaccard 7/9)."""
    rows = []
    for i in range(30):
        unique = " ".join(f"w{i}x{j}" for j in range(10))
        rows.append((i, f"{unique} {BOILER}"))
    rows += [(100, NEAR_A), (101, NEAR_B)]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_posting_list_cap_keeps_candidates_linear(spark, boiler_corpus):
    # threshold=0 exposes the raw candidate space the index materializes
    uncapped = ngram_jaccard_pairs(
        boiler_corpus, "doc_id", "text", threshold=0.0
    ).count()
    # every boilerplate-sharing pair appears: C(30,2) + the near-dup pair
    assert uncapped == 30 * 29 // 2 + 1

    capped = ngram_jaccard_pairs(
        boiler_corpus, "doc_id", "text", threshold=0.0, max_shingle_df=10
    ).collect()
    # boilerplate shingles (df=30) are out of the index: candidate space
    # collapses from quadratic to just the genuine pair
    assert [(r.id_a, r.id_b) for r in capped] == [(100, 101)]


def test_posting_list_cap_preserves_exact_jaccard(spark, boiler_corpus):
    # set sizes stay uncapped, and the pair's shared shingles are rare,
    # so its Jaccard is still exact: 7 shared / (8 + 8 - 7)
    [row] = (
        ngram_jaccard_pairs(
            boiler_corpus, "doc_id", "text", threshold=0.5, max_shingle_df=10
        )
        .filter("id_a = 100")
        .collect()
    )
    assert row.jaccard == pytest.approx(7 / 9)


def test_lsh_hot_bucket_cap(spark):
    """A 60-doc identical cluster must not produce C(60,2) candidates
    when capped; the distinct-content near-dup pair must survive."""
    rows = [(i, "spam spam ham eggs spam ham eggs spam") for i in range(60)]
    rows += [(200, NEAR_A), (201, NEAR_B)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    uncapped = minhash_lsh_candidates(df, "doc_id", "text").count()
    assert uncapped >= 60 * 59 // 2  # quadratic without the cap

    capped = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_candidates(
            df, "doc_id", "text", max_bucket_size=10
        ).collect()
    }
    assert (200, 201) in capped
    # the identical cluster's buckets (size 60) were all shed —
    # exact-dup clusters are dedup_exact's job, not LSH's
    assert all(a >= 200 for a, _ in capped)


def test_capped_minhash_dedup_pairs_end_to_end(spark):
    rows = [(i, "spam spam ham eggs spam ham eggs spam") for i in range(60)]
    rows += [(200, NEAR_A), (201, NEAR_B)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = minhash_dedup_pairs(
        df, "doc_id", "text", threshold=0.5, max_bucket_size=10
    ).collect()
    assert [(r.id_a, r.id_b) for r in out] == [(200, 201)]
    assert out[0].jaccard == pytest.approx(7 / 9)
