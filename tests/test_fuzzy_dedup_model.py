"""Model tests for fuzzy dedup: the Spark operators vs a pure-Python
reference implementation on randomized corpora."""

from __future__ import annotations

import random

from onechronos_etl_takehome_spark.operators.dedup import (
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)


def _py_shingles(text: str, n: int = 3) -> set[str]:
    w = text.split(" ")
    if len(w) < n:
        return {" ".join(w)}
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


def _py_jaccard_pairs(docs: dict[int, str], threshold: float) -> dict:
    out = {}
    ids = sorted(docs)
    sh = {i: _py_shingles(docs[i]) for i in ids}
    for i in ids:
        for j in ids:
            if i < j:
                inter = len(sh[i] & sh[j])
                if inter:
                    jac = inter / (len(sh[i]) + len(sh[j]) - inter)
                    if jac >= threshold:
                        out[(i, j)] = jac
    return out


def _random_corpus(n_docs=40, seed=3):
    rng = random.Random(seed)
    vocab = [f"w{k}" for k in range(12)]  # tiny vocab → real collisions
    docs = {}
    for i in range(n_docs):
        length = rng.randint(1, 30)
        docs[i] = " ".join(rng.choice(vocab) for _ in range(length))
    # plant near-duplicates: copy with one word changed
    for i in range(5):
        src = docs[i]
        w = src.split(" ")
        if len(w) > 3:
            w[len(w) // 2] = "mutated"
        docs[n_docs + i] = " ".join(w)
    return docs


def test_jaccard_pairs_match_python_model(spark):
    docs = _random_corpus()
    df = spark.createDataFrame(list(docs.items()), ["id", "text"])
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(df, "id", "text", threshold=0.3).collect()
    }
    expected = _py_jaccard_pairs(docs, 0.3)
    assert got.keys() == expected.keys()
    for k in expected:
        assert abs(got[k] - expected[k]) < 1e-12, (k, got[k], expected[k])


def test_minhash_pairs_subset_of_exact_with_recall(spark):
    """Both production forms of minhash_dedup_pairs — the cross-engine
    md5 family (d03's oracled registration) and the capped xxhash64
    form (d03_capped) — must return verified-exact-Jaccard pairs only
    (subset of the exact operator) and keep recall on the planted
    near-duplicates."""
    docs = _random_corpus()
    df = spark.createDataFrame(list(docs.items()), ["id", "text"])
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(df, "id", "text", threshold=0.5).collect()
    }
    assert exact, "corpus must produce exact pairs for the test to bite"
    for kwargs in ({"hash_family": "md5"}, {"max_bucket_size": 50}):
        got = {
            (r.id_a, r.id_b): r.jaccard
            for r in minhash_dedup_pairs(
                df, "id", "text", threshold=0.5, **kwargs
            ).collect()
        }
        assert set(got) <= set(exact), kwargs
        for k, jac in got.items():
            assert abs(jac - exact[k]) < 1e-12, (kwargs, k)
        recall = len(got) / len(exact)
        assert recall >= 0.6, (kwargs, recall, set(exact) - set(got))


def test_simhash_identical_docs_collide(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta theta"),
            (3, "completely different words nothing shared here at all"),
        ],
        ["id", "text"],
    )
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_near_pairs(df, "id", "text", max_hamming=3).collect()
    }
    assert pairs.get((1, 2)) == 0  # identical → distance 0
    assert (1, 3) not in pairs and (2, 3) not in pairs
