"""Round-4b additions: FastSS edit-distance join, BM25 retrieval, and
the distributed prefix sum / systematic PPS sampler.

The FastSS contract is exact result equality with the brute-force
all-pairs levenshtein filter — the deletion-neighborhood blocking must
be lossless for k=1 across substitutions, insertions, deletions, and
equal strings. Pinned against a pure-python DP model over seeded
random edits.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from onechronos_etl_takehome_spark.operators.sampling import (
    prefix_sum,
    systematic_pps_sample,
)
from onechronos_etl_takehome_spark.operators.strings import (
    deletion_neighborhood,
    edit_distance_join,
)
from onechronos_etl_takehome_spark.operators.text import bm25_topk


from .conftest import py_levenshtein as _lev


def _mutate(rng: random.Random, s: str) -> str:
    op = rng.choice(["sub", "ins", "del", "none"])
    i = rng.randrange(len(s))
    c = rng.choice("abcxyz019")
    if op == "sub":
        return s[:i] + c + s[i + 1 :]
    if op == "ins":
        return s[:i] + c + s[i:]
    if op == "del" and len(s) > 1:
        return s[:i] + s[i + 1 :]
    return s


def test_fastss_matches_bruteforce_over_random_edits(spark):
    rng = random.Random(41)
    base = ["".join(rng.choices("abcdef012345", k=rng.randint(4, 12)))
            for _ in range(20)]
    strings = base + [_mutate(rng, s) for s in base for _ in range(2)]
    rows = [(i, s) for i, s in enumerate(strings)]
    df = spark.createDataFrame(rows, "id long, s string")
    got = sorted(
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_join(df, "id", "s").collect()
    )
    want = sorted(
        (i, j, _lev(a, b))
        for i, a in rows
        for j, b in rows
        if i < j and _lev(a, b) <= 1
    )
    assert got == want and len(want) >= 20


def test_fastss_neighborhood_contains_self_and_deletions(spark):
    row = spark.range(1).select(
        deletion_neighborhood(F.lit("abc")).alias("n")
    ).collect()[0]
    assert sorted(row.n) == ["ab", "abc", "ac", "bc"]


def test_fastss_sig_cap_is_subset(spark):
    # A shared hot prefix makes one signature bucket huge; the cap
    # sheds it, and the capped output must be a subset of the lossless
    # result (recall traded, never precision).
    rows = [(i, f"XX{i:03d}") for i in range(50)]
    df = spark.createDataFrame(rows, "id long, s string")
    full = {(r.id_a, r.id_b) for r in
            edit_distance_join(df, "id", "s").collect()}
    capped = {(r.id_a, r.id_b) for r in
              edit_distance_join(df, "id", "s", max_sig_df=5).collect()}
    assert capped <= full and len(full) > 0


def test_prefix_sum_matches_python_cumsum(spark):
    rng = random.Random(7)
    rows = [(k, rng.randint(0, 500)) for k in rng.sample(range(10_000), 300)]
    df = spark.createDataFrame(rows, "k long, v long")
    for nb in (1, 4, 32):
        got = {
            r.k: r.cum
            for r in prefix_sum(df, "k", "v", n_buckets=nb).collect()
        }
        acc, want = 0, {}
        for k, v in sorted(rows):
            acc += v
            want[k] = acc
        assert got == want, f"n_buckets={nb}"


def test_systematic_sample_draws_exactly_n(spark):
    rng = random.Random(11)
    rows = [(k, rng.randint(1, 1000)) for k in range(400)]
    # one whale weight → multiplicity > 1 for that row
    rows[100] = (100, 200_000)
    df = spark.createDataFrame(rows, "k long, w long")
    out = systematic_pps_sample(df, "k", "w", 50).collect()
    assert sum(r.multiplicity for r in out) == 50
    whale = [r for r in out if r.k == 100]
    assert whale and whale[0].multiplicity > 1


def test_bm25_hand_computed(spark):
    docs = [
        (1, "cat dog cat"),
        (2, "dog dog dog fish"),
        (3, "fish fish bird"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r.score
           for r in bm25_topk(df, "doc_id", "text", ["cat", "dog"]).collect()}
    k1, b, n, avgdl = 1.2, 0.75, 3, 10 / 3

    def term(tf, dfreq, dl):
        idf = (n - dfreq + 0.5) / (dfreq + 0.5)
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    want = {
        1: term(2, 1, 3) + term(1, 2, 3),   # cat×2 (df=1), dog×1 (df=2)
        2: term(3, 2, 4),                   # dog×3
    }
    assert set(out) == {1, 2}
    for d in want:
        assert math.isclose(out[d], want[d], rel_tol=1e-9), d


def test_bm25_single_corpus_scan(spark):
    # The wide conditional-aggregate form must read the corpus ONCE:
    # per-term tfs are conditional counts inside the single per-doc
    # groupBy, and corpus stats reduce that frame (no tf/dl/df branch
    # re-scans — the naive long form showed 4 parquet scans).
    from onechronos_etl_takehome_spark.plans import QUERIES

    df = QUERIES["t16_bm25_topk"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # the corpus parquet relation appears ZERO times in the final plan:
    # it was consumed once, eagerly, into the per-doc checkpoint both
    # branches read (the naive long form showed 4 parquet scans).
    assert plan.count("Relation") == 0, plan
    assert "ExistingRDD" in plan or "LogicalRDD" in plan


def test_weighted_percentiles_matches_python_model(spark):
    from onechronos_etl_takehome_spark.operators.sampling import (
        weighted_percentiles,
    )

    rng = random.Random(23)
    rows = [(rng.randint(0, 50), rng.randint(1, 9), i) for i in range(500)]
    df = spark.createDataFrame(rows, "v long, w long, id long")
    got = {
        r.pct: r.value
        for r in weighted_percentiles(
            df, "v", "w", [50, 90, 99], tiebreak_cols=["id"]
        ).collect()
    }
    total = sum(w for _, w, _ in rows)
    want = {}
    for pct in (50, 90, 99):
        cum = 0
        for v, w, _ in sorted(rows, key=lambda t: (t[0], t[2])):
            cum += w
            if cum * 100 >= pct * total:
                want[pct] = v
                break
    assert got == want


def test_passjoin_matches_bruteforce_over_random_edits(spark):
    from onechronos_etl_takehome_spark.operators.strings import passjoin_pairs

    rng = random.Random(43)
    base = ["".join(rng.choices("abcde012", k=rng.randint(1, 12)))
            for _ in range(15)]
    strings = base + [
        _mutate(rng, _mutate(rng, s)) for s in base for _ in range(2)
    ] + ["", "a", "ab"]
    rows = [(i, s) for i, s in enumerate(strings)]
    df = spark.createDataFrame(rows, "id long, s string")
    got = sorted(
        (r.id_a, r.id_b, r.dist)
        for r in passjoin_pairs(df, "id", "s", tau=2).collect()
    )
    want = sorted(
        (i, j, _lev(a, b))
        for i, a in rows
        for j, b in rows
        if i < j and _lev(a, b) <= 2
    )
    assert got == want and len(want) >= 30


def test_passjoin_tau1_agrees_with_fastss(spark):
    from onechronos_etl_takehome_spark.operators.strings import passjoin_pairs

    rng = random.Random(44)
    strings = ["".join(rng.choices("xy01", k=rng.randint(2, 8)))
               for _ in range(40)]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(strings)], "id long, s string"
    )
    pj = sorted((r.id_a, r.id_b, r.dist)
                for r in passjoin_pairs(df, "id", "s", tau=1).collect())
    fs = sorted((r.id_a, r.id_b, r.dist)
                for r in edit_distance_join(df, "id", "s").collect())
    assert pj == fs and pj


def test_passjoin_seg_cap_is_subset(spark):
    from onechronos_etl_takehome_spark.operators.strings import passjoin_pairs

    # constant prefix -> two ubiquitous segment buckets; the cap sheds
    # them and may only LOSE pairs, never invent them.
    rows = [(i, f"PREFIX##{i:04d}") for i in range(60)]
    df = spark.createDataFrame(rows, "id long, s string")
    full = {(r.id_a, r.id_b) for r in
            passjoin_pairs(df, "id", "s", tau=2).collect()}
    capped = {(r.id_a, r.id_b) for r in
              passjoin_pairs(df, "id", "s", tau=2, max_seg_df=10).collect()}
    assert capped <= full and len(full) > 0


def test_passjoin_block_col_equals_postfiltered_pairs(spark):
    from onechronos_etl_takehome_spark.operators.strings import passjoin_pairs

    rng = random.Random(47)
    rows = [
        (i, "".join(rng.choices("ab12", k=rng.randint(1, 7))), rng.randint(0, 2))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "id long, s string, blk int")
    blocked = sorted(
        (r.id_a, r.id_b, r.dist)
        for r in passjoin_pairs(df, "id", "s", tau=1, block_col="blk").collect()
    )
    full = passjoin_pairs(df, "id", "s", tau=1).collect()
    blk_of = {i: b for i, _, b in rows}
    want = sorted(
        (r.id_a, r.id_b, r.dist)
        for r in full
        if blk_of[r.id_a] == blk_of[r.id_b]
    )
    assert blocked == want and len(want) > 0
