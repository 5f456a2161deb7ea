"""Round-4g additions: degree-oriented triangle counting, the binned
interval-overlap join, bounded-lag EWMA, one-pass profiling, and the
bigram LM score.

Contracts pinned here (the catalog parity tests pin the cross-engine
hashes; these pin the operator semantics against pure-python models):
- triangle_stats == brute-force triangle enumeration on random graphs
  (the orientation must count every triangle exactly once);
- interval_overlap_pairs == the naive O(n²) overlap scan, across bin
  widths (binning must be lossless, including bin-boundary and
  touching-interval cases);
- x20's fixed-order EWMA == the textbook recursive EWMA on full
  4-history rows;
- x21 flags seeded violations with exact counts;
- t18 ranks a shuffled-word document below its natural-order twin.
"""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F

from onechronos_etl_takehome_spark.operators.graph import triangle_stats
from onechronos_etl_takehome_spark.operators.intervals import (
    interval_overlap_pairs,
)


def _random_graph(rng: random.Random, n: int, p: float):
    return [
        (u, v)
        for u in range(n)
        for v in range(u + 1, n)
        if rng.random() < p
    ]


def _brute_triangles(edges):
    es = set(edges)
    nodes = sorted({x for e in edges for x in e})
    tri = 0
    for a, b, c in itertools.combinations(nodes, 3):
        if (a, b) in es and (b, c) in es and (a, c) in es:
            tri += 1
    return tri


def test_triangle_stats_matches_bruteforce(spark):
    rng = random.Random(7)
    for n, p in [(12, 0.5), (25, 0.25), (18, 0.9), (10, 0.05)]:
        edges = _random_graph(rng, n, p)
        if not edges:
            continue
        df = spark.createDataFrame(edges, "u long, v long")
        row = triangle_stats(df).collect()[0]
        assert row.n_triangles == _brute_triangles(edges), (n, p)
        assert row.n_edges == len(edges)
        deg = {}
        for u, v in edges:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        assert row.n_nodes == len(deg)
        assert row.n_wedges == sum(d * (d - 1) // 2 for d in deg.values())
        if row.n_wedges:
            assert abs(
                row.global_clustering - 3 * row.n_triangles / row.n_wedges
            ) < 1e-12


def test_triangle_stats_counts_clique_and_path(spark):
    # K4 has C(4,3)=4 triangles; a 4-path has none.
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    path = [(0, 1), (1, 2), (2, 3)]
    assert triangle_stats(
        spark.createDataFrame(k4, "u long, v long")
    ).collect()[0].n_triangles == 4
    row = triangle_stats(
        spark.createDataFrame(path, "u long, v long")
    ).collect()[0]
    assert row.n_triangles == 0 and row.global_clustering == 0.0


def _brute_overlaps(intervals):
    out = set()
    for (i, s1, e1), (j, s2, e2) in itertools.combinations(intervals, 2):
        a, b = (i, j) if i < j else (j, i)
        if s1 <= e2 and s2 <= e1:
            out.add((a, b, min(e1, e2) - max(s1, s2)))
    return out


def test_interval_overlap_lossless_across_bin_widths(spark):
    rng = random.Random(11)
    intervals = []
    for i in range(60):
        s = rng.randrange(0, 10_000)
        intervals.append((i, s, s + rng.randrange(0, 3_000)))
    # Boundary cases: touching pair, identical pair, bin-straddler.
    intervals += [(100, 500, 1000), (101, 1000, 1500),
                  (102, 500, 1000), (103, 9_999, 30_000)]
    expected = _brute_overlaps(intervals)
    df = spark.createDataFrame(intervals, "iid long, s long, e long")
    for bin_us in (100, 1_000, 7_919, 100_000):
        got = {
            (r.id_a, r.id_b, r.overlap_us)
            for r in interval_overlap_pairs(
                df, "iid", "s", "e", bin_us=bin_us
            ).collect()
        }
        assert got == expected, f"bin_us={bin_us}"


def test_interval_overlap_carries_columns(spark):
    df = spark.createDataFrame(
        [(1, 0, 10, "x"), (2, 5, 15, "y")], "iid long, s long, e long, tag string"
    )
    rows = interval_overlap_pairs(
        df, "iid", "s", "e", bin_us=4, carry=["tag"]
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.id_a, r.id_b, r.tag_a, r.tag_b, r.overlap_us) == (1, 2, "x", "y", 5)


def test_x20_matches_recursive_ewma_on_full_history(spark):
    # On rows with a full 4-lag history the bounded-lag form equals the
    # classic recursion s_t = (v_t + 0.5·s'_{t-1}) truncated at depth 4
    # with the same normalization: check directly against the weighted
    # mean of the last 4 values.
    from onechronos_etl_takehome_spark.plans.catalog import QUERIES

    out = {
        r.event_id: r.ewma
        for r in QUERIES["x20_ewma_smoothing"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    ev = sorted(
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select("event_id", "user_id", "ts", "value")
        .collect(),
        key=lambda r: (r.ts, r.event_id),
    )
    by_user = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    checked = 0
    for rows in by_user.values():
        for k, r in enumerate(rows):
            hist = [rows[k - i].value for i in range(0, min(k, 3) + 1)]
            w = [1.0, 0.5, 0.25, 0.125][: len(hist)]
            exp = sum(h * wi for h, wi in zip(hist, w)) / sum(w)
            assert abs(out[r.event_id] - exp) < 1e-9
            checked += 1
    assert checked == len(ev)


def test_x21_counts_seeded_violations(spark, tmp_path):
    import shutil

    src = "/root/testdata/sf0.001"
    d = tmp_path / "dirty"
    d.mkdir()
    li = spark.read.parquet(f"{src}/lineitem.parquet")
    bad = li.limit(3).select(
        F.col("l_orderkey"),
        F.col("l_linenumber"),
        F.lit(None).cast(li.schema["l_quantity"].dataType).alias("l_quantity"),
        F.lit(0.75).alias("l_discount"),
        F.lit("Z").alias("l_returnflag"),
        *[
            F.col(c)
            for c in li.columns
            if c not in {"l_orderkey", "l_linenumber", "l_quantity",
                         "l_discount", "l_returnflag"}
        ],
    ).select(*li.columns)
    li.unionByName(bad).coalesce(1).write.parquet(
        str(d / "lineitem.parquet")
    )
    from onechronos_etl_takehome_spark.plans.catalog import QUERIES

    rep = {
        r.constraint_name: r
        for r in QUERIES["x21_profile_constraints"](spark, str(d)).collect()
    }
    n = li.count()
    assert rep["quantity_in_1_50"].n_violations == 3
    assert rep["discount_in_0_01"].n_violations == 3
    assert rep["returnflag_domain"].n_violations == 3
    # The synthetic lineitem is NOT unique on (orderkey, linenumber) —
    # the profile reports the pre-existing duplicates plus the 3 seeded.
    base_dups = (
        n
        - li.select("l_orderkey", "l_linenumber").distinct().count()
    )
    assert rep["pk_orderkey_linenumber_unique"].n_violations == base_dups + 3
    assert not rep["quantity_in_1_50"].passed
    assert rep["orderkey_not_null"].passed
    assert rep["orderkey_not_null"].n_rows == n + 3
    shutil.rmtree(d)


def test_t18_scores_natural_order_above_shuffled(spark, tmp_path):
    # A document whose words are a verbatim repeat of corpus bigrams
    # scores higher than the same words in scrambled order.
    rng = random.Random(3)
    base = "the quick brown fox jumps over the lazy dog".split()
    docs = []
    for i in range(30):
        docs.append((i, " ".join(base)))
    shuffled = base[:]
    rng.shuffle(shuffled)
    docs.append((1000, " ".join(base)))
    docs.append((1001, " ".join(shuffled)))
    d = tmp_path / "corpus"
    d.mkdir()
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(d / "documents.parquet")
    )
    from onechronos_etl_takehome_spark.plans.catalog import QUERIES

    out = {
        r.doc_id: r.micro_cond_prob
        for r in QUERIES["t18_bigram_lm_score"](spark, str(d)).collect()
    }
    assert out[1000] > out[1001]


def test_x22_packing_matches_sequential_model(spark):
    # Concat-order packing must equal the single-threaded fold over
    # documents sorted by doc_id, whatever the partitioning.
    from onechronos_etl_takehome_spark.plans.catalog import QUERIES

    sf = "/root/testdata/sf0.001"
    out = {
        r.doc_id: (r.n_tokens, r.start_offset, r.seq_id, r.crosses_boundary)
        for r in QUERIES["x22_sequence_packing"](spark, sf).collect()
    }
    docs = sorted(
        spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id", "text")
        .collect(),
        key=lambda r: r.doc_id,
    )
    off = 0
    for r in docs:
        n = len(r.text.split(" "))
        expect = (n, off, off // 256, (off % 256) + n > 256)
        assert out[r.doc_id] == expect, r.doc_id
        off += n
    assert len(out) == len(docs)
