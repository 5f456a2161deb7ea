"""dedup_components: transitive closure correctness on BOTH solver
tiers (bounded-driver union-find; distributed large-star/small-star
contraction), plus the unconverged-warning contract (ADVICE r1: a
component the solver cannot finish must not silently split)."""

from __future__ import annotations

import warnings

import pytest

from onechronos_etl_takehome_spark.operators.dedup import dedup_components


def _ids(spark, n):
    return spark.createDataFrame([(i,) for i in range(n)], "doc_id long")


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "id_a long, id_b long")


# driver_edge_limit=0 forces the distributed star-contraction path;
# the default exercises the bounded-driver union-find.
@pytest.mark.parametrize("limit", [0, 1_000_000])
def test_chain_collapses_to_min_label(spark, limit):
    # 0-1-2-3 chain plus isolated 4: one component {0..3} + singleton.
    got = {
        (r.doc_id, r.canonical_id)
        for r in dedup_components(
            _ids(spark, 5),
            _pairs(spark, [(0, 1), (1, 2), (2, 3)]),
            id_col="doc_id",
            driver_edge_limit=limit,
        ).collect()
    }
    assert got == {(0, 0), (1, 0), (2, 0), (3, 0), (4, 4)}


@pytest.mark.parametrize("limit", [0, 1_000_000])
def test_long_chain_converges(spark, limit):
    # A 40-node chain (diameter 39) — the shape that broke one-hop
    # label propagation (it needed O(diameter) rounds). Union-find is
    # diameter-free; star contraction is O(log²) rounds.
    n = 40
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        got = {
            (r.doc_id, r.canonical_id)
            for r in dedup_components(
                _ids(spark, n),
                _pairs(spark, [(i, i + 1) for i in range(n - 1)]),
                id_col="doc_id",
                driver_edge_limit=limit,
            ).collect()
        }
    assert got == {(i, 0) for i in range(n)}


def test_unconverged_distributed_run_warns(spark):
    # One star-contraction round cannot finish a 40-node chain; the
    # distributed path must say so instead of returning split labels.
    with pytest.warns(RuntimeWarning, match="did not converge"):
        dedup_components(
            _ids(spark, 40),
            _pairs(spark, [(i, i + 1) for i in range(39)]),
            id_col="doc_id",
            max_iters=1,
            driver_edge_limit=0,
        ).collect()


@pytest.mark.parametrize("limit", [0, 1_000_000])
def test_converged_run_does_not_warn(spark, limit):
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        dedup_components(
            _ids(spark, 3),
            _pairs(spark, [(0, 1)]),
            id_col="doc_id",
            driver_edge_limit=limit,
        ).collect()


def test_distributed_path_no_premature_convergence(spark):
    # Review repro: path 1-7-5-10-2 is ONE component, but after round 0
    # the edge count matches the initial count and the intermediate
    # state is large-star-stable — a one-sided convergence check split
    # it into {1,5,7} / {2,10} with node 5 getting two conflicting
    # labels. The full-round no-op check must keep contracting.
    ids = spark.createDataFrame([(i,) for i in (1, 2, 5, 7, 10)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 7), (2, 10), (5, 7), (5, 10)], "id_a long, id_b long"
    )
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        rows = dedup_components(
            ids, pairs, id_col="doc_id", driver_edge_limit=0
        ).collect()
    got = {(r.doc_id, r.canonical_id) for r in rows}
    assert len(rows) == 5, rows
    assert got == {(1, 1), (2, 1), (5, 1), (7, 1), (10, 1)}
