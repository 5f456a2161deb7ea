"""dedup_components: transitive closure correctness and the
unconverged-warning contract (ADVICE r1: a component wider than
max_iters hops must not silently split)."""

from __future__ import annotations

import warnings

import pytest

from onechronos_etl_takehome_spark.operators.dedup import dedup_components


def _ids(spark, n):
    return spark.createDataFrame([(i,) for i in range(n)], "doc_id long")


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "id_a long, id_b long")


def test_chain_collapses_to_min_label(spark):
    # 0-1-2-3 chain plus isolated 4: one component {0..3} + singleton.
    got = {
        (r.doc_id, r.canonical_id)
        for r in dedup_components(
            _ids(spark, 5),
            _pairs(spark, [(0, 1), (1, 2), (2, 3)]),
            id_col="doc_id",
        ).collect()
    }
    assert got == {(0, 0), (1, 0), (2, 0), (3, 0), (4, 4)}


def test_unconverged_component_warns(spark):
    # A 6-node chain needs ~5 propagation hops; max_iters=2 cannot
    # converge and must say so instead of returning split components.
    with pytest.warns(RuntimeWarning, match="did not converge"):
        dedup_components(
            _ids(spark, 6),
            _pairs(spark, [(i, i + 1) for i in range(5)]),
            id_col="doc_id",
            max_iters=2,
        ).collect()


def test_converged_run_does_not_warn(spark):
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        dedup_components(
            _ids(spark, 3), _pairs(spark, [(0, 1)]), id_col="doc_id"
        ).collect()
