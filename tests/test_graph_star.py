"""Large-star/small-star connected components: equivalence with the
plain min-label propagation on adversarial graph shapes (deep chains are
the propagation loop's worst case and the star algorithm's showcase),
plus the oracle-backed dedup_clusters_star twin."""

from __future__ import annotations

import pytest

from species_range_data_pipeline_spark.plans.graph import (
    connected_components,
    connected_components_star,
    dedup_clusters,
    dedup_clusters_star,
)

from .conftest import SF_CORRECT


def _labels(df):
    return {(r.id, r.comp) for r in df.collect()}


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


@pytest.mark.parametrize(
    "pairs",
    [
        # chain: diameter == n (kept under the plain loop's round cap
        # here; the 200-link version below is star-only)
        [(i, i + 1) for i in range(25)],
        # two cycles + a bridge + a singleton edge
        [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10), (2, 10), (50, 51)],
        # star, reversed orientation, duplicate + self-loop noise
        [(5, 1), (5, 2), (5, 3), (1, 5), (5, 5), (2, 5), (7, 7)],
        # binary-tree-ish fan
        [(i, 2 * i) for i in range(1, 64)] + [(i, 2 * i + 1) for i in range(1, 64)],
    ],
)
@pytest.mark.slow  # r19 slow tier: 4-param equivalence sweep; star-equals-plain fixture test stays default
def test_star_matches_propagation(spark, pairs):
    edges = _edges_df(spark, pairs)
    got = _labels(connected_components_star(edges))
    want = _labels(connected_components(edges))
    # the plain loop drops vertices with only self-loop edges; the star
    # variant keeps them as singletons — reconcile before comparing
    only_self = {a for a, b in pairs if a == b} - {
        x for a, b in pairs if a != b for x in (a, b)
    }
    assert got == want | {(v, v) for v in only_self}


@pytest.mark.slow  # r19 slow tier: convergence-rate property; correctness pinned by the default-tier equality tests
def test_star_chain_converges_in_log_rounds(spark):
    """A 200-link chain must finish well under the propagation bound —
    the cap would trip if rounds were O(diameter).  The plain loop must
    REFUSE the same graph loudly instead of returning partially-propagated
    (wrong) labels."""
    edges = _edges_df(spark, [(i, i + 1) for i in range(200)])
    out = connected_components_star(edges, max_iters=12)
    labels = _labels(out)
    assert labels == {(i, 0) for i in range(201)}
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges)


def test_dedup_clusters_star_equals_plain_on_fixture(spark):
    a = [tuple(r) for r in dedup_clusters_star(spark, SF_CORRECT).collect()]
    b = [tuple(r) for r in dedup_clusters(spark, SF_CORRECT).collect()]
    assert a == b and len(a) > 0


def test_star_refuses_partial_convergence(spark):
    edges = _edges_df(spark, [(i, i + 1) for i in range(120)])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components_star(edges, max_iters=2)
