"""Connected-components kernel: hand-built graphs with known components.

The oracle-parity test covers dedup_clusters end-to-end; these pin the
iterative kernel itself on shapes that stress it: multi-hop chains (forces
several propagation rounds), cycles (must terminate), and disjoint
components (no label bleed).
"""

from __future__ import annotations

from species_range_data_pipeline_spark.plans.graph import connected_components


def _components(spark, edge_list):
    edges = spark.createDataFrame(edge_list, ["src", "dst"])
    rows = connected_components(edges).collect()
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r["comp"], set()).add(r["id"])
    return {frozenset(v) for v in by_comp.values()}, {
        r["id"]: r["comp"] for r in rows
    }


def test_chain_propagates_min_label(spark):
    # 1-2-3-4-5 chain: diameter 4, needs multiple rounds.
    comps, labels = _components(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert comps == {frozenset({1, 2, 3, 4, 5})}
    assert all(c == 1 for c in labels.values())


def test_cycle_terminates(spark):
    comps, labels = _components(spark, [(10, 20), (20, 30), (30, 10)])
    assert comps == {frozenset({10, 20, 30})}
    assert all(c == 10 for c in labels.values())


def test_disjoint_components_no_bleed(spark):
    comps, labels = _components(
        spark, [(1, 2), (2, 3), (7, 8), (9, 9), (100, 50)]
    )
    assert comps == {
        frozenset({1, 2, 3}),
        frozenset({7, 8}),
        frozenset({9}),
        frozenset({50, 100}),
    }
    assert labels[100] == 50
