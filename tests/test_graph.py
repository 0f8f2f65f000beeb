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


def test_edge_cache_partitions_adapts_to_input_bytes(spark, tmp_path):
    """The pagerank edge cache sizes from the driving table's bytes
    (SCALE.md rule 42: the fixture constant inverted at 10x), clamped to
    [8, defaultParallelism], with the scale-safe ceiling as the fallback
    for non-stat-able inputs."""
    import species_range_data_pipeline_spark.plans.graph as g

    dp = spark.sparkContext.defaultParallelism
    # every fixture scale is under one calibration unit -> the floor
    for sf in ("0.001", "0.01", "0.1"):
        assert g._edge_cache_partitions(spark, f"/root/testdata/sf{sf}") == 8
    # a large input scales linearly and clamps at defaultParallelism
    big = tmp_path / "big" / "lineitem.parquet"
    big.parent.mkdir()
    big.write_bytes(b"\0" * (3 * g._PR_EDGE_PART_BYTES))
    assert g._edge_cache_partitions(spark, str(tmp_path / "big")) == max(8, min(3, dp))
    huge = tmp_path / "huge" / "lineitem.parquet"
    huge.parent.mkdir()
    # directory-of-parts layout: sizes sum across files
    huge.mkdir()
    for i in range(4):
        (huge / f"part-{i}.parquet").write_bytes(
            b"\0" * (40 * g._PR_EDGE_PART_BYTES)
        )
    assert g._edge_cache_partitions(spark, str(tmp_path / "huge")) == max(8, dp)
    # non-stat-able path -> the scale-safe fallback, never a crash
    assert g._edge_cache_partitions(spark, str(tmp_path / "absent")) == max(8, dp)
    # the sweep/test override pins the count exactly
    g._PR_EDGE_PARTS_OVERRIDE = 13
    try:
        assert g._edge_cache_partitions(spark, "/root/testdata/sf0.1") == 13
    finally:
        g._PR_EDGE_PARTS_OVERRIDE = None
