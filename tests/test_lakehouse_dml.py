"""DML over the open lakehouse layouts: copy-on-write DELETE/UPDATE
for Delta (`sources/delta_dml.py`) and merge-on-read DELETE for
Iceberg (`iceberg_write.iceberg_delete_where`) — touched-file
minimality, whole-file drops, DV absorption, partition-column
refusals, and change-feed visibility of the DML commits.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from species_range_data_pipeline_spark.sources.delta_dml import (
    delta_delete_where,
    delta_update_where,
)
from species_range_data_pipeline_spark.sources.delta_log import (
    read_delta_changes,
    read_delta_table,
)
from species_range_data_pipeline_spark.sources.delta_write import (
    write_delta_table,
)
from species_range_data_pipeline_spark.sources.iceberg_log import (
    iceberg_read_changes,
    read_iceberg_table,
)
from species_range_data_pipeline_spark.sources.iceberg_write import (
    iceberg_delete_where,
    write_iceberg_table,
)


def _seed_delta(spark, tmp_path, name="t"):
    tbl = str(tmp_path / name)
    rows = [(k, "lo" if k < 50 else "hi", float(k)) for k in range(100)]
    write_delta_table(
        spark.createDataFrame(rows, "k long, part string, v double"),
        tbl,
        partition_by=["part"],
    )
    return tbl


def test_delta_delete_rewrites_only_touched_files(spark, tmp_path):
    tbl = _seed_delta(spark, tmp_path)
    before = {
        rel: None
        for rel in os.listdir(os.path.join(tbl, "part=hi"))
    }
    v = delta_delete_where(spark, tbl, [("k", "=", 7)])
    assert v == 1
    got = sorted(r.k for r in read_delta_table(spark, tbl).collect())
    assert got == [k for k in range(100) if k != 7]
    # the hi partition's files were never touched
    assert {
        rel for rel in os.listdir(os.path.join(tbl, "part=hi"))
    } == set(before)


def test_delta_delete_partition_only_drops_whole_files(spark, tmp_path):
    """A predicate with only partition-column terms removes files
    without rewriting a byte: the commit has removes and NO adds."""
    tbl = _seed_delta(spark, tmp_path)
    v = delta_delete_where(spark, tbl, [("part", "=", "lo")])
    with open(os.path.join(tbl, "_delta_log", f"{v:020d}.json")) as fh:
        actions = [json.loads(line) for line in fh if line.strip()]
    kinds = [next(iter(a)) for a in actions]
    assert "remove" in kinds and "add" not in kinds
    got = sorted(r.k for r in read_delta_table(spark, tbl).collect())
    assert got == list(range(50, 100))


def test_delta_update_where(spark, tmp_path):
    tbl = _seed_delta(spark, tmp_path)
    delta_update_where(
        spark, tbl, [("k", "<", 3)], {"v": F.col("v") + 1000.0}
    )
    got = {r.k: r.v for r in read_delta_table(spark, tbl).collect()}
    assert got[0] == 1000.0 and got[2] == 1002.0 and got[3] == 3.0
    # time travel still shows the pre-update rows
    old = {
        r.k: r.v
        for r in read_delta_table(spark, tbl, version=0).collect()
    }
    assert old[0] == 0.0


def test_delta_dml_refusals(spark, tmp_path):
    tbl = _seed_delta(spark, tmp_path)
    with pytest.raises(ValueError, match="non-empty"):
        delta_delete_where(spark, tbl, [])
    with pytest.raises(NotImplementedError, match="partition column"):
        delta_update_where(
            spark, tbl, [("k", "=", 1)], {"part": F.lit("zz")}
        )
    with pytest.raises(ValueError, match="unknown column"):
        delta_update_where(
            spark, tbl, [("k", "=", 1)], {"nope": F.lit(1)}
        )


def test_delta_delete_feeds_change_feed(spark, tmp_path):
    tbl = _seed_delta(spark, tmp_path)
    delta_delete_where(spark, tbl, [("k", "=", 7)])
    changes = [
        (r.k, r._change_type)
        for r in read_delta_changes(spark, tbl, 0).collect()
        if r._commit_version == 1
    ]
    assert changes == [(7, "delete")]


def test_delta_delete_no_match_is_noop(spark, tmp_path):
    tbl = _seed_delta(spark, tmp_path)
    v = delta_delete_where(spark, tbl, [("k", "=", 10_000)])
    assert v == 0  # unchanged current version, no new commit
    assert read_delta_table(spark, tbl).count() == 100


def test_iceberg_mor_delete_masks_without_rewrite(spark, tmp_path):
    tbl = str(tmp_path / "ice")
    rows = [(k, "lo" if k < 50 else "hi", float(k)) for k in range(100)]
    write_iceberg_table(
        spark.createDataFrame(rows, "k long, part string, v double"),
        tbl,
        partition_by=["part"],
    )
    data_before = {
        os.path.join(dp, n): os.path.getmtime(os.path.join(dp, n))
        for dp, _d, ns in os.walk(os.path.join(tbl, "data"))
        for n in ns
        if "delete-" not in n
    }
    sid = iceberg_delete_where(spark, tbl, [("k", "<", 3)])
    got = sorted(r.k for r in read_iceberg_table(spark, tbl).collect())
    assert got == list(range(3, 100))
    # no data file rewritten — only a delete file appeared
    data_after = {
        os.path.join(dp, n): os.path.getmtime(os.path.join(dp, n))
        for dp, _d, ns in os.walk(os.path.join(tbl, "data"))
        for n in ns
        if "delete-" not in n
    }
    assert data_after == data_before
    # the change feed reads the masked rows as deletes
    snaps = [
        s
        for s in __import__(
            "species_range_data_pipeline_spark.sources.iceberg_log",
            fromlist=["iceberg_snapshots"],
        ).iceberg_snapshots(tbl)
    ]
    first = snaps[0]["snapshot-id"]
    changes = sorted(
        (r.k, r._change_type)
        for r in iceberg_read_changes(spark, tbl, first).collect()
        if r._snapshot_id == sid
    )
    assert changes == [(0, "delete"), (1, "delete"), (2, "delete")]


def test_iceberg_mor_delete_then_append_escapes_mask(spark, tmp_path):
    """Sequence-number scoping: a row re-inserted AFTER the delete
    keeps its value (the delete applies only to strictly smaller data
    sequence numbers)."""
    tbl = str(tmp_path / "ice")
    write_iceberg_table(
        spark.createDataFrame(
            [(1, "a", 1.0), (2, "b", 2.0)], "k long, part string, v double"
        ),
        tbl,
    )
    iceberg_delete_where(spark, tbl, [("k", "=", 1)])
    write_iceberg_table(
        spark.createDataFrame(
            [(1, "a2", 10.0)], "k long, part string, v double"
        ),
        tbl,
    )
    got = sorted(
        (r.k, r.part) for r in read_iceberg_table(spark, tbl).collect()
    )
    assert got == [(1, "a2"), (2, "b")]


def test_iceberg_mor_delete_no_match_is_noop(spark, tmp_path):
    tbl = str(tmp_path / "ice")
    s1 = write_iceberg_table(
        spark.createDataFrame([(1, "a", 1.0)], "k long, part string, v double"),
        tbl,
    )
    assert iceberg_delete_where(spark, tbl, [("k", "=", 99)]) == s1
    assert read_iceberg_table(spark, tbl).count() == 1


def test_delta_optimize_compacts_without_logical_change(spark, tmp_path):
    """OPTIMIZE merges small files per partition under dataChange=false
    actions; rows are unchanged, the file count drops, and a DV'd
    file's mask is materialized away."""
    from species_range_data_pipeline_spark.sources.delta_dml import (
        delta_optimize,
    )

    tbl = str(tmp_path / "t")
    rows = [(k, "lo" if k < 50 else "hi", float(k)) for k in range(100)]
    df = spark.createDataFrame(
        rows, "k long, part string, v double"
    ).repartition(10)
    write_delta_table(df, tbl, partition_by=["part"])

    def _files():
        return {
            os.path.join(dp, n)
            for dp, _d, ns in os.walk(tbl)
            for n in ns
            if n.endswith(".parquet") and "_delta_log" not in dp
        }

    n_before = len(_files())
    assert n_before > 2
    v = delta_optimize(spark, tbl)
    with open(os.path.join(tbl, "_delta_log", f"{v:020d}.json")) as fh:
        actions = [json.loads(line) for line in fh if line.strip()]
    for a in actions:
        if "add" in a:
            assert a["add"]["dataChange"] is False
        if "remove" in a:
            assert a["remove"]["dataChange"] is False
    live = {
        os.path.relpath(f, tbl)
        for f in __import__(
            "species_range_data_pipeline_spark.sources.delta_log",
            fromlist=["delta_scan_files"],
        ).delta_scan_files(tbl)
    }
    assert len(live) == 2  # one compacted file per partition
    got = sorted(r.k for r in read_delta_table(spark, tbl).collect())
    assert got == list(range(100))
    # the streaming CDF tail skips the compaction commit entirely
    from species_range_data_pipeline_spark.sources.delta_cdf_stream import (
        DeltaCdfTailStreamReader,
        _cdf_schema,
    )

    reader = DeltaCdfTailStreamReader(
        {"path": tbl},
        _cdf_schema(read_delta_table(spark, tbl).schema),
    )
    parts = reader.partitions({"version": 0}, {"version": v})
    assert parts == []


def test_delta_optimize_materializes_deletion_vectors(spark, tmp_path):
    """A DV'd small file entering a compaction group comes out as a
    clean file with the masked rows gone for good."""
    from species_range_data_pipeline_spark.sources.delta_dml import (
        delta_optimize,
    )
    from species_range_data_pipeline_spark.sources.dv import (
        make_inline_descriptor,
    )

    tbl = str(tmp_path / "t")
    write_delta_table(
        spark.createDataFrame(
            [(1, "a", 1.0), (2, "a", 2.0)], "k long, part string, v double"
        ).coalesce(1),
        tbl,
    )
    write_delta_table(
        spark.createDataFrame(
            [(3, "b", 3.0)], "k long, part string, v double"
        ).coalesce(1),
        tbl,
    )
    # attach a DV masking row 0 (k=1) of the first file
    import pyarrow.parquet as pq

    snap = __import__(
        "species_range_data_pipeline_spark.sources.delta_log",
        fromlist=["_replay"],
    )._replay(tbl)
    # the two-row file (k=1,2) — file names are uuid-unique, so pick
    # by footer row count, not sort order
    (rel0,) = [
        rel
        for rel in snap["live"]
        if pq.read_metadata(os.path.join(tbl, rel)).num_rows == 2
    ]
    add0 = dict(snap["live"][rel0])
    add0["deletionVector"] = make_inline_descriptor([0])
    add0["dataChange"] = True
    with open(os.path.join(tbl, "_delta_log", f"{2:020d}.json"), "w") as fh:
        fh.write(json.dumps({"add": add0}) + "\n")
        fh.write(
            json.dumps(
                {"remove": {"path": rel0, "dataChange": True}}
            )
            + "\n"
        )
    assert sorted(
        r.k for r in read_delta_table(spark, tbl).collect()
    ) == [2, 3]
    delta_optimize(spark, tbl)
    snap2 = __import__(
        "species_range_data_pipeline_spark.sources.delta_log",
        fromlist=["_replay"],
    )._replay(tbl)
    assert all(
        not (a.get("deletionVector") or {}).get("storageType")
        for a in snap2["live"].values()
    )
    assert sorted(
        r.k for r in read_delta_table(spark, tbl).collect()
    ) == [2, 3]


def test_iceberg_compact_folds_deletes_away(spark, tmp_path):
    """Compaction materializes the MoR masks: the new snapshot has no
    delete manifests, rows are unchanged, and the feed step across the
    compaction nets to zero."""
    from species_range_data_pipeline_spark.sources.iceberg_log import (
        _walk_entries,
        iceberg_snapshots,
    )
    from species_range_data_pipeline_spark.sources.iceberg_write import (
        iceberg_compact,
    )

    tbl = str(tmp_path / "ice")
    rows = [(k, "lo" if k < 50 else "hi", float(k)) for k in range(100)]
    write_iceberg_table(
        spark.createDataFrame(rows, "k long, part string, v double"),
        tbl,
        partition_by=["part"],
    )
    pre_sid = iceberg_delete_where(spark, tbl, [("k", "<", 3)])
    sid = iceberg_compact(spark, tbl)
    got = sorted(r.k for r in read_iceberg_table(spark, tbl).collect())
    assert got == list(range(3, 100))
    snaps = iceberg_snapshots(tbl)
    current = [s for s in snaps if s["snapshot-id"] == sid][0]
    kinds = {
        kind for kind, _d, _s, _q in _walk_entries(tbl, current)
    }
    assert kinds == {"data"}  # no delete files survive
    # feed across the compaction step nets to zero rows
    changes = [
        r
        for r in iceberg_read_changes(spark, tbl, pre_sid).collect()
        if r._snapshot_id == sid
    ]
    assert changes == []
    # time travel still reaches the pre-compaction snapshot
    assert sorted(
        r.k
        for r in read_iceberg_table(spark, tbl, snapshot_id=pre_sid).collect()
    ) == list(range(3, 100))


def test_delta_vacuum_removes_only_expired_unreferenced(spark, tmp_path):
    """VACUUM deletes unreferenced files past retention; the current
    snapshot is untouched, time travel to the vacuumed version breaks
    (the documented contract), and the default retention deletes
    nothing fresh."""
    from species_range_data_pipeline_spark.sources.delta_dml import (
        delta_vacuum,
    )

    tbl = _seed_delta(spark, tmp_path)
    write_delta_table(
        spark.createDataFrame(
            [(999, "zz", 9.0)], "k long, part string, v double"
        ),
        tbl,
        mode="overwrite",
    )
    # default 7-day retention: fresh tombstones survive
    assert delta_vacuum(tbl) == []
    gone = delta_vacuum(tbl, retention_ms=0)
    assert gone and all(g.startswith("part=") for g in gone)
    assert sorted(
        r.k for r in read_delta_table(spark, tbl).collect()
    ) == [999]
    with pytest.raises(Exception):
        read_delta_table(spark, tbl, version=0).collect()
    # idempotent second pass
    assert delta_vacuum(tbl, retention_ms=0) == []


def test_delta_vacuum_dry_run_and_guardrails(spark, tmp_path):
    from species_range_data_pipeline_spark.sources.delta_dml import (
        delta_vacuum,
    )

    tbl = _seed_delta(spark, tmp_path)
    write_delta_table(
        spark.createDataFrame(
            [(999, "zz", 9.0)], "k long, part string, v double"
        ),
        tbl,
        mode="overwrite",
    )
    would = delta_vacuum(tbl, retention_ms=0, dry_run=True)
    assert would
    for rel in would:  # dry run deleted nothing
        assert os.path.exists(os.path.join(tbl, rel))
    with pytest.raises(ValueError, match=">= 0"):
        delta_vacuum(tbl, retention_ms=-1)


def test_iceberg_expire_snapshots(spark, tmp_path):
    """Expiry keeps the newest snapshots, prunes the metadata history,
    deletes files reachable only from expired snapshots, and leaves
    the current read intact; an expired snapshot id then refuses."""
    from species_range_data_pipeline_spark.sources.iceberg_log import (
        iceberg_snapshots,
    )
    from species_range_data_pipeline_spark.sources.iceberg_write import (
        iceberg_expire_snapshots,
    )

    tbl = str(tmp_path / "ice")
    s1 = write_iceberg_table(
        spark.createDataFrame([(1, "a", 1.0)], "k long, part string, v double"),
        tbl,
    )
    write_iceberg_table(
        spark.createDataFrame([(2, "b", 2.0)], "k long, part string, v double"),
        tbl,
    )
    s3 = write_iceberg_table(
        spark.createDataFrame([(9, "z", 9.0)], "k long, part string, v double"),
        tbl,
        mode="overwrite",
    )
    dropped = iceberg_expire_snapshots(tbl, keep_last=1)
    assert dropped  # the pre-overwrite data files + their manifests
    snaps = iceberg_snapshots(tbl)
    assert [s["snapshot-id"] for s in snaps] == [s3]
    assert "parent-snapshot-id" not in snaps[0]
    assert sorted(
        r.k for r in read_iceberg_table(spark, tbl).collect()
    ) == [9]
    with pytest.raises(ValueError):
        read_iceberg_table(spark, tbl, snapshot_id=s1).collect()
    # nothing further to expire
    assert iceberg_expire_snapshots(tbl, keep_last=1) == []
