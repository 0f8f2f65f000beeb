"""Streaming tail over an Iceberg layout (`sources/iceberg_stream.py`):
snapshot-id offsets, exactly-once restart, the append-only contract
(skipChangeCommits covers removals AND delete-manifest changes), and
the expired-snapshot / migrated-layout refusals.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from species_range_data_pipeline_spark.sources.iceberg_stream import (
    IcebergTailStreamReader,
    register_iceberg_stream_source,
)
from tests.test_iceberg_log import _Builder


def _append_snapshot(b: _Builder, snap_id: int, new_files, carried):
    """Append: carried entries as EXISTING (status 0), new as ADDED."""
    m = b.manifest(
        f"m{snap_id}.avro",
        [(0, fp, part, n, 0) for fp, part, n in carried]
        + [(1, fp, part, n, 0) for fp, part, n in new_files],
    )
    b.snapshot(snap_id, [m])
    return carried + new_files


def test_iceberg_tail_reads_snapshots_exactly_once(spark, tmp_path):
    register_iceberg_stream_source(spark)
    b = _Builder(str(tmp_path / "t"))
    f1 = b.data_file("f1.parquet", [1, 2], 2020)
    live = _append_snapshot(b, 100, [(f1, {"year": 2020}, 2)], [])
    f2 = b.data_file("f2.parquet", [3], 2021)
    live = _append_snapshot(b, 200, [(f2, {"year": 2021}, 1)], live)
    b.commit(current_snapshot_id=200)

    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run_once():
        q = (
            spark.readStream.format("iceberg_tail")
            .option("path", b.root)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    got = {(r.k, r.year) for r in spark.read.parquet(out).collect()}
    assert got == {(1, 2020), (2, 2020), (3, 2021)}

    # a third snapshot lands while the stream is down -> only it streams
    f3 = b.data_file("f3.parquet", [9], 2022)
    _append_snapshot(b, 300, [(f3, {"year": 2022}, 1)], live)
    b.commit(current_snapshot_id=300)
    run_once()
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 4  # nothing replayed twice
    assert {(r.k, r.year) for r in rows} == {
        (1, 2020),
        (2, 2020),
        (3, 2021),
        (9, 2022),
    }


def test_iceberg_tail_change_snapshot_fails_or_skips(spark, tmp_path):
    """A snapshot that removes a data file or adds a delete manifest is
    a change snapshot: loud failure by default, skipped with the
    option; a later pure append still streams."""
    b = _Builder(str(tmp_path / "chg"))
    f1 = b.data_file("f1.parquet", [1, 2], 2020)
    live = _append_snapshot(b, 100, [(f1, {"year": 2020}, 2)], [])
    # snapshot 200: rewrite (f1 removed, f1b added)
    f1b = b.data_file("f1b.parquet", [1], 2020)
    m2 = b.manifest("m200.avro", [(1, f1b, {"year": 2020}, 1, 0)])
    b.snapshot(200, [m2])
    # snapshot 300: position-delete manifest appears (delete-set change)
    pd_path = os.path.join(b.root, "data", "pd.parquet")
    pq.write_table(
        pa.table({"file_path": [f1b], "pos": pa.array([0], pa.int64())}),
        pd_path,
    )
    md = b.manifest("md.avro", [(1, pd_path, {"year": None}, 1, 1)])
    b.snapshot(300, [m2, md], contents=[0, 1])
    # snapshot 400: pure append on top
    f4 = b.data_file("f4.parquet", [7], 2021)
    m4 = b.manifest(
        "m400.avro",
        [(0, f1b, {"year": 2020}, 1, 0), (1, f4, {"year": 2021}, 1, 0)],
    )
    b.snapshot(400, [m4, md], contents=[0, 1])
    b.commit(current_snapshot_id=400)

    from species_range_data_pipeline_spark.sources.iceberg_log import (
        _current_schema,
        _load_metadata,
        _struct_type,
    )

    schema = _struct_type(_current_schema(_load_metadata(b.root), b.root))
    reader = IcebergTailStreamReader({"path": b.root}, schema)
    with pytest.raises(ValueError, match="skipChangeCommits"):
        reader.partitions({"snapshot_id": 100}, {"snapshot_id": 400})

    skip = IcebergTailStreamReader(
        {"path": b.root, "skipChangeCommits": "true"}, schema
    )
    parts = skip.partitions({"snapshot_id": 100}, {"snapshot_id": 400})
    rows = [t for p in parts for bt in skip.read(p) for t in bt.to_pylist()]
    # 200 skipped (rewrite), 300 skipped (delete-set change), 400 streams
    assert [(r["k"], r["year"]) for r in rows] == [(7, 2021)]

    # expired offset: a snapshot id absent from the metadata raises
    with pytest.raises(ValueError, match="fresh checkpoint"):
        skip.partitions({"snapshot_id": 9999}, {"snapshot_id": 400})


def test_iceberg_tail_migrated_layout_refused(spark, tmp_path):
    """An added file lacking the identity-partition source column is a
    migrated layout the tail cannot restore: refused at planning."""
    b = _Builder(str(tmp_path / "mig"))
    stripped = os.path.join(b.root, "data", "s.parquet")
    pq.write_table(
        pa.table({"k": pa.array([1], pa.int64()), "v": ["x"]}), stripped
    )
    m = b.manifest("m.avro", [(1, stripped, {"year": 2020}, 1, 0)])
    b.snapshot(100, [m])
    b.commit(current_snapshot_id=100)

    from species_range_data_pipeline_spark.sources.iceberg_log import (
        _current_schema,
        _load_metadata,
        _struct_type,
    )

    schema = _struct_type(_current_schema(_load_metadata(b.root), b.root))
    reader = IcebergTailStreamReader({"path": b.root}, schema)
    with pytest.raises(NotImplementedError, match="migrated"):
        reader.partitions({"snapshot_id": None}, {"snapshot_id": 100})
