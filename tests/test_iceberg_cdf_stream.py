"""Streaming change-data-feed over an Iceberg layout
(`sources/iceberg_cdf_stream.py`): snapshot-id offsets, batch-feed
parity (insert / position-delete coverage / file-removal steps),
exactly-once restart, and the equality-delete / expired-snapshot /
migrated-layout refusals.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from species_range_data_pipeline_spark.sources.iceberg_cdf_stream import (
    IcebergCdfTailStreamReader,
    _cdf_schema,
    register_iceberg_cdf_stream_source,
)
from tests.test_iceberg_log import _Builder


def _history_table(tmp_path, name="t"):
    """snap 100: add f1 (k 1..4) / snap 200: add f2 (k 5..6) /
    snap 300: position-delete file masks f1 rows 0 and 2 (k 1, 3) /
    snap 400: remove f2 (its rows stream as deletes)."""
    b = _Builder(str(tmp_path / name))
    f1 = b.data_file("f1.parquet", [1, 2, 3, 4], 2000)
    f2 = b.data_file("f2.parquet", [5, 6], 2001)
    pd_path = os.path.join(b.root, "data", "pos-del.parquet")
    pq.write_table(
        pa.table(
            {
                "file_path": pa.array([f1, f1]),
                "pos": pa.array([0, 2], pa.int64()),
            }
        ),
        pd_path,
    )
    m1 = b.manifest("m1.avro", [(1, f1, {"year": 2000}, 4, 0)])
    b.snapshot(100, [m1])
    m2 = b.manifest(
        "m2.avro",
        [(0, f1, {"year": 2000}, 4, 0), (1, f2, {"year": 2001}, 2, 0)],
    )
    b.snapshot(200, [m2])
    md = b.manifest("md.avro", [(1, pd_path, {"year": None}, 2, 1)])
    b.snapshot(300, [m2, md], contents=[0, 1])
    m3 = b.manifest("m3.avro", [(0, f1, {"year": 2000}, 4, 0)])
    b.snapshot(400, [m3, md], contents=[0, 1])
    b.commit(current_snapshot_id=400)
    return b


def _drain(spark, table, out, ckpt, starting=None):
    reader = (
        spark.readStream.format("iceberg_cdf_tail").option("path", table)
    )
    if starting is not None:
        reader = reader.option("startingSnapshotId", str(starting))
    q = (
        reader.load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_ice_cdf_tail_matches_batch_feed(spark, tmp_path):
    """The streamed feed over (100, latest] equals the batch
    iceberg_read_changes rows exactly — the pure append, the
    delete-coverage step (exactly the newly-masked rows, carried rows
    cancel in the fold), and the file removal under the OLD delete set
    (already-masked rows do not resurrect as deletes)."""
    from species_range_data_pipeline_spark.sources.iceberg_log import (
        iceberg_read_changes,
    )

    register_iceberg_cdf_stream_source(spark)
    b = _history_table(tmp_path)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(spark, b.root, out, ckpt, starting=100)
    got = sorted(
        (r.k, r.year, r.v, r._change_type, r._snapshot_id)
        for r in spark.read.parquet(out).collect()
    )
    want = sorted(
        (r.k, r.year, r.v, r._change_type, r._snapshot_id)
        for r in iceberg_read_changes(spark, b.root, 100).collect()
    )
    assert got == want
    # spot-pin the semantics, not just parity: snap 400 removed f2
    # whose rows were never delete-masked, so exactly k=5,6 stream
    assert [(k, ct) for k, _y, _v, ct, sid in got if sid == 400] == [
        (5, "delete"),
        (6, "delete"),
    ]
    assert [(k, ct) for k, _y, _v, ct, sid in got if sid == 300] == [
        (1, "delete"),
        (3, "delete"),
    ]


def test_ice_cdf_tail_full_history_and_restart_exactly_once(spark, tmp_path):
    """From a None offset the whole history streams as changes;
    snapshots landing while the stream is down are picked up by the
    checkpointed restart exactly once."""
    register_iceberg_cdf_stream_source(spark)
    b = _history_table(tmp_path, "restart")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(spark, b.root, out, ckpt)
    first = spark.read.parquet(out).collect()
    # 4 inserts (snap 100) + 2 inserts (200) + 2 deletes (300) + 2 (400)
    assert len(first) == 10
    assert sorted(
        (r.k, r._change_type) for r in first if r._snapshot_id == 100
    ) == [(1, "insert"), (2, "insert"), (3, "insert"), (4, "insert")]

    f3 = b.data_file("f3.parquet", [9], 2002)
    m4 = b.manifest(
        "m4.avro",
        [(0, os.path.join(b.root, "data", "f1.parquet"),
          {"year": 2000}, 4, 0), (1, f3, {"year": 2002}, 1, 0)],
    )
    md = os.path.join(b.root, "metadata", "md.avro")
    b.snapshot(500, [m4, md], contents=[0, 1])
    b.commit(current_snapshot_id=500)
    _drain(spark, b.root, out, ckpt)
    rows = spark.read.parquet(out).collect()
    assert len(rows) == len(first) + 1
    assert {(r.k, r._change_type, r._snapshot_id) for r in rows} >= {
        (9, "insert", 500)
    }


def test_ice_cdf_tail_refuses_equality_deletes(spark, tmp_path):
    """An equality-delete file inside the stepped range refuses loudly
    (value-keyed coverage is not position-diffable) — the batch feed's
    boundary."""
    b = _Builder(str(tmp_path / "eq"))
    f1 = b.data_file("f1.parquet", [1, 2], 2000)
    eq = os.path.join(b.root, "data", "eq-del.parquet")
    pq.write_table(pa.table({"k": pa.array([1], pa.int64())}), eq)
    m1 = b.manifest("m1.avro", [(1, f1, {"year": 2000}, 2, 0)])
    b.snapshot(100, [m1])
    me = b.manifest(
        "me.avro",
        [(1, eq, {"year": None}, 1, 2)],
        seqs=[2],
        equality_ids=[[1]],
    )
    b.snapshot(200, [m1, me], contents=[0, 1])
    b.commit(current_snapshot_id=200)

    from species_range_data_pipeline_spark.sources.iceberg_log import (
        _current_schema,
        _load_metadata,
        _struct_type,
    )

    schema = _cdf_schema(
        _struct_type(_current_schema(_load_metadata(b.root), b.root))
    )
    reader = IcebergCdfTailStreamReader({"path": b.root}, schema)
    with pytest.raises(NotImplementedError, match="equality-delete"):
        reader.partitions({"snapshot_id": 100}, {"snapshot_id": 200})


def test_ice_cdf_tail_expired_snapshot_raises(spark, tmp_path):
    """A checkpointed snapshot id no longer in the metadata fails with
    a fresh-checkpoint instruction rather than re-emitting or gapping."""
    b = _history_table(tmp_path, "expired")
    from species_range_data_pipeline_spark.sources.iceberg_log import (
        _current_schema,
        _load_metadata,
        _struct_type,
    )

    schema = _cdf_schema(
        _struct_type(_current_schema(_load_metadata(b.root), b.root))
    )
    reader = IcebergCdfTailStreamReader({"path": b.root}, schema)
    with pytest.raises(ValueError, match="no longer in"):
        reader.partitions({"snapshot_id": 99}, {"snapshot_id": 400})


def test_ice_cdf_tail_migrated_layout_refused(spark, tmp_path):
    """A data file lacking its identity-partition source column
    (migrated layout) refuses at planning — the feed cannot restore
    manifest partition tuples."""
    b = _Builder(str(tmp_path / "mig"))
    stripped = os.path.join(b.root, "data", "stripped.parquet")
    pq.write_table(
        pa.table(
            {"k": pa.array([1], pa.int64()), "v": pa.array(["a"])}
        ),
        stripped,
    )
    m1 = b.manifest("m1.avro", [(1, stripped, {"year": 2000}, 1, 0)])
    b.snapshot(100, [m1])
    b.commit(current_snapshot_id=100)

    from species_range_data_pipeline_spark.sources.iceberg_log import (
        _current_schema,
        _load_metadata,
        _struct_type,
    )

    schema = _cdf_schema(
        _struct_type(_current_schema(_load_metadata(b.root), b.root))
    )
    reader = IcebergCdfTailStreamReader({"path": b.root}, schema)
    with pytest.raises(NotImplementedError, match="identity-partition"):
        reader.partitions({"snapshot_id": None}, {"snapshot_id": 100})
