"""Streaming change-data-feed over a foreign Delta log
(`sources/delta_cdf_stream.py`): version offsets, batch-feed parity
(insert/delete/rewrite/DV steps), exactly-once restart, compaction
skipping, and the column-mapping refusal.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from species_range_data_pipeline_spark.sources.delta_cdf_stream import (
    DeltaCdfTailStreamReader,
    register_delta_cdf_stream_source,
)

_PROTOCOL = {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}


def _schema_string(fields):
    return json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": n, "type": t, "nullable": True, "metadata": {}}
                for n, t in fields
            ],
        }
    )


def _meta(fields, partition_cols=(), configuration=None):
    return {
        "metaData": {
            "id": "00000000-0000-0000-0000-000000000000",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": _schema_string(fields),
            "partitionColumns": list(partition_cols),
            "configuration": configuration or {},
        }
    }


def _commit(table, version, actions):
    log = os.path.join(table, "_delta_log")
    os.makedirs(log, exist_ok=True)
    with open(os.path.join(log, f"{version:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")


def _data_file(table, rel, cols: dict, pvalues=None, data_change=True):
    fpath = os.path.join(table, rel)
    if os.path.dirname(fpath):
        os.makedirs(os.path.dirname(fpath), exist_ok=True)
    pq.write_table(pa.table(cols), fpath)
    return {
        "add": {
            "path": rel,
            "partitionValues": pvalues or {},
            "size": os.path.getsize(fpath),
            "modificationTime": 0,
            "dataChange": data_change,
        }
    }


def _history_table(tmp_path, name="t"):
    """v0 insert f1(k 1..3) / v1 insert f2(k 4) / v2 delete f1 /
    v3 update f2 (rewrite d -> D) / v4 DV on f3 masking its row."""
    from species_range_data_pipeline_spark.sources.dv import (
        make_inline_descriptor,
    )

    table = str(tmp_path / name)
    os.makedirs(table, exist_ok=True)
    fields = [("k", "long"), ("v", "string")]
    a1 = _data_file(table, "f1.parquet", {"k": [1, 2, 3], "v": ["a", "b", "c"]})
    _commit(table, 0, [_PROTOCOL, _meta(fields), a1])
    a2 = _data_file(table, "f2.parquet", {"k": [4], "v": ["d"]})
    _commit(table, 1, [a2])
    _commit(table, 2, [{"remove": {"path": "f1.parquet", "dataChange": True}}])
    a3 = _data_file(table, "f3.parquet", {"k": [4], "v": ["D"]})
    _commit(
        table, 3, [a3, {"remove": {"path": "f2.parquet", "dataChange": True}}]
    )
    add_dv = {"add": dict(a3["add"], deletionVector=make_inline_descriptor([0]))}
    _commit(
        table, 4,
        [add_dv, {"remove": {"path": "f3.parquet", "dataChange": True}}],
    )
    return table, fields


def _drain(spark, table, out, ckpt, starting=None):
    reader = (
        spark.readStream.format("delta_cdf_tail").option("path", table)
    )
    if starting is not None:
        reader = reader.option("startingVersion", str(starting))
    q = (
        reader.load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_cdf_tail_matches_batch_feed(spark, tmp_path):
    """The streamed feed over (0, latest] equals the batch
    read_delta_changes rows exactly — inserts, file deletes, the
    update rewrite (delete-pre + insert-post of the changed row only),
    and the deletion-vector rewrite (exactly its newly-masked row)."""
    from species_range_data_pipeline_spark.sources.delta_log import (
        read_delta_changes,
    )

    register_delta_cdf_stream_source(spark)
    table, _fields = _history_table(tmp_path)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(spark, table, out, ckpt, starting=1)
    got = sorted(
        (r.k, r.v, r._change_type, r._commit_version)
        for r in spark.read.parquet(out).collect()
    )
    want = sorted(
        (r.k, r.v, r._change_type, r._commit_version)
        for r in read_delta_changes(spark, table, 0).collect()
    )
    assert got == want


def test_cdf_tail_restart_exactly_once(spark, tmp_path):
    """Changes landing while the stream is down are picked up by the
    checkpointed restart exactly once — nothing replayed twice."""
    register_delta_cdf_stream_source(spark)
    table, fields = _history_table(tmp_path, "restart")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(spark, table, out, ckpt)
    first = spark.read.parquet(out).count()

    a4 = _data_file(table, "f4.parquet", {"k": [9], "v": ["z"]})
    _commit(table, 5, [a4])
    _drain(spark, table, out, ckpt)
    rows = spark.read.parquet(out).collect()
    assert len(rows) == first + 1
    assert {(r.k, r._change_type, r._commit_version) for r in rows} >= {
        (9, "insert", 5)
    }


def test_cdf_tail_skips_compaction_without_reading(spark, tmp_path):
    """A dataChange=false rewrite is a physical reorganization with no
    logical change: the step emits nothing, decided from the commit
    JSON alone (no snapshot replay, no file read)."""
    from pyspark.sql.types import StructType

    table = str(tmp_path / "compact")
    os.makedirs(table, exist_ok=True)
    fields = [("k", "long")]
    a1 = _data_file(table, "f1.parquet", {"k": [1]})
    a2 = _data_file(table, "f2.parquet", {"k": [2]})
    _commit(table, 0, [_PROTOCOL, _meta(fields), a1, a2])
    comp = _data_file(table, "f12.parquet", {"k": [1, 2]}, data_change=False)
    _commit(
        table,
        1,
        [
            comp,
            {"remove": {"path": "f1.parquet", "dataChange": False}},
            {"remove": {"path": "f2.parquet", "dataChange": False}},
        ],
    )
    a3 = _data_file(table, "f3.parquet", {"k": [3]})
    _commit(table, 2, [a3])

    schema = StructType.fromJson(
        json.loads(
            _schema_string(fields)
        )
    )
    from species_range_data_pipeline_spark.sources.delta_cdf_stream import (
        _cdf_schema,
    )

    reader = DeltaCdfTailStreamReader({"path": table}, _cdf_schema(schema))
    parts = reader.partitions({"version": 0}, {"version": 2})
    # only v2's insert; the compaction contributed no partition at all
    assert [p.version for p in parts] == [2]
    rows = [t for p in parts for b in reader.read(p) for t in b.to_pylist()]
    assert [(r["k"], r["_change_type"]) for r in rows] == [(3, "insert")]


def test_cdf_tail_refuses_column_mapping(spark, tmp_path):
    """Column-mapped tables refuse loudly (the batch feed resolves the
    mapping; this per-file reader does not)."""
    from pyspark.sql.types import StructType

    from species_range_data_pipeline_spark.sources.delta_cdf_stream import (
        _cdf_schema,
    )

    table = str(tmp_path / "cm")
    os.makedirs(table, exist_ok=True)
    fields = [("k", "long")]
    a0 = _data_file(table, "f0.parquet", {"k": [1]})
    _commit(
        table,
        0,
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            _meta(
                fields,
                configuration={"delta.columnMapping.mode": "name"},
            ),
            a0,
        ],
    )
    schema = StructType.fromJson(json.loads(_schema_string(fields)))
    reader = DeltaCdfTailStreamReader({"path": table}, _cdf_schema(schema))
    with pytest.raises(NotImplementedError, match="column-mapped"):
        reader.partitions({"version": -1}, {"version": 0})
