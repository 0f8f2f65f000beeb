"""Streaming tail over a foreign Delta log (`sources/delta_stream.py`):
version offsets, exactly-once restart, the append-only contract
(skipChangeCommits), compaction skipping, and partition/schema
restoration in the per-file reader.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from species_range_data_pipeline_spark.sources.delta_stream import (
    DeltaTailStreamReader,
    register_delta_stream_source,
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


def _meta(fields, partition_cols=()):
    return {
        "metaData": {
            "id": "00000000-0000-0000-0000-000000000000",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": _schema_string(fields),
            "partitionColumns": list(partition_cols),
            "configuration": {},
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


def _partitioned_table(tmp_path, name="t"):
    table = str(tmp_path / name)
    os.makedirs(table, exist_ok=True)
    fields = [("k", "long"), ("y", "integer")]
    a1 = _data_file(
        table, "y=2020/f0.parquet", {"k": [1, 2]}, {"y": "2020"}
    )
    a2 = _data_file(table, "y=2021/f1.parquet", {"k": [3]}, {"y": "2021"})
    _commit(table, 0, [_PROTOCOL, _meta(fields, ["y"]), a1, a2])
    a3 = _data_file(table, "y=2021/f2.parquet", {"k": [4]}, {"y": "2021"})
    _commit(table, 1, [a3])
    return table, fields


def test_delta_tail_reads_versions_exactly_once(spark, tmp_path):
    """Each commit's added files stream exactly once (restart from the
    checkpoint picks up only versions landed while the stream was
    down), with partition values restored per file."""
    register_delta_stream_source(spark)
    table, fields = _partitioned_table(tmp_path)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run_once():
        q = (
            spark.readStream.format("delta_tail")
            .option("path", table)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    got = {(r.k, r.y) for r in spark.read.parquet(out).collect()}
    assert got == {(1, 2020), (2, 2020), (3, 2021), (4, 2021)}

    # v2 lands while the stream is down -> restart reads ONLY v2
    a4 = _data_file(table, "y=2022/f3.parquet", {"k": [9]}, {"y": "2022"})
    _commit(table, 2, [a4])
    run_once()
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 5  # nothing replayed twice
    assert {(r.k, r.y) for r in rows} == {
        (1, 2020),
        (2, 2020),
        (3, 2021),
        (4, 2021),
        (9, 2022),
    }


def test_delta_tail_change_commit_fails_or_skips(spark, tmp_path):
    """A dataChange remove (or a DV add) is not representable as an
    append stream: default fails loudly naming the option; with
    skipChangeCommits the version contributes nothing; a compaction
    (dataChange=false on both sides) is silently skipped either way."""
    from pyspark.sql.types import StructType

    table, fields = _partitioned_table(tmp_path, "chg")
    # v2: DELETE (dataChange remove)
    _commit(
        table,
        2,
        [{"remove": {"path": "y=2020/f0.parquet", "dataChange": True}}],
    )
    # v3: compaction — rewrite y=2021 files with dataChange=false
    comp = _data_file(
        table,
        "y=2021/compact.parquet",
        {"k": [3, 4]},
        {"y": "2021"},
        data_change=False,
    )
    _commit(
        table,
        3,
        [
            comp,
            {"remove": {"path": "y=2021/f1.parquet", "dataChange": False}},
            {"remove": {"path": "y=2021/f2.parquet", "dataChange": False}},
        ],
    )
    # v4: a fresh append after the noise
    a5 = _data_file(table, "y=2023/f5.parquet", {"k": [7]}, {"y": "2023"})
    _commit(table, 4, [a5])

    schema = StructType.fromJson(
        json.loads(_schema_string(fields))
    )
    reader = DeltaTailStreamReader({"path": table}, schema)
    with pytest.raises(ValueError, match="skipChangeCommits"):
        reader.partitions({"version": 1}, {"version": 4})

    skip = DeltaTailStreamReader(
        {"path": table, "skipChangeCommits": "true"}, schema
    )
    parts = skip.partitions({"version": 1}, {"version": 4})
    rows = [t for p in parts for b in skip.read(p) for t in b.to_pylist()]
    # v2 skipped (change), v3 contributes nothing (compaction), v4 streams
    assert [(r["k"], r["y"]) for r in rows] == [(7, 2023)]

    # a DV add is a change commit too
    from species_range_data_pipeline_spark.sources.dv import (
        make_inline_descriptor,
    )

    add_dv = _data_file(
        table, "y=2023/f6.parquet", {"k": [8]}, {"y": "2023"}
    )
    add_dv["add"]["deletionVector"] = make_inline_descriptor([0])
    _commit(table, 5, [add_dv])
    with pytest.raises(ValueError, match="skipChangeCommits"):
        reader.partitions({"version": 4}, {"version": 5})
    assert skip.partitions({"version": 4}, {"version": 5}) == []


def test_delta_tail_schema_evolution_pads_nulls(spark, tmp_path):
    """A file written before ADD COLUMN is null-padded to the committed
    schema in the per-file reader, matching the batch read path; a
    vacuumed commit inside the range raises instead of gapping."""
    from pyspark.sql.types import StructType

    table = str(tmp_path / "evo")
    os.makedirs(table, exist_ok=True)
    a0 = _data_file(table, "f0.parquet", {"k": [1]})
    _commit(table, 0, [_PROTOCOL, _meta([("k", "long")]), a0])
    a1 = _data_file(table, "f1.parquet", {"k": [2], "extra": [9]})
    _commit(table, 1, [_meta([("k", "long"), ("extra", "long")]), a1])

    schema = StructType.fromJson(
        json.loads(_schema_string([("k", "long"), ("extra", "long")]))
    )
    reader = DeltaTailStreamReader({"path": table}, schema)
    parts = reader.partitions({"version": -1}, {"version": 1})
    rows = sorted(
        (t["k"], t["extra"])
        for p in parts
        for b in reader.read(p)
        for t in b.to_pylist()
    )
    assert rows == [(1, None), (2, 9)]

    os.remove(os.path.join(table, "_delta_log", f"{0:020d}.json"))
    with pytest.raises(ValueError, match="no JSON commit"):
        reader.partitions({"version": -1}, {"version": 1})


def test_delta_tail_rejects_unknown_file_columns(spark, tmp_path):
    """A file holding a column the committed schema lacks is an
    out-of-spec RENAME/DROP: the per-file reader refuses (ADVICE r17)
    instead of null-padding the renamed column like the legal
    ADD-COLUMN case — matching the batch path's footer probe."""
    from pyspark.sql.types import StructType

    table = str(tmp_path / "badcol")
    os.makedirs(table, exist_ok=True)
    a0 = _data_file(table, "f0.parquet", {"k": [1], "old_name": [9]})
    _commit(table, 0, [_PROTOCOL, _meta([("k", "long"), ("new_name", "long")]), a0])
    schema = StructType.fromJson(
        json.loads(_schema_string([("k", "long"), ("new_name", "long")]))
    )
    reader = DeltaTailStreamReader({"path": table}, schema)
    (part,) = reader.partitions({"version": -1}, {"version": 0})
    with pytest.raises(NotImplementedError, match="rename/drop"):
        list(reader.read(part))


def test_delta_tail_mid_log_start_seeds_batch_start_pcols(spark, tmp_path):
    """A stream starting mid-log reconstructs partitionValues for its
    batch range under the partition-column list AT THE BATCH-START
    version, not the latest snapshot's (ADVICE r17: a later metaData
    change — reachable via skipChangeCommits — would otherwise drop
    the old partition column from every reconstructed row)."""
    from pyspark.sql.types import StructType

    table, fields = _partitioned_table(tmp_path, "midlog")
    # v2: repartition to UNPARTITIONED (metaData change + rewrite)
    comp = _data_file(
        table, "flat.parquet", {"k": [1, 2, 3, 4], "y": [2020, 2020, 2021, 2021]}
    )
    _commit(
        table,
        2,
        [
            _meta(fields, []),
            comp,
            {"remove": {"path": "y=2020/f0.parquet", "dataChange": True}},
            {"remove": {"path": "y=2021/f1.parquet", "dataChange": True}},
            {"remove": {"path": "y=2021/f2.parquet", "dataChange": True}},
        ],
    )
    schema = StructType.fromJson(json.loads(_schema_string(fields)))
    # batch covers ONLY v1, a version partitioned by y
    reader = DeltaTailStreamReader(
        {"path": table, "startingVersion": 1, "skipChangeCommits": "true"},
        schema,
    )
    parts = reader.partitions({"version": 0}, {"version": 1})
    rows = [t for p in parts for b in reader.read(p) for t in b.to_pylist()]
    assert [(r["k"], r["y"]) for r in rows] == [(4, 2021)]


def test_delta_tail_refuses_column_mapped_table(spark, tmp_path):
    """The per-file streaming reader does not resolve column mapping
    (the batch readers do): a mapped table refuses loudly instead of
    mis-resolving physical names."""
    from pyspark.sql.types import StructType

    table = str(tmp_path / "cmref")
    os.makedirs(table, exist_ok=True)
    meta = {
        "metaData": {
            "id": "0" * 32,
            "format": {"provider": "parquet", "options": {}},
            "schemaString": _schema_string([("k", "long")]),
            "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "name"},
        }
    }
    a0 = _data_file(table, "f0.parquet", {"k": [1]})
    _commit(
        table,
        0,
        [{"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}}, meta, a0],
    )
    schema = StructType.fromJson(json.loads(_schema_string([("k", "long")])))
    reader = DeltaTailStreamReader({"path": table}, schema)
    with pytest.raises(NotImplementedError, match="column-mapped"):
        reader.partitions({"version": -1}, {"version": 0})
