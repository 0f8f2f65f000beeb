"""Measure the r18 lakehouse surfaces' scale claims (SCALE.md rule 63)
— the argued->measured discipline for:

1. **The equality-delete mask is delete-file-sized, not table-sized**
   (`iceberg_log._apply_equality_deletes` docstring): a FIXED 256-key
   equality-delete file over 16 vs 160 data files must add a ~flat
   ABSOLUTE overhead to the full scan vs a no-deletes twin of
   identical data (one broadcast anti join + one broadcast seq-map
   join — floors, not growth terms).
2. **Partition pruning still runs before Spark sees a file list when
   equality deletes are present**: an identity-partition point read
   (`part = 1`) must stay ~flat under the 10x file growth.
3. **The streaming CDF tail costs the files each commit TOUCHED**
   (`delta_cdf_stream` docstring): draining the one-file-rewrite
   commit with ``startingVersion`` past the base load must stay ~flat
   at 16 vs 160 untouched sibling files.
4. **Name-mode column mapping is alias-only at scan time**
   (`delta_log._read_files`): a mapped table's full scan vs an
   unmapped twin of identical data must read ~1.0x at both scales
   (the mapping adds one projection, no shuffle, no Python).

Protocol: interleaved arms within each scale, medians of 5 after one
discarded warm-up, noop sink for batch arms (never time .count()),
fresh checkpoint + memory sink per streaming cell.  Prints one JSON
line.

Usage: python scripts/r18_lakehouse_sweep.py [rows_per_file]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from species_range_data_pipeline_spark.session import get_spark  # noqa: E402
from species_range_data_pipeline_spark.sources.avro_ocf import (  # noqa: E402
    write_avro,
)
from species_range_data_pipeline_spark.sources.delta_cdf_stream import (  # noqa: E402
    register_delta_cdf_stream_source,
)
from species_range_data_pipeline_spark.sources.delta_log import (  # noqa: E402
    read_delta_table,
)
from species_range_data_pipeline_spark.sources.iceberg_log import (  # noqa: E402
    read_iceberg_table,
)

SCALES = (16, 160)
ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 512
EQ_KEYS = 256  # fixed-size equality-delete file, both scales


def _jsonl(path, actions):
    with open(path, "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")


_MLIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "content", "type": "int"},
        {"name": "sequence_number", "type": ["null", "long"], "default": None},
        {"name": "added_snapshot_id", "type": "long"},
    ],
}

_MAN_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"], "default": None},
        {"name": "sequence_number", "type": ["null", "long"], "default": None},
        {
            "name": "data_file",
            "type": {
                "type": "record",
                "name": "r2",
                "fields": [
                    {"name": "content", "type": "int"},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {
                        "name": "partition",
                        "type": {
                            "type": "record",
                            "name": "r102",
                            "fields": [
                                {
                                    "name": "part",
                                    "type": ["null", "int"],
                                    "default": None,
                                }
                            ],
                        },
                    },
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                    {
                        "name": "equality_ids",
                        "type": ["null", {"type": "array", "items": "int"}],
                        "default": None,
                    },
                ],
            },
        },
    ],
}


def _iceberg_eq_table(root: str, n_files: int, with_deletes: bool) -> str:
    """One identity-partitioned data file per `part`; optionally an
    equality-delete manifest (seq 2 over data seq 1) whose FIXED-size
    delete file names EQ_KEYS keys spread across the table."""
    tag = "eq" if with_deletes else "plain"
    table = os.path.join(root, f"ice_{tag}{n_files}")
    mdir = os.path.join(table, "metadata")
    ddir = os.path.join(table, "data")
    os.makedirs(mdir)
    os.makedirs(ddir)
    entries = []
    total = n_files * ROWS
    for i in range(n_files):
        fp = os.path.join(ddir, f"d{i:04d}.parquet")
        ks = list(range(i * ROWS, (i + 1) * ROWS))
        pq.write_table(
            pa.table(
                {
                    "k": pa.array(ks, pa.int64()),
                    "part": pa.array([i] * ROWS, pa.int32()),
                    "v": pa.array([x * 2 for x in ks], pa.int64()),
                }
            ),
            fp,
        )
        entries.append((fp, {"part": i}, ROWS))
    manifests, contents, seqs = [], [], []
    m1 = os.path.join(mdir, "m1.avro")
    write_avro(
        [
            {
                "status": 1,
                "snapshot_id": None,
                "sequence_number": None,  # inherit 1 from the list
                "data_file": {
                    "content": 0,
                    "file_path": fp,
                    "file_format": "PARQUET",
                    "partition": part,
                    "record_count": n,
                    "file_size_in_bytes": os.path.getsize(fp),
                    "equality_ids": None,
                },
            }
            for fp, part, n in entries
        ],
        _MAN_SCHEMA,
        m1,
    )
    manifests.append(m1)
    contents.append(0)
    seqs.append(1)
    if with_deletes:
        step = max(1, total // EQ_KEYS)
        keys = list(range(0, total, step))[:EQ_KEYS]
        ed = os.path.join(ddir, "eq-del.parquet")
        pq.write_table(
            pa.table({"k": pa.array(keys, pa.int64())}), ed
        )
        md = os.path.join(mdir, "md.avro")
        write_avro(
            [
                {
                    "status": 1,
                    "snapshot_id": None,
                    "sequence_number": None,  # inherit 2
                    "data_file": {
                        "content": 2,
                        "file_path": ed,
                        "file_format": "PARQUET",
                        "partition": {"part": None},
                        "record_count": len(keys),
                        "file_size_in_bytes": os.path.getsize(ed),
                        "equality_ids": [1],
                    },
                }
            ],
            _MAN_SCHEMA,
            md,
        )
        manifests.append(md)
        contents.append(1)
        seqs.append(2)
    mlist = os.path.join(mdir, "snap-1.avro")
    write_avro(
        [
            {
                "manifest_path": m,
                "manifest_length": os.path.getsize(m),
                "partition_spec_id": 0,
                "content": c,
                "sequence_number": sq,
                "added_snapshot_id": 1,
            }
            for m, c, sq in zip(manifests, contents, seqs)
        ],
        _MLIST_SCHEMA,
        mlist,
    )
    with open(os.path.join(mdir, "v1.metadata.json"), "w") as fh:
        json.dump(
            {
                "format-version": 2,
                "table-uuid": "0" * 32,
                "location": table,
                "last-column-id": 3,
                "schemas": [
                    {
                        "type": "struct",
                        "schema-id": 0,
                        "fields": [
                            {"id": 1, "name": "k", "required": False,
                             "type": "long"},
                            {"id": 2, "name": "part", "required": False,
                             "type": "int"},
                            {"id": 3, "name": "v", "required": False,
                             "type": "long"},
                        ],
                    }
                ],
                "current-schema-id": 0,
                "partition-specs": [
                    {
                        "spec-id": 0,
                        "fields": [
                            {"name": "part", "transform": "identity",
                             "source-id": 2, "field-id": 1000}
                        ],
                    }
                ],
                "default-spec-id": 0,
                "snapshots": [
                    {
                        "snapshot-id": 1,
                        "timestamp-ms": 1700000000000,
                        "manifest-list": mlist,
                        "summary": {"operation": "append"},
                    }
                ],
                "current-snapshot-id": 1,
            },
            fh,
        )
    with open(os.path.join(mdir, "version-hint.text"), "w") as fh:
        fh.write("1")
    return table


def _delta_table(root: str, n_files: int, mapped: bool) -> str:
    """n_files unpartitioned files + a one-file-rewrite v1 commit.
    ``mapped=True`` writes the same data under physical names with
    name-mode column mapping."""
    tag = "cm" if mapped else "plain"
    table = os.path.join(root, f"delta_{tag}{n_files}")
    os.makedirs(os.path.join(table, "_delta_log"))
    kcol = "col-1" if mapped else "k"
    vcol = "col-2" if mapped else "v"

    def _field(name, phys, i):
        md = (
            {
                "delta.columnMapping.physicalName": phys,
                "delta.columnMapping.id": i,
            }
            if mapped
            else {}
        )
        return {"name": name, "type": "long", "nullable": True,
                "metadata": md}

    schema_json = json.dumps(
        {
            "type": "struct",
            "fields": [_field("k", "col-1", 1), _field("v", "col-2", 2)],
        }
    )
    conf = (
        {"delta.columnMapping.mode": "name",
         "delta.columnMapping.maxColumnId": "2"}
        if mapped
        else {}
    )
    adds = []
    for i in range(n_files):
        rel = f"f{i:04d}.parquet"
        ks = list(range(i * ROWS, (i + 1) * ROWS))
        pq.write_table(
            pa.table({kcol: pa.array(ks, pa.int64()),
                      vcol: pa.array([x * 2 for x in ks], pa.int64())}),
            os.path.join(table, rel),
        )
        adds.append(
            {
                "add": {
                    "path": rel,
                    "partitionValues": {},
                    "size": os.path.getsize(os.path.join(table, rel)),
                    "modificationTime": 0,
                    "dataChange": True,
                }
            }
        )
    _jsonl(
        os.path.join(table, "_delta_log", f"{0:020d}.json"),
        [
            {
                "protocol": {
                    "minReaderVersion": 2 if mapped else 1,
                    "minWriterVersion": 5 if mapped else 2,
                }
            },
            {
                "metaData": {
                    "id": "0" * 32,
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": schema_json,
                    "partitionColumns": [],
                    "configuration": conf,
                }
            },
            *adds,
        ],
    )
    # v1 rewrites file 0: keep even-k rows only (the CDF stream's one
    # touched file)
    ks = [k for k in range(ROWS) if k % 2 == 0]
    rel = "f0000-rewrite.parquet"
    pq.write_table(
        pa.table({kcol: pa.array(ks, pa.int64()),
                  vcol: pa.array([x * 2 for x in ks], pa.int64())}),
        os.path.join(table, rel),
    )
    _jsonl(
        os.path.join(table, "_delta_log", f"{1:020d}.json"),
        [
            {
                "add": {
                    "path": rel,
                    "partitionValues": {},
                    "size": os.path.getsize(os.path.join(table, rel)),
                    "modificationTime": 0,
                    "dataChange": True,
                }
            },
            {"remove": {"path": "f0000.parquet", "dataChange": True}},
        ],
    )
    return table


def main() -> None:
    spark = get_spark("r18_lakehouse_sweep")
    register_delta_cdf_stream_source(spark)
    root = tempfile.mkdtemp(prefix="r18_lakehouse_sweep_")
    results: dict = {"experiment": "r18_lakehouse_sweep", "rows_per_file": ROWS}
    try:
        for n in SCALES:
            ice_eq = _iceberg_eq_table(root, n, True)
            ice_plain = _iceberg_eq_table(root, n, False)
            d_plain = _delta_table(root, n, False)
            d_cm = _delta_table(root, n, True)

            def t_noop(df) -> float:
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                return round(time.perf_counter() - t0, 3)

            def t_stream(table: str, i: int) -> float:
                ckpt = os.path.join(root, f"ck_{n}_{i}")
                sink = f"cdf_sweep_{n}_{i}"
                t0 = time.perf_counter()
                q = (
                    spark.readStream.format("delta_cdf_tail")
                    .option("path", table)
                    .option("startingVersion", "1")
                    .load()
                    .writeStream.format("memory")
                    .queryName(sink)
                    .outputMode("append")
                    .trigger(availableNow=True)
                    .option("checkpointLocation", ckpt)
                    .start()
                )
                q.awaitTermination(120)
                dt = round(time.perf_counter() - t0, 3)
                spark.catalog.dropTempView(sink)
                shutil.rmtree(ckpt, ignore_errors=True)
                return dt

            arms = {
                "eq_full_scan": lambda: t_noop(read_iceberg_table(spark, ice_eq)),
                "plain_full_scan": lambda: t_noop(
                    read_iceberg_table(spark, ice_plain)
                ),
                "eq_point_read": lambda: t_noop(
                    read_iceberg_table(
                        spark, ice_eq, filters=[("part", "=", 1)]
                    )
                ),
                "cm_full_scan": lambda: t_noop(read_delta_table(spark, d_cm)),
                "delta_plain_full_scan": lambda: t_noop(
                    read_delta_table(spark, d_plain)
                ),
            }
            per_arm: dict[str, list[float]] = {a: [] for a in arms}
            per_arm["cdf_stream_tail"] = []
            for a, fn in arms.items():  # warm-up, discarded
                fn()
            t_stream(d_plain, 9999)
            for rep in range(5):
                for a, fn in arms.items():
                    per_arm[a].append(fn())
                per_arm["cdf_stream_tail"].append(t_stream(d_plain, rep))
            results[f"files_{n}"] = {
                a: round(statistics.median(v), 3) for a, v in per_arm.items()
            }
        lo, hi = (results[f"files_{n}"] for n in SCALES)
        results["growth_under_10x"] = {
            a: round(hi[a] / lo[a], 2) for a in lo
        }
        results["eq_mask_absolute_overhead_sec"] = {
            f"files_{n}": round(
                results[f"files_{n}"]["eq_full_scan"]
                - results[f"files_{n}"]["plain_full_scan"],
                3,
            )
            for n in SCALES
        }
        results["cm_scan_ratio"] = {
            f"files_{n}": round(
                results[f"files_{n}"]["cm_full_scan"]
                / results[f"files_{n}"]["delta_plain_full_scan"],
                3,
            )
            for n in SCALES
        }
        print(json.dumps(results))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
