"""Measure the r17 row-level-delete surfaces' scale claims (SCALE.md
rule 62) — the argued->measured discipline for:

1. **Foreign-Delta CDF cost scales with files TOUCHED, not table
   size** (`read_delta_changes` docstring): a history whose v1
   rewrites ONE file is diffed at 16 vs 160 untouched sibling files;
   the feed wall must stay ~flat under the 10x growth.
2. **Position-delete / deletion-vector masks ride the broadcast side
   of ONE data scan**: at both scales, (a) an identity-partition point
   read of an Iceberg merge-on-read table (delete manifest present)
   must stay flat — pruning still happens before Spark sees a file
   list, deletes notwithstanding; (b) the full-scan overhead of the
   mask (masked table vs a no-deletes twin of identical data) must be
   a bounded constant factor, not a growth term.

Protocol: interleaved arms within each scale, medians of 5 after one
discarded warm-up, noop sink (rule: never time .count()).  Prints one
JSON line.

Usage: python scripts/lakehouse_deletes_sweep.py [rows_per_file]
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
from species_range_data_pipeline_spark.sources.delta_log import (  # noqa: E402
    read_delta_changes,
    read_delta_table,
)
from species_range_data_pipeline_spark.sources.iceberg_log import (  # noqa: E402
    read_iceberg_table,
)

SCALES = (16, 160)
ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 512


def _jsonl(path, actions):
    with open(path, "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")


def _delta_cdf_table(root: str, n_files: int) -> str:
    """v0: n_files files; v1: ONE file rewritten with half its rows."""
    table = os.path.join(root, f"delta{n_files}")
    os.makedirs(os.path.join(table, "_delta_log"))
    schema_json = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "k", "type": "long", "nullable": True, "metadata": {}},
                {"name": "v", "type": "long", "nullable": True, "metadata": {}},
            ],
        }
    )
    adds = []
    for i in range(n_files):
        rel = f"f{i:04d}.parquet"
        ks = list(range(i * ROWS, (i + 1) * ROWS))
        pq.write_table(
            pa.table({"k": pa.array(ks, pa.int64()),
                      "v": pa.array([x * 2 for x in ks], pa.int64())}),
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
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {
                "metaData": {
                    "id": "0" * 32,
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": schema_json,
                    "partitionColumns": [],
                    "configuration": {},
                }
            },
            *adds,
        ],
    )
    # v1 rewrites file 0: keep even-k rows only
    ks = [k for k in range(ROWS) if k % 2 == 0]
    rel = "f0000-rewrite.parquet"
    pq.write_table(
        pa.table({"k": pa.array(ks, pa.int64()),
                  "v": pa.array([x * 2 for x in ks], pa.int64())}),
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


_MLIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "content", "type": "int"},
        {"name": "added_snapshot_id", "type": "long"},
    ],
}

_MAN_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"], "default": None},
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
                ],
            },
        },
    ],
}


def _iceberg_mor_table(root: str, n_files: int, with_deletes: bool) -> str:
    """One identity-partitioned data file per `part` value; optionally a
    delete manifest masking 10% of every file's rows."""
    tag = "mor" if with_deletes else "plain"
    table = os.path.join(root, f"ice_{tag}{n_files}")
    mdir = os.path.join(table, "metadata")
    ddir = os.path.join(table, "data")
    os.makedirs(mdir)
    os.makedirs(ddir)
    entries, del_rows = [], []
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
        entries.append((1, fp, {"part": i}, ROWS, 0))
        del_rows += [(fp, p) for p in range(0, ROWS, 10)]
    manifests, contents = [], []
    m1 = os.path.join(mdir, "m1.avro")
    write_avro(
        [
            {
                "status": st,
                "snapshot_id": None,
                "data_file": {
                    "content": c,
                    "file_path": fp,
                    "file_format": "PARQUET",
                    "partition": part,
                    "record_count": n,
                    "file_size_in_bytes": os.path.getsize(fp),
                },
            }
            for st, fp, part, n, c in entries
        ],
        _MAN_SCHEMA,
        m1,
    )
    manifests.append(m1)
    contents.append(0)
    if with_deletes:
        pd_path = os.path.join(ddir, "pos-del.parquet")
        pq.write_table(
            pa.table(
                {
                    "file_path": pa.array([f for f, _ in del_rows]),
                    "pos": pa.array([p for _, p in del_rows], pa.int64()),
                }
            ),
            pd_path,
        )
        md = os.path.join(mdir, "md.avro")
        write_avro(
            [
                {
                    "status": 1,
                    "snapshot_id": None,
                    "data_file": {
                        "content": 1,
                        "file_path": pd_path,
                        "file_format": "PARQUET",
                        "partition": {"part": None},
                        "record_count": len(del_rows),
                        "file_size_in_bytes": os.path.getsize(pd_path),
                    },
                }
            ],
            _MAN_SCHEMA,
            md,
        )
        manifests.append(md)
        contents.append(1)
    mlist = os.path.join(mdir, "snap-1.avro")
    write_avro(
        [
            {
                "manifest_path": m,
                "manifest_length": os.path.getsize(m),
                "partition_spec_id": 0,
                "content": c,
                "added_snapshot_id": 1,
            }
            for m, c in zip(manifests, contents)
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


def main() -> None:
    spark = get_spark("lakehouse_deletes_sweep")
    root = tempfile.mkdtemp(prefix="lh_del_sweep_")
    out: dict = {"experiment": "lakehouse_deletes_sweep", "rows_per_file": ROWS}
    try:
        def timed(fn, reps=5):
            fn()  # warm-up, discarded
            samples = []
            for _ in range(reps):
                t0 = time.perf_counter()
                fn()
                samples.append(round(time.perf_counter() - t0, 4))
            return statistics.median(samples)

        staged = {
            n: (
                _delta_cdf_table(root, n),
                _iceberg_mor_table(root, n, with_deletes=True),
                _iceberg_mor_table(root, n, with_deletes=False),
            )
            for n in SCALES
        }
        # SESSION warm-up: one throwaway pass of every arm shape before
        # any timing, so the first scale's cells don't absorb the
        # session's codegen/broadcast-machinery spin-up (the first cut
        # of this sweep read a 13x mask overhead at the small scale
        # that was really first-queries-of-the-session cost)
        dt0, ice0, plain0 = staged[SCALES[0]]
        read_delta_changes(spark, dt0, 0).write.format("noop").mode(
            "overwrite"
        ).save()
        read_iceberg_table(spark, ice0, filters=[("part", "=", 1)]).write.format(
            "noop"
        ).mode("overwrite").save()
        read_iceberg_table(spark, ice0).write.format("noop").mode(
            "overwrite"
        ).save()
        read_iceberg_table(spark, plain0).write.format("noop").mode(
            "overwrite"
        ).save()

        for n in SCALES:
            dt, ice, plain = staged[n]
            key = str(n)
            out[key] = {}
            # interleave the arms at this scale
            out[key]["cdf_feed_sec"] = timed(
                lambda: read_delta_changes(spark, dt, 0)
                .write.format("noop").mode("overwrite").save()
            )
            out[key]["mor_point_read_sec"] = timed(
                lambda: read_iceberg_table(
                    spark, ice, filters=[("part", "=", 1)]
                ).write.format("noop").mode("overwrite").save()
            )
            out[key]["mor_full_scan_sec"] = timed(
                lambda: read_iceberg_table(spark, ice)
                .write.format("noop").mode("overwrite").save()
            )
            out[key]["plain_full_scan_sec"] = timed(
                lambda: read_iceberg_table(spark, plain)
                .write.format("noop").mode("overwrite").save()
            )
        lo, hi = (out[str(s)] for s in SCALES)
        out["growth"] = {
            "cdf_feed": round(hi["cdf_feed_sec"] / lo["cdf_feed_sec"], 3),
            "mor_point_read": round(
                hi["mor_point_read_sec"] / lo["mor_point_read_sec"], 3
            ),
            "mor_full_scan": round(
                hi["mor_full_scan_sec"] / lo["mor_full_scan_sec"], 3
            ),
            "mask_overhead_at_hi": round(
                hi["mor_full_scan_sec"] / hi["plain_full_scan_sec"], 3
            ),
            "mask_overhead_at_lo": round(
                lo["mor_full_scan_sec"] / lo["plain_full_scan_sec"], 3
            ),
            # the claim is about the ABSOLUTE mask cost: a broadcast
            # anti-join adds a fixed job floor, not a per-file term
            "mask_overhead_abs_lo_sec": round(
                lo["mor_full_scan_sec"] - lo["plain_full_scan_sec"], 4
            ),
            "mask_overhead_abs_hi_sec": round(
                hi["mor_full_scan_sec"] - hi["plain_full_scan_sec"], 4
            ),
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
