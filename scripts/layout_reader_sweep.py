"""Measured evidence for SCALE.md rule 61 (layout readers: metadata at
the driver, pruning before the scan).

Two claims the rule stated structurally, measured here:

1. **File skipping makes point reads metadata-bounded**: on a
   Delta-layout table whose per-file zone maps are disjoint, a point
   filter opens ONE file regardless of table size, so the filtered
   read's wall time stays ~flat under a 10x file-count growth while
   the unfiltered scan grows with the table.
2. **The driver-side replay is log-sized and cheap**: Delta JSON replay
   and Iceberg Avro manifest decode both scale linearly in file count
   at microseconds-to-milliseconds per file — the metadata walk is
   never the bottleneck the data scan is.

Table shape: F files x 512 rows, file i holding k in
[i*1000, i*1000+512), stats recorded in the log — so zone maps are
disjoint by construction and a point filter has exactly one candidate.
Arms F=32 and F=320 (10x), timings are medians of 5 alternating cells
(box-drift discipline).

Usage: python scripts/layout_reader_sweep.py
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from species_range_data_pipeline_spark.session import get_spark  # noqa: E402
from species_range_data_pipeline_spark.sources.delta_log import (  # noqa: E402
    _replay,
    delta_scan_files,
    read_delta_table,
)

ROWS = 512


def build_delta_table(root: str, n_files: int) -> str:
    table = os.path.join(root, f"delta_{n_files}")
    log = os.path.join(table, "_delta_log")
    os.makedirs(log)
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": "0" * 32,
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(
                    {
                        "type": "struct",
                        "fields": [
                            {"name": "k", "type": "long",
                             "nullable": True, "metadata": {}},
                            {"name": "v", "type": "double",
                             "nullable": True, "metadata": {}},
                        ],
                    }
                ),
                "partitionColumns": [],
                "configuration": {},
            }
        },
    ]
    for i in range(n_files):
        lo = i * 1000
        ks = list(range(lo, lo + ROWS))
        rel = f"part-{i:05d}.parquet"
        pq.write_table(
            pa.table(
                {"k": pa.array(ks, pa.int64()),
                 "v": pa.array([k * 0.5 for k in ks], pa.float64())}
            ),
            os.path.join(table, rel),
        )
        actions.append(
            {
                "add": {
                    "path": rel,
                    "partitionValues": {},
                    "size": os.path.getsize(os.path.join(table, rel)),
                    "modificationTime": 0,
                    "dataChange": True,
                    "stats": json.dumps(
                        {"numRecords": ROWS,
                         "minValues": {"k": lo},
                         "maxValues": {"k": lo + ROWS - 1},
                         "nullCount": {"k": 0}}
                    ),
                }
            }
        )
    with open(os.path.join(log, f"{0:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    return table


def timed(fn, cells: int = 5) -> float:
    fn()  # warm-up, discarded
    return round(
        statistics.median(
            (lambda t0: (fn(), time.perf_counter() - t0)[1])(
                time.perf_counter()
            )
            for _ in range(cells)
        ),
        4,
    )


def main() -> None:
    spark = get_spark("layout_reader_sweep")
    root = tempfile.mkdtemp(prefix="layout_sweep_")
    out: dict = {"metric": "layout_reader_pruning", "rows_per_file": ROWS}
    try:
        for n in (32, 320):
            table = build_delta_table(root, n)
            probe = (n // 2) * 1000 + 7  # mid-table point key
            filt = [("k", "=", probe)]
            assert len(delta_scan_files(table, filters=filt)) == 1
            # interleave the two read arms (box-drift discipline)
            point_cells, full_cells = [], []

            def point():
                read_delta_table(spark, table, filters=filt).write.format(
                    "noop"
                ).mode("overwrite").save()

            def full():
                read_delta_table(spark, table).write.format("noop").mode(
                    "overwrite"
                ).save()

            point(); full()  # warm-up
            for _ in range(5):
                t0 = time.perf_counter(); point()
                point_cells.append(time.perf_counter() - t0)
                t0 = time.perf_counter(); full()
                full_cells.append(time.perf_counter() - t0)
            replay = timed(lambda: _replay(table))
            out[f"files_{n}"] = {
                "point_read_sec": round(statistics.median(point_cells), 4),
                "full_scan_sec": round(statistics.median(full_cells), 4),
                "files_opened_point": 1,
                "log_replay_sec": replay,
            }
        g32, g320 = out["files_32"], out["files_320"]
        out["point_read_growth_10x"] = round(
            g320["point_read_sec"] / g32["point_read_sec"], 2
        )
        out["full_scan_growth_10x"] = round(
            g320["full_scan_sec"] / g32["full_scan_sec"], 2
        )
        out["replay_sec_per_file_at_320"] = round(
            g320["log_replay_sec"] / 320, 6
        )
        print(json.dumps(out))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
