"""Regression instrument for the deletion-vector mask's cost curve —
and the archived r17 adjudication that DELETED the all-JVM join path.

r17 built the DV mask twice: (a) a driver-exploded (path, pos)
broadcast anti-join (all-JVM), and (b) an Arrow-batched pandas filter
over broadcast COMPRESSED roaring bitmaps decoded lazily per executor.
Interleaved medians-of-5 on the same staged tables (8 files, both
paths verified row-identical first):

    positions   join     arrow   join/arrow   (200k rows/file)
    400         0.990 s  0.464 s   2.1x
    8,000       0.777 s  0.397 s   2.0x
    200,000     1.452 s  0.376 s   3.9x
    800,000     3.331 s  0.332 s  10.0x
    800 @ 1M rows/file (8M rows — the join's best case on paper):
                3.593 s  1.698 s   2.1x

The join path lost at EVERY rung: its driver explode + row broadcast
is a fixed cost the bitmap broadcast never pays, and its per-row
anti-join probe (url_decode + hash probe on two metadata columns) is
no cheaper than the Arrow batch.  Per the engine's
one-path-unless-measured rule the join variant was deleted rather
than kept behind a dispatch (`delta_log._apply_deletion_vectors`
docstring carries the citation).

What remains here measures the SURVIVING path's curve across the same
deleted-position ladder — broadcast payload (compressed bitmap bytes)
stays log-sized while wall stays ~flat in positions — so a future
regression in the mask shows up as a curve change.

Usage: python scripts/dv_path_crossover_sweep.py
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

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from species_range_data_pipeline_spark.session import get_spark  # noqa: E402
from species_range_data_pipeline_spark.sources import delta_log  # noqa: E402
from species_range_data_pipeline_spark.sources.dv import (  # noqa: E402
    encode_rbm_array,
    make_uuid_descriptor,
)

N_FILES = 8
ROWS = 200_000  # rows per file
#: deleted positions per file (total = N_FILES x this)
LADDER = (50, 1_000, 25_000, 100_000)


def _dv_table(root: str, per_file: int) -> str:
    table = os.path.join(root, f"t{per_file}")
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
    actions = [
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["deletionVectors"],
                "writerFeatures": ["deletionVectors"],
            }
        },
        {
            "metaData": {
                "id": "0" * 32,
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema_json,
                "partitionColumns": [],
                "configuration": {},
            }
        },
    ]
    stride = ROWS // per_file
    for i in range(N_FILES):
        rel = f"f{i:02d}.parquet"
        ks = list(range(i * ROWS, (i + 1) * ROWS))
        pq.write_table(
            pa.table({"k": pa.array(ks, pa.int64()),
                      "v": pa.array(ks, pa.int64())}),
            os.path.join(table, rel),
        )
        dv = make_uuid_descriptor(
            table, list(range(0, per_file * stride, stride))
        )
        actions.append(
            {
                "add": {
                    "path": rel,
                    "partitionValues": {},
                    "size": os.path.getsize(os.path.join(table, rel)),
                    "modificationTime": 0,
                    "dataChange": True,
                    "deletionVector": dv,
                }
            }
        )
    with open(
        os.path.join(table, "_delta_log", f"{0:020d}.json"), "w"
    ) as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    return table


def main() -> None:
    spark = get_spark("dv_path_crossover_sweep")
    root = tempfile.mkdtemp(prefix="dv_xover_")
    out: dict = {
        "experiment": "dv_path_crossover_sweep",
        "files": N_FILES,
        "rows_per_file": ROWS,
        "ladder": {},
    }
    try:
        def timed(fn, reps=5):
            fn()
            samples = []
            for _ in range(reps):
                t0 = time.perf_counter()
                fn()
                samples.append(round(time.perf_counter() - t0, 4))
            return statistics.median(samples)

        for per_file in LADDER:
            table = _dv_table(root, per_file)
            total = per_file * N_FILES

            def read():
                delta_log.read_delta_table(spark, table).write.format(
                    "noop"
                ).mode("overwrite").save()

            # correctness check once per rung
            n = delta_log.read_delta_table(spark, table).count()
            assert n == N_FILES * (ROWS - per_file), n

            bitmap_bytes = sum(
                len(encode_rbm_array(range(0, per_file)))
                for _ in range(N_FILES)
            )
            out["ladder"][str(total)] = {
                "per_file": per_file,
                "mask_sec": timed(read),
                "exploded_rows_avoided": total,
                "compressed_bitmap_bytes": bitmap_bytes,
            }
        print(json.dumps(out))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
