"""Measure the r18 DML surfaces' scale claims (SCALE.md rule 65) —
the argued->measured discipline for `sources/delta_dml.py` and
`iceberg_write.iceberg_delete_where`:

1. **Copy-on-write DELETE costs the touched files, not the table**:
   deleting ONE key (one touched file) from a table of 16 vs 160
   files must stay ~flat — phase 1 is a zone-map prune plus one
   column-pruned candidate scan, phase 2 rewrites one file.
2. **A partition-only DELETE never rewrites**: dropping one partition
   must stay ~flat AND beat the row-level delete (no scan, no
   rewrite — removes only).
3. **Merge-on-read DELETE is matching-rows-sized**: the Iceberg
   position-delete write for one key must stay ~flat under 10x
   sibling files.

Protocol: fresh table per rep (DML mutates), medians of 3 after one
discarded warm-up, interleaved arms within each scale.  Prints one
JSON line.

Usage: python scripts/r18_dml_sweep.py [rows_per_file]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from species_range_data_pipeline_spark.session import get_spark  # noqa: E402
from species_range_data_pipeline_spark.sources.delta_dml import (  # noqa: E402
    delta_delete_where,
)
from species_range_data_pipeline_spark.sources.delta_write import (  # noqa: E402
    write_delta_table,
)
from species_range_data_pipeline_spark.sources.iceberg_write import (  # noqa: E402
    iceberg_delete_where,
    write_iceberg_table,
)

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 512
SCALES = (16, 160)
REPS = 3


def _base_df(spark, n_files: int):
    from pyspark.sql import functions as F

    return (
        spark.range(ROWS * n_files)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 8).cast("string").alias("part"),
            (F.col("id") * 1.5).alias("v"),
        )
        .repartition(n_files)
    )


def _median(vals):
    return statistics.median(vals)


def main() -> None:
    spark = get_spark("r18_dml_sweep")
    out: dict = {"rows_per_file": ROWS, "scales": list(SCALES)}
    for n_files in SCALES:
        base = _base_df(spark, n_files).localCheckpoint(eager=True)
        cell: dict = {}
        arms = {
            "delta_delete_one_key": None,
            "delta_delete_partition": None,
            "iceberg_mor_delete_one_key": None,
        }
        for arm in arms:
            vals = []
            for i in range(REPS + 1):
                root = tempfile.mkdtemp(prefix=f"dml_{n_files}_")
                tbl = os.path.join(root, "t")
                try:
                    if arm.startswith("delta"):
                        write_delta_table(
                            base, tbl, partition_by=["part"]
                        )
                    else:
                        write_iceberg_table(
                            base, tbl, partition_by=["part"]
                        )
                    t0 = time.monotonic()
                    if arm == "delta_delete_one_key":
                        delta_delete_where(spark, tbl, [("k", "=", 7)])
                    elif arm == "delta_delete_partition":
                        delta_delete_where(
                            spark, tbl, [("part", "=", "3")]
                        )
                    else:
                        iceberg_delete_where(
                            spark, tbl, [("k", "=", 7)]
                        )
                    t = time.monotonic() - t0
                    if i > 0:
                        vals.append(t)
                finally:
                    shutil.rmtree(root, ignore_errors=True)
            cell[arm] = round(_median(vals), 4)
        out[str(n_files)] = cell
    for arm in (
        "delta_delete_one_key",
        "delta_delete_partition",
        "iceberg_mor_delete_one_key",
    ):
        lo = out[str(SCALES[0])][arm]
        hi = out[str(SCALES[1])][arm]
        out[f"growth_{arm}"] = round(hi / lo, 3) if lo else None
    print(json.dumps(out))


if __name__ == "__main__":
    main()
