"""Measure the r18 WRITER surfaces' scale claims (SCALE.md rule 64)
— the argued->measured discipline for `sources/delta_write.py` and
`sources/iceberg_write.py`:

1. **Append cost is payload-sized, not table-sized**: committing a
   FIXED 4-file payload to a table holding 16 vs 160 existing data
   files must stay ~flat for both layouts (Delta: one log replay —
   log-sized — plus per-NEW-file footer probes and one O(1) commit
   JSON; Iceberg: prior manifest-list entries carried verbatim, one
   new Avro manifest).
2. **The checkpoint is log-sized**: `write_delta_checkpoint` at 16 vs
   160 live files grows with the FILE count (driver metadata render),
   never the row count — report the growth and the absolute.
3. **Self-written tables read at parquet cost**: a full
   `read_delta_table` / `read_iceberg_table` scan of the written
   table vs `spark.read.parquet` over the same files must be ~1.x at
   both scales (the delta is the driver-side replay/plan floor).

Protocol: interleaved arms within each scale, medians of 3 after one
discarded warm-up, noop sink for read arms (never time .count()).
Prints one JSON line.

Usage: python scripts/r18_writer_sweep.py [rows_per_file]
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
from species_range_data_pipeline_spark.sources.delta_log import (  # noqa: E402
    read_delta_table,
)
from species_range_data_pipeline_spark.sources.delta_write import (  # noqa: E402
    write_delta_checkpoint,
    write_delta_table,
)
from species_range_data_pipeline_spark.sources.iceberg_log import (  # noqa: E402
    read_iceberg_table,
)
from species_range_data_pipeline_spark.sources.iceberg_write import (  # noqa: E402
    write_iceberg_table,
)

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 512
SCALES = (16, 160)
REPS = 3


def _base_df(spark, n_files: int):
    from pyspark.sql import functions as F

    n = ROWS * n_files
    return (
        spark.range(n)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 7).cast("string").alias("part"),
            (F.col("id") * 1.5).alias("v"),
        )
        .repartition(n_files)
    )


def _payload_df(spark):
    from pyspark.sql import functions as F

    return (
        spark.range(ROWS * 4)
        .select(
            (F.col("id") + 10_000_000).alias("k"),
            (F.col("id") % 7).cast("string").alias("part"),
            (F.col("id") * 2.5).alias("v"),
        )
        .repartition(4)
    )


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _timed(fn) -> float:
    t0 = time.monotonic()
    fn()
    return time.monotonic() - t0


def _median_timed(fn, setup=None, reps=REPS) -> float:
    vals = []
    for i in range(reps + 1):  # +1 discarded warm-up
        if setup is not None:
            setup()
        t = _timed(fn)
        if i > 0:
            vals.append(t)
    return statistics.median(vals)


def main() -> None:
    spark = get_spark("r18_writer_sweep")
    out: dict = {"rows_per_file": ROWS, "scales": list(SCALES)}
    for n_files in SCALES:
        cell: dict = {}
        root = tempfile.mkdtemp(prefix=f"wsweep_{n_files}_")
        try:
            base = _base_df(spark, n_files).localCheckpoint(eager=True)
            payload = _payload_df(spark).localCheckpoint(eager=True)

            # base tables, one commit of n_files data files each
            dtbl = os.path.join(root, "delta")
            itbl = os.path.join(root, "iceberg")
            write_delta_table(base, dtbl)
            write_iceberg_table(base, itbl)

            # arm 1a: Delta append of a FIXED payload (fresh copy per
            # rep so the log grows identically across scales)
            def _delta_append():
                write_delta_table(payload, dtbl)

            cell["delta_append"] = _median_timed(_delta_append)

            def _ice_append():
                write_iceberg_table(payload, itbl)

            cell["iceberg_append"] = _median_timed(_ice_append)

            # arm 2: checkpoint at the current live-file count
            cell["delta_checkpoint"] = _median_timed(
                lambda: write_delta_checkpoint(dtbl)
            )

            # arm 3: full-scan reads, written table vs raw parquet
            cell["delta_read"] = _median_timed(
                lambda: _noop(read_delta_table(spark, dtbl))
            )
            cell["iceberg_read"] = _median_timed(
                lambda: _noop(read_iceberg_table(spark, itbl))
            )
            raw = [
                os.path.join(dtbl, n)
                for n in os.listdir(dtbl)
                if n.endswith(".parquet")
            ]
            cell["raw_parquet_read"] = _median_timed(
                lambda: _noop(spark.read.parquet(*raw))
            )
            out[str(n_files)] = {
                k: round(v, 4) for k, v in cell.items()
            }
        finally:
            shutil.rmtree(root, ignore_errors=True)
    for arm in (
        "delta_append",
        "iceberg_append",
        "delta_checkpoint",
        "delta_read",
        "iceberg_read",
        "raw_parquet_read",
    ):
        lo = out[str(SCALES[0])][arm]
        hi = out[str(SCALES[1])][arm]
        out[f"growth_{arm}"] = round(hi / lo, 3) if lo else None
    print(json.dumps(out))


if __name__ == "__main__":
    main()
