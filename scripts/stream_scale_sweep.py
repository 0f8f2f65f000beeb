"""Validate the staged streaming lanes under 10x event growth (r10;
companion to SCALE.md rule 44).

The r10 driver-oracled streaming lanes (`stream_session_flush`,
`stream_dedup_replayed`) are correctness-gated at sf0.01/sf0.1; this
sweep checks the SCALE claim behind them: watermark-bounded state means
wall-clock grows ~linearly with rows while the state store tracks the
1-hour event-time horizon, not total history.  It builds a 10x events
table (10 key-shifted copies — event_ids and user_ids disjoint per
copy, timestamps IDENTICAL, so per-user session structure is preserved
while rows AND state keys scale 10x) and times each lane at both
scales, cross-checking the streamed result against the equivalent
batch computation in the same session.

Prints one JSON line per (lane, scale) with median-of-3 warm seconds
and the row counts.  Usage: python scripts/stream_scale_sweep.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from species_range_data_pipeline_spark.catalog import load_table  # noqa: E402
from species_range_data_pipeline_spark.plans.events import (  # noqa: E402
    stream_dedup_replayed,
    stream_session_flush,
)
from species_range_data_pipeline_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"
MULT = 10
LANES = {
    "stream_session_flush": stream_session_flush,
    "stream_dedup_replayed": stream_dedup_replayed,
}


def build_scaled(spark, mult: int) -> str:
    """Write a key-shifted mult-x events table; return its sf_dir."""
    tmp = tempfile.mkdtemp(prefix=f"stream_sweep_{mult}x_")
    ev = load_table(spark, SF, "events")
    copies = ev.withColumn(
        "copy", F.explode(F.array(*[F.lit(i) for i in range(mult)]))
    ).withColumn("copy", F.col("copy").cast("long")).select(
        (F.col("event_id") + F.col("copy") * F.lit(10**9)).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("copy") * F.lit(10**6)).alias("user_id"),
        "event_type",
        "value",
        "props",
    )
    copies.write.parquet(os.path.join(tmp, "events.parquet"))
    return tmp


def batch_session_count(spark, sf_dir: str) -> int:
    import datetime

    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts")).first()[0]
    cut = mx - datetime.timedelta(hours=2)
    return (
        ev.groupBy(F.session_window("ts", "15 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("w.end") <= F.lit(cut))
        .count()
    )


def main() -> None:
    spark = get_spark("stream-scale-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    for mult in (1, MULT):
        sf_dir = SF if mult == 1 else build_scaled(spark, mult)
        expect = {
            "stream_session_flush": batch_session_count(spark, sf_dir),
            "stream_dedup_replayed": load_table(
                spark, sf_dir, "events"
            ).count(),
        }
        for lane, fn in LANES.items():
            runs, rows = [], None
            fn(spark, sf_dir).count()  # warm (staging + codegen)
            for _ in range(3):
                t0 = time.perf_counter()
                rows = fn(spark, sf_dir).count()
                runs.append(round(time.perf_counter() - t0, 3))
            assert rows == expect[lane], (lane, mult, rows, expect[lane])
            print(
                json.dumps(
                    {
                        "lane": lane,
                        "scale": mult,
                        "rows": rows,
                        "median_s": round(statistics.median(runs), 3),
                        "runs": runs,
                    }
                )
            )


if __name__ == "__main__":
    main()
