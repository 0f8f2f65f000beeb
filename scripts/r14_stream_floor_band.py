"""Band-setting session for the r14 streaming-floor normalization
(companion to scripts/r14_streaming_floor_ab.py, which adjudicated the
r13 breach and showed the BATCH 12-job no-op floor undercounts the
lanes' real floor ~17x — the cost is microbatch machinery, not bare job
submission).

This session interleaves the judged numerators with the ACTUAL probe
bench.py now publishes (``bench_stream_noop_drain``: one availableNow
drain, 4 microbatches, memory sink, zero data work) so BASELINE.md can
state the ``streaming_floor_normalized`` bands from same-session
measurements:

- stream_tumbling_counts / noop_drain
- streaming_medallion   / noop_drain

Protocol: cold passes discarded, 6 alternating cells (medallion every
other), medians.  Usage: python scripts/r14_stream_floor_band.py
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from bench import (  # noqa: E402
    bench_stream_noop_drain,
    bench_streaming_medallion,
)
from species_range_data_pipeline_spark.plans.registry import (  # noqa: E402
    all_queries,
)
from species_range_data_pipeline_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"


def main() -> None:
    spark = get_spark("r14_floor_band")
    queries = all_queries()

    def run_stream() -> float:
        t0 = time.perf_counter()
        queries["stream_tumbling_counts"](spark, SF).write.format(
            "noop"
        ).mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    cold = {
        "noop_drain": bench_stream_noop_drain(spark),
        "stream_tumbling_counts": run_stream(),
        "medallion": bench_streaming_medallion(spark, SF)[
            "streaming_medallion_sec"
        ],
    }

    cells: list[tuple[str, float]] = []
    for i in range(6):
        cells.append(("noop_drain", bench_stream_noop_drain(spark)))
        cells.append(("stream_tumbling_counts", run_stream()))
        if i % 2 == 0:
            cells.append(
                (
                    "medallion",
                    bench_streaming_medallion(spark, SF)[
                        "streaming_medallion_sec"
                    ],
                )
            )

    names = ["noop_drain", "stream_tumbling_counts", "medallion"]
    med = {
        n: round(statistics.median([s for c, s in cells if c == n]), 3)
        for n in names
    }
    mins = {n: min(s for c, s in cells if c == n) for n in names}
    print(
        json.dumps(
            {
                "experiment": "r14_stream_floor_band",
                "cold": cold,
                "cells": cells,
                "median": med,
                "min": mins,
                "tumbling_over_drain": round(
                    med["stream_tumbling_counts"] / med["noop_drain"], 3
                ),
                "medallion_over_drain": round(
                    med["medallion"] / med["noop_drain"], 3
                ),
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
