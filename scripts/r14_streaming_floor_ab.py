"""Round-14 streaming-gate adjudication (VERDICT r13 next #1 + #8).

The r13 breach: both r13 artifacts put ``streaming_normalized
["stream_tumbling_counts"]`` at 3.24-3.36 against BASELINE.md's
published 2.0-2.7 band ("beyond 3x is a regression") — on a round in
which the streaming source/plan code was untouched (git-verified), the
lane's job count was unchanged at 12, and its ABSOLUTE reading sat at
or below the r12 A/B anchor.  The suspected failure is the RULE, not
the lane: the denominator (``graph_pagerank``) is compute-dominated
while the numerator is microbatch/checkpoint-floor dominated, so the
ratio is not box-speed-invariant — on a fast box the compute control
shrinks and the floor does not, inflating the ratio with zero
regression anywhere.

This instrument settles it in ONE session, interleaved per the
box-drift policy, with THREE denominators measured side by side:

- ``graph_pagerank`` (the legacy compute control, 14 jobs);
- a 12-JOB NO-OP FLOOR probe — twelve one-job noop writes of a 1-row
  in-memory frame, timed as one unit: pure job-submission/scheduler
  floor, the same resource the streaming lane's 12 microbatch-drain
  jobs are dominated by;
- the floor probe again at 14 jobs (pagerank's count) so the
  pagerank-to-floor decomposition (compute vs floor share) is visible.

If stream/floor12 is stable while stream/pagerank swings with
pagerank/floor14, the r13 breach is a denominator artifact and the
re-anchored rule (BASELINE.md r14 note) judges ``stream_*`` rows by
stream/floor12 — a floor-per-floor ratio both of whose sides scale
with the box's scheduler speed.  The medallion hop is measured in the
same cells so its band (VERDICT r13 next #8) is pinned with the same
normalization from day one.

Usage: python scripts/r14_streaming_floor_ab.py
Prints one JSON line per experiment.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from species_range_data_pipeline_spark.plans.registry import (  # noqa: E402
    all_queries,
)
from species_range_data_pipeline_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"


def job_floor(spark, n_jobs: int) -> float:
    """One floor-probe unit: ``n_jobs`` single-job noop writes of a
    1-row in-memory frame — no scan, no shuffle, no Python; the wall
    time is n_jobs x (job submit + schedule + single-task run + result
    handling), the same per-job floor a microbatch drain pays."""
    one = spark.range(1)
    t0 = time.perf_counter()
    for _ in range(n_jobs):
        one.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    spark = get_spark("r14_floor_ab")
    queries = all_queries()

    def run(name: str) -> float:
        t0 = time.perf_counter()
        queries[name](spark, SF).write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.perf_counter() - t0, 3)

    def medallion() -> float:
        from bench import bench_streaming_medallion

        return bench_streaming_medallion(spark, SF)[
            "streaming_medallion_sec"
        ]

    sys.path.insert(0, "/root/repo")

    # cold passes (discarded from medians, reported for the record)
    cold = {
        "stream_tumbling_counts": run("stream_tumbling_counts"),
        "graph_pagerank": run("graph_pagerank"),
        "floor12": job_floor(spark, 12),
        "floor14": job_floor(spark, 14),
        "medallion": medallion(),
    }

    cells: list[tuple[str, float]] = []
    for i in range(6):
        cells.append(("stream_tumbling_counts", run("stream_tumbling_counts")))
        cells.append(("floor12", job_floor(spark, 12)))
        cells.append(("graph_pagerank", run("graph_pagerank")))
        cells.append(("floor14", job_floor(spark, 14)))
        if i % 2 == 0:  # medallion every other round: heavy cell
            cells.append(("medallion", medallion()))

    names = [
        "stream_tumbling_counts",
        "graph_pagerank",
        "floor12",
        "floor14",
        "medallion",
    ]
    med = {
        n: round(statistics.median([s for c, s in cells if c == n]), 3)
        for n in names
    }
    mins = {n: min(s for c, s in cells if c == n) for n in names}
    print(
        json.dumps(
            {
                "experiment": "r14_streaming_floor_adjudication",
                "cold": cold,
                "cells": cells,
                "median": med,
                "min": mins,
                "legacy_stream_over_pagerank": round(
                    med["stream_tumbling_counts"] / med["graph_pagerank"], 3
                ),
                "stream_over_floor12": round(
                    med["stream_tumbling_counts"] / med["floor12"], 3
                ),
                "medallion_over_floor12": round(
                    med["medallion"] / med["floor12"], 3
                ),
                "pagerank_over_floor14": round(
                    med["graph_pagerank"] / med["floor14"], 3
                ),
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
