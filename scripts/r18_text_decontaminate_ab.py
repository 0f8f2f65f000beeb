"""Settle the r17 watch item: text_decontaminate (VERDICT r17 wrong #2
/ next #5).

The r17 builder capture read it at 1.78x its r16 row and 1.53x its r10
BASELINE row at UNCHANGED job count (9), while the r17 driver capture
normalized it <=1.1x — every signal said box, but it became the
worst-ratio non-streaming row in one of two captures.  Rule 45 triage
step (1): an interleaved A/B against a SAME-JOB-COUNT control in ONE
session on the frozen tree.  `q10_returned_revenue` runs the same 9
Spark jobs per invocation (BENCH_LOCAL_r17 queries_jobs), so the pair
moves together when the box's per-job scheduler floor moves and

    (suspect_med / control_med) / (suspect_r10 / control_r10)

isolates the plan, judged against rule 45's 1.3x bar on the
full-session median AND the last-half (steady-state) median, with MIN
and per-cell job counts recorded.  Normalization constants come from
BENCH_LOCAL_r10.json's queries dict — never a BASELINE.md grep (the
two-absolute-tables trap, BASELINE.md:83).

Usage: python scripts/r18_text_decontaminate_ab.py [alternations]
Prints one JSON line.
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
CONTROL = "q10_returned_revenue"  # 9 jobs, same as the suspect
SUSPECT = "text_decontaminate"
#: r10 medians from BENCH_LOCAL_r10.json["queries"] (the current
#: absolute table's source artifact)
R10 = {
    "text_decontaminate": 1.148,
    "q10_returned_revenue": 0.895,
}


def main() -> None:
    alternations = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("r18_text_decontaminate_ab")
    queries = all_queries()
    tracker = spark.sparkContext.statusTracker()

    def run(name: str) -> tuple[float, int]:
        jobs0 = max(tracker.getJobIdsForGroup() or [-1])
        t0 = time.perf_counter()
        queries[name](spark, SF).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = round(time.perf_counter() - t0, 3)
        jobs1 = max(tracker.getJobIdsForGroup() or [-1])
        return dt, jobs1 - jobs0

    names = (CONTROL, SUSPECT)
    for n in names:  # warm-up pass, discarded
        run(n)
    cells: list[tuple[str, float, int]] = []
    for _ in range(alternations):
        for n in names:
            dt, jobs = run(n)
            cells.append((n, dt, jobs))
    med = {
        n: statistics.median(s for c, s, _ in cells if c == n)
        for n in names
    }
    half = {
        n: statistics.median(
            [s for c, s, _ in cells if c == n][alternations // 2:]
        )
        for n in names
    }
    mins = {n: min(s for c, s, _ in cells if c == n) for n in names}
    jobs = {n: max(j for c, _, j in cells if c == n) for n in names}
    normalized = (med[SUSPECT] / med[CONTROL]) / (R10[SUSPECT] / R10[CONTROL])
    steady = (half[SUSPECT] / half[CONTROL]) / (R10[SUSPECT] / R10[CONTROL])
    print(
        json.dumps(
            {
                "experiment": "r18_text_decontaminate_ab",
                "control_median_sec": med[CONTROL],
                "control_vs_r10": round(med[CONTROL] / R10[CONTROL], 3),
                "suspect": {
                    "median_sec": med[SUSPECT],
                    "steady_median_sec": half[SUSPECT],
                    "min_sec": mins[SUSPECT],
                    "min_vs_r10": round(mins[SUSPECT] / R10[SUSPECT], 3),
                    "jobs_per_run": jobs[SUSPECT],
                    "control_jobs_per_run": jobs[CONTROL],
                    "normalized_vs_r10": round(normalized, 3),
                    "steady_normalized_vs_r10": round(steady, 3),
                    "r17_raw_ratios": {
                        "builder_vs_r10": 1.53,
                        "driver_normalized": 1.1,
                    },
                    "verdict": "box" if min(normalized, steady) <= 1.3
                    else "plan-suspect",
                },
                "cells": cells,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
