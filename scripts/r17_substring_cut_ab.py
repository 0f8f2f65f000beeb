"""Triage the one drifting bench family: dedup_substring_cut
(VERDICT r16 next #6).

Both r16 captures put `dedup_substring_cut` above 1.15x its r10
BASELINE row (1.17x driver, 1.20x builder min) — the only comparable
row there — while everything else read at or under parity.  Rule 45
triage step (1): an interleaved A/B against a SAME-JOB-COUNT control
in ONE session on the frozen tree.  `q21_suppliers_kept_waiting` runs
the same 11 Spark jobs per invocation (BENCH_LOCAL_r16 queries_jobs),
so the pair moves together when the box's per-job scheduler floor
moves and the normalized ratio isolates the plan:

    (suspect_med / control_med) / (suspect_r10 / control_r10)

judged against rule 45's 1.3x bar on both the full-session median and
the last-half (steady-state) median, with MIN and per-cell job counts
recorded so an unchanged-plan claim is checkable in the artifact.

CORRECTION (r17): the first cut of this script normalized the suspect
with 1.178 — the R8 table's row — against the control's R10 value,
overstating the pre-change drift as 1.47x/1.39x ("plan-suspect").
With the consistent R10 pair below, that same session reads 1.29x
median / 1.17x steady (borderline).  The plan fix it triggered stands
on its own interleaved old-vs-new measurement (0.84x median, byte-
equal output, 11 -> 9 jobs); post-change this script reads 1.09-1.13x across sessions.

Usage: python scripts/r17_substring_cut_ab.py [alternations]
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
CONTROL = "q21_suppliers_kept_waiting"  # 11 jobs, same as the suspect
SUSPECT = "dedup_substring_cut"
#: r10 BASELINE medians (BENCH_LOCAL_r10.json, the current absolute table)
R10 = {
    "dedup_substring_cut": 1.345,
    "q21_suppliers_kept_waiting": 1.247,
}


def main() -> None:
    alternations = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_spark("r17_substring_cut_ab")
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
                "experiment": "r17_substring_cut_ab",
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
                    "r16_raw_ratios": {"driver": 1.17, "builder_min": 1.20},
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
