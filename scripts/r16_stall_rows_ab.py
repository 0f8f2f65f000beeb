"""Adjudicate the three r15 stall-poisoned bench rows (VERDICT r15 #2).

`BENCH_LOCAL_r15.json` published `ev_gapfill` at 2.59x, `merge_upsert`
at 2.03x and `q21_suppliers_kept_waiting` at 1.48x their r10 BASELINE
rows, captured on a day the box stalled intermittently (four same-day
sessions each inflated a DIFFERENT random row subset at identical job
counts — box-drift-policy).  The r15 verdict adjudicated box-not-plan
from job counts + the per-row min across sessions, but required a
controlled re-measurement on the frozen tree: this instrument.

Protocol (the r12/r14 settlement discipline): the three suspects and
the `q3_shipping_priority` control interleaved in ONE session, 6
alternations after a discarded warm-up, medians only, each suspect
judged by its NORMALIZED ratio

    (suspect_med / control_med) / (suspect_r10 / control_r10)

against the 1.3x threshold (SCALE.md rule 45).  Job counts are
recorded per cell so an unchanged-plan claim is checkable in the same
artifact.

Usage: python scripts/r16_stall_rows_ab.py [alternations]
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
CONTROL = "q3_shipping_priority"
SUSPECTS = ("ev_gapfill", "merge_upsert", "q21_suppliers_kept_waiting")
#: r10 BASELINE medians (BENCH_LOCAL_r10.json, the current absolute table)
R10 = {
    "ev_gapfill": 0.358,
    "merge_upsert": 0.483,
    "q21_suppliers_kept_waiting": 1.247,
    "q3_shipping_priority": 0.810,
}


def main() -> None:
    alternations = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    spark = get_spark("r16_stall_rows_ab")
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

    names = (CONTROL, *SUSPECTS)
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
    # sub-second rows keep warming (JIT/codegen caches) well past one
    # discarded pass — the r16 runs showed monotone decay over a whole
    # session — so publish three estimators: full-session median,
    # LAST-HALF median (steady state), and MIN (the scheduler floor the
    # r15 cross-session adjudication used)
    half = {
        n: statistics.median(
            [s for c, s, _ in cells if c == n][alternations // 2:]
        )
        for n in names
    }
    mins = {n: min(s for c, s, _ in cells if c == n) for n in names}
    jobs = {n: max(j for c, _, j in cells if c == n) for n in names}
    verdicts = {}
    for n in SUSPECTS:
        normalized = (med[n] / med[CONTROL]) / (R10[n] / R10[CONTROL])
        steady = (half[n] / half[CONTROL]) / (R10[n] / R10[CONTROL])
        verdicts[n] = {
            "median_sec": med[n],
            "steady_median_sec": half[n],
            "min_sec": mins[n],
            "min_vs_r10": round(mins[n] / R10[n], 3),
            "jobs_per_run": jobs[n],
            "normalized_vs_r10": round(normalized, 3),
            "steady_normalized_vs_r10": round(steady, 3),
            "r15_raw_ratio": round(
                {"ev_gapfill": 2.59, "merge_upsert": 2.03,
                 "q21_suppliers_kept_waiting": 1.48}[n], 2
            ),
            "verdict": "box" if min(normalized, steady) <= 1.3
            else "plan-suspect",
        }
    print(
        json.dumps(
            {
                "experiment": "r16_stall_rows_ab",
                "control_median_sec": med[CONTROL],
                "control_vs_r10": round(med[CONTROL] / R10[CONTROL], 3),
                "verdicts": verdicts,
                "cells": cells,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
