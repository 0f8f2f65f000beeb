"""Round-14 curation-pair dispersion check (VERDICT r13 next #6).

The r13 builder closing bench read `curation_token_budget` at 0.821 s
(1.97x raw vs its BASELINE row) while the SAME-DAY driver bench read
0.373 s (0.90x) at an unchanged 5 jobs — the box-drift signature, but
the file stays open until an interleaved A/B confirms it on the frozen
tree (the r12 settlement discipline: 8 alternations vs the same-job-
count `flagship_threshold_rollup` control in ONE session, medians,
ratio-to-control judged, not absolutes).

Usage: python scripts/r14_curation_ab.py
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


def main() -> None:
    spark = get_spark("r14_curation_ab")
    queries = all_queries()

    def run(name: str) -> float:
        t0 = time.perf_counter()
        queries[name](spark, SF).write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.perf_counter() - t0, 3)

    pair = ("curation_token_budget", "flagship_threshold_rollup")
    for n in pair:  # warm-up, discarded
        run(n)
    cells: list[tuple[str, float]] = []
    for _ in range(8):
        for n in pair:
            cells.append((n, run(n)))
    med = {n: statistics.median(s for c, s in cells if c == n) for n in pair}
    print(
        json.dumps(
            {
                "experiment": "r14_curation_token_budget_ab",
                "cells": cells,
                "median": med,
                "ratio_to_control": round(
                    med["curation_token_budget"]
                    / med["flagship_threshold_rollup"],
                    3,
                ),
                "baseline_row": 0.416,
                "baseline_control_row": 0.589,
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
