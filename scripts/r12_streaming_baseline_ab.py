"""Round-12 measurement session (VERDICT r11 next #6 + #7), one process,
interleaved cells per the box-drift policy (BASELINE.md r9 note):

1. BASELINE capture for `stream_tumbling_counts` — the r11 headline
   addition with no absolute anchor.  Cold + 6 warm passes, interleaved
   with `graph_pagerank` (14 jobs — the closest same-job-count batch
   control with an existing BASELINE row; the streaming lane runs 12).
   A future reading is judged by RATIO to the same-run pagerank median,
   never by the absolute — the lane is microbatch/checkpoint-floor
   dominated (SCALE.md rule 48), which is exactly why two same-tree r11
   runs disagreed 1.5x.

2. Curation-pair dispersion settlement — `curation_domain_cap` /
   `curation_token_budget` vs `flagship_threshold_rollup` (all three 5
   jobs), 8 alternations.  The r11 driver read the pair at 1.95x/1.38x
   of r10 with ZERO code changes while the same-tree builder bench read
   0.71x/0.74x of BASELINE; if the interleaved medians normalize inside
   the drift band, the verdict is box dispersion and BASELINE stands.

Instrument: noop sink (bench.py's), the queries constructed fresh per
cell.  Prints one JSON line per experiment.
Usage: python scripts/r12_streaming_baseline_ab.py
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
    spark = get_spark("r12_ab")
    queries = all_queries()

    def run(name: str) -> float:
        t0 = time.perf_counter()
        queries[name](spark, SF).write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.perf_counter() - t0, 3)

    # --- experiment 1: streaming baseline capture ---
    cold = {n: run(n) for n in ("stream_tumbling_counts", "graph_pagerank")}
    cells: list[tuple[str, float]] = []
    for _ in range(6):
        for n in ("stream_tumbling_counts", "graph_pagerank"):
            cells.append((n, run(n)))
    med = {
        n: statistics.median(s for c, s in cells if c == n)
        for n in ("stream_tumbling_counts", "graph_pagerank")
    }
    mins = {
        n: min(s for c, s in cells if c == n)
        for n in ("stream_tumbling_counts", "graph_pagerank")
    }
    print(
        json.dumps(
            {
                "experiment": "stream_tumbling_counts_baseline",
                "cold": cold,
                "cells": cells,
                "median": med,
                "min": mins,
                "ratio_to_pagerank": round(
                    med["stream_tumbling_counts"] / med["graph_pagerank"], 3
                ),
            }
        ),
        flush=True,
    )

    # --- experiment 2: curation pair vs control, 8 alternations ---
    trio = (
        "curation_domain_cap",
        "curation_token_budget",
        "flagship_threshold_rollup",
    )
    for n in trio:  # warm
        run(n)
    cells2: list[tuple[str, float]] = []
    for _ in range(8):
        for n in trio:
            cells2.append((n, run(n)))
    med2 = {n: statistics.median(s for c, s in cells2 if c == n) for n in trio}
    print(
        json.dumps(
            {
                "experiment": "curation_pair_ab",
                "cells": cells2,
                "median": med2,
                "ratio_domain_cap": round(
                    med2["curation_domain_cap"]
                    / med2["flagship_threshold_rollup"],
                    3,
                ),
                "ratio_token_budget": round(
                    med2["curation_token_budget"]
                    / med2["flagship_threshold_rollup"],
                    3,
                ),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
