"""Interleaved A/B: retrieval_rrf_fusion vs the q3_shipping_priority
control (VERDICT r10 next #2).

The r10 closing bench read rrf at 1.160 s — 1.34x its r9 reading after
control normalization, crossing BASELINE.md's own 1.3x line — while the
driver's independent same-round bench read 0.91 s (0.78x of the new
table row).  Code untouched in r10, so the two contradictory same-round
readings are either in-run dispersion or a plan-real cost the shared
box sometimes hides.  Per the box-drift policy (BASELINE.md r9 note)
the only believable measurement is alternating cells in ONE session:
run A/B/A/B/... for >=6 alternations, report per-cell wall plus
medians, and judge rrf by its RATIO to the control's same-run median.

Usage: python scripts/rrf_ab_interleaved.py [alternations]
Prints one JSON line: {"cells": [...], "median_rrf": s, "median_q3": s,
"ratio": r, "baseline_ratio": r8_capture_ratio}
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from species_range_data_pipeline_spark.session import get_spark  # noqa: E402
from species_range_data_pipeline_spark.plans.registry import (  # noqa: E402
    all_queries,
)

SF = "/root/testdata/sf0.1"


def main() -> None:
    alternations = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_spark("rrf_ab")
    queries = all_queries()
    pair = {
        "rrf": queries["retrieval_rrf_fusion"],
        "q3": queries["q3_shipping_priority"],
    }
    # one warm-up pass each (JIT, broadcast, shuffle-file caches)
    for fn in pair.values():
        fn(spark, SF).collect()
    cells = []
    for i in range(alternations):
        for name, fn in pair.items():
            t0 = time.perf_counter()
            fn(spark, SF).collect()
            cells.append((name, round(time.perf_counter() - t0, 3)))
    med = {
        n: statistics.median(s for c, s in cells if c == n) for n in pair
    }
    print(json.dumps({
        "cells": cells,
        "median_rrf": med["rrf"],
        "median_q3": med["q3"],
        "ratio": round(med["rrf"] / med["q3"], 3),
        # r8 capture ratio 0.778/0.594 and r9 run ratio 0.993/0.749 both
        # ~1.31-1.33: the band a plan-unchanged rrf should sit in
        "baseline_ratio_band": [1.31, 1.33],
    }))


if __name__ == "__main__":
    main()
