"""r18 optimization round: interleaved re-measure of changed headline
queries against unchanged same-session controls.

Usage: python scripts/r18_opt_ab.py [passes] [changed...] -- [controls...]
Defaults: 5 passes; the r18 batch-1 changed set; controls
q3_shipping_priority + dedup_substring_cut.

Prints one JSON line: per-query medians/mins/jobs, plus each query's
ratio to the control-mean so the number is box-drift-normalized when
compared to the round-start baseline capture (same method as rule 45).
"""
from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from species_range_data_pipeline_spark.plans.registry import all_queries  # noqa: E402
from species_range_data_pipeline_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"
DEFAULT_CHANGED = [
    "text_bigram_lm", "text_decontaminate", "retrieval_rrf_fusion",
    "q21_suppliers_kept_waiting", "merge_upsert", "mv_incremental_refresh",
]
DEFAULT_CONTROLS = ["q3_shipping_priority", "dedup_substring_cut"]


def main() -> None:
    args = sys.argv[1:]
    passes = 5
    if args and args[0].isdigit():
        passes = int(args[0])
        args = args[1:]
    if "--" in args:
        i = args.index("--")
        changed, controls = args[:i], args[i + 1:]
    else:
        changed, controls = args or DEFAULT_CHANGED, DEFAULT_CONTROLS
    names = changed + controls
    spark = get_spark("r18_opt_ab")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    tracker = spark.sparkContext.statusTracker()

    def run(name: str) -> tuple[float, int]:
        jobs0 = max(tracker.getJobIdsForGroup() or [-1])
        t0 = time.perf_counter()
        queries[name](spark, SF).write.format("noop").mode("overwrite").save()
        dt = round(time.perf_counter() - t0, 3)
        return dt, max(tracker.getJobIdsForGroup() or [-1]) - jobs0

    for n in names:  # warm-up, discarded
        run(n)
    cells: list[tuple[str, float, int]] = []
    for _ in range(passes):
        for n in names:
            dt, jobs = run(n)
            cells.append((n, dt, jobs))
    med = {n: round(statistics.median(s for c, s, _ in cells if c == n), 3)
           for n in names}
    mn = {n: round(min(s for c, s, _ in cells if c == n), 3) for n in names}
    jobs = {n: max(j for c, _, j in cells if c == n) for n in names}
    ctrl = statistics.mean(med[c] for c in controls)
    print(json.dumps({
        "metric": "r18_opt_ab",
        "passes": passes,
        "median": med,
        "min": mn,
        "jobs": jobs,
        "control_mean": round(ctrl, 3),
        "ratio_to_control": {n: round(med[n] / ctrl, 3) for n in changed},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
