"""Interleaved A/B + recall-dial capture for the MMR lane (r13).

Two measurements, one session:

1. Execution-strategy A/B: the registered cogrouped-Arrow-kernel lane
   vs the JVM round-loop twin (`retrieval_mmr_diversify_rounds`).
   Alternating cells, equivalence asserted BEFORE timing (SCALE.md
   rule 51's discipline); medians over the warm passes.  The expected
   gap is barrier count (K-1 rounds x ~3 candidate-frame shuffles + a
   lazy checkpoint each), not data.

2. IVF-head recall dial: mean candidate recall of
   `_mmr_candidates_ivf(nprobe)` against the exact exhaustive head at
   nprobe in {2, 4, 8} — the numbers pinned (as floors + monotonicity)
   in tests/test_retrieval_mmr.py.

Usage: python scripts/mmr_ab_interleaved.py [alternations]
Prints one JSON line.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from species_range_data_pipeline_spark.catalog import load_table  # noqa: E402
from species_range_data_pipeline_spark.plans.retrieval import (  # noqa: E402
    _mmr_candidates,
    _mmr_candidates_ivf,
    retrieval_mmr_diversify,
    retrieval_mmr_diversify_rounds,
)
from species_range_data_pipeline_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"


def _candidate_sets(df):
    out: dict[int, set] = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["vec_id"])
    return out


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark()

    kern = [tuple(r) for r in retrieval_mmr_diversify(spark, SF).collect()]
    rnds = [
        tuple(r) for r in retrieval_mmr_diversify_rounds(spark, SF).collect()
    ]
    assert kern == rnds, "twins diverged — timing would be meaningless"

    walls = {"kernel": [], "rounds": []}
    for _ in range(reps):
        for name, fn in (
            ("kernel", retrieval_mmr_diversify),
            ("rounds", retrieval_mmr_diversify_rounds),
        ):
            t0 = time.monotonic()
            fn(spark, SF).collect()
            walls[name].append(time.monotonic() - t0)

    emb = load_table(spark, SF, "embeddings")
    exact = _candidate_sets(_mmr_candidates(emb))
    recall = {}
    for nprobe in (2, 4, 8):
        ivf = _candidate_sets(_mmr_candidates_ivf(emb, nprobe=nprobe))
        recall[str(nprobe)] = round(
            statistics.mean(
                len(exact[q] & ivf.get(q, set())) / len(exact[q])
                for q in exact
            ),
            3,
        )

    med = {
        # drop the first (cold) alternation from the medians
        k: round(statistics.median(v[1:] if len(v) > 2 else v), 3)
        for k, v in walls.items()
    }
    print(
        json.dumps(
            {
                "sf": SF,
                "reps": reps,
                "walls": {
                    k: [round(x, 3) for x in v] for k, v in walls.items()
                },
                "medians": med,
                "rounds_over_kernel": round(
                    med["rounds"] / med["kernel"], 2
                ),
                "ivf_mean_candidate_recall_by_nprobe": recall,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
