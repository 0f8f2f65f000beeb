"""Exact-vs-IVF MMR candidate-head crossover in QUERY COUNT (r15).

``retrieval_mmr_auto`` dispatches between the exact broadcast head
(cost ~ |queries| x |corpus| scored rows) and the IVF-probed head
(cost ~ quantizer(corpus) + |queries| x |corpus| x nprobe/nlist) on the
size of the query set — the quadratic driver VERDICT r14 #3 flagged.
This sweep measures the crossover on the fixture corpus: fixed sf0.1
embeddings (2 000 vectors), query density varied via the head's
``query_mod`` knob (mod 100 / 20 / 6 -> 20 / 100 / 334 queries, all
under the exact head's ``_MMR_MAX_QUERIES`` hard cap), arms interleaved
within each cell (box-drift discipline, SCALE.md rule 45), candidate
frames materialized through the noop sink (rule: never .count() — column
pruning deletes the expensive projection).

The IVF arm runs the AMORTIZED shape the registered lane now uses
(pre-collected LocalRelation quantizer, ``_ivf_centroids_cached``):
dispatch compares steady-state production costs, not one-shot builds
(the one-shot build cost is reported separately as ``quantizer_build``).

Usage: python scripts/mmr_head_crossover_sweep.py [alternations]
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
    _ivf_centroids,
    _mmr_candidates,
    _mmr_candidates_ivf,
)
from species_range_data_pipeline_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"
MODS = (100, 20, 6)  # -> 20 / 100 / 334 queries at 2000 vectors


def _noop(df) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark()
    emb = load_table(spark, SF, "embeddings")

    # One-shot quantizer build cost (the part the session cache amortizes),
    # then the LocalRelation replay the registered lane uses.
    t0 = time.monotonic()
    built = _ivf_centroids(emb)
    rows, schema = built.collect(), built.schema
    quantizer_build = time.monotonic() - t0
    cent = spark.createDataFrame(rows, schema)

    out = {}
    for mod in MODS:
        n_q = emb.where(f"vec_id % {mod} = 0").count()
        walls = {"exact": [], "ivf": []}
        for _ in range(reps):
            walls["exact"].append(_noop(_mmr_candidates(emb, query_mod=mod)))
            walls["ivf"].append(
                _noop(_mmr_candidates_ivf(emb, cent=cent, query_mod=mod))
            )
        med = {
            k: round(statistics.median(v[1:] if len(v) > 2 else v), 3)
            for k, v in walls.items()
        }
        out[str(mod)] = {
            "n_queries": n_q,
            "walls": {k: [round(x, 3) for x in v] for k, v in walls.items()},
            "medians": med,
            "ivf_over_exact": round(med["ivf"] / med["exact"], 3),
        }

    print(
        json.dumps(
            {
                "sf": SF,
                "reps": reps,
                "quantizer_build_sec": round(quantizer_build, 3),
                "arms": out,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
