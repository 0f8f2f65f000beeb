"""BPE-train scale sweep: convert SCALE.md rule 17's "iteration state is
the Zipf-small word-type table" from argument to measurement (r13).

Two axes, alternating cells in ONE session:

1. CORPUS-MASS axis — the full registered lane (`bpe_train_merges`:
   corpus explode+collapse, then train) at sf0.01 vs sf0.1.  The fixture
   lexicon is closed, so the word-TYPE count stays ~constant while
   corpus tokens grow ~10x: if the claim holds, the wall moves only by
   the one-scan collapse term, far below 10x.

2. TYPE-TABLE axis — `train_merges` alone on a synthetic type table of
   T base types replicated with distinct suffixes (word||'_'||i), same
   count distribution, T and 10T rows.  This isolates the per-round
   explode/argmax cost, which SHOULD grow ~linearly with types —
   that is the claim's other half: cost follows the type table, so the
   knob that matters at 100 TB is vocabulary breadth, not corpus bytes.

Usage: python scripts/bpe_scale_sweep.py [reps]
Prints one JSON line with walls, medians, type/token counts, and the
two growth exponents.
"""

from __future__ import annotations

import json
import math
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from species_range_data_pipeline_spark.catalog import load_table  # noqa: E402
from species_range_data_pipeline_spark.plans.bpe import (  # noqa: E402
    bpe_train_merges,
    train_merges,
)
from species_range_data_pipeline_spark.plans.text import _tokens  # noqa: E402
from species_range_data_pipeline_spark.session import get_spark  # noqa: E402

SF1 = "/root/testdata/sf0.01"
SF10 = "/root/testdata/sf0.1"


def corpus_stats(spark, sf_dir: str):
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.explode(_tokens()).alias("word")).where(
        F.col("word") != ""
    )
    row = words.agg(
        F.count(F.lit(1)).alias("tokens"),
        F.countDistinct("word").alias("types"),
    ).collect()[0]
    return int(row["tokens"]), int(row["types"])


def synthetic_types(spark, replicas: int):
    """The sf0.01 type table, each type replicated with distinct
    suffixes (same wc): types x replicas, corpus mass x replicas."""
    docs = load_table(spark, SF1, "documents")
    base = (
        docs.select(F.explode(_tokens()).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    return base.select(
        F.explode(F.sequence(F.lit(1), F.lit(replicas))).alias("i"),
        "word",
        "wc",
    ).select(
        F.concat_ws("_", "word", F.col("i").cast("string")).alias("word"),
        "wc",
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark()

    tok1, typ1 = corpus_stats(spark, SF1)
    tok10, typ10 = corpus_stats(spark, SF10)

    walls: dict[str, list[float]] = {
        "lane_sf001": [],
        "lane_sf01": [],
        "types_x1": [],
        "types_x10": [],
    }
    # the 12-round loop's job-scheduling floor is ~3 s on this box, so
    # the type-axis cells must be large enough for per-round work to
    # clear it: 31 base types x {1000, 10000} = 31k vs 310k type rows
    t1 = synthetic_types(spark, 1_000).localCheckpoint()
    t10 = synthetic_types(spark, 10_000).localCheckpoint()
    n_t1, n_t10 = t1.count(), t10.count()
    for _ in range(reps):
        t0 = time.monotonic()
        bpe_train_merges(spark, SF1).collect()
        walls["lane_sf001"].append(time.monotonic() - t0)
        t0 = time.monotonic()
        bpe_train_merges(spark, SF10).collect()
        walls["lane_sf01"].append(time.monotonic() - t0)
        t0 = time.monotonic()
        train_merges(t1)
        walls["types_x1"].append(time.monotonic() - t0)
        t0 = time.monotonic()
        train_merges(t10)
        walls["types_x10"].append(time.monotonic() - t0)

    med = {k: statistics.median(v) for k, v in walls.items()}
    print(
        json.dumps(
            {
                "reps": reps,
                "corpus": {
                    "sf0.01": {"tokens": tok1, "types": typ1},
                    "sf0.1": {"tokens": tok10, "types": typ10},
                },
                "synthetic_type_rows": {"x1": n_t1, "x10": n_t10},
                "walls": {
                    k: [round(x, 3) for x in v] for k, v in walls.items()
                },
                "medians": {k: round(v, 3) for k, v in med.items()},
                "corpus_mass_exponent": round(
                    math.log10(med["lane_sf01"] / med["lane_sf001"]), 3
                ),
                "type_table_exponent": round(
                    math.log10(med["types_x10"] / med["types_x1"]), 3
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
