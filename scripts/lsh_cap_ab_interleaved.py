"""Interleaved A/B: the r12 hot-bucket cap machinery vs the r11 plain
kernel for dedup_minhash_lsh (VERDICT r12 next #4).

The r12 closing bench read dedup_minhash_lsh at 1.296 s vs 0.850 s in
r11 (1.35x normalized, jobs 8->9) after the hot-bucket cap landed:
a bucket-sizes aggregation + join + a shared lazy localCheckpoint of
the signature table were added so over-cap buckets hash-sub-shard
(adversarial-corpora safety).  Per the box-drift policy the only
believable cost attribution is alternating cells in ONE session.

Cells:
- ``capped``  — the registered query (today's kernel, cap machinery in).
- ``plain``   — the r11 kernel reconstructed from today's helpers
  (same ``_lsh_banded`` head WITHOUT the localCheckpoint, single
  collect_list aggregation, no sizes/join/shard) — byte-identical
  output on any corpus with no over-cap bucket (the fixture).

Usage: python scripts/lsh_cap_ab_interleaved.py [alternations]
Prints one JSON line with per-cell walls, medians, and the overhead
ratio median_capped/median_plain.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from species_range_data_pipeline_spark.catalog import load_table  # noqa: E402
from species_range_data_pipeline_spark.plans.text import (  # noqa: E402
    _ensure_parallel,
    _lsh_banded,
    dedup_minhash_lsh,
)
from species_range_data_pipeline_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"


def plain_r11_kernel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-cap kernel: one collect_list per bucket, no sizes agg,
    no join, no checkpoint — identical output when no bucket is over
    the cap (asserted once before timing)."""
    banded = _lsh_banded(
        _ensure_parallel(load_table(spark, sf_dir, "documents"))
    )
    buckets = (
        banded.groupBy("band", "bucket")
        .agg(F.collect_list("doc_id").alias("ids"))
        .where(F.size("ids") > 1)
    )
    return (
        buckets.select("ids", F.explode("ids").alias("doc_a"))
        .select("doc_a", F.explode("ids").alias("doc_b"))
        .where(F.col("doc_a") < F.col("doc_b"))
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


def main() -> None:
    alternations = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_spark("lsh_cap_ab")
    pair = {
        "capped": lambda: dedup_minhash_lsh(spark, SF),
        "plain": lambda: plain_r11_kernel(spark, SF),
    }
    # equivalence gate before timing (fixture has no over-cap bucket)
    a = sorted(map(tuple, pair["capped"]().collect()))
    b = sorted(map(tuple, pair["plain"]().collect()))
    assert a == b and a, f"kernels disagree: {len(a)} vs {len(b)} rows"
    cells = []
    for _ in range(alternations):
        for name, fn in pair.items():
            t0 = time.perf_counter()
            fn().collect()
            cells.append((name, round(time.perf_counter() - t0, 3)))
    med = {
        n: statistics.median(s for c, s in cells if c == n) for n in pair
    }
    print(
        json.dumps(
            {
                "cells": cells,
                "median_capped": med["capped"],
                "median_plain": med["plain"],
                "overhead_ratio": round(med["capped"] / med["plain"], 3),
                "rows": len(a),
            }
        )
    )


if __name__ == "__main__":
    main()
