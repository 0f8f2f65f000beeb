"""Adversarial-corpus sweep: the incremental (aggregation-only) dedup
lane vs the capped pair generator on the hot-boilerplate corpus
(VERDICT r13: convert `plans/text.py` dedup_incremental_minhash's "the
lane to run on exactly the corpora that need capping" from argument to
measurement).

Corpus: n documents sharing ONE boilerplate body (the
tests/test_dedup_adversarial.py shape) — identical shingle sets, so all
n docs land in ONE bucket per band.  That is the worst case for any
pair generator and the no-op case for an aggregation:

- ``pairs``  — ``minhash_lsh_pairs`` (the registered generator, default
  cap): sub-shards the hot bucket to ~cap-sized groups, so candidate
  volume is bands * (n/cap) * C(cap, 2) ~= n * bands * (cap-1)/2 —
  LINEAR in n but with a ~(cap-1)/2 constant (1500x at cap=1000,
  bands=4).
- ``incr``   — ``_bucket_min_incremental`` over the same banded
  signatures: one mergeable min per bucket + one join-back — the hot
  bucket costs ONE long per partition; total work ~= n * bands rows.

Cells alternate in ONE session (box-drift policy); output equality is
sanity-asserted once before timing (every batch doc must resolve
dup_of=0, the global bucket min).  The incremental lane gets an extra
10x decade (pairs at that n would be ~2e8 candidate rows — the point).

Usage: python scripts/incremental_adversarial_sweep.py [reps]
Prints one JSON line: per-cell walls, medians, and log10 growth
exponents.
"""

from __future__ import annotations

import json
import math
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from species_range_data_pipeline_spark.plans.text import (  # noqa: E402
    _LSH_BANDS,
    _LSH_BUCKET_CAP,
    _lsh_banded,
    _bucket_min_incremental,
    minhash_lsh_pairs,
)
from species_range_data_pipeline_spark.session import get_spark  # noqa: E402

BODY = " ".join(f"boilerplate{w}" for w in range(40))


def corpus(spark, n: int):
    return spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit(BODY).alias("text")
    )


def run_incr(spark, n: int) -> int:
    out = _bucket_min_incremental(_lsh_banded(corpus(spark, n), shared=True))
    return out.count()


def run_pairs(spark, n: int) -> int:
    return minhash_lsh_pairs(corpus(spark, n), cap=_LSH_BUCKET_CAP).count()


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark()

    # sanity: on the hot corpus every batch doc is a dup of doc 0
    chk = (
        _bucket_min_incremental(_lsh_banded(corpus(spark, 1000), shared=True))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("is_dup").cast("int")).alias("dups"),
            F.max("dup_of").alias("max_dup_of"),
        )
        .collect()[0]
    )
    assert chk["n"] == 200 and chk["dups"] == 200 and chk["max_dup_of"] == 0, chk

    cells = [
        ("incr", 1_000),
        ("pairs", 1_000),
        ("incr", 10_000),
        ("pairs", 10_000),
        ("incr", 100_000),  # pairs at 1e5 ~= 2e8 candidates — not run
    ]
    walls: dict[str, list[float]] = {f"{k}_{n}": [] for k, n in cells}
    rows: dict[str, int] = {}
    for _ in range(reps):
        for kind, n in cells:
            fn = run_incr if kind == "incr" else run_pairs
            t0 = time.monotonic()
            cnt = fn(spark, n)
            walls[f"{kind}_{n}"].append(time.monotonic() - t0)
            rows[f"{kind}_{n}"] = cnt

    med = {k: statistics.median(v) for k, v in walls.items()}

    def expo(a: str, b: str, decades: float) -> float:
        return math.log10(med[b] / med[a]) / decades

    print(
        json.dumps(
            {
                "bands": _LSH_BANDS,
                "cap": _LSH_BUCKET_CAP,
                "reps": reps,
                "rows": rows,
                "walls": {k: [round(x, 3) for x in v] for k, v in walls.items()},
                "medians": {k: round(v, 3) for k, v in med.items()},
                "incr_exponent_1e3_1e5": round(
                    expo("incr_1000", "incr_100000", 2.0), 3
                ),
                "pairs_exponent_1e3_1e4": round(
                    expo("pairs_1000", "pairs_10000", 1.0), 3
                ),
                "pairs_over_incr_at_1e4": round(
                    med["pairs_10000"] / med["incr_10000"], 2
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
