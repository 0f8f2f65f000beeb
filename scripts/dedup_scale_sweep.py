"""10x scale sweep for the gram/shingle dedup family (VERDICT r10 next
#4; companion to SCALE.md rules 44/45).

The shuffle-heaviest text lanes (`dedup_substring_cut`,
`dedup_minhash_lsh`, `dedup_paragraphs`, `doc_pack_sequences`) had only
sf0.1 measurements; this sweep measures their growth under a 10x
documents table and directly checks the `_ensure_parallel` claims:

- The 10x table is 10 id-shifted copies of the corpus with a DISTINCT
  vowel permutation applied per copy (`translate`), so within-copy
  duplicate/gram structure is preserved while cross-copy texts share no
  grams — without this, identical copies would multiply LSH bucket
  candidates quadratically and the sweep would measure the duplicated
  fixture, not the operator's growth.
- Cells alternate 1x/10x per lane (the box-drift policy: sequential
  blocks confound with drift); medians of 3 per cell; growth exponent
  e = log10(t10/t1).
- At 10x the sweep re-times each lane with `_ensure_parallel`
  monkeypatched to identity, showing what the parallelism guard is
  worth as the input grows.
- The no-op-at-scale claim is asserted BEHAVIORALLY: under a conf where
  the bin-packing estimate reaches defaultParallelism (scaled table +
  lowered maxPartitionBytes), `_ensure_parallel(df) is df`.

Prints one JSON line per lane plus a trailer.  Usage:
python scripts/dedup_scale_sweep.py
"""

from __future__ import annotations

import itertools
import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from species_range_data_pipeline_spark.catalog import load_table  # noqa: E402
from species_range_data_pipeline_spark.session import get_spark  # noqa: E402
from species_range_data_pipeline_spark.plans import packing, text  # noqa: E402

SF = "/root/testdata/sf0.1"
MULT = 10
LANES = {
    "dedup_substring_cut": text.dedup_substring_cut,
    "dedup_minhash_lsh": text.dedup_minhash_lsh,
    "dedup_paragraphs": text.dedup_paragraphs,
    "doc_pack_sequences": packing.doc_pack_sequences,
}


def build_scaled(spark, mult: int) -> str:
    tmp = tempfile.mkdtemp(prefix=f"dedup_sweep_{mult}x_")
    docs = load_table(spark, SF, "documents")
    perms = ["".join(p) for p in itertools.permutations("aeiou")][:mult]
    copies = docs.withColumn(
        "copy", F.explode(F.array(*[F.lit(i) for i in range(mult)]))
    )
    mutated = F.when(F.col("copy") == 0, F.col("text"))
    for i in range(1, mult):
        mutated = mutated.when(
            F.col("copy") == i, F.translate("text", "aeiou", perms[i])
        )
    out = copies.select(
        (F.col("doc_id") + F.col("copy").cast("long") * F.lit(10**9)).alias(
            "doc_id"
        ),
        mutated.alias("text"),
        *[c for c in docs.columns if c not in ("doc_id", "text")],
    )
    out.write.parquet(os.path.join(tmp, "documents.parquet"))
    return tmp


def timed(fn, spark, sf_dir) -> tuple[float, int]:
    """Time through the noop sink (bench.py's sink): a count() would let
    the optimizer prune the expensive output columns (observed:
    dedup_substring_cut 0.50 s by count vs 1.35 s materialized)."""
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0, 0


def decade2(spark) -> None:
    """Second-decade arm (VERDICT r13 next #7): 10x vs 100x documents,
    so the LSH-cap and sub-linearity claims rest on two measured
    decades instead of one extrapolated from the first.  Same
    vowel-permutation copy mutation (120 distinct permutations cover
    the 100 copies), same protocol: alternating cells, medians of 3,
    noop sink.  The guard-disabled and behavioral-no-op arms are 10x
    findings (rule 46) and are not re-run here."""
    import math

    sf10 = build_scaled(spark, 10)
    sf100 = build_scaled(spark, 100)
    for name, fn in LANES.items():
        rows_10x = fn(spark, sf10).count()  # sanity + warm
        rows_100x = fn(spark, sf100).count()
        timed(fn, spark, sf10)  # warm the materialized shape too
        timed(fn, spark, sf100)
        cells_10x, cells_100x = [], []
        for _ in range(3):
            cells_10x.append(timed(fn, spark, sf10)[0])
            cells_100x.append(timed(fn, spark, sf100)[0])
        t10 = statistics.median(cells_10x)
        t100 = statistics.median(cells_100x)
        print(json.dumps({
            "lane": name,
            "t10x_med": round(t10, 3),
            "t100x_med": round(t100, 3),
            "second_decade_exponent": round(math.log10(t100 / t10), 3),
            "rows_10x": rows_10x,
            "rows_100x": rows_100x,
            "cells_10x": [round(c, 3) for c in cells_10x],
            "cells_100x": [round(c, 3) for c in cells_100x],
        }), flush=True)


def main() -> None:
    spark = get_spark("dedup-scale-sweep")
    if "--decade2" in sys.argv:
        decade2(spark)
        return
    sf10 = build_scaled(spark, MULT)
    results = []
    for name, fn in LANES.items():
        rows_1x = fn(spark, SF).count()  # sanity + warm
        rows_10x = fn(spark, sf10).count()
        timed(fn, spark, SF)  # warm the materialized shape too
        timed(fn, spark, sf10)
        cells_1x, cells_10x = [], []
        for _ in range(3):  # alternating cells, drift-resistant
            cells_1x.append(timed(fn, spark, SF)[0])
            cells_10x.append(timed(fn, spark, sf10)[0])
        # 10x arm with the parallelism guard disabled
        orig = text._ensure_parallel
        text._ensure_parallel = lambda df: df
        try:
            timed(fn, spark, sf10)
            cells_10x_noguard = [timed(fn, spark, sf10)[0] for _ in range(3)]
        finally:
            text._ensure_parallel = orig
        t1 = statistics.median(cells_1x)
        t10 = statistics.median(cells_10x)
        import math

        rec = {
            "lane": name,
            "t1x_med": round(t1, 3),
            "t10x_med": round(t10, 3),
            "growth_exponent": round(math.log10(t10 / t1), 3),
            "t10x_noguard_med": round(
                statistics.median(cells_10x_noguard), 3
            ),
            "rows_1x": rows_1x,
            "rows_10x": rows_10x,
            "cells_1x": [round(c, 3) for c in cells_1x],
            "cells_10x": [round(c, 3) for c in cells_10x],
            "cells_10x_noguard": [round(c, 3) for c in cells_10x_noguard],
        }
        print(json.dumps(rec), flush=True)
        results.append(rec)

    # behavioral no-op check: when the split estimate reaches
    # defaultParallelism, _ensure_parallel must return the SAME object
    docs10 = load_table(spark, sf10, "documents")
    total = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(os.path.join(sf10, "documents.parquet"))
        for f in fs if f.endswith(".parquet")
    )
    par = spark.sparkContext.defaultParallelism
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    spark.conf.set(
        "spark.sql.files.maxPartitionBytes", str(max(1, total // (par * 2)))
    )
    try:
        noop = text._ensure_parallel(docs10) is docs10
    finally:
        spark.conf.unset("spark.sql.files.openCostInBytes")
        spark.conf.unset("spark.sql.files.maxPartitionBytes")
    print(json.dumps({
        "ensure_parallel_noop_when_splits_reach_parallelism": noop,
        "scaled_bytes": total,
        "default_parallelism": par,
    }), flush=True)
    assert noop, "_ensure_parallel must disarm once est splits >= parallelism"


if __name__ == "__main__":
    main()
