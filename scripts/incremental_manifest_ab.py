"""Measure what the signature manifest actually buys the incremental
dedup lane (r14; converts the docstring claim "the re-scan this removes
IS the dominant cost of the naive incremental lane" into numbers).

Interleaved cells, one session, frozen tree, sf0.1:
- `dedup_incremental_minhash` (recomputed: corpus text re-read and
  re-shingled every run) vs
- `dedup_incremental_minhash_manifest` (warm: corpus signatures read
  from the committed manifest, only the batch split's text scanned).
Output equality is asserted BEFORE timing (the box-drift policy's A/B
discipline).  The ingest cost the manifest amortizes (paid once, at
ingest time) is reported separately, as are the on-disk byte sizes of
the signature table vs the corpus text parquet — the bandwidth ratio
that grows with document length at production scale (the fixture's
docs are short, so the measured ratio here is a FLOOR on the win).

Usage: python scripts/incremental_manifest_ab.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from species_range_data_pipeline_spark.plans import text  # noqa: E402
from species_range_data_pipeline_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"


def _tree_bytes(path: str) -> int:
    if os.path.isfile(path):  # the fixture table is a single parquet file
        return os.path.getsize(path)
    return sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(path)
        for f in fs
    )


def main() -> None:
    spark = get_spark("incremental_manifest_ab")

    def run(fn) -> float:
        t0 = time.perf_counter()
        fn(spark, SF).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    # ingest half, timed once (the amortized cost)
    text._SIG_MANIFEST_CACHE.clear()
    t0 = time.perf_counter()
    text.dedup_incremental_minhash_manifest_query(spark, SF).write.format(
        "noop"
    ).mode("overwrite").save()
    ingest_plus_first = round(time.perf_counter() - t0, 3)
    sig_path = next(iter(text._SIG_MANIFEST_CACHE.values()))

    # equality before timing
    a = [
        tuple(r)
        for r in text.dedup_incremental_minhash(spark, SF).collect()
    ]
    b = [
        tuple(r)
        for r in text.dedup_incremental_minhash_manifest_query(
            spark, SF
        ).collect()
    ]
    assert a == b and len(a) > 0, "lanes diverge; timing would be meaningless"

    pair = {
        "recomputed": lambda: run(text.dedup_incremental_minhash),
        "manifest_warm": lambda: run(
            text.dedup_incremental_minhash_manifest_query
        ),
    }
    for fn in pair.values():  # warm both shapes
        fn()
    cells: list[tuple[str, float]] = []
    for _ in range(6):
        for nm, fn in pair.items():
            cells.append((nm, fn()))
    med = {
        nm: round(statistics.median([s for c, s in cells if c == nm]), 3)
        for nm in pair
    }
    sig_bytes = _tree_bytes(sig_path)
    text_bytes = _tree_bytes(os.path.join(SF, "documents.parquet"))
    print(
        json.dumps(
            {
                "experiment": "incremental_manifest_ab",
                "cells": cells,
                "median": med,
                "speedup_warm": round(
                    med["recomputed"] / med["manifest_warm"], 3
                ),
                "ingest_plus_first_run_sec": ingest_plus_first,
                "signature_table_bytes": sig_bytes,
                "corpus_text_parquet_bytes": text_bytes,
                "bytes_ratio_text_over_sigs": round(
                    text_bytes / sig_bytes, 2
                ),
                "rows": len(a),
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
