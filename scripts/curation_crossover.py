"""Measure the curation token-budget crossover (VERDICT r8 next #4).

Times three forms of the same selection at sf0.1 and at a 10x
copy-multiplied documents table (the SCALE.md rule-38/39 duplication
sweep shape):

  window     — the REGISTERED form (per-language running-sum window)
  histogram  — the sort-free twin as written (lazy DAG: tokenizes the
               fact table once per branch, 3 passes)
  hist+mat   — the twin with its documented 100 TB move applied: the
               narrow (doc_id, lang, n_chars, ntok) projection is
               materialized once (localCheckpoint) and both passes run
               over it

Prints one JSON line per (scale, form) with min-of-3 warm seconds, and
asserts all three forms agree on the output rows at both scales.

Usage: python scripts/curation_crossover.py
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from species_range_data_pipeline_spark.session import get_spark  # noqa: E402
from species_range_data_pipeline_spark.plans.quality import (  # noqa: E402
    curation_token_budget,
    curation_token_budget_histogram,
    curation_token_budget_histogram_materialized,
)

SF = "/root/testdata/sf0.1"


def _dup_documents(spark, out_dir: str, mult: int) -> None:
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    # shift by max(doc_id)+1, not count: sparse ids would collide across
    # copies under a count shift and silently shrink the "10x" table
    stride = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    (
        docs.crossJoin(
            spark.range(mult).withColumnRenamed("id", "copy")
        )
        .withColumn("doc_id", F.col("doc_id") + F.col("copy") * stride)
        .drop("copy")
        .write.mode("overwrite")
        .parquet(f"{out_dir}/documents.parquet")
    )


def _time(fn, spark, sf_dir: str, passes: int = 3) -> tuple[float, list]:
    rows = None
    best = float("inf")
    for _ in range(passes):
        t0 = time.monotonic()
        rows = fn(spark, sf_dir).collect()
        best = min(best, time.monotonic() - t0)
    return best, [tuple(r) for r in rows]


def main() -> None:
    spark = get_spark("curation-crossover")
    forms = {
        "window": curation_token_budget,
        "histogram": curation_token_budget_histogram,
        "hist+mat": curation_token_budget_histogram_materialized,
    }
    with tempfile.TemporaryDirectory() as tmp:
        _dup_documents(spark, tmp, 10)
        for scale, sf_dir in [("1x", SF), ("10x", tmp)]:
            results = {}
            for name, fn in forms.items():
                sec, rows = _time(fn, spark, sf_dir)
                results[name] = (sec, rows)
                print(json.dumps(
                    {"scale": scale, "form": name, "sec": round(sec, 3)}
                ))
            base = results["window"][1]
            for name, (_, rows) in results.items():
                assert rows == base, f"{name} disagrees with window at {scale}"
            print(json.dumps({"scale": scale, "agree": True}))


if __name__ == "__main__":
    main()
