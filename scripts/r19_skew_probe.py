"""r19 key-distribution probe (VERDICT r18 #8, guide §2.3/§2.5): put
measured skew evidence behind the dispositioned "2-scan floor" lanes —
dedup_substring_cut (gram-keyed window), dedup_paragraphs (chunk-text
aggregate), basket_brand_pairs (order-keyed collect_set) — so the
salting thresholds for scale are calibrated from data, not guessed.

For each lane's wide key this prints: total rows, distinct keys, the
top-10 key counts, and the top-key mass (share of all rows on the
hottest key).  Interpretation against the operators:

- A WINDOW partitioned by the key buffers ``top_key_count`` rows in ONE
  task (spilling to disk past the in-memory threshold) — the relevant
  bound is one task's disk, reached only when a single key's rows
  outgrow it.
- A hash AGGREGATE by the key collapses duplicates map-side: the
  exchange carries at most ``distinct_keys × input_partitions`` rows,
  and one reducer holds ``O(distinct keys in its partition)`` state —
  skew in raw counts is absorbed before the shuffle.
- A JOIN on the key is AQE-skew-splittable (one giant key CAN be split
  across tasks, duplicating the other side's partition).

Usage: SPARK_GRAFT_CPUS=32 python scripts/r19_skew_probe.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from species_range_data_pipeline_spark.catalog import load_table  # noqa: E402
from species_range_data_pipeline_spark.plans.text import (  # noqa: E402
    _PARA_TOKENS,
    _tokens,
)
from species_range_data_pipeline_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"


def key_stats(df, key: str) -> dict:
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
    agg = counts.agg(
        F.count(F.lit(1)).alias("distinct_keys"),
        F.sum("n").alias("total_rows"),
        F.max("n").alias("top_key_count"),
        F.expr("percentile_approx(n, 0.5)").alias("median_key_count"),
    ).collect()[0]
    top10 = [
        r["n"]
        for r in counts.orderBy(F.col("n").desc()).limit(10).collect()
    ]
    return {
        "total_rows": agg["total_rows"],
        "distinct_keys": agg["distinct_keys"],
        "top_key_count": agg["top_key_count"],
        "median_key_count": agg["median_key_count"],
        "top10_counts": top10,
        "top_key_mass": round(agg["top_key_count"] / agg["total_rows"], 6),
        "max_over_median": round(
            agg["top_key_count"] / max(agg["median_key_count"], 1), 1
        ),
    }


def main() -> None:
    spark = get_spark("r19-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF, "documents")
    out: dict = {"sf_dir": SF}

    # dedup_substring_cut: every (start) 6-token window keyed by gram
    # hash — the lane's one wide exchange + min/max window by gram
    W = 6
    args = ",".join(
        f"t[i{'+' + str(j - 1) if j else '-1'}]" for j in range(W)
    )
    grams = (
        docs.select("doc_id", _tokens().alias("t"))
        .where(F.size("t") >= W)
        .select(
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(t)-{W - 1}),"
                    f" i -> xxhash64({args}))"
                )
            ).alias("gram")
        )
    )
    out["dedup_substring_cut_gram"] = key_stats(grams, "gram")

    # dedup_paragraphs: 20-token chunk text — the min(struct) aggregate key
    C = _PARA_TOKENS
    chunks = docs.select("doc_id", _tokens().alias("t")).select(
        F.explode(
            F.expr(
                f"transform(sequence(0, cast(ceil(size(t) / {C}.0) as int)"
                f" - 1), i -> array_join(slice(t, i * {C} + 1, {C}), ' '))"
            )
        ).alias("chunk_text")
    )
    out["dedup_paragraphs_chunk"] = key_stats(chunks, "chunk_text")

    # basket_brand_pairs: per-order basket width (the collect_set bound)
    lineitem = load_table(spark, SF, "lineitem")
    part = load_table(spark, SF, "part")
    ob = lineitem.join(
        part.select("p_partkey", "p_brand"),
        F.col("l_partkey") == F.col("p_partkey"),
    ).select("l_orderkey", "p_brand")
    out["basket_brand_pairs_orderkey"] = key_stats(ob, "l_orderkey")
    widths = (
        ob.groupBy("l_orderkey")
        .agg(F.size(F.collect_set("p_brand")).alias("k"))
        .agg(
            F.max("k").alias("max_basket"),
            F.expr("percentile_approx(k, 0.5)").alias("median_basket"),
        )
        .collect()[0]
    )
    out["basket_brand_pairs_basket_width"] = {
        "max_distinct_brands_per_order": widths["max_basket"],
        "median": widths["median_basket"],
    }
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
