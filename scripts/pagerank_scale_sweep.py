"""Validate pagerank's edge-cache partition sizing under graph growth
(r9; companion to SCALE.md rule 42).

Rule 42 first picked a CONSTANT 8 for the fixture's ~1.1M-edge graph
and claimed the count should rise toward core count as the graph
grows.  This sweep tested that claim instead of trusting it: it builds
a 10x graph (10 disjoint key-shifted copies of lineitem+orders, so
nodes AND edges scale 10x with the same degree distribution) and times
``graph_pagerank`` at forced partition counts {8, 32} on both scales.
The measured inversion (8 wins at 1x, 32 wins at 10x) is why
``graph_pagerank`` now sizes the edge cache adaptively from the
driving table's bytes (``_edge_cache_partitions``); this sweep remains
as the re-calibration harness.

Prints one JSON line per (scale, parts) with median-of-3 warm seconds,
and asserts the top-20 result rows at 1x are identical across partition
counts (the plan is partition-count-independent by construction).

Usage: python scripts/pagerank_scale_sweep.py
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from species_range_data_pipeline_spark.session import get_spark  # noqa: E402
import species_range_data_pipeline_spark.plans.graph as g  # noqa: E402

SF = "/root/testdata/sf0.1"
PARTS = (8, 32)
MULT = 10


def _dup_graph_tables(spark, out_dir: str, mult: int) -> None:
    """Key-shifted copies: orderkey/custkey/suppkey move together, so the
    10x graph is 10 disjoint components with the fixture's shape."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    )
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    shifts = {
        "l_orderkey": 10_000_000,
        "o_orderkey": 10_000_000,
        "l_suppkey": 1_000_000,
        "o_custkey": 1_000_000,
    }
    for name, df in (("lineitem", li), ("orders", orders)):
        out = df.crossJoin(spark.range(mult).withColumnRenamed("id", "copy"))
        for col in df.columns:
            out = out.withColumn(col, F.col(col) + F.col("copy") * shifts[col])
        out.drop("copy").write.mode("overwrite").parquet(
            f"{out_dir}/{name}.parquet"
        )


def _median3(spark, sf_dir: str) -> tuple[float, list]:
    rows, ts = None, []
    for _ in range(3):
        t0 = time.monotonic()
        rows = g.graph_pagerank(spark, sf_dir).collect()
        ts.append(time.monotonic() - t0)
    ts.sort()
    return ts[1], [tuple(r) for r in rows]


def main() -> None:
    spark = get_spark("pagerank-scale-sweep")
    with tempfile.TemporaryDirectory() as tmp:
        _dup_graph_tables(spark, tmp, MULT)
        scales = [("1x", SF), (f"{MULT}x", tmp)]
        # warm both scales once before timing
        for _, sf_dir in scales:
            g.graph_pagerank(spark, sf_dir).collect()
        results: dict[tuple[str, int], tuple[float, list]] = {}
        for scale, sf_dir in scales:
            for parts in PARTS:
                g._PR_EDGE_PARTS_OVERRIDE = parts
                results[(scale, parts)] = _median3(spark, sf_dir)
                print(
                    json.dumps(
                        {
                            "scale": scale,
                            "parts": parts,
                            "median_sec": round(results[(scale, parts)][0], 3),
                        }
                    ),
                    flush=True,
                )
        base = results[("1x", PARTS[0])][1]
        for parts in PARTS[1:]:
            assert results[("1x", parts)][1] == base, (
                f"top-20 differs between parts={PARTS[0]} and parts={parts}"
            )
        print(json.dumps({"agree_at_1x": True}))


if __name__ == "__main__":
    main()
