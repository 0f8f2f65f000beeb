"""Scale sweep for the connected-components family (r12; companion to
SCALE.md rules 46-49) — the tail shared by dedup_clusters_star,
emb_dedup_components(_lsh) and the SemDeDup lanes.

Two axes, because the algorithm has two scale claims:

1. THROUGHPUT (disjoint replication): a fixture-shaped base graph and a
   10x id-shifted copy set — component structure replicates exactly, so
   distinct component count must scale by exactly 10 (asserted before
   timing).  Measures growth of the per-round shuffles.
2. DEPTH (path graphs): large-star/small-star's selling point is
   O(log n) rounds regardless of diameter, where plain min-label
   propagation needs O(diameter) rounds.  Timed on path graphs of
   length 1k / 10k / 100k (one component each, asserted): star's
   wall-clock should grow ~log (rounds + linear shuffle volume), and
   the plain propagation loop is measured on the 1k path only — its
   O(diameter) rounds make longer paths a non-starter, which is itself
   the measurement.

Alternating cells, medians of 3, noop sink.  Prints one JSON line per
experiment.  Usage: python scripts/components_scale_sweep.py
"""

from __future__ import annotations

import json
import math
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from species_range_data_pipeline_spark.plans.graph import (  # noqa: E402
    connected_components,
    connected_components_star,
)
from species_range_data_pipeline_spark.session import get_spark  # noqa: E402

BASE_N = 60_000  # edges in the 1x throughput graph (~lineitem sf0.1 scale)
MULT = 10


def _write(df, tmpdir: str, name: str) -> str:
    path = os.path.join(tmpdir, name)
    df.write.parquet(path)
    return path


def build_graphs(spark, tmp: str) -> dict[str, str]:
    # base graph: hash-random edges over ~BASE_N/2 vertices at mean
    # degree ~4 — the SUPER-critical regime (one giant component plus a
    # few stragglers; measured: 29 components over 30k vertices), i.e.
    # the hot-component worst case a boilerplate-heavy dedup pair set
    # degenerates into
    base = spark.range(BASE_N).select(
        (F.xxhash64(F.col("id")) % (BASE_N // 2)).alias("src"),
        (F.xxhash64(F.col("id") + 10**9) % (BASE_N // 2)).alias("dst"),
    ).select(F.abs("src").alias("src"), F.abs("dst").alias("dst"))
    paths = {"base_1x": _write(base, tmp, "base_1x")}
    scaled = base.withColumn(
        "copy", F.explode(F.array(*[F.lit(i) for i in range(MULT)]))
    ).select(
        (F.col("src") + F.col("copy").cast("long") * 10**9).alias("src"),
        (F.col("dst") + F.col("copy").cast("long") * 10**9).alias("dst"),
    )
    paths["base_10x"] = _write(scaled, tmp, "base_10x")
    for n in (16, 1_000, 10_000, 100_000):
        p = spark.range(n).select(
            F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
        )
        paths[f"path_{n}"] = _write(p, tmp, f"path_{n}")
    return paths


def main() -> None:
    spark = get_spark("components-sweep")
    tmp = tempfile.mkdtemp(prefix="components_sweep_")
    paths = build_graphs(spark, tmp)
    rd = lambda k: spark.read.parquet(paths[k])  # noqa: E731

    # --- structural invariants ---
    n1 = (
        connected_components_star(rd("base_1x"))
        .select("comp").distinct().count()
    )
    n10 = (
        connected_components_star(rd("base_10x"))
        .select("comp").distinct().count()
    )
    assert n10 == MULT * n1, (n1, n10)
    for n in (1_000, 10_000, 100_000):
        k = (
            connected_components_star(rd(f"path_{n}"))
            .select("comp").distinct().count()
        )
        assert k == 1, (n, k)
    print(json.dumps({"invariants": "ok", "components_1x": n1}), flush=True)

    def timed(fn) -> float:
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    # --- throughput: 1x vs 10x, alternating ---
    for k in ("base_1x", "base_10x"):
        timed(lambda: connected_components_star(rd(k)))  # warm
    c1, c10 = [], []
    for _ in range(3):
        c1.append(timed(lambda: connected_components_star(rd("base_1x"))))
        c10.append(timed(lambda: connected_components_star(rd("base_10x"))))
    t1, t10 = statistics.median(c1), statistics.median(c10)
    print(
        json.dumps(
            {
                "lane": "components_star_throughput",
                "edges_1x": BASE_N,
                "t1x_med": t1,
                "t10x_med": t10,
                "growth_exponent": round(math.log10(t10 / t1), 3),
                "cells_1x": c1,
                "cells_10x": c10,
            }
        ),
        flush=True,
    )

    # --- depth: star on 1k/10k/100k paths; plain propagation on 1k ---
    depth = {}
    for n in (1_000, 10_000, 100_000):
        timed(lambda: connected_components_star(rd(f"path_{n}")))
        depth[f"star_path_{n}"] = statistics.median(
            timed(lambda: connected_components_star(rd(f"path_{n}")))
            for _ in range(3)
        )
    # plain min-label propagation moves labels ONE hop per round, so a
    # path longer than _MAX_ITERS (30) cannot converge at all — the 16-hop
    # cell is the longest honest comparison, and that asymmetry IS the
    # algorithmic point
    for name, fn in (
        ("plain_path_16", lambda: connected_components(rd("path_16"))),
        ("star_path_16", lambda: connected_components_star(rd("path_16"))),
    ):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        depth[name] = round(time.perf_counter() - t0, 3)
    print(
        json.dumps(
            {
                "lane": "components_depth",
                **depth,
                "note": (
                    "star wall grows ~log with path length (rounds ~ "
                    "log2 n); plain min-label propagation needs "
                    "O(diameter) rounds — its 1k-path time vs star's is "
                    "why longer plain cells are not run"
                ),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
