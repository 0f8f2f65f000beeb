"""10x scale sweep for the geo family (VERDICT r11 next #5; companion to
SCALE.md rules 46/47 and scripts/dedup_scale_sweep.py).

The last heavy family without measured growth exponents:
``geo_dissolve_area`` (A1 two-level union), ``geo_polygonize_components``
(T4 component walk), ``geo_spatial_join_bin`` (bin-and-refine join).

Scaling strategy — TILED LATTICE REPLICATION: the dissolve/polygonize
input is the raw (species, threshold, row, col) cell stream derived from
lineitem; the 10x table is 10 copies with ``row += copy * (GRID + 1)``.
The +1 gap guarantees no cross-copy 4-adjacency, so every component of
the 1x lattice appears EXACTLY 10 times — n_cells, area and
n_components must all scale by exactly 10, which the sweep asserts
before trusting any timing (a growth number over a structurally
different input measures nothing).  The spatial-join points table is 10
id-shifted copies with permuted coordinates (uniform over the same 100x100
domain, so rect selectivity is preserved).

Protocol (box-drift policy, BASELINE.md): alternating 1x/10x cells,
medians of 3, noop sink (never .count() — column pruning deletes the
geometry output projection).  The dissolve lane also times the
``dissolve_tiled`` memory-bounded twin at both scales with
``tile_size = GRID + 1`` (tiles align with replicas): plain dissolve
runs ONE Python task per group regardless of group size, tiled runs one
per (group, replica) — the crossover where per-task memory/latency beats
the two-level merge overhead is the number SCALE.md needs.

Prints one JSON line per lane plus a trailer.  Usage:
python scripts/geo_scale_sweep.py
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

from species_range_data_pipeline_spark.catalog import load_table  # noqa: E402
from species_range_data_pipeline_spark.operators.polygonize import (  # noqa: E402
    dissolve,
    dissolve_tiled,
    polygonize,
    polygonize_tiled,
)
from species_range_data_pipeline_spark.plans.geo import (  # noqa: E402
    _GRID,
    _cells_from_lineitem,
)
from species_range_data_pipeline_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"
MULT = 10
BY = ["species", "threshold_s"]


def build_scaled_cells(spark, mult: int) -> str:
    """Raw cell stream (pre-dedup, so the JVM dedup shuffle scales too)
    replicated as a gapped row-lattice."""
    tmp = tempfile.mkdtemp(prefix=f"geo_sweep_cells_{mult}x_")
    cells = _cells_from_lineitem(spark, SF)
    out = cells.withColumn(
        "copy", F.explode(F.array(*[F.lit(i) for i in range(mult)]))
    ).select(
        "species",
        "threshold_s",
        (F.col("row") + F.col("copy") * (_GRID + 1)).cast("int").alias("row"),
        F.col("col").cast("int").alias("col"),
    )
    out.write.parquet(os.path.join(tmp, "cells.parquet"))
    return os.path.join(tmp, "cells.parquet")


def build_scaled_points(spark, mult: int) -> str:
    tmp = tempfile.mkdtemp(prefix=f"geo_sweep_pts_{mult}x_")
    lineitem = load_table(spark, SF, "lineitem")
    pts = lineitem.select(
        (F.col("l_orderkey") % 100).alias("px"),
        (F.col("l_partkey") % 100).alias("py"),
    )
    out = pts.withColumn(
        "copy", F.explode(F.array(*[F.lit(i) for i in range(mult)]))
    ).select(
        ((F.col("px") + F.col("copy") * 7) % 100).alias("px"),
        ((F.col("py") + F.col("copy") * 13) % 100).alias("py"),
    )
    out.write.parquet(os.path.join(tmp, "points.parquet"))
    return os.path.join(tmp, "points.parquet")


def _write_1x_cells(spark) -> str:
    tmp = tempfile.mkdtemp(prefix="geo_sweep_cells_1x_")
    _cells_from_lineitem(spark, SF).select(
        "species",
        "threshold_s",
        F.col("row").cast("int").alias("row"),
        F.col("col").cast("int").alias("col"),
    ).write.parquet(os.path.join(tmp, "cells.parquet"))
    return os.path.join(tmp, "cells.parquet")


def _write_1x_points(spark) -> str:
    tmp = tempfile.mkdtemp(prefix="geo_sweep_pts_1x_")
    lineitem = load_table(spark, SF, "lineitem")
    lineitem.select(
        (F.col("l_orderkey") % 100).alias("px"),
        (F.col("l_partkey") % 100).alias("py"),
    ).write.parquet(os.path.join(tmp, "points.parquet"))
    return os.path.join(tmp, "points.parquet")


def timed(build_df) -> float:
    t0 = time.perf_counter()
    build_df().write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def spatial_join(spark, points_path: str):
    supplier = load_table(spark, SF, "supplier")
    pts = spark.read.parquet(points_path)
    rects = supplier.select(
        "s_suppkey",
        (F.col("s_suppkey") * 7 % 90).alias("xmin"),
        (F.col("s_suppkey") * 13 % 90).alias("ymin"),
        (F.col("s_suppkey") * 7 % 90 + 3 + F.col("s_suppkey") % 8).alias("xmax"),
        (F.col("s_suppkey") * 13 % 90 + 3 + F.col("s_suppkey") % 5).alias("ymax"),
    )
    pt_tiles = pts.select(
        "px", "py", (F.expr("px div 10") * 16 + F.expr("py div 10")).alias("tile")
    )
    rect_tiles = rects.select(
        "*",
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.expr("xmin div 10"), F.expr("xmax div 10")),
                    lambda tx: F.transform(
                        F.sequence(F.expr("ymin div 10"), F.expr("ymax div 10")),
                        lambda ty: tx * 16 + ty,
                    ),
                )
            )
        ).alias("tile"),
    )
    return (
        pt_tiles.join(rect_tiles, "tile")
        .where(
            F.col("px").between(F.col("xmin"), F.col("xmax"))
            & F.col("py").between(F.col("ymin"), F.col("ymax"))
        )
        .groupBy("s_suppkey")
        .agg(F.count(F.lit(1)).alias("n_points"))
    )


def sweep(name: str, mk_1x, mk_10x, extra: dict | None = None) -> dict:
    # warm both shapes
    timed(mk_1x)
    timed(mk_10x)
    cells_1x, cells_10x = [], []
    for _ in range(3):  # alternating cells, drift-resistant
        cells_1x.append(timed(mk_1x))
        cells_10x.append(timed(mk_10x))
    t1 = statistics.median(cells_1x)
    t10 = statistics.median(cells_10x)
    rec = {
        "lane": name,
        "t1x_med": round(t1, 3),
        "t10x_med": round(t10, 3),
        "growth_exponent": round(math.log10(t10 / t1), 3),
        "cells_1x": [round(c, 3) for c in cells_1x],
        "cells_10x": [round(c, 3) for c in cells_10x],
        **(extra or {}),
    }
    print(json.dumps(rec), flush=True)
    return rec


def main() -> None:
    spark = get_spark("geo-scale-sweep")
    cells_1x_path = _write_1x_cells(spark)
    cells_10x_path = build_scaled_cells(spark, MULT)
    pts_1x_path = _write_1x_points(spark)
    pts_10x_path = build_scaled_points(spark, MULT)

    c1 = lambda: spark.read.parquet(cells_1x_path)  # noqa: E731
    c10 = lambda: spark.read.parquet(cells_10x_path)  # noqa: E731

    # --- structural invariants before any timing ---
    d1 = {
        (r["species"], r["threshold_s"]): (r["n_cells"], r["area"])
        for r in dissolve(c1(), BY, num_partitions=9).collect()
    }
    d10 = {
        (r["species"], r["threshold_s"]): (r["n_cells"], r["area"])
        for r in dissolve(c10(), BY, num_partitions=9).collect()
    }
    assert set(d1) == set(d10) and all(
        d10[k][0] == MULT * d1[k][0]
        and abs(d10[k][1] - MULT * d1[k][1]) < 1e-6
        for k in d1
    ), "lattice replication must scale n_cells/area by exactly MULT"
    p1 = {
        (r["species"], r["threshold_s"]): r["n_components"]
        for r in polygonize(c1().distinct(), BY, num_partitions=9)
        .groupBy(*BY)
        .agg(F.count(F.lit(1)).alias("n_components"))
        .collect()
    }
    p10 = {
        (r["species"], r["threshold_s"]): r["n_components"]
        for r in polygonize(c10().distinct(), BY, num_partitions=9)
        .groupBy(*BY)
        .agg(F.count(F.lit(1)).alias("n_components"))
        .collect()
    }
    assert all(p10[k] == MULT * p1[k] for k in p1), (
        "gapped replication must scale component counts by exactly MULT"
    )
    dt10 = {
        (r["species"], r["threshold_s"]): (r["n_cells"], r["area"])
        for r in dissolve_tiled(c10(), BY, tile_size=_GRID + 1).collect()
    }
    assert all(
        dt10[k][0] == d10[k][0] and abs(dt10[k][1] - d10[k][1]) < 1e-6
        for k in d10
    ), "dissolve_tiled must cover the same region as dissolve"
    print(
        json.dumps(
            {
                "invariants": "ok",
                "groups": len(d1),
                "n_cells_1x": sum(v[0] for v in d1.values()),
                "n_cells_10x": sum(v[0] for v in d10.values()),
            }
        ),
        flush=True,
    )

    # --- growth timings ---
    sweep(
        "geo_dissolve_area",
        lambda: dissolve(c1(), BY, num_partitions=9),
        lambda: dissolve(c10(), BY, num_partitions=9),
    )
    sweep(
        "geo_polygonize_components",
        lambda: polygonize(c1().distinct(), BY, num_partitions=9),
        lambda: polygonize(c10().distinct(), BY, num_partitions=9),
    )
    sweep(
        "geo_spatial_join_bin",
        lambda: spatial_join(spark, pts_1x_path),
        lambda: spatial_join(spark, pts_10x_path),
    )
    # --- dissolve vs dissolve_tiled crossover ---
    tiled_1x = [
        timed(lambda: dissolve_tiled(c1(), BY, tile_size=_GRID + 1))
        for _ in range(3)
    ]
    tiled_10x = [
        timed(lambda: dissolve_tiled(c10(), BY, tile_size=_GRID + 1))
        for _ in range(3)
    ]
    plain_10x = [
        timed(lambda: dissolve(c10(), BY, num_partitions=9)) for _ in range(3)
    ]
    print(
        json.dumps(
            {
                "lane": "dissolve_tiled_crossover",
                "tiled_1x_med": round(statistics.median(tiled_1x), 3),
                "tiled_10x_med": round(statistics.median(tiled_10x), 3),
                "plain_10x_med": round(statistics.median(plain_10x), 3),
                "tile_size": _GRID + 1,
                "note": (
                    "tiled wins once per-group unique cells outgrow one "
                    "task; at 10x each group has 10 replica tiles -> 90 "
                    "level-1 tasks vs plain's 9"
                ),
            }
        ),
        flush=True,
    )


    # --- polygonize vs polygonize_tiled (r13: the stitching twin) ---
    # Invariant first: the tiled kernel must produce the same component
    # counts as plain at 10x (stitch correctness on CROSS-tile components
    # is pinned separately in tests/test_geometry.py — this lattice's +1
    # gap means no component crosses a tile line, isolating the
    # task-granularity term the twin exists for).
    pt10 = {
        (r["species"], r["threshold_s"]): r["n_components"]
        for r in polygonize_tiled(c10().distinct(), BY, tile_size=_GRID + 1)
        .groupBy(*BY)
        .agg(F.count(F.lit(1)).alias("n_components"))
        .collect()
    }
    assert pt10 == p10, "polygonize_tiled component counts diverge at 10x"
    rec_tiled = sweep(
        "geo_polygonize_tiled",
        lambda: polygonize_tiled(c1().distinct(), BY, tile_size=_GRID + 1),
        lambda: polygonize_tiled(c10().distinct(), BY, tile_size=_GRID + 1),
        extra={"tile_size": _GRID + 1},
    )
    plain_poly_10x = [
        timed(lambda: polygonize(c10().distinct(), BY, num_partitions=9))
        for _ in range(3)
    ]
    print(
        json.dumps(
            {
                "lane": "polygonize_tiled_crossover",
                "tiled_10x_med": rec_tiled["t10x_med"],
                "plain_10x_med": round(statistics.median(plain_poly_10x), 3),
                "note": (
                    "plain runs one boundary-walk task per group (9); "
                    "tiled runs one per (group, replica tile) (90) plus "
                    "the stitch cogroup — same crossover logic as "
                    "dissolve (SCALE.md rule 49)"
                ),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
