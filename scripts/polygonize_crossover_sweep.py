"""Measure the polygonize plain-vs-tiled crossover DIRECTLY through the
second decade (VERDICT r13 next #5).

`polygonize_auto` dispatches on `DISSOLVE_TILED_THRESHOLD_CELLS`, a
constant derived from DISSOLVE's measured second-decade exponents
(SCALE.md rule 49: plain e=1.19, tiled e=1.00, extrapolated wall-clock
crossover ~2M cells/group).  Rule 52 measured the polygonize twin at
10x only and carried rule 49's crossover over by analogy.  This sweep
replaces the analogy with a measurement: the same gapped-lattice
replication (`row += copy * (GRID + 1)` — no cross-copy adjacency, so
component counts scale EXACTLY with the multiplier, asserted before any
timing) at 10x and 100x, plain `polygonize` vs `polygonize_tiled`
alternating in one session, medians of 3 through the noop sink.

Outputs (one JSON line per arm plus a trailer):
- per-scale medians for both kernels,
- second-decade exponents e = log10(t100/t10) for each,
- the measured-exponent crossover extrapolation
  (cells/group where plain's superlinear curve meets tiled's linear
  one), to be recorded in SCALE.md rule 52 and cited by
  `polygonize_auto`'s threshold.

Usage: python scripts/polygonize_crossover_sweep.py
"""

from __future__ import annotations

import json
import math
import statistics
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from pyspark.sql import functions as F  # noqa: E402

from geo_scale_sweep import (  # noqa: E402
    BY,
    _write_1x_cells,
    build_scaled_cells,
    timed,
)
from species_range_data_pipeline_spark.operators.polygonize import (  # noqa: E402
    polygonize,
    polygonize_tiled,
)
from species_range_data_pipeline_spark.plans.geo import _GRID  # noqa: E402
from species_range_data_pipeline_spark.session import get_spark  # noqa: E402


def _component_counts(df) -> dict:
    return {
        (r["species"], r["threshold_s"]): r["n_components"]
        for r in df.groupBy(*BY)
        .agg(F.count(F.lit(1)).alias("n_components"))
        .collect()
    }


def main() -> None:
    spark = get_spark("polygonize-crossover-sweep")
    ts = _GRID + 1  # tiles align with the gapped replicas

    paths = {1: _write_1x_cells(spark)}
    for mult in (10, 100):
        paths[mult] = build_scaled_cells(spark, mult)
    read = {m: (lambda p=paths[m]: spark.read.parquet(p).distinct()) for m in paths}

    # --- invariants: component counts scale exactly with the multiplier ---
    base = _component_counts(polygonize(read[1](), BY, num_partitions=9))
    for mult in (10, 100):
        got_plain = _component_counts(
            polygonize(read[mult](), BY, num_partitions=9)
        )
        got_tiled = _component_counts(
            polygonize_tiled(read[mult](), BY, tile_size=ts)
        )
        assert got_plain == {k: mult * v for k, v in base.items()}, mult
        assert got_tiled == got_plain, f"tiled diverges at {mult}x"
    cells_per_group = {
        m: read[m]().count() // len(base) for m in (1, 10, 100)
    }
    print(
        json.dumps(
            {
                "invariants": "ok",
                "groups": len(base),
                "cells_per_group": cells_per_group,
                "tile_size": ts,
            }
        ),
        flush=True,
    )

    # --- alternating timings, medians of 3, per scale ---
    med: dict[tuple[str, int], float] = {}
    for mult in (10, 100):
        cells: dict[str, list[float]] = {"plain": [], "tiled": []}
        for _ in range(3):
            cells["plain"].append(
                timed(lambda: polygonize(read[mult](), BY, num_partitions=9))
            )
            cells["tiled"].append(
                timed(
                    lambda: polygonize_tiled(read[mult](), BY, tile_size=ts)
                )
            )
        for k, v in cells.items():
            med[(k, mult)] = round(statistics.median(v), 3)
        print(
            json.dumps(
                {
                    "arm": f"{mult}x",
                    "cells_per_group": cells_per_group[mult],
                    "plain": cells["plain"],
                    "tiled": cells["tiled"],
                    "plain_med": med[("plain", mult)],
                    "tiled_med": med[("tiled", mult)],
                }
            ),
            flush=True,
        )

    e_plain = round(math.log10(med[("plain", 100)] / med[("plain", 10)]), 3)
    e_tiled = round(math.log10(med[("tiled", 100)] / med[("tiled", 10)]), 3)
    # crossover: solve t_plain(s) = t_tiled(s) on the measured power laws
    # anchored at the 100x points, s in units of 100x cells/group
    xover = None
    if e_plain > e_tiled:
        lg = (
            math.log10(med[("tiled", 100)] / med[("plain", 100)])
            / (e_plain - e_tiled)
        )
        xover = round(cells_per_group[100] * (10.0 ** lg))
    print(
        json.dumps(
            {
                "trailer": "polygonize_crossover",
                "e_plain_second_decade": e_plain,
                "e_tiled_second_decade": e_tiled,
                "crossover_cells_per_group": xover,
                "note": (
                    "crossover extrapolated from the measured exponent "
                    "pair anchored at the 100x medians; None means the "
                    "plain kernel never loses on these curves"
                ),
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
