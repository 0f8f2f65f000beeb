"""One-off audit: driver-style STRINGIFIED compare of every oracle pair.

The driver hashes stringified values, so hazards invisible to value-level
compares still fail its gate: -0.0 vs 0.0, int vs float (0 vs 0.0), None vs
NaN, Decimal vs float.  This script runs every query at sf0.01 on Spark and
its oracle on DuckDB, stringifies every cell with str(), sorts columns by
name and rows lexicographically, and reports any pair whose stringified
multisets differ — with the first few differing cells.

Usage:  python scripts/sweep_stringify.py [name_substring ...]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF = os.environ.get("SWEEP_SF_DIR", "/root/testdata/sf0.01")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def stringify_rows(rows, columns):
    idx = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(str(row[i]) for i in idx) for row in rows]
    out.sort()
    return [columns[i] for i in idx], out


def main():
    import duckdb

    from species_range_data_pipeline_spark.plans import registry
    from species_range_data_pipeline_spark.session import get_spark

    filters = sys.argv[1:]
    queries = registry.all_queries()
    oracles = registry.all_oracles()

    spark = get_spark("sweep")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    names = sorted(oracles)
    if filters:
        names = [n for n in names if any(f in n for f in filters)]

    bad = []
    for i, name in enumerate(names):
        try:
            sdf = queries[name](spark, SF)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001 - audit must not stop
            bad.append((name, f"ERROR {type(e).__name__}: {e}"))
            print(f"[{i+1}/{len(names)}] {name}: ERROR {e}", flush=True)
            continue

        _, s_norm = stringify_rows(s_rows, s_cols)
        _, d_norm = stringify_rows(d_rows, d_cols)
        if s_norm == d_norm:
            print(f"[{i+1}/{len(names)}] {name}: OK ({len(s_norm)} rows)", flush=True)
            continue

        diffs = []
        for rs, rd in zip(s_norm, d_norm):
            if rs != rd:
                cell = [(a, b) for a, b in zip(rs, rd) if a != b]
                diffs.append(cell[:3])
            if len(diffs) >= 3:
                break
        if len(s_norm) != len(d_norm):
            diffs.append(f"rowcount {len(s_norm)} vs {len(d_norm)}")
        bad.append((name, diffs))
        print(f"[{i+1}/{len(names)}] {name}: MISMATCH {diffs}", flush=True)

    print("\n=== SUMMARY ===")
    if not bad:
        print(f"all {len(names)} stringify-clean")
    for name, diffs in bad:
        print(f"STRINGIFY-HAZARD {name}: {diffs}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
