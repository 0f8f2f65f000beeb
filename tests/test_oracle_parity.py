"""Local replica of the driver's correctness gate.

For every query with a declared oracle: run the Spark plan at sf0.01 and the
DuckDB SQL on the same parquet, then compare row count, column names, and
values (order-insensitive, column-name-sorted, tiny float tolerance).  This
is STRICTER than surviving the driver's value hash by accident: if this
passes, hash parity should too.
"""

from __future__ import annotations

import math

import pytest

from species_range_data_pipeline_spark.plans import registry

from .conftest import SF_CORRECT

QUERIES = registry.all_queries()
ORACLES = registry.all_oracles()


def _normalize(rows, columns):
    """Sort columns by name, then rows; round floats defensively."""
    idx = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in idx:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                elif v == 0.0 and math.copysign(1.0, v) < 0:
                    # The driver stringifies before hashing, so -0.0 and 0.0
                    # hash differently even though they compare equal.  Keep
                    # them distinct here so the local gate catches what the
                    # driver's hash catches (the window_anomaly_zscore class).
                    v = "-0.0"
                else:
                    v = round(v, 6)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return [columns[i] for i in idx], out


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_oracle_match(name, spark, duck):
    sdf = QUERIES[name](spark, SF_CORRECT)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} (spark) != {len(duck_rows)} (duckdb)"
    )
    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: columns {sorted(spark_cols)} != {sorted(duck_cols)}"
    )

    s_cols, s_rows = _normalize(spark_rows, spark_cols)
    d_cols, d_rows = _normalize(duck_rows, duck_cols)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]} (cols={s_cols})"


def test_every_query_has_runnable_plan(registry_plans):
    """Queries without oracles still must build a DataFrame and return
    columns (r19: reads the shared one-pass registry construction — see
    conftest.registry_plans — instead of paying its own full pass)."""
    assert set(registry_plans) == set(QUERIES)
    for name, (schema, _plan_text) in registry_plans.items():
        assert schema.fields, f"{name}: no columns"


def test_rows_only_set_is_exactly_the_documented_exceptions():
    """Every registered query carries an oracle — the non-SQL-expressible
    ops (kmeans/PCA/BPE-train/FFD/HLL/CMS/LSH) graduated to scale-keyed
    VALUES pins in round 7 (plans/pinned.py): each is deterministic per
    corpus, so its expected rows are captured per fixture scale and the
    driver can hash-check it like any relational query.  A query landing
    here means someone registered it without either a SQL restatement or
    a VALUES pin — decide which before it ships."""
    rows_only = set(registry.all_queries()) - set(registry.all_oracles())
    assert rows_only == set()
