"""Property tests for operators/intervals.py: the bin-and-refine interval
join must equal the all-pairs theta join for any interval set / bin size."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from species_range_data_pipeline_spark.operators.intervals import (
    auto_bin_size,
    interval_join,
)


def _pairs_oracle(rows_l, rows_r, key=None):
    out = set()
    for lid, ls, le, lk in rows_l:
        for rid, rs, re_, rk in rows_r:
            if key is not None and lk != rk:
                continue
            if ls <= re_ and rs <= le:
                out.add((lid, rid))
    return out


def _mkdf(spark, rows, tag):
    return spark.createDataFrame(
        [(i, s, e, k) for (i, s, e, k) in rows],
        f"{tag}_id int, {tag}_s long, {tag}_e long, grp int",
    )


def _random_rows(rng, n, lo, hi, max_len):
    rows = []
    for i in range(n):
        s = rng.randint(lo, hi)
        rows.append((i, s, s + rng.randint(0, max_len), rng.randint(0, 2)))
    return rows


@pytest.mark.parametrize("bin_size", [1, 3, 7, 50, 10_000])
def test_equals_all_pairs_theta_join(spark, bin_size):
    """Random intervals (incl. zero-length and multi-bin spans, negative
    coordinates) — result set is exactly the theta join, each pair once."""
    rng = random.Random(bin_size * 101 + 7)
    rows_l = _random_rows(rng, 80, -40, 120, 25)
    rows_r = _random_rows(rng, 90, -40, 120, 25)
    got_df = interval_join(
        _mkdf(spark, rows_l, "l"),
        _mkdf(spark, rows_r, "r").drop("grp"),
        ("l_s", "l_e"),
        ("r_s", "r_e"),
        bin_size=bin_size,
    )
    got = [(r["l_id"], r["r_id"]) for r in got_df.select("l_id", "r_id").collect()]
    assert len(got) == len(set(got)), "pair emitted more than once"
    assert set(got) == _pairs_oracle(rows_l, rows_r)


def test_extra_on_key_tightens_join(spark):
    rng = random.Random(42)
    rows_l = _random_rows(rng, 60, 0, 100, 15)
    rows_r = _random_rows(rng, 60, 0, 100, 15)
    got_df = interval_join(
        _mkdf(spark, rows_l, "l"),
        _mkdf(spark, rows_r, "r"),
        ("l_s", "l_e"),
        ("r_s", "r_e"),
        bin_size=8,
        extra_on=["grp"],
    )
    got = {(r["l_id"], r["r_id"]) for r in got_df.select("l_id", "r_id").collect()}
    assert got == _pairs_oracle(rows_l, rows_r, key=True)


def test_date_typed_spans_and_auto_bin(spark):
    df_l = spark.createDataFrame(
        [(1, "2024-01-01", "2024-01-10"), (2, "2024-02-01", "2024-02-02"),
         (3, "2024-01-08", "2024-03-01")],
        "l_id int, ls string, le string",
    ).select("l_id", F.to_date("ls").alias("ls"), F.to_date("le").alias("le"))
    df_r = spark.createDataFrame(
        [(10, "2024-01-09", "2024-01-20"), (11, "2024-05-01", "2024-05-02")],
        "r_id int, rs string, re string",
    ).select("r_id", F.to_date("rs").alias("rs"), F.to_date("re").alias("re"))
    b = auto_bin_size(df_l, "ls", "le")
    assert b >= 1
    got = {
        (r["l_id"], r["r_id"])
        for r in interval_join(
            df_l, df_r, ("ls", "le"), ("rs", "re")
        ).select("l_id", "r_id").collect()
    }
    assert got == {(1, 10), (3, 10)}


def test_bad_bin_size_rejected(spark):
    df = spark.createDataFrame([(1, 0, 1)], "id int, s long, e long")
    with pytest.raises(ValueError):
        interval_join(df, df.withColumnRenamed("id", "id2"),
                      ("s", "e"), ("s", "e"), bin_size=0)


def test_operator_plan_is_equi_join(spark):
    """Generic operator keeps the equi-join shape: hash/sort-merge join on
    the bin key, never a nested loop, regardless of span width."""
    rng = random.Random(7)
    df_l = _mkdf(spark, _random_rows(rng, 50, 0, 1000, 200), "l")
    df_r = _mkdf(spark, _random_rows(rng, 50, 0, 1000, 200), "r").drop("grp")
    plan = interval_join(
        df_l, df_r, ("l_s", "l_e"), ("r_s", "r_e"), bin_size=64
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan, plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan, plan


def test_reserved_prefix_collision_raises(spark):
    """Caller columns under the operator's __iv prefix refuse instead of
    silently vanishing from the output."""
    import pytest as _pytest

    from species_range_data_pipeline_spark.operators.intervals import (
        interval_join,
    )

    left = spark.createDataFrame([(1, 5, "x")], "s int, e int, __iv_cache string")
    right = spark.createDataFrame([(2, 6)], "s2 int, e2 int")
    with _pytest.raises(ValueError, match="__iv"):
        interval_join(left, right, ("s", "e"), ("s2", "e2"), bin_size=4)


def test_auto_bin_size_considers_both_sides(spark):
    """Point-like left intervals must not pick bin_size 1 when the right
    side holds year-long spans (the ~365-rows-per-right-row explosion)."""
    from species_range_data_pipeline_spark.operators.intervals import (
        auto_bin_size,
    )

    left = spark.createDataFrame(
        [(d, d) for d in range(0, 50)], "s int, e int"
    )
    right = spark.createDataFrame(
        [(d, d + 365) for d in range(0, 1000, 100)], "s int, e int"
    )
    assert auto_bin_size(left, "s", "e") == 1  # left alone: points
    assert auto_bin_size(left, "s", "e", right, ("s", "e")) >= 300
