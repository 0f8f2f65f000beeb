"""Bucketed co-located join: the join on the bucket key must plan with ZERO
Exchange (the shuffle was paid at write time), and results must match the
plain join."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from species_range_data_pipeline_spark.catalog import load_table
from species_range_data_pipeline_spark.operators.bucketing import (
    read_bucketed,
    write_bucketed,
)

from .conftest import SF_SMOKE


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    orders = load_table(spark, SF_SMOKE, "orders")
    customer = load_table(spark, SF_SMOKE, "customer")
    write_bucketed(orders, "orders_b", ["o_custkey"], 8, str(tmp_path / "ob"))
    write_bucketed(
        customer.withColumnRenamed("c_custkey", "o_custkey"),
        "customer_b",
        ["o_custkey"],
        8,
        str(tmp_path / "cb"),
    )
    yield "orders_b", "customer_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    ot, ct = bucketed_tables
    joined = (
        read_bucketed(spark, ot)
        .join(read_bucketed(spark, ct).hint("merge"), "o_custkey")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    join_part = plan.split("SortMergeJoin")[0] if "SortMergeJoin" in plan else plan
    assert "SortMergeJoin" in plan, plan
    # everything below the SMJ (scans up to the join) must be exchange-free;
    # the aggregate above it still shuffles on c_mktsegment, as it should
    below = plan[plan.index("SortMergeJoin"):]
    assert "Exchange" not in below, below
    del join_part

    # same result as the plain (shuffling) join
    want = (
        load_table(spark, SF_SMOKE, "orders")
        .join(
            load_table(spark, SF_SMOKE, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, want.collect()))
