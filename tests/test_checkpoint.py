"""Checkpoint + restartable-run semantics: crash mid-write, re-run, and only
the remainder executes; the final sink equals a clean one-shot run."""

from __future__ import annotations

from pyspark.sql import functions as F

from species_range_data_pipeline_spark.catalog import load_table
from species_range_data_pipeline_spark.pipeline.checkpoint import (
    checkpoint,
    run_restartable,
)

from .conftest import SF_SMOKE


def test_checkpoint_truncates_lineage(spark, tmp_path):
    orders = load_table(spark, SF_SMOKE, "orders")
    staged = checkpoint(
        orders.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n")),
        str(tmp_path / "stage1"),
    )
    # the re-read plan is a bare scan: no aggregate left in the lineage
    plan = staged._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" not in plan
    assert sorted(map(tuple, staged.collect())) == sorted(
        map(
            tuple,
            orders.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n")).collect(),
        )
    )


def test_restartable_run_resumes_where_it_stopped(spark, tmp_path):
    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    sink = str(tmp_path / "sink")

    # simulate a partial previous run: only even keys made it
    orders.where(F.pmod("o_orderkey", F.lit(2)) == 0).write.parquet(sink)

    written, skipped = run_restartable(orders, sink, ["o_orderkey"])
    n_total = orders.count()
    assert written + skipped == n_total
    assert skipped == orders.where(F.pmod("o_orderkey", F.lit(2)) == 0).count()

    # sink now complete; an immediate re-run is a no-op
    written2, skipped2 = run_restartable(orders, sink, ["o_orderkey"])
    assert written2 == 0 and skipped2 == n_total

    back = spark.read.parquet(sink)
    assert back.count() == n_total
    assert back.select("o_orderkey").distinct().count() == n_total


def test_materialize_once_blocks_bounded(spark):
    """r19 (VERDICT r18 #7): materialize_once (lazy localCheckpoint)
    frames are released by the ContextCleaner once the DataFrame becomes
    unreachable and a GC runs — a loop of lane invocations must not grow
    executor block-manager storage without bound.  50 invocations of a
    checkpointing lane, references dropped each time, then GC: the
    persistent-RDD registry must come back to a small constant, not ~50
    entries."""
    import gc
    import time

    from species_range_data_pipeline_spark.plans import registry

    fn = registry.all_queries()["dedup_repeated_ngrams"]
    for _ in range(50):
        df = fn(spark, SF_SMOKE)
        df.write.format("noop").mode("overwrite").save()
        del df

    def n_persistent() -> int:
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    # release is GC-driven (documented in functions/materialize.py):
    # drop Python refs, force both GCs, and poll for the async cleaner
    deadline = time.time() + 60
    while time.time() < deadline:
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        if n_persistent() <= 10:
            break
        time.sleep(1)
    assert n_persistent() <= 10, n_persistent()
