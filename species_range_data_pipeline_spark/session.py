"""SparkSession construction with scale-oriented defaults.

The reference hand-tunes concurrency (30 threads IO, 4 processes CPU,
``species_range_etl.py:246,268``); here the equivalent knobs are Spark conf.
Defaults below are what we would ship to a 1000-executor cluster, modulo
``shuffle.partitions`` which callers should raise (or leave to AQE coalescing,
which is enabled) as data volume grows.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# One place for every tuning decision so tests, bench, and the driver entry
# all run the same engine configuration.
ENGINE_CONF: dict[str, str] = {
    # Adaptive execution: runtime re-plan, partition coalescing, skew-join
    # splitting.  At 100 TB this is what keeps a static shuffle.partitions
    # guess from being fatal.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow-vectorized Python interop: every pandas_udf / applyInPandas /
    # mapInPandas hot path moves columnar batches, not pickled rows.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # Deterministic timestamp semantics vs. the DuckDB oracle.
    "spark.sql.session.timeZone": "UTC",
    # events.parquet carries TIMESTAMP(NANOS); Spark has no nanos type, so
    # read as long and let catalog.load_table truncate to microseconds
    # (exactly what DuckDB's nanos->micros read does).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Dimension tables (region/nation/supplier/part at any SF that matters)
    # should broadcast; 64 MB leaves headroom over the 10 MB default.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Read-side parallelism: at 100 TB the default 128 MB split keeps scan
    # tasks uniform; stated explicitly so it is a decision, not an accident.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
    # local-mode JVM sizing: driver == executors in local[*], and Spark's
    # 1g default heap OOMs a 32-thread run long before the machine does
    # (measured: an 8x sf0.1 corpus kills the text lanes at 1g on a
    # 128 GiB box).  Must be set BEFORE the JVM starts, which holds for
    # every fresh process using get_spark; a cluster submitter overrides
    # per-role memory externally as usual.
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
    "spark.driver.maxResultSize": "4g",
    # UI off for CI/bench hygiene.
    "spark.ui.enabled": "false",
}


def get_spark(app_name: str = "species-range-spark", master: str | None = None) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (all cores if the env
    var is unset); on a real cluster the submitter sets master externally and
    the conf here still applies.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    for key, value in ENGINE_CONF.items():
        builder = builder.config(key, value)
    return builder.getOrCreate()
