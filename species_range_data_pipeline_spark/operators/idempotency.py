"""Idempotent-skip operator (D1, ``species_range_etl.py:64-69,117-120``).

The reference checks ``os.path.exists`` per output file to avoid redoing
work.  Relationally that is: work-list ANTI JOIN already-materialized keys.
At scale the materialized side is a listing of the sink (parquet partition
keys or a manifest), and the anti-join broadcasts whenever it fits.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def pending_work(
    worklist: DataFrame, materialized: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Rows of ``worklist`` whose ``keys`` are not yet in ``materialized``."""
    keys = list(keys)
    return worklist.join(materialized.select(*keys).distinct(), keys, "left_anti")


def materialized_keys(spark, sink_path: str, keys: Sequence[str]) -> DataFrame:
    """Key listing of an existing parquet sink (empty frame if absent)."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(sink_path).select(*keys).distinct()
    except AnalysisException:
        from pyspark.sql import types as T

        return spark.createDataFrame(
            [], T.StructType([T.StructField(k, T.StringType()) for k in keys])
        )
