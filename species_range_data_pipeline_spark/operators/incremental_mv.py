"""Incremental materialized-view maintenance from the change data feed.

``plans/stats.mv_incremental_refresh`` shows delta maintenance when the
delta is KNOWN (a date partition); this operator generalizes it to ANY
DML the table saw, by consuming ``sources/manifest_table.read_changes``:
inserts contribute +1, deletes -1, and an UPDATE (delete+insert pair)
nets out automatically.  The classic counting algorithm for view
maintenance over algebraic aggregates (sum/count here; avg derives).

At 100 TB the MV refresh cost is proportional to rows CHANGED since the
last refresh, never the base table: the feed reads only files each
commit touched (SCALE.md rule 21), the delta aggregate is one group-key
shuffle over those rows, and the merge is state-sized.  Groups whose
row count reaches zero leave the view — the part naive "just add the
new rows" refreshes get wrong.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def aggregate_mv(df: DataFrame, keys: list[str], measures: list[str]) -> DataFrame:
    """Build the MV state from a snapshot: per group, ``n_rows`` plus
    ``sum_<m>`` for each measure.  (Counts and sums are the algebraic
    core; avg = sum/n at read time.)"""
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(m).alias(f"sum_{m}") for m in measures
    ]
    return df.groupBy(*keys).agg(*aggs)


def apply_changes_to_mv(
    mv: DataFrame, changes: DataFrame, keys: list[str], measures: list[str]
) -> DataFrame:
    """Fold a change feed (rows + ``_change_type``) into MV state.

    Returns the refreshed MV: same schema as ``aggregate_mv``'s output.
    Signed delta aggregation + a union-merge re-aggregate (sum-of-sums),
    then groups with ``n_rows == 0`` are dropped.  Exact for any
    insert/delete multiset the feed reports, in any order.
    """
    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
        F.lit(-1)
    )
    delta = changes.groupBy(*keys).agg(
        F.sum(sign).alias("n_rows"),
        *[F.sum(F.col(m) * sign).alias(f"sum_{m}") for m in measures],
    )
    return (
        mv.unionByName(delta)
        .groupBy(*keys)
        .agg(
            F.sum("n_rows").alias("n_rows"),
            *[F.sum(f"sum_{m}").alias(f"sum_{m}") for m in measures],
        )
        .where(F.col("n_rows") != 0)
    )
