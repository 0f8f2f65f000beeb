"""Bucketed-table co-location (SURVEY.md §2.1 joins / the 100 TB repeated-
join strategy).

A fact table joined on the same key query after query should pay its shuffle
ONCE, at write time: ``bucketBy(n, key)`` hash-partitions files on disk and
records the layout in the catalog, so every later equi-join or aggregation
on that key reads pre-clustered data — SortMergeJoin with ZERO Exchange
(tests/test_bucketing.py asserts exactly that on the physical plan).

Rules of thumb encoded here:
- bucket count is a power of two sized so one bucket ~ one task's memory;
- sortBy on the bucket key drops the per-task Sort under SMJ too;
- both sides must agree on (key, n_buckets) — the helper takes them
  together so callers can't drift.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    n_buckets: int,
    path: str,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed+sorted external table at ``path``."""
    keys = list(keys)
    (
        df.write.mode(mode)
        .option("path", path)
        .bucketBy(n_buckets, *keys)
        .sortBy(*keys)
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (layout metadata comes from the catalog —
    reading the bare files would lose bucketing)."""
    return spark.table(table)
