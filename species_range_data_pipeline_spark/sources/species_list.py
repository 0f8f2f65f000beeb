"""The species-list source (S1/S2, ``species_range_etl.py:31-46``).

The reference GETs a tab-separated file over HTTP, parses it with pandas,
assigns four column names positionally (one literally named ``source???``),
and degrades it to a Python list.  Here:

- the fetch is an injectable ``fetcher`` (driver-side, like the reference's
  single GET — the list is tiny; a 100 TB deployment would land it once and
  ``spark.read.csv`` it),
- the schema is explicit (SURVEY.md §1.1) — ``source_site`` replaces the
  reference's unusable ``source???`` name while keeping its position,
- the result STAYS a DataFrame; downstream stages join/broadcast it instead
  of iterating a driver list (O1 becomes task parallelism).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

SPECIES_LIST_SCHEMA = T.StructType(
    [
        T.StructField("hyphenated_name", T.StringType()),
        T.StructField("regular_name", T.StringType()),
        T.StructField("scientific_name", T.StringType()),
        T.StructField("source_site", T.StringType()),
    ]
)


def read_species_list_text(spark: SparkSession, text: str) -> DataFrame:
    """Parse the TSV payload (no header, 4 positional columns)."""
    rows = []
    for line in text.splitlines():
        if not line.strip():
            continue
        parts = line.split("\t")
        parts = (parts + [None] * 4)[:4]
        rows.append(tuple(parts))
    return spark.createDataFrame(rows, SPECIES_LIST_SCHEMA)


def fetch_species_list(
    spark: SparkSession, url: str, fetcher: Callable[[str], str]
) -> DataFrame:
    """S1: fetch + parse.  ``fetcher`` is injected (tests pass a stub; a
    deployment passes urllib) so the engine has no hard network dependency."""
    return read_species_list_text(spark, fetcher(url))


def read_species_list_csv(spark: SparkSession, path: str) -> DataFrame:
    """S2 on a landed copy: the scale path (splittable, pushdown-friendly)."""
    return spark.read.csv(path, sep="\t", header=False, schema=SPECIES_LIST_SCHEMA)
