"""Generic columnar/text source+sink adapters (SURVEY.md §2.1: the reference
reads TSV/zip/ASCII-grid and writes PostGIS only; parquet/ORC/JSON/CSV are
"free" in Spark and the engine exposes them uniformly).

Design rules:
- Explicit schema on read for text formats (CSV/JSON): at 100 TB schema
  inference is a full extra scan, and a surprise type is an incident.
- ``partition_by`` produces Hive-style directory partitioning — the layout
  that makes partition PRUNING work (see tests/test_formats.py, which
  asserts the pruned plan reads a single directory).
- Binary columns round-trip through parquet/ORC only; CSV/JSON refuse them
  loudly rather than silently corrupting (base64 on demand is a caller
  decision, not a default).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_TEXT_FORMATS = {"csv", "json"}
_NATIVE_FORMATS = {"parquet", "orc"}
SUPPORTED_FORMATS = _TEXT_FORMATS | _NATIVE_FORMATS


def _check_format(fmt: str, schema: T.StructType | None, for_write: bool,
                  df: DataFrame | None = None) -> None:
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"format {fmt!r} not in {sorted(SUPPORTED_FORMATS)}")
    if fmt in _TEXT_FORMATS:
        if not for_write and schema is None:
            raise ValueError(f"{fmt} read requires an explicit schema")
        if for_write and df is not None and any(
            isinstance(f.dataType, T.BinaryType) for f in df.schema.fields
        ):
            raise ValueError(
                f"{fmt} cannot carry binary columns; use parquet/orc"
            )


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    _check_format(fmt, None, for_write=True, df=df)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.format(fmt).save(path)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | None = None,
) -> DataFrame:
    _check_format(fmt, schema, for_write=False)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        reader = reader.option("header", "true")
    return reader.format(fmt).load(path)
