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
from pyspark.sql.functions import col as F_col

_TEXT_FORMATS = {"csv", "json"}
_NATIVE_FORMATS = {"parquet", "orc"}
# avro is row-oriented (splittable, schema-evolving) — the right wire format
# for streaming hand-off, but it needs the spark-avro connector jar, which
# is NOT bundled with pyspark (only the avro-core libs are). Gated: callers
# get a clear remediation message instead of DATA_SOURCE_NOT_FOUND.
_GATED_FORMATS = {"avro"}
SUPPORTED_FORMATS = _TEXT_FORMATS | _NATIVE_FORMATS | _GATED_FORMATS


def avro_available(spark: SparkSession) -> bool:
    """True when the spark-avro connector is registered as a data source.

    Probed through Spark's own lookup (a zero-IO read plan on a missing
    path): classpath checks are wrong here — ``AvroFileFormat`` classes can
    be present while the DataSourceRegister service entry is not, and
    Spark resolves formats through the registry.
    """
    try:
        spark.read.format("avro").schema("__probe long").load(
            "/__avro_availability_probe__"
        )
        return True
    except Exception as e:  # PATH_NOT_FOUND => registered; else missing
        return "PATH_NOT_FOUND" in str(e)


def _check_gated(fmt: str, spark: SparkSession) -> None:
    if fmt in _GATED_FORMATS and not avro_available(spark):
        raise RuntimeError(
            "avro needs the spark-avro connector jar; launch with "
            '--packages org.apache.spark:spark-avro_2.13:<spark version> '
            "or add it to spark.jars — or use the dependency-free lane: "
            "sources.avro_ocf.read_avro_python (stdlib OCF reader, "
            "null/deflate codecs, error side-channel)"
        )


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
    _check_gated(fmt, df.sparkSession)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.format(fmt).save(path)


def write_range_sorted(
    df: DataFrame,
    path: str,
    range_cols: Sequence[str],
    sort_cols: Sequence[str] | None = None,
    num_files: int | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Range-clustered layout: ``repartitionByRange`` on ``range_cols`` then
    ``sortWithinPartitions`` before the write.

    This is the standard time-series/event layout (the linear sibling of
    ``layout_zorder``'s multi-dim curve): each output file covers a
    disjoint range of the cluster key, so parquet footer min/max stats let
    a point or range predicate skip whole files — at 100 TB the difference
    between scanning one file and scanning all of them.  Range partitioning
    samples the key distribution, so skewed keys still yield even file
    sizes (hash partitioning would instead scatter each key's rows across
    every file, destroying the stats).
    """
    _check_format(fmt, None, for_write=True, df=df)
    _check_gated(fmt, df.sparkSession)
    cols = [df[c] for c in range_cols]
    part = (
        df.repartitionByRange(num_files, *cols)
        if num_files
        else df.repartitionByRange(*cols)
    )
    ordered = part.sortWithinPartitions(*(sort_cols or range_cols))
    ordered.write.format(fmt).mode(mode).save(path)


def read_merged_schema(spark: SparkSession, path: str) -> DataFrame:
    """Parquet read across files with EVOLVED schemas (``mergeSchema``).

    A long-lived 100 TB table accretes columns; the default read takes the
    schema from one footer and silently drops the others' new columns.
    ``mergeSchema=true`` unions all footers (missing fields -> null) — an
    extra footer-listing pass, which is why it is an explicit reader here
    and not a default.  Incompatible type changes still fail loudly, as
    they must.
    """
    return spark.read.option("mergeSchema", "true").parquet(path)


def read_csv_with_rejects(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    corrupt_col: str = "_corrupt_record",
) -> tuple[DataFrame, DataFrame]:
    """CSV scan with malformed-row ROUTING: returns (good, rejects).

    PERMISSIVE mode captures each unparseable line verbatim in
    ``corrupt_col`` instead of aborting the scan (FAILFAST) or silently
    dropping it (DROPMALFORMED) — the same error-side-channel contract as
    the zip expander's BadZipFile rows (reference swallows those failures,
    ``species_range_etl.py:161-171``; this engine routes them).  Both
    returned frames come from ONE cached scan predicate-split on the
    corrupt column.
    """
    full_schema = T.StructType(
        list(schema.fields) + [T.StructField(corrupt_col, T.StringType())]
    )
    df = (
        spark.read.schema(full_schema)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .csv(path)
        # Spark requires the corrupt column be materialized (not a raw
        # filter over the scan) before it can be referenced
        .cache()
    )
    good = df.where(F_col(corrupt_col).isNull()).drop(corrupt_col)
    rejects = df.where(F_col(corrupt_col).isNotNull()).select(corrupt_col)
    return good, rejects


def compact_files(
    spark: SparkSession,
    path: str,
    target_rows_per_file: int,
    fmt: str = "parquet",
) -> int:
    """Small-file compaction: rewrite a directory into ~target-sized files.

    Streaming sinks and fine-grained partition writes leave thousands of
    KB-scale files; at scale the NameNode/listing cost and per-file task
    overhead dominate reads.  Rewrites via ``repartition(n)`` (round-robin
    — even output sizes regardless of input skew) to a temp dir, then
    swaps.  Returns the new file count.  On object stores the swap is a
    manifest/rename-tree operation; the local form mirrors it.
    """
    import shutil
    import uuid

    df = spark.read.format(fmt).load(path)
    n = max(1, -(-df.count() // target_rows_per_file))
    tmp = f"{path}__compact_{uuid.uuid4().hex[:8]}"
    df.repartition(n).write.format(fmt).mode("overwrite").save(tmp)
    check = spark.read.format(fmt).load(tmp)
    if check.count() != df.count():  # refuse to swap a bad rewrite
        raise RuntimeError("compaction row-count mismatch; source untouched")
    shutil.rmtree(path)
    shutil.move(tmp, path)
    return n


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | None = None,
) -> DataFrame:
    _check_format(fmt, schema, for_write=False)
    _check_gated(fmt, spark)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        reader = reader.option("header", "true")
    return reader.format(fmt).load(path)
