"""Schema registry + loaders for the fixture tables.

The reference has no schema system — columns are assigned imperatively after
pandas inference (``species_range_etl.py:39-44``).  Here every table gets an
explicit StructType: at 100 TB, schema inference is a full extra scan and an
inferred-type surprise is a production incident.

Parquet carries its own schema, so loaders validate rather than coerce; the
declared schemas are also the engine's documentation of its data model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

# Tables small enough (at every realistic SF) that joins against them should
# broadcast.  lineitem/orders/events/documents/embeddings are fact-sized.
DIMENSION_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table; parquet scan keeps pushdown + pruning."""
    if name not in SCHEMAS:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        # The fixture's ts is TIMESTAMP(NANOS), which Spark refuses without
        # the legacy conf; and every formatted window bound assumes UTC
        # rendering.  get_spark sets both, but the external driver passes
        # its OWN session — set them here so the contract holds for any
        # caller (runtime-settable; idempotent under our sessions).
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            spark.conf.set("spark.sql.session.timeZone", "UTC")
        except Exception:
            pass  # conf locked -> the read below surfaces the real error
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_event_ts(df)
    return df


def normalize_event_ts(df: "DataFrame") -> "DataFrame":
    """Adapt the events table's ``ts`` to TIMESTAMP whatever the fixture
    writer produced — THE single copy of this rule (r9; it previously
    lived in three places and the fixture's physical type has already
    changed once between rounds):

    - TIMESTAMP(NANOS) arrives as bigint under ``nanosAsLong``: truncate
      to micros with integer div (nanos ~1.7e18 overflow double mantissa);
    - TIMESTAMP_NTZ: cast to TIMESTAMP (value-preserving under the UTC
      session timezone every caller sets);
    - native TIMESTAMP passes through.
    """
    from pyspark.sql import functions as F

    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if ts_type == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All fixture tables as a dict, also registered as temp views so
    ``spark.sql`` plans can reference them by name."""
    tables = {}
    for name in TABLE_NAMES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        tables[name] = df
    return tables


def register_table_view(
    spark: SparkSession, name: str, path: str
) -> DataFrame:
    """Register ANY on-disk table layout the engine can read as a temp
    view, sniffing the format from the directory shape (the CLI's
    ``--table NAME=PATH`` dispatcher, also usable as a library entry):

    - ``_delta_log/`` present        -> Delta layout (read-only)
    - ``metadata/*.metadata.json``   -> Iceberg Hadoop layout (read-only)
    - otherwise                      -> the engine's own manifest table

    The sniff reads directory entries only — no data files are opened
    to decide.  Each reader keeps its own refusal boundaries; this
    helper adds none.
    """
    import glob as _glob
    import os as _os

    if _os.path.isdir(_os.path.join(path, "_delta_log")):
        from .sources.delta_log import register_delta_view

        return register_delta_view(spark, name, path)
    mdir = _os.path.join(path, "metadata")
    if _os.path.isdir(mdir) and (
        _os.path.exists(_os.path.join(mdir, "version-hint.text"))
        or _glob.glob(_os.path.join(mdir, "v*.metadata.json"))
    ):
        from .sources.iceberg_log import register_iceberg_view

        return register_iceberg_view(spark, name, path)
    from .sources.manifest_table import register_manifest_view

    return register_manifest_view(spark, name, path)
