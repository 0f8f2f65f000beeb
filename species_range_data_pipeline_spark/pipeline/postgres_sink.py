"""K1 sink against a REAL PostgreSQL server, without JDBC or a driver.

The reference's load step is ``gdf.to_postgis("speciesdata", engine,
if_exists="replace", index=True, index_label="sid", chunksize=5)``
(``species_range_etl.py:230-236``).  The engine's primary JDBC sink
(`pipeline/species.py::write_speciesdata`) covers any JDBC target, but
this container has a PostgreSQL 15 server and no JDBC driver jar — so
this sink writes through the public v3 wire protocol directly
(`sources/pgwire.py`), executor-side:

- the DRIVER opens one connection for DDL: ``replace`` mirrors the
  reference's ``if_exists="replace"`` (DROP + CREATE from the DataFrame
  schema), ``truncate`` preserves pre-created typed DDL (the PostGIS
  ``geometry`` column pattern), ``append`` touches nothing;
- each PARTITION opens its own connection and flushes multi-row
  ``INSERT ... VALUES`` batches — one round trip per batch, the same
  shape Spark's JDBC writer uses, so write parallelism is the DataFrame's
  partitioning (the reference serializes through one SQLAlchemy engine
  at chunksize=5).

At 100 TB the identical code runs unchanged against a networked host
(pass ``host``/``port`` instead of ``unix_socket_dir``); per-partition
connections are the standard fan-in pattern and the DBA-side knob is the
target's connection limit, so size ``df.repartition(n)`` to it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..sources.pgwire import PgConnection, quote_ident, quote_literal
from .species import prepare_geometry_column

_PG_TYPES = {
    "long": "bigint",
    "bigint": "bigint",
    "int": "integer",
    "integer": "integer",
    "smallint": "smallint",
    "double": "double precision",
    "float": "real",
    "string": "text",
    "binary": "bytea",
    "boolean": "boolean",
    "date": "date",
    "timestamp": "timestamp",
    "timestamp_ntz": "timestamp",
}


def _ddl_from_schema(df: DataFrame, table: str) -> str:
    cols = []
    for f in df.schema.fields:
        pg = _PG_TYPES.get(f.dataType.simpleString())
        if pg is None:
            raise ValueError(
                f"no PostgreSQL mapping for column {f.name!r} of type "
                f"{f.dataType.simpleString()!r}; cast it before writing"
            )
        cols.append(f"{quote_ident(f.name)} {pg}")
    return f"CREATE TABLE {quote_ident(table)} ({', '.join(cols)})"


def write_speciesdata_postgres(
    df: DataFrame,
    table: str = "speciesdata",
    *,
    user: str = "postgres",
    database: str = "postgres",
    unix_socket_dir: str | None = None,
    host: str = "127.0.0.1",
    port: int = 5432,
    mode: str = "replace",
    batch_rows: int = 500,
    geometry_format: str = "ewkb",
    geometry_col: str = "geometry",
    srid: int = 4326,
) -> None:
    """Write ``df`` into PostgreSQL over the wire protocol (trust auth).

    ``mode``: ``"replace"`` (reference semantics: drop + create from the
    DataFrame schema), ``"truncate"`` (keep existing typed DDL — required
    when the target column is a real PostGIS ``geometry``), ``"append"``.
    """
    if mode not in ("replace", "truncate", "append"):
        raise ValueError(f"unknown mode {mode!r}")
    if geometry_col in df.columns:
        df = prepare_geometry_column(df, geometry_format, geometry_col, srid)

    conn_kw = dict(
        unix_socket_dir=unix_socket_dir, host=host, port=port
    )
    with PgConnection(user, database, **conn_kw) as c:
        if mode == "replace":
            c.query(f"DROP TABLE IF EXISTS {quote_ident(table)}")
            c.query(_ddl_from_schema(df, table))
        elif mode == "truncate":
            c.query(f"TRUNCATE TABLE {quote_ident(table)}")

    columns = list(df.columns)
    col_sql = ", ".join(quote_ident(c) for c in columns)
    insert_head = f"INSERT INTO {quote_ident(table)} ({col_sql}) VALUES "

    def _write_partition(rows) -> None:
        batch: list[str] = []
        conn = None
        try:
            for row in rows:
                if conn is None:  # connect lazily: empty partitions are free
                    conn = PgConnection(user, database, **conn_kw)
                batch.append(
                    "(" + ",".join(quote_literal(row[c]) for c in columns) + ")"
                )
                if len(batch) >= batch_rows:
                    conn.query(insert_head + ",".join(batch))
                    batch.clear()
            if batch:
                conn.query(insert_head + ",".join(batch))
        finally:
            if conn is not None:
                conn.close()

    df.foreachPartition(_write_partition)


def read_table_postgres(
    spark,
    table: str,
    *,
    user: str = "postgres",
    database: str = "postgres",
    unix_socket_dir: str | None = None,
    host: str = "127.0.0.1",
    port: int = 5432,
):
    """Driver-side readback of a (small) table as (columns, text rows) —
    the verification half of the round trip.  Values arrive in the
    simple-query TEXT format (``bytea`` as ``\\x``-hex); this is a check
    utility, not a distributed source — register a JDBC source when a
    driver jar exists."""
    with PgConnection(
        user, database, unix_socket_dir=unix_socket_dir, host=host, port=port
    ) as c:
        return c.query(
            f"SELECT * FROM {quote_ident(table)}"
        )
