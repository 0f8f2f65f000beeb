"""Named query plans, registered with the driver contract.

Each plan module exposes ``QUERIES: dict[str, Callable[[SparkSession, str],
DataFrame]]`` and ``ORACLES: dict[str, str]`` (DuckDB ANSI SQL over the same
parquet fixtures).  ``registry.all_queries()`` / ``registry.all_oracles()``
aggregate them for ``__spark_entry__.py``.

Column-name discipline: every computed/aggregate column is aliased the same
in the Spark plan and its oracle; floats produced by aggregation are rounded
to a fixed scale on BOTH sides so the driver's value hash is stable.
"""
