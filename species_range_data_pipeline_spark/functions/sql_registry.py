"""Engine functions on the SQL surface: ``register_engine_functions``.

Two registration lanes, chosen per function by what the body IS:

- **Declarative SQL UDFs** (Spark 4 ``CREATE TEMPORARY FUNCTION ...
  RETURN <expr>``): for functions whose body is pure column math.  These
  are *not* black boxes — Catalyst inlines the expression into the
  calling plan, so they codegen, push down, and prune exactly like the
  hand-written column form.  ``url_host`` / ``url_domain`` /
  ``bpe_token_count`` / ``pii_redact`` ship this way.
- **Pandas UDFs** (``spark.udf.register`` over Arrow batches): for the
  WKB kernels whose bodies are genuinely imperative (ring decoding,
  Douglas-Peucker).  ``wkb_area`` / ``wkb_area_km2`` / ``simplify_wkb``
  ship this way — the same kernels the DataFrame API uses, now callable
  from ``spark.sql`` and the CLI ``sql`` subcommand.

All names are prefixed ``engine_`` so they can never shadow a Spark
builtin (plain ``wkb_area`` would be fine today and break on the day
Spark grows one).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession

from .text import BPE_SPLIT_PATTERN, PII_EMAIL, PII_IP, PII_PHONE


def _q(pattern: str) -> str:
    """Escape a regex for embedding in a single-quoted SQL literal."""
    return pattern.replace("\\", "\\\\").replace("'", "''")


def register_engine_functions(spark: SparkSession) -> list[str]:
    """Install the engine's function surface into the session's SQL
    namespace; returns the registered names (idempotent — CREATE OR
    REPLACE + re-register are both safe to repeat)."""
    sql_udfs = {
        "engine_url_host": (
            "(url STRING) RETURNS STRING RETURN "
            "lower(try_parse_url(url, 'HOST'))"
        ),
        "engine_bpe_token_count": (
            "(t STRING) RETURNS INT RETURN "
            f"size(regexp_extract_all(t, '{_q(BPE_SPLIT_PATTERN)}', 0))"
        ),
        "engine_pii_redact": (
            "(t STRING) RETURNS STRING RETURN "
            "regexp_replace(regexp_replace(regexp_replace(t, "
            f"'{_q(PII_EMAIL)}', '<EMAIL>'), "
            f"'{_q(PII_IP)}', '<IP>'), "
            f"'{_q(PII_PHONE)}', '<PHONE>')"
        ),
    }
    for name, body in sql_udfs.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{body}")

    from pyspark.sql.functions import pandas_udf

    from .wkb import simplify_wkb, wkb_area, wkb_area_km2

    @pandas_udf("double")
    def _area(wkb: pd.Series) -> pd.Series:
        return wkb.map(lambda b: None if b is None else wkb_area(b))

    @pandas_udf("double")
    def _area_km2(wkb: pd.Series) -> pd.Series:
        return wkb.map(lambda b: None if b is None else wkb_area_km2(b))

    @pandas_udf("binary")
    def _simplify(wkb: pd.Series, tol: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if b is None else simplify_wkb(b, float(t))
                for b, t in zip(wkb, tol)
            ]
        )

    spark.udf.register("engine_wkb_area", _area)
    spark.udf.register("engine_wkb_area_km2", _area_km2)
    spark.udf.register("engine_simplify_wkb", _simplify)
    return sorted(
        list(sql_udfs)
        + ["engine_simplify_wkb", "engine_wkb_area", "engine_wkb_area_km2"]
    )
