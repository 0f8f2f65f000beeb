"""The SQL function surface (functions/sql_registry.py): every registered
function must agree exactly with the engine's own column/python form —
registration is packaging, never a second implementation."""

from __future__ import annotations

from pyspark.sql import functions as F

from species_range_data_pipeline_spark.functions.sql_registry import (
    register_engine_functions,
)

from .conftest import SF_CORRECT


def test_sql_udfs_match_column_functions(spark):
    names = register_engine_functions(spark)
    assert names == sorted(names)  # stable, documented surface

    from species_range_data_pipeline_spark.functions.text import bpe_token_count
    from species_range_data_pipeline_spark.functions.url import url_host

    urls = [
        ("https://EXAMPLE.com:443/a?q=1",),
        ("http://sub.co.uk/x",),
        ("not a url",),
        (None,),
    ]
    df = spark.createDataFrame(urls, "url string")
    df.createOrReplaceTempView("urls")
    via_sql = [r.h for r in spark.sql(
        "SELECT engine_url_host(url) AS h FROM urls"
    ).collect()]
    via_col = [r.h for r in df.select(url_host(F.col("url")).alias("h")).collect()]
    assert via_sql == via_col

    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet").limit(50)
    docs.createOrReplaceTempView("d50")
    sql_counts = {
        r.doc_id: r.n
        for r in spark.sql(
            "SELECT doc_id, engine_bpe_token_count(text) AS n FROM d50"
        ).collect()
    }
    col_counts = {
        r.doc_id: r.n
        for r in docs.select("doc_id", bpe_token_count("text").alias("n")).collect()
    }
    assert sql_counts == col_counts


def test_sql_pii_redact_matches_plan_chain(spark):
    register_engine_functions(spark)
    sample = [
        ("mail bob@site.org then 10.1.2.3 call +1-555-1234 done",),
        ("clean text with no pii at all",),
    ]
    df = spark.createDataFrame(sample, "t string")
    df.createOrReplaceTempView("pii_rows")
    got = [r.c for r in spark.sql(
        "SELECT engine_pii_redact(t) AS c FROM pii_rows"
    ).collect()]
    assert got == [
        "mail <EMAIL> then <IP> call <PHONE> done",
        "clean text with no pii at all",
    ]


def test_sql_wkb_kernels_match_python(spark):
    import math

    from species_range_data_pipeline_spark.functions.wkb import (
        encode_polygon,
        simplify_wkb,
        wkb_area,
        wkb_area_km2,
    )

    register_engine_functions(spark)
    square = encode_polygon([[(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0), (0.0, 0.0)]])
    df = spark.createDataFrame([(square,)], "g binary")
    df.createOrReplaceTempView("geoms")
    row = spark.sql(
        "SELECT engine_wkb_area(g) AS a, engine_wkb_area_km2(g) AS km2, "
        "engine_simplify_wkb(g, CAST(0.0 AS DOUBLE)) AS s, "
        "engine_wkb_area(NULL) AS a_null FROM geoms"
    ).collect()[0]
    assert math.isclose(row.a, wkb_area(square))
    assert math.isclose(row.km2, wkb_area_km2(square))
    assert bytes(row.s) == simplify_wkb(square, 0.0)  # tolerance 0 == no-op
    assert row.a_null is None
