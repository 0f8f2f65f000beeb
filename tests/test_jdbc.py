"""K1 JDBC sink round-trip against embedded Derby (ships in Spark's jars).

The reference's sink is ``to_postgis(..., if_exists="replace", chunksize=5)``
(``species_range_etl.py:230-236``); the engine's ``write_speciesdata`` maps
it to Spark's JDBC writer with mode("overwrite") + a sane batchsize.  No
Postgres exists in this environment, but Derby's embedded driver exercises
the exact same codepath (dialect-mapped DDL, batched inserts, overwrite
semantics) inside the local JVM — the loud-gate pattern used for avro."""

from __future__ import annotations

import pytest


def _derby_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
        return True
    except Exception:
        return False


@pytest.fixture()
def derby_url(spark, tmp_path):
    if not _derby_available(spark):
        pytest.skip("Derby embedded driver not on the JVM classpath")
    return f"jdbc:derby:{tmp_path}/speciesdb;create=true"


def test_jdbc_roundtrip_speciesdata(spark, derby_url):
    """written rows == input, through the real JDBC write branch."""
    from species_range_data_pipeline_spark.pipeline.species import (
        write_speciesdata,
    )

    df = spark.createDataFrame(
        [
            (0, "abies-balsamea", 3, bytearray(b"\x01\x03\x00"), "25",
             "vtech", "2020", "current", 1.25),
            (1, "acer-rubrum", 1, bytearray(b"\x01\x03\x01"), "50",
             "gfdl", "2080", "rcp45", 0.5),
        ],
        "sid long, species string, species_id long, geometry binary, "
        "threshold string, source string, year string, scenario string, "
        "area double",
    )
    write_speciesdata(df, jdbc_url=derby_url, table="speciesdata", batchsize=1000)

    back = (
        spark.read.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "speciesdata")
        .load()
    )
    got = sorted(
        (r.sid, r.species, r.species_id, bytes(r.geometry), r.threshold,
         r.source, r.year, r.scenario, r.area)
        for r in back.collect()
    )
    want = sorted(
        (r.sid, r.species, r.species_id, bytes(r.geometry), r.threshold,
         r.source, r.year, r.scenario, r.area)
        for r in df.collect()
    )
    assert got == want


def test_jdbc_overwrite_replaces_not_appends(spark, derby_url):
    """if_exists="replace" parity: a second overwrite leaves ONLY the new
    rows (species_range_etl.py:236)."""
    from species_range_data_pipeline_spark.pipeline.species import (
        write_speciesdata,
    )

    schema = "sid long, species string, area double"
    first = spark.createDataFrame([(0, "a", 1.0), (1, "b", 2.0)], schema)
    second = spark.createDataFrame([(7, "c", 9.0)], schema)
    write_speciesdata(first, jdbc_url=derby_url, table="t2")
    write_speciesdata(second, jdbc_url=derby_url, table="t2")

    back = (
        spark.read.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "t2")
        .load()
        .collect()
    )
    assert [(r.sid, r.species, r.area) for r in back] == [(7, "c", 9.0)]
