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


def test_jdbc_ewkb_geometry_mode(spark, derby_url):
    """geometry_format="ewkb" ships PostGIS-native EWKB bytes through the
    JDBC writer: the JVM-side byte-splice must equal the pure-Python
    ``to_ewkb`` twin for every row (polygon + multipolygon + NULL), and
    the embedded SRID must round-trip.  Derby stands in for PostGIS via
    the production geometry-typed pattern: the table is pre-created with
    a dialect-typed geometry column (here BLOB; on a
    real target ``geometry(MultiPolygon, 4326)``), and the writer runs
    overwrite + truncate=True so the DDL survives the replace."""
    from species_range_data_pipeline_spark.functions.wkb import (
        encode_multipolygon,
        encode_polygon,
        from_ewkb,
        to_ewkb,
    )
    from species_range_data_pipeline_spark.pipeline.species import (
        write_speciesdata,
    )

    poly = encode_polygon([[(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 0.0)]])
    multi = encode_multipolygon(
        [
            [[(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 0.0)]],
            [[(5.0, 5.0), (6.0, 5.0), (6.0, 6.0), (5.0, 5.0)]],
        ]
    )
    df = spark.createDataFrame(
        [(0, "abies", bytearray(poly)), (1, "acer", bytearray(multi)),
         (2, "nullgeom", None)],
        "sid long, species string, geometry binary",
    )
    # pre-create the geometry-typed table, as one would on PostGIS
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(derby_url)
    try:
        conn.createStatement().execute(
            'CREATE TABLE "geo_ewkb" ("sid" BIGINT, "species" VARCHAR(64), '
            '"geometry" BLOB)'
        )
    finally:
        conn.close()
    write_speciesdata(
        df,
        jdbc_url=derby_url,
        table="geo_ewkb",
        geometry_format="ewkb",
        srid=31370,
        truncate=True,
    )
    back = {
        r.sid: None if r.geometry is None else bytes(r.geometry)
        for r in spark.read.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "geo_ewkb")
        .load()
        .collect()
    }
    assert back[0] == to_ewkb(poly, 31370)
    assert back[1] == to_ewkb(multi, 31370)
    assert back[2] is None
    assert from_ewkb(back[0]) == (31370, poly)
    assert from_ewkb(back[1]) == (31370, multi)


def test_jdbc_ewkt_geometry_mode(spark, derby_url):
    """geometry_format="ewkt" lands SRID=n;... strings — the literal form
    PostGIS ingests where the driver can't bind bytea into geometry."""
    from species_range_data_pipeline_spark.functions.wkb import encode_polygon
    from species_range_data_pipeline_spark.pipeline.species import (
        write_speciesdata,
    )

    poly = encode_polygon([[(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 0.0)]])
    df = spark.createDataFrame(
        [(0, bytearray(poly))], "sid long, geometry binary"
    )
    write_speciesdata(
        df, jdbc_url=derby_url, table="geo_ewkt", geometry_format="ewkt"
    )
    [r] = (
        spark.read.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "geo_ewkt")
        .load()
        .collect()
    )
    assert r.geometry == "SRID=4326;POLYGON((0 0, 2 0, 2 2, 0 0))"

    with pytest.raises(ValueError, match="geometry_format"):
        write_speciesdata(df, jdbc_url=derby_url, geometry_format="wkt")
