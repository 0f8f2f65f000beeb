"""GeoPackage interop: geometry-blob encode/parse, spec-conformant file
write (system tables, application_id, envelopes), the Spark read lane with
its error channel, and cross-format parity with the shapefile lane."""

from __future__ import annotations

import sqlite3
import struct

import pytest

from species_range_data_pipeline_spark.functions.wkb import (
    decode,
    encode_multipolygon,
    encode_polygon,
    wkb_area,
)
from species_range_data_pipeline_spark.sources.geopackage import (
    encode_gpkg_blob,
    parse_gpkg,
    parse_gpkg_blob,
    read_geopackage,
    write_geopackage,
)

OUTER = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)]  # CCW
HOLE = [(1.0, 1.0), (1.0, 2.0), (2.0, 2.0), (2.0, 1.0), (1.0, 1.0)]  # CW
FAR = [(100.0, 100.0), (101.0, 100.0), (101.0, 101.0), (100.0, 101.0), (100.0, 100.0)]


def test_gpkg_blob_roundtrip_and_envelope():
    wkb = encode_polygon([OUTER, HOLE])
    blob = encode_gpkg_blob(wkb, srid=4326)
    assert blob[:2] == b"GP"
    # header: magic(2) version(1) flags(1) srid(4) envelope(4 doubles)
    assert struct.unpack_from("<i", blob, 4)[0] == 4326
    minx, maxx, miny, maxy = struct.unpack_from("<4d", blob, 8)
    assert (minx, maxx, miny, maxy) == (0.0, 4.0, 0.0, 4.0)
    assert parse_gpkg_blob(blob) == wkb


def test_gpkg_blob_rejects_garbage():
    with pytest.raises(ValueError, match="magic"):
        parse_gpkg_blob(b"XX" + b"\x00" * 20)
    with pytest.raises(ValueError, match="shorter"):
        parse_gpkg_blob(b"GP")
    wkb = encode_polygon([OUTER])
    blob = bytearray(encode_gpkg_blob(wkb))
    blob[3] |= 0b00100000  # extended-binary flag
    with pytest.raises(ValueError, match="Extended"):
        parse_gpkg_blob(bytes(blob))
    # truncated inside the declared envelope
    with pytest.raises(ValueError, match="truncated"):
        parse_gpkg_blob(bytes(encode_gpkg_blob(wkb)[:20]))


def test_write_geopackage_is_spec_conformant(tmp_path):
    """A written .gpkg carries the GPKG application_id, the three system
    tables, the EPSG:4326 srs row, and a contents envelope matching the
    data — what GeoPandas/QGIS check before opening a layer."""
    p = str(tmp_path / "out.gpkg")
    write_geopackage(
        [
            (encode_polygon([OUTER, HOLE]), {"species": "abies", "thr": "25"}),
            (encode_multipolygon([[OUTER], [FAR]]), {"species": "picea"}),
            (None, {"species": "ghost"}),
        ],
        p,
        table="ranges",
    )
    con = sqlite3.connect(p)
    try:
        app_id = con.execute("PRAGMA application_id").fetchone()[0]
        assert app_id == 0x47504B47
        names = {
            r[0]
            for r in con.execute(
                "SELECT name FROM sqlite_master WHERE type='table'"
            )
        }
        assert {
            "gpkg_contents",
            "gpkg_geometry_columns",
            "gpkg_spatial_ref_sys",
            "ranges",
        } <= names
        srs = con.execute(
            "SELECT organization, organization_coordsys_id FROM "
            "gpkg_spatial_ref_sys WHERE srs_id = 4326"
        ).fetchone()
        assert srs == ("EPSG", 4326)
        row = con.execute(
            "SELECT data_type, min_x, min_y, max_x, max_y, srs_id "
            "FROM gpkg_contents WHERE table_name = 'ranges'"
        ).fetchone()
        assert row == ("features", 0.0, 0.0, 101.0, 101.0, 4326)
        assert con.execute("SELECT count(*) FROM ranges").fetchone()[0] == 3
        assert (
            con.execute(
                "SELECT count(*) FROM ranges WHERE geom IS NULL"
            ).fetchone()[0]
            == 1
        )
    finally:
        con.close()


def test_parse_gpkg_roundtrip_attrs_and_null_geometry(tmp_path):
    p = str(tmp_path / "t.gpkg")
    wkb = encode_polygon([OUTER, HOLE])
    write_geopackage(
        [(wkb, {"species": "abies", "thr": "25"}), (None, {"species": "x"})], p
    )
    feats = parse_gpkg((tmp_path / "t.gpkg").read_bytes())
    assert len(feats) == 2
    table, rowid, got, attrs = feats[0]
    assert (table, rowid) == ("features", 1)
    assert got == wkb and wkb_area(got) == pytest.approx(15.0)
    assert attrs == {"species": "abies", "thr": "25"}
    # second record: NULL geometry, missing attr key omitted from the map
    assert feats[1][2] is None and feats[1][3] == {"species": "x"}


def test_read_geopackage_spark_lane_and_error_channel(spark, tmp_path):
    """The Spark lane reads every feature table of every .gpkg under the
    path; a corrupt file becomes an error ROW, never an exception."""
    write_geopackage(
        [(encode_polygon([OUTER]), {"species": "abies"})],
        str(tmp_path / "good.gpkg"),
        table="layer_a",
    )
    (tmp_path / "bad.gpkg").write_bytes(b"SQLite format 3\x00" + b"\x99" * 64)
    df = read_geopackage(spark, str(tmp_path)).cache()
    ok = df.where("error IS NULL").collect()
    assert len(ok) == 1
    assert (ok[0]["table"], ok[0]["record"]) == ("layer_a", 1)
    assert decode(bytes(ok[0]["geometry"]))[1][0][0] == OUTER
    assert ok[0]["attrs"]["species"] == "abies"
    bad = df.where("error IS NOT NULL").collect()
    assert len(bad) == 1 and "bad.gpkg" in bad[0]["path"]
    df.unpersist()


def test_gpkg_shapefile_cross_format_parity(spark, tmp_path):
    """The same geometry set written as .gpkg and as .shp reads back to
    the same WKB rows through each lane — format interchange holds."""
    from species_range_data_pipeline_spark.sources.shapefile import (
        read_shapefile,
        write_shapefile,
    )

    rows = [
        ([[OUTER, HOLE]], {"species": "abies"}),
        ([[OUTER], [FAR]], {"species": "picea"}),
    ]
    write_shapefile(rows, str(tmp_path / "t.shp"))
    write_geopackage(
        [
            (
                encode_polygon(p[0]) if len(p) == 1 else encode_multipolygon(p),
                a,
            )
            for p, a in rows
        ],
        str(tmp_path / "t.gpkg"),
    )
    shp = {
        r["record"]: (wkb_area(bytes(r["geometry"])), r["attrs"]["species"])
        for r in read_shapefile(spark, str(tmp_path)).collect()
    }
    gpkg = {
        r["record"]: (wkb_area(bytes(r["geometry"])), r["attrs"]["species"])
        for r in read_geopackage(spark, str(tmp_path)).collect()
    }
    assert shp == gpkg == {1: (15.0, "abies"), 2: (17.0, "picea")}


def test_hostile_identifier_cannot_inject_sql(tmp_path):
    """A crafted gpkg_geometry_columns row whose table name embeds a
    quote must not break out of the quoted identifier (SQL injection in
    the executor's sqlite connection): the name is either handled as an
    exact identifier (missing table -> sqlite error -> ValueError) or
    rejected — never executed as SQL."""
    evil = 'x" UNION SELECT zeroblob(100000000), 1 --'
    p = str(tmp_path / "evil.gpkg")
    con = sqlite3.connect(p)
    con.execute(
        "CREATE TABLE gpkg_contents (table_name TEXT, data_type TEXT)"
    )
    con.execute(
        "CREATE TABLE gpkg_geometry_columns (table_name TEXT, column_name TEXT)"
    )
    con.execute("INSERT INTO gpkg_contents VALUES (?, 'features')", (evil,))
    con.execute(
        "INSERT INTO gpkg_geometry_columns VALUES (?, 'geom')", (evil,)
    )
    con.commit()
    con.close()
    with pytest.raises(ValueError):
        parse_gpkg((tmp_path / "evil.gpkg").read_bytes())


def test_random_geometries_roundtrip_both_formats(tmp_path):
    """Property: polygonize arbitrary cell sets (holes, multiparts,
    single cells) and the resulting WKB survives shapefile AND gpkg
    write->parse byte-identically (modulo the documented ring re-winding
    round trip, which must be value-identical)."""
    import random

    import numpy as np

    from species_range_data_pipeline_spark.functions.geometry import (
        union_cells_to_multipolygon,
    )
    from species_range_data_pipeline_spark.functions.wkb import decode, wkb_area
    from species_range_data_pipeline_spark.sources.shapefile import (
        encode_shp,
        parse_shp,
    )

    rng = random.Random(31)
    for trial in range(25):
        n = rng.randrange(1, 60)
        rc = {(rng.randrange(9), rng.randrange(9)) for _ in range(n)}
        rows = np.array([r for r, _ in rc])
        cols = np.array([c for _, c in rc])
        wkb, area, n_parts, n_cells = union_cells_to_multipolygon(rows, cols)

        # gpkg: header strip must return the WKB bit-exact
        blob = encode_gpkg_blob(wkb)
        assert parse_gpkg_blob(blob) == wkb

        # shapefile: ring winding flips on write and flips back on read —
        # decoded rings must be value-identical
        polys = decode(wkb)[1]
        back = parse_shp(encode_shp([polys]))[0][1]
        assert wkb_area(back) == wkb_area(wkb) == area, trial
        assert decode(back)[1] == polys, trial
