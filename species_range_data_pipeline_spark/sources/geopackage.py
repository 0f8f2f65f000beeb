"""GeoPackage (OGC .gpkg) reader/writer: SQLite feature tables <-> WKB rows.

The reference round-trips vector artifacts through GeoPandas
(``species_range_etl.py:131,199``), whose modern default container is
GeoPackage rather than shapefile — a user of the reference increasingly
holds ``.gpkg`` files.  GPKG is an open OGC format: a SQLite database with
three mandated metadata tables (``gpkg_contents``,
``gpkg_geometry_columns``, ``gpkg_spatial_ref_sys``) and feature tables
whose geometry column stores a small binary header (magic ``GP``, flags,
srs id, optional envelope) followed by standard WKB.  Python's stdlib
``sqlite3`` reads and writes all of it — no GDAL/fiona, same
no-dependency discipline as ``sources/shapefile.py`` and
``pipeline/geotiff.py``.

Read path: ``binaryFile`` scan of ``*.gpkg`` -> ``mapInPandas``; each task
deserializes its file into an in-memory SQLite connection
(``Connection.deserialize``, stdlib since 3.11 — no temp files), walks the
declared feature tables, and emits one row per feature with the geometry
as engine WKB and the non-geometry columns as a ``map<string,string>``
(the stable-schema contract shared with the shapefile lane; callers cast
the fields they use).  Parse failures become error rows, never
exceptions.  GPKG files cap practically at SQLite's limits but a feature
table is read sequentially per task — one task per file, the same unit as
the shapefile lane (a .gpkg holding a reference-scale species layer is
MBs).

Write path: driver-side ``write_geopackage`` (the artifact-export twin of
``write_shapefile``) creates a spec-conformant file: application_id
``GPKG``, the three system tables, EPSG:4326 in ``gpkg_spatial_ref_sys``,
envelopes in both the geometry headers and ``gpkg_contents`` — what
GeoPandas/QGIS require to open the layer.
"""

from __future__ import annotations

import sqlite3
import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..functions.wkb import decode

_GPKG_MAGIC = b"GP"
#: SQLite application_id 'GPKG' and user_version 1.3.0, per OGC 12-128r17
_APPLICATION_ID = 0x47504B47
_USER_VERSION = 10300

GPKG_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("record", T.LongType()),
        T.StructField("geometry", T.BinaryType()),
        T.StructField("attrs", T.MapType(T.StringType(), T.StringType())),
        T.StructField("error", T.StringType()),
    ]
)

#: envelope indicator (flags bits 1-3) -> number of envelope doubles
_ENVELOPE_DOUBLES = {0: 0, 1: 4, 2: 6, 3: 6, 4: 8}


def parse_gpkg_blob(blob: bytes) -> bytes | None:
    """GPKG geometry blob -> standard WKB payload (``None`` for an empty
    geometry).  Malformed headers raise ``ValueError``."""
    if len(blob) < 8:
        raise ValueError("gpkg geometry blob shorter than its fixed header")
    if blob[:2] != _GPKG_MAGIC:
        raise ValueError(f"bad gpkg geometry magic {blob[:2]!r}")
    version, flags = blob[2], blob[3]
    if version != 0:
        raise ValueError(f"unsupported gpkg geometry version {version}")
    if flags & 0b00100000:
        raise ValueError("ExtendedGeoPackageBinary (flags bit 5) not supported")
    env_ind = (flags >> 1) & 0b111
    if env_ind not in _ENVELOPE_DOUBLES:
        raise ValueError(f"invalid envelope indicator {env_ind}")
    off = 8 + 8 * _ENVELOPE_DOUBLES[env_ind]
    if len(blob) < off:
        raise ValueError("gpkg geometry blob truncated inside its envelope")
    if flags & 0b00010000:  # empty-geometry flag
        return None
    return blob[off:]


def encode_gpkg_blob(wkb: bytes, srid: int = 4326) -> bytes:
    """Standard WKB -> GPKG geometry blob with a computed XY envelope
    (little-endian header, envelope indicator 1)."""
    _, polygons = decode(wkb)
    xs = [x for poly in polygons for ring in poly for x, _ in ring]
    ys = [y for poly in polygons for ring in poly for _, y in ring]
    if not xs:
        # no vertices: mark empty, skip the envelope
        return _GPKG_MAGIC + bytes([0, 0b00010001]) + struct.pack("<i", srid)
    header = _GPKG_MAGIC + bytes([0, 0b00000011]) + struct.pack("<i", srid)
    # GPKG envelope order is [minx, maxx, miny, maxy]
    env = struct.pack("<4d", min(xs), max(xs), min(ys), max(ys))
    return header + env + wkb


def _ident(name: str) -> str:
    """Quote a SQL identifier that came FROM the (hostile) file itself:
    doubling embedded quotes prevents a crafted table/column name in
    gpkg_geometry_columns from breaking out of the quoted identifier and
    injecting SQL (e.g. gigabyte ``randomblob()`` calls) into the
    executor's sqlite connection."""
    return '"' + str(name).replace('"', '""') + '"'


def _feature_tables(con: sqlite3.Connection) -> list[tuple[str, str]]:
    """[(table_name, geometry_column)] for every declared feature layer."""
    rows = con.execute(
        "SELECT g.table_name, g.column_name FROM gpkg_geometry_columns g "
        "JOIN gpkg_contents c ON c.table_name = g.table_name "
        "WHERE c.data_type = 'features' ORDER BY g.table_name"
    ).fetchall()
    return [(str(t), str(c)) for t, c in rows]


def parse_gpkg(content: bytes) -> list[tuple[str, int, bytes | None, dict]]:
    """.gpkg bytes -> [(table, rowid, wkb_or_None, {attr: str})].

    Attribute values surface as strings (``map<string,string>`` schema
    stability, as in the shapefile lane); SQL NULLs are omitted from the
    map so ``attrs['k']`` is never the string 'None'."""
    con = sqlite3.connect(":memory:")
    try:
        con.deserialize(content)
        out: list[tuple[str, int, bytes | None, dict]] = []
        for table, geom_col in _feature_tables(con):
            info = con.execute(f"PRAGMA table_info({_ident(table)})").fetchall()
            # the INTEGER PRIMARY KEY (fid/id) aliases rowid, which already
            # surfaces as the record column — not an attribute
            pk_int = {
                str(r[1])
                for r in info
                if r[5] and str(r[2]).upper() == "INTEGER"
            }
            attr_cols = [
                str(r[1])
                for r in info
                if str(r[1]) != geom_col and str(r[1]) not in pk_int
            ]
            sel = ", ".join(_ident(c) for c in [geom_col, *attr_cols])
            for row in con.execute(
                f"SELECT rowid, {sel} FROM {_ident(table)} ORDER BY rowid"
            ):
                rowid, gblob = row[0], row[1]
                # SQLite is dynamically typed: a hostile file can put an
                # integer where the blob belongs, and bytes(big_int)
                # ALLOCATES that many zero bytes — type-check, never coerce
                if gblob is not None and not isinstance(gblob, (bytes, bytearray)):
                    raise ValueError(
                        f"geometry column of {table!r} holds "
                        f"{type(gblob).__name__}, not a blob"
                    )
                wkb = (
                    parse_gpkg_blob(bytes(gblob)) if gblob is not None else None
                )
                attrs = {
                    c: str(v)
                    for c, v in zip(attr_cols, row[2:])
                    if v is not None
                }
                out.append((table, int(rowid), wkb, attrs))
        return out
    except sqlite3.Error as exc:
        raise ValueError(f"malformed geopackage: {exc}") from exc
    finally:
        con.close()


def read_geopackage(spark: SparkSession, path: str) -> DataFrame:
    """Scan ``*.gpkg`` under ``path``: one row per feature across every
    declared feature table — (path, table, record, geometry WKB, attrs
    map, error).  Parse failures become error rows (the raster/shapefile
    side-channel contract)."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.gpkg")
        .load(path)
        .select("path", "content")
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for path_, blob in zip(pdf["path"], pdf["content"]):
                try:
                    for table, rowid, wkb, attrs in parse_gpkg(bytes(blob)):
                        out.append(
                            {"path": path_, "table": table, "record": rowid,
                             "geometry": wkb, "attrs": attrs, "error": None}
                        )
                except Exception as exc:
                    out.append(
                        {"path": path_, "table": None, "record": None,
                         "geometry": None, "attrs": None,
                         "error": f"{type(exc).__name__}: {exc}"}
                    )
            yield pd.DataFrame(out, columns=[f.name for f in GPKG_SCHEMA.fields])

    return files.mapInPandas(fn, GPKG_SCHEMA)


#: EPSG:4326 WKT for gpkg_spatial_ref_sys — the reference's pinned CRS
#: (``species_range_etl.py:132``)
_WGS84_DEFINITION = (
    'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
    '298.257223563]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]'
)


def write_geopackage(
    rows: list[tuple[bytes | None, dict]],
    gpkg_path: str,
    table: str = "features",
    srid: int = 4326,
) -> None:
    """[(wkb_or_None, attrs)] -> a spec-conformant single-layer ``.gpkg``
    on local disk (application_id, system tables, EPSG:4326 srs row,
    contents envelope) — the artifact-export twin of ``write_shapefile``.
    Attribute keys become TEXT columns (union across rows); a ``None``
    geometry is stored as SQL NULL."""
    if not table.replace("_", "").isalnum():
        raise ValueError(f"unsafe table name {table!r}")
    con = sqlite3.connect(gpkg_path)
    try:
        con.execute(f"PRAGMA application_id = {_APPLICATION_ID}")
        con.execute(f"PRAGMA user_version = {_USER_VERSION}")
        con.execute(
            "CREATE TABLE gpkg_spatial_ref_sys ("
            "srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY, "
            "organization TEXT NOT NULL, organization_coordsys_id INTEGER "
            "NOT NULL, definition TEXT NOT NULL, description TEXT)"
        )
        con.executemany(
            "INSERT INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)",
            [
                ("Undefined cartesian SRS", -1, "NONE", -1, "undefined", None),
                ("Undefined geographic SRS", 0, "NONE", 0, "undefined", None),
                ("WGS 84", 4326, "EPSG", 4326, _WGS84_DEFINITION, None),
            ],
        )
        con.execute(
            "CREATE TABLE gpkg_contents ("
            "table_name TEXT NOT NULL PRIMARY KEY, data_type TEXT NOT NULL, "
            "identifier TEXT UNIQUE, description TEXT DEFAULT '', "
            "last_change DATETIME NOT NULL DEFAULT "
            "(strftime('%Y-%m-%dT%H:%M:%fZ','now')), "
            "min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE, "
            "srs_id INTEGER)"
        )
        con.execute(
            "CREATE TABLE gpkg_geometry_columns ("
            "table_name TEXT NOT NULL, column_name TEXT NOT NULL, "
            "geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL, "
            "z TINYINT NOT NULL, m TINYINT NOT NULL, "
            "CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name))"
        )
        attr_names: list[str] = []
        for _, attrs in rows:
            for k in attrs or {}:
                if k not in attr_names:
                    attr_names.append(k)
        if any(not k.replace("_", "").isalnum() for k in attr_names):
            raise ValueError("attribute names must be alphanumeric/underscore")
        attr_ddl = "".join(f', "{k}" TEXT' for k in attr_names)
        con.execute(
            f'CREATE TABLE "{table}" (id INTEGER PRIMARY KEY AUTOINCREMENT, '
            f"geom BLOB{attr_ddl})"
        )
        minx = miny = float("inf")
        maxx = maxy = float("-inf")
        placeholders = ", ".join("?" for _ in range(1 + len(attr_names)))
        cols = ", ".join(['geom', *(f'"{k}"' for k in attr_names)])
        for wkb, attrs in rows:
            blob = None
            if wkb is not None:
                blob = encode_gpkg_blob(wkb, srid)
                # the blob header already carries this geometry's envelope
                # (computed inside encode_gpkg_blob) — read it back instead
                # of decoding the WKB a second time
                if blob[3] & 0b00001110:
                    gminx, gmaxx, gminy, gmaxy = struct.unpack_from(
                        "<4d", blob, 8
                    )
                    minx, miny = min(minx, gminx), min(miny, gminy)
                    maxx, maxy = max(maxx, gmaxx), max(maxy, gmaxy)
            vals = [blob] + [
                None if attrs is None else attrs.get(k) for k in attr_names
            ]
            con.execute(
                f'INSERT INTO "{table}" ({cols}) VALUES ({placeholders})', vals
            )
        have_env = minx <= maxx
        con.execute(
            "INSERT INTO gpkg_contents (table_name, data_type, identifier, "
            "min_x, min_y, max_x, max_y, srs_id) VALUES (?,?,?,?,?,?,?,?)",
            (
                table, "features", table,
                minx if have_env else None, miny if have_env else None,
                maxx if have_env else None, maxy if have_env else None,
                srid,
            ),
        )
        con.execute(
            "INSERT INTO gpkg_geometry_columns VALUES (?,?,?,?,0,0)",
            (table, "geom", "MULTIPOLYGON", srid),
        )
        con.commit()
    finally:
        con.close()
