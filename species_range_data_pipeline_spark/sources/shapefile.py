"""Minimal ESRI Shapefile reader/writer: .shp polygons <-> WKB rows.

The reference round-trips its dissolve output through shapefiles
(``to_file``/``read_file`` as GeoDataFrames, ``species_range_etl.py:131,199``),
so a user of the reference has ``.shp`` artifacts on disk.  This module lets
the engine ingest them — and produce them — without GDAL/fiona: the
shapefile main-file layout and the dBase III attribute format are public,
fixed, and small.

Scope: shape types Null (0) and Polygon (5) — the only types the reference
ever writes.  Ring conversion: shapefile outer rings are CW and holes CCW;
the engine's WKB convention (``functions/wkb.py``) is the opposite, so rings
are re-wound on the way through.  Rings are grouped into polygons by
winding: each CW ring starts a new polygon, subsequent CCW rings are its
holes (the common GIS heuristic).  That ordering is only trustworthy when
the record has a single outer ring; records with a hole-wound first ring
OR with holes among multiple outers fall back to point-in-ring containment
grouping instead of trusting order.

Attributes ride in the sidecar ``.dbf`` (dBase III): parsed into a
``map<string,string>`` column so the schema is stable across layers —
callers cast the fields they use.  Other sidecars (.shx index, .prj) are
not needed for a full sequential read, but the writer emits them because
downstream GeoPandas/fiona consumers require the index and read the CRS
from ``.prj``.

Scale note: one task per shapefile via ``binaryFile`` + ``mapInPandas``;
shapefiles cap at 2 GB by format, so a file is always a sane task unit.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..functions.wkb import Ring, encode_multipolygon, encode_polygon, ring_signed_area

_SHP_MAGIC = 9994
_SHAPE_NULL = 0
_SHAPE_POLYGON = 5

SHAPE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("record", T.IntegerType()),
        T.StructField("geometry", T.BinaryType()),
        T.StructField("attrs", T.MapType(T.StringType(), T.StringType())),
        T.StructField("error", T.StringType()),
    ]
)


def parse_shp(content: bytes) -> list[tuple[int, bytes | None]]:
    """.shp bytes -> [(record_number, wkb_or_None), ...].  Null shapes carry
    ``None`` geometry; unsupported shape types and malformed input raise
    ``ValueError`` (struct-layer errors normalized)."""
    try:
        return _parse_shp(content)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"malformed shapefile: {exc}") from exc


def _parse_shp(content: bytes) -> list[tuple[int, bytes | None]]:
    if len(content) < 100:
        raise ValueError("not a shapefile: header too short")
    (magic,) = struct.unpack_from(">i", content, 0)
    if magic != _SHP_MAGIC:
        raise ValueError(f"not a shapefile: file code {magic}")
    (file_words,) = struct.unpack_from(">i", content, 24)
    end = min(file_words * 2, len(content))
    out: list[tuple[int, bytes | None]] = []
    off = 100
    while off + 8 <= end:
        recno, content_words = struct.unpack_from(">ii", content, off)
        off += 8
        rec_end = off + content_words * 2
        if rec_end > len(content):
            raise ValueError(f"truncated record {recno}")
        (shape_type,) = struct.unpack_from("<i", content, off)
        if shape_type == _SHAPE_NULL:
            out.append((recno, None))
        elif shape_type == _SHAPE_POLYGON:
            out.append((recno, _polygon_record_to_wkb(content, off)))
        else:
            raise ValueError(f"unsupported shape type {shape_type} (record {recno})")
        off = rec_end
    return out


def _polygon_record_to_wkb(content: bytes, off: int) -> bytes:
    """One Polygon record -> WKB Polygon/MultiPolygon, rings re-wound to the
    WKB convention (exterior CCW, holes CW)."""
    n_parts, n_points = struct.unpack_from("<ii", content, off + 36)
    # counts are attacker-controlled: bound BEFORE building format strings
    # (f"<{n}i" with a 4-billion n allocates gigabytes)
    if (
        n_parts < 0
        or n_points < 0
        or off + 44 + 4 * n_parts + 16 * n_points > len(content)
    ):
        raise ValueError(
            f"polygon record declares {n_parts} parts/{n_points} points "
            "beyond the file size"
        )
    parts = list(struct.unpack_from(f"<{n_parts}i", content, off + 44))
    pts_off = off + 44 + 4 * n_parts
    flat = struct.unpack_from(f"<{2 * n_points}d", content, pts_off)
    rings: list[Ring] = []
    bounds = parts + [n_points]
    for i in range(n_parts):
        ring = [
            (flat[2 * j], flat[2 * j + 1])
            for j in range(bounds[i], bounds[i + 1])
        ]
        rings.append(ring)
    # group by winding: shapefile outer = CW (signed area < 0), hole = CCW.
    # The sequential heuristic (each CW ring starts a polygon, following CCW
    # rings are its holes) only holds when every hole directly follows its
    # outer.  It is provably safe only when there is at most one outer ring
    # (every hole must belong to it) — with multiple outers a writer may
    # interleave (outerA, hole-of-B, outerB), which sequential grouping
    # silently mis-attaches.  So: any record with a hole and more than one
    # outer, or a hole-first record, uses point-in-ring containment grouping.
    is_outer = [ring_signed_area(r) <= 0 for r in rings]
    n_outer = sum(is_outer)
    has_hole = n_outer < len(rings)
    if rings and (not is_outer[0] or (has_hole and n_outer > 1)):
        return _group_rings_by_containment(rings, is_outer)
    polygons: list[list[Ring]] = []
    for ring, outer in zip(rings, is_outer):
        wound = list(reversed(ring))  # flip to the WKB convention
        if outer or not polygons:
            polygons.append([wound])
        else:
            polygons[-1].append(wound)
    if len(polygons) == 1:
        return encode_polygon(polygons[0])
    return encode_multipolygon(polygons)


def _point_in_ring(x: float, y: float, ring: Ring) -> bool:
    """Ray-casting point-in-polygon test (boundary treatment irrelevant
    here: hole vertices never lie exactly on a valid outer boundary)."""
    inside = False
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        if (y1 > y) != (y2 > y):
            xin = (x2 - x1) * (y - y1) / (y2 - y1) + x1
            if x < xin:
                inside = not inside
    return inside


def _group_rings_by_containment(rings: list[Ring], is_outer: list[bool]) -> bytes:
    """Hole-first fallback: assign each CCW (hole) ring to the smallest CW
    outer ring containing its first vertex; unassignable holes or records
    with no outer ring at all raise into the error channel."""
    outers = [
        (i, r, abs(ring_signed_area(r)))
        for i, (r, o) in enumerate(zip(rings, is_outer))
        if o
    ]
    if not outers:
        raise ValueError("polygon record has only hole-wound rings")
    polygons: dict[int, list[Ring]] = {
        i: [list(reversed(r))] for i, r, _ in outers
    }
    for ring, outer in zip(rings, is_outer):
        if outer:
            continue
        px, py = ring[0]
        best: int | None = None
        best_area = float("inf")
        for i, oring, area in outers:
            if area < best_area and _point_in_ring(px, py, oring):
                best, best_area = i, area
        if best is None:
            raise ValueError("hole ring not contained in any outer ring")
        polygons[best].append(list(reversed(ring)))
    grouped = [polygons[i] for i, _, _ in outers]
    if len(grouped) == 1:
        return encode_polygon(grouped[0])
    return encode_multipolygon(grouped)


#: Esri WKT for EPSG:4326, what GeoPandas ``to_file`` writes for the
#: reference's pinned CRS (``species_range_etl.py:132``).
WGS84_PRJ_WKT = (
    'GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",'
    'SPHEROID["WGS_1984",6378137.0,298.257223563]],'
    'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]]'
)


def encode_shp(geometries: list[list[list[Ring]]]) -> bytes:
    """[(polygons per record)] -> .shp bytes.  Input rings follow the WKB
    convention (exterior CCW, holes CW) — i.e. exactly what
    ``functions.wkb.decode`` returns — and are re-wound to shapefile order.
    A record with an empty polygon list becomes a Null shape."""
    return encode_shp_shx(geometries)[0]


def encode_shp_shx(geometries: list[list[list[Ring]]]) -> tuple[bytes, bytes]:
    """Like ``encode_shp`` but also returns the fixed-stride ``.shx`` index
    (100-byte header + one big-endian (offset_words, content_words) pair per
    record) that GeoPandas/fiona readers require."""
    records = []
    minx = miny = float("inf")
    maxx = maxy = float("-inf")
    for recno, polygons in enumerate(geometries, start=1):
        if not polygons:
            body = struct.pack("<i", _SHAPE_NULL)
            records.append(struct.pack(">ii", recno, len(body) // 2) + body)
            continue
        rings: list[Ring] = []
        for rings_of_poly in polygons:
            for k, ring in enumerate(rings_of_poly):
                pts = list(ring)
                if pts and pts[0] != pts[-1]:
                    pts.append(pts[0])
                rings.append(list(reversed(pts)))  # WKB winding -> shapefile
        xs = [x for r in rings for x, _ in r]
        ys = [y for r in rings for _, y in r]
        bx = (min(xs), min(ys), max(xs), max(ys))
        minx, miny = min(minx, bx[0]), min(miny, bx[1])
        maxx, maxy = max(maxx, bx[2]), max(maxy, bx[3])
        n_points = sum(len(r) for r in rings)
        body = struct.pack("<i4d", _SHAPE_POLYGON, *bx)
        body += struct.pack("<ii", len(rings), n_points)
        part_off = 0
        for r in rings:
            body += struct.pack("<i", part_off)
            part_off += len(r)
        for r in rings:
            for x, y in r:
                body += struct.pack("<dd", x, y)
        records.append(struct.pack(">ii", recno, len(body) // 2) + body)
    payload = b"".join(records)
    if not any(geometries):
        minx = miny = maxx = maxy = 0.0

    def _header(file_len_bytes: int) -> bytes:
        h = struct.pack(
            ">i5ii", _SHP_MAGIC, 0, 0, 0, 0, 0, file_len_bytes // 2
        )
        h += struct.pack("<ii", 1000, _SHAPE_POLYGON)
        h += struct.pack("<4d", minx, miny, maxx, maxy)
        h += struct.pack("<4d", 0.0, 0.0, 0.0, 0.0)  # z/m ranges
        return h

    index = bytearray()
    off_words = 50  # 100-byte main-file header
    for rec in records:
        content_words = (len(rec) - 8) // 2
        index += struct.pack(">ii", off_words, content_words)
        off_words += len(rec) // 2
    shp = _header(100 + len(payload)) + payload
    shx = _header(100 + len(index)) + bytes(index)
    return shp, shx


def parse_dbf(content: bytes) -> list[dict[str, str] | None]:
    """dBase III .dbf -> one {field: trimmed string} dict per record slot.
    Numeric/char/date fields all surface as strings.  Deleted records
    ('*' flag) yield ``None`` IN PLACE rather than being skipped: the .shp
    pairs attributes to shapes positionally, and dropping a deleted slot
    would silently shift every subsequent record's attributes onto the
    wrong geometry.  Malformed input raises ``ValueError``."""
    try:
        return _parse_dbf(content)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"malformed dbf: {exc}") from exc


def _parse_dbf(content: bytes) -> list[dict[str, str] | None]:
    if len(content) < 32:
        raise ValueError("not a dbf: header too short")
    n_records, header_size, record_size = struct.unpack_from("<IHH", content, 4)
    if record_size == 0 or n_records > len(content):
        raise ValueError(
            f"dbf declares {n_records} records of {record_size} bytes "
            f"in a {len(content)}-byte file"
        )
    fields: list[tuple[str, int]] = []
    off = 32
    while off + 32 <= header_size and content[off] != 0x0D:
        raw_name = content[off : off + 11].split(b"\x00", 1)[0]
        length = content[off + 16]
        fields.append((raw_name.decode("ascii", "replace"), length))
        off += 32
    out: list[dict[str, str] | None] = []
    off = header_size
    for _ in range(n_records):
        if off + record_size > len(content):
            break
        if content[off : off + 1] == b"*":  # deleted: keep the slot
            out.append(None)
        else:
            rec: dict[str, str] = {}
            pos = off + 1
            for name, length in fields:
                rec[name] = (
                    content[pos : pos + length].decode("ascii", "replace").strip()
                )
                pos += length
            out.append(rec)
        off += record_size
    return out


def encode_dbf(records: list[dict[str, str] | None]) -> bytes:
    """Inverse of ``parse_dbf``: uniform-keyed string records -> dBase III
    bytes (all fields type 'C', width = longest value, capped 254).
    ``None`` slots (``parse_dbf``'s representation of deleted records) are
    written as empty records so a read->write round-trip of a file holding
    deleted records keeps its positional alignment instead of crashing."""
    records = [r if r is not None else {} for r in records]
    names = next((list(r) for r in records if r), [])
    widths = {
        n: min(254, max(1, max((len(str(r.get(n, ""))) for r in records), default=1)))
        for n in names
    }
    header_size = 32 + 32 * len(names) + 1
    record_size = 1 + sum(widths.values())
    out = bytearray()
    out += struct.pack(
        "<B3BIHH20x", 0x03, 26, 8, 13, len(records), header_size, record_size
    )
    for n in names:
        desc = bytearray(32)
        desc[0:11] = n.encode("ascii", "replace")[:11].ljust(11, b"\x00")
        desc[11] = ord("C")
        desc[16] = widths[n]
        out += desc
    out += b"\x0d"
    for r in records:
        out += b" "
        for n in names:
            out += str(r.get(n, "")).encode("ascii", "replace")[: widths[n]].ljust(
                widths[n], b" "
            )
    out += b"\x1a"
    return bytes(out)


def read_shapefile(spark: SparkSession, path: str) -> DataFrame:
    """S-side entry: scan ``*.shp`` under ``path`` (with any sibling
    ``.dbf``), one row per shape record: (path, record, geometry WKB,
    attrs map, error).  Parse failures become error rows, never exceptions
    — the same side-channel contract as the raster lanes."""
    shp = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.shp")
        .load(path)
        .select("path", "content")
    )
    dbf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.dbf")
        .load(path)
        .selectExpr(
            "regexp_replace(path, '\\\\.dbf$', '.shp') AS path",
            "content AS dbf_content",
        )
    )
    joined = shp.join(dbf, "path", "left")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for path_, blob, dblob in zip(
                pdf["path"], pdf["content"], pdf["dbf_content"]
            ):
                try:
                    shapes = parse_shp(bytes(blob))
                    attrs = (
                        parse_dbf(bytes(dblob)) if dblob is not None else []
                    )
                    for i, (recno, wkb) in enumerate(shapes):
                        out.append(
                            {"path": path_, "record": recno, "geometry": wkb,
                             "attrs": attrs[i] if i < len(attrs) else None,
                             "error": None}
                        )
                except Exception as exc:
                    out.append(
                        {"path": path_, "record": None, "geometry": None,
                         "attrs": None,
                         "error": f"{type(exc).__name__}: {exc}"}
                    )
            yield pd.DataFrame(out, columns=[f.name for f in SHAPE_SCHEMA.fields])

    return joined.mapInPandas(fn, SHAPE_SCHEMA)


def write_shapefile(
    rows: list[tuple[list, dict]], shp_path: str, prj_wkt: str = WGS84_PRJ_WKT
) -> None:
    """[(polygons, attrs)] -> ``.shp`` + ``.shx`` + ``.dbf`` + ``.prj`` on
    local disk — the full sidecar set a GeoDataFrame-based consumer needs
    (fiona requires the ``.shx`` index; the reference pins EPSG:4326, which
    travels in ``.prj`` — ``species_range_etl.py:131-132,199``).
    ``polygons`` uses the WKB ring convention (``functions.wkb.decode``
    output)."""
    base = shp_path[:-4] if shp_path.endswith(".shp") else shp_path
    shp, shx = encode_shp_shx([g for g, _ in rows])
    with open(base + ".shp", "wb") as fh:
        fh.write(shp)
    with open(base + ".shx", "wb") as fh:
        fh.write(shx)
    with open(base + ".dbf", "wb") as fh:
        fh.write(encode_dbf([a for _, a in rows]))
    with open(base + ".prj", "w", encoding="ascii") as fh:
        fh.write(prj_wkt)
