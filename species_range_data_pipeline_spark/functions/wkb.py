"""Minimal WKB (well-known binary) codec for Polygon / MultiPolygon.

The engine's geometry column convention is WKB bytes in a BinaryType column
(SURVEY.md §1.4) — the same bytes a PostGIS sink or Sedona adapter would
consume.  Only the two geometry types the species pipeline produces are
implemented (``species_range_etl.py:127`` emits polygons; the dissolve at
``:205`` can merge them into multipolygons).

Layout (little-endian):
  byte order (1 byte, 0x01) | geom type (uint32) | payload
  Polygon: n_rings, then per ring n_points + points (x, y float64)
  MultiPolygon: n_polygons, then each polygon as a full WKB geometry
"""

from __future__ import annotations

import struct

_POLYGON = 3
_MULTIPOLYGON = 6

Ring = list[tuple[float, float]]


def encode_polygon(rings: list[Ring]) -> bytes:
    """rings[0] = exterior (CCW), rings[1:] = holes (CW).  Rings are closed
    (first point repeated last) by the encoder if needed."""
    out = [struct.pack("<BII", 1, _POLYGON, len(rings))]
    for ring in rings:
        pts = list(ring)
        if pts and pts[0] != pts[-1]:
            pts.append(pts[0])
        out.append(struct.pack("<I", len(pts)))
        for x, y in pts:
            out.append(struct.pack("<dd", x, y))
    return b"".join(out)


def encode_multipolygon(polygons: list[list[Ring]]) -> bytes:
    out = [struct.pack("<BII", 1, _MULTIPOLYGON, len(polygons))]
    for rings in polygons:
        out.append(encode_polygon(rings))
    return b"".join(out)


def decode(wkb: bytes) -> tuple[str, list[list[Ring]]]:
    """Return ("Polygon"|"MultiPolygon", polygons) where polygons is a list
    of ring-lists (one entry for Polygon)."""
    geom_type, polygons, _ = _decode_at(wkb, 0)
    name = "Polygon" if geom_type == _POLYGON else "MultiPolygon"
    return name, polygons


def _decode_at(wkb: bytes, off: int) -> tuple[int, list[list[Ring]], int]:
    byte_order, geom_type = struct.unpack_from("<BI", wkb, off)
    if byte_order != 1:
        raise ValueError("only little-endian WKB supported")
    off += 5
    if geom_type == _POLYGON:
        (n_rings,) = struct.unpack_from("<I", wkb, off)
        off += 4
        rings: list[Ring] = []
        for _ in range(n_rings):
            (n_pts,) = struct.unpack_from("<I", wkb, off)
            off += 4
            ring = [
                struct.unpack_from("<dd", wkb, off + 16 * i) for i in range(n_pts)
            ]
            off += 16 * n_pts
            rings.append([(float(x), float(y)) for x, y in ring])
        return _POLYGON, [rings], off
    if geom_type == _MULTIPOLYGON:
        (n_polys,) = struct.unpack_from("<I", wkb, off)
        off += 4
        polys: list[list[Ring]] = []
        for _ in range(n_polys):
            _, sub, off = _decode_at(wkb, off)
            polys.extend(sub)
        return _MULTIPOLYGON, polys, off
    raise ValueError(f"unsupported WKB geometry type {geom_type}")


def ring_signed_area(ring: Ring) -> float:
    """Shoelace; positive for CCW rings.  Square-degree semantics preserved
    (the reference computes area in EPSG:4326, ``species_range_etl.py:227``)."""
    area = 0.0
    n = len(ring)
    for i in range(n - 1):
        x0, y0 = ring[i]
        x1, y1 = ring[i + 1]
        area += x0 * y1 - x1 * y0
    # close implicitly if the ring is open
    if n >= 2 and ring[0] != ring[-1]:
        x0, y0 = ring[-1]
        x1, y1 = ring[0]
        area += x0 * y1 - x1 * y0
    return area / 2.0


def wkb_area(wkb: bytes) -> float:
    """Total area: exterior rings positive, holes negative (holes are CW so
    their signed area subtracts naturally)."""
    _, polygons = decode(wkb)
    return sum(ring_signed_area(ring) for rings in polygons for ring in rings)
