"""Closed-form CRS reprojection: EPSG:4326 <-> EPSG:6933 / EPSG:3857.

The reference stops at *assigning* EPSG:4326 (``species_range_etl.py:132``
``set_crs``) and computes areas in square degrees; a real geospatial user
immediately needs coordinates and areas in metric units.  This module adds
the two projections that cover that need without any native dependency:

- **EPSG:6933** (WGS 84 / NSIDC EASE-Grid 2.0 Global): ellipsoidal
  cylindrical EQUAL-AREA, standard parallel 30°.  Equal-area means planar
  shoelace area of the projected polygon IS its true ellipsoidal area in
  m² — the correct CRS for range-area statistics.
- **EPSG:3857** (WGS 84 / Pseudo-Mercator): the web-tile CRS, spherical
  formulas on the WGS 84 semi-major axis by definition.

Formulas are Snyder, *Map Projections — A Working Manual* (USGS PP 1395,
public domain): eq. 3-12 (q), 10-x (cylindrical equal-area, ellipsoid),
3-18 (authalic-to-geodetic latitude series), 7-1/7-2 (Mercator, sphere).

Every kernel exists twice, proven equivalent by test:

- numpy (vectorized, used by the WKB geometry path), and
- a ``pyspark.sql.Column`` expression builder (pure built-in functions, so
  point reprojection stays JVM-side / whole-stage-codegen at 100 TB —
  the Python kernel is only for opaque WKB blobs).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "EPSG_SUPPORTED",
    "cea_forward",
    "cea_inverse",
    "merc_forward",
    "merc_inverse",
    "cea_x_expr",
    "cea_y_expr",
    "merc_x_expr",
    "merc_y_expr",
    "transform_xy",
    "transform_wkb",
    "wkb_area_m2",
]

# WGS 84 ellipsoid
_A = 6378137.0
_F = 1.0 / 298.257223563
_E2 = _F * (2.0 - _F)
_E = math.sqrt(_E2)

# EPSG:6933: standard parallel 30°N, natural origin at lon 0
_LAT_TS = math.radians(30.0)
#: Snyder 10-13: scale factor along the standard parallel
_K0 = math.cos(_LAT_TS) / math.sqrt(1.0 - _E2 * math.sin(_LAT_TS) ** 2)


def _q(sin_phi):
    """Snyder eq. 3-12: the equal-area auxiliary q (numpy or scalar)."""
    es = _E * sin_phi
    return (1.0 - _E2) * (
        sin_phi / (1.0 - _E2 * sin_phi * sin_phi)
        - (1.0 / (2.0 * _E)) * np.log((1.0 - es) / (1.0 + es))
    )


_QP = float(_q(1.0))  # q at the pole

# Snyder eq. 3-18 series coefficients (authalic -> geodetic latitude)
_C2 = _E2 / 3.0 + 31.0 * _E2**2 / 180.0 + 517.0 * _E2**3 / 5040.0
_C4 = 23.0 * _E2**2 / 360.0 + 251.0 * _E2**3 / 3780.0
_C6 = 761.0 * _E2**3 / 45360.0


def cea_forward(lon_deg, lat_deg):
    """EPSG:4326 -> EPSG:6933 (meters).  Accepts scalars or numpy arrays."""
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    x = _A * _K0 * lon
    y = _A * _q(np.sin(lat)) / (2.0 * _K0)
    return x, y


def cea_inverse(x, y):
    """EPSG:6933 -> EPSG:4326 (degrees)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    q = 2.0 * _K0 * y / _A
    # clip: |q| can exceed qp by float noise exactly at the poles
    beta = np.arcsin(np.clip(q / _QP, -1.0, 1.0))
    lat = (
        beta
        + _C2 * np.sin(2.0 * beta)
        + _C4 * np.sin(4.0 * beta)
        + _C6 * np.sin(6.0 * beta)
    )
    lon = x / (_A * _K0)
    return np.degrees(lon), np.degrees(lat)


#: Pseudo-Mercator is undefined at the poles; the web-tile cutoff, where
#: the square world tile ends (y == pi * a), is the conventional domain.
MERC_MAX_LAT = math.degrees(2.0 * math.atan(math.exp(math.pi)) - math.pi / 2)


def merc_forward(lon_deg, lat_deg):
    """EPSG:4326 -> EPSG:3857 (meters).  |lat| above the ~85.051° web
    cutoff raises — Pseudo-Mercator y diverges toward the poles and every
    real consumer treats the square tile as the domain edge."""
    lon = np.asarray(lon_deg, dtype=np.float64)
    lat = np.asarray(lat_deg, dtype=np.float64)
    if np.any(np.abs(lat) > MERC_MAX_LAT + 1e-9):
        raise ValueError(
            f"EPSG:3857 undefined beyond |lat| {MERC_MAX_LAT:.6f}"
        )
    x = _A * np.radians(lon)
    y = _A * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))
    return x, y


def merc_inverse(x, y):
    """EPSG:3857 -> EPSG:4326 (degrees)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.degrees(x / _A)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / _A)) - np.pi / 2.0)
    return lon, lat


# ---------------------------------------------------------------------------
# Column-expression twins (JVM-side: the hot path for point tables)
# ---------------------------------------------------------------------------


def cea_x_expr(lon: Column) -> Column:
    """EPSG:6933 easting as a built-in-function Column (codegen-friendly)."""
    return F.lit(_A * _K0) * F.radians(lon)


def cea_y_expr(lat: Column) -> Column:
    """EPSG:6933 northing as a built-in-function Column."""
    s = F.sin(F.radians(lat))
    es = F.lit(_E) * s
    q = F.lit(1.0 - _E2) * (
        s / (F.lit(1.0) - F.lit(_E2) * s * s)
        - F.lit(1.0 / (2.0 * _E)) * F.log((F.lit(1.0) - es) / (F.lit(1.0) + es))
    )
    return F.lit(_A / (2.0 * _K0)) * q


def merc_x_expr(lon: Column) -> Column:
    """EPSG:3857 easting as a built-in-function Column."""
    return F.lit(_A) * F.radians(lon)


def merc_y_expr(lat: Column) -> Column:
    """EPSG:3857 northing as a built-in-function Column (caller guards the
    ~85.051° web cutoff; beyond it the expression returns ±Infinity/NaN
    rather than raising, matching SQL-engine semantics)."""
    return F.lit(_A) * F.log(F.tan(F.lit(math.pi / 4.0) + F.radians(lat) / 2))


# ---------------------------------------------------------------------------
# Dispatch + WKB
# ---------------------------------------------------------------------------

EPSG_SUPPORTED = (4326, 6933, 3857)

_FORWARD = {6933: cea_forward, 3857: merc_forward}
_INVERSE = {6933: cea_inverse, 3857: merc_inverse}


def transform_xy(x, y, src_epsg: int, dst_epsg: int):
    """Transform coordinate arrays between any two supported CRSs,
    routing through 4326 (every supported CRS has a closed-form inverse,
    so the hub costs one extra trig pass, never a precision cliff)."""
    if src_epsg not in EPSG_SUPPORTED or dst_epsg not in EPSG_SUPPORTED:
        raise ValueError(
            f"unsupported CRS pair {src_epsg}->{dst_epsg}; "
            f"supported: {EPSG_SUPPORTED}"
        )
    if src_epsg == dst_epsg:
        return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    if src_epsg != 4326:
        x, y = _INVERSE[src_epsg](x, y)
    if dst_epsg == 4326:
        return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    return _FORWARD[dst_epsg](x, y)


def transform_wkb(wkb: bytes, src_epsg: int, dst_epsg: int) -> bytes:
    """ST_Transform for this engine's WKB polygons/multipolygons: decode,
    transform every ring vertex (vectorized), re-encode."""
    from .wkb import decode, encode_multipolygon, encode_polygon

    kind, polygons = decode(wkb)
    out = []
    for rings in polygons:
        new_rings = []
        for ring in rings:
            arr = np.asarray(ring, dtype=np.float64)
            tx, ty = transform_xy(arr[:, 0], arr[:, 1], src_epsg, dst_epsg)
            new_rings.append(list(zip(tx.tolist(), ty.tolist())))
        out.append(new_rings)
    if kind == "Polygon":
        return encode_polygon(out[0])
    return encode_multipolygon(out)


def wkb_area_m2(wkb: bytes, src_epsg: int = 4326) -> float:
    """True ellipsoidal area in m² of a lon/lat WKB geometry: project to
    the equal-area EPSG:6933 and take the planar shoelace — by
    construction of an equal-area projection the two are identical.
    The metric twin of ``wkb.wkb_area`` (square degrees, reference
    fidelity) and ``wkb.wkb_area_km2`` (spherical approximation)."""
    from .wkb import wkb_area

    if src_epsg == 6933:
        return wkb_area(wkb)
    if src_epsg != 4326:
        raise ValueError(f"wkb_area_m2 expects 4326 or 6933, got {src_epsg}")
    return wkb_area(transform_wkb(wkb, 4326, 6933))
