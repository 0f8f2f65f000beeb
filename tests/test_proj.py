"""Reprojection kernels (functions/proj.py): external anchors, round
trips, numpy/Column equivalence, WKB transform + equal-area m².

External (non-circular) anchors:
- EPSG:3857 x at lon 180° is pi * 6378137 = 20037508.342789244 m (the
  web-tile world half-width, a published constant).
- The WGS 84 AUTHALIC radius is 6371007.1810 m (standard geodesy
  constant); it equals a*sqrt(qp/2), anchoring the Snyder q machinery.
- EPSG:6933 x extent is +/-17367530.44 m (EASE-Grid 2.0 paper, Brodzik
  et al. 2012).
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from species_range_data_pipeline_spark.functions import proj
from species_range_data_pipeline_spark.functions.wkb import (
    encode_polygon,
    wkb_area_km2,
)


def test_merc_world_half_width_anchor():
    x, y = proj.merc_forward(180.0, 0.0)
    assert float(x) == pytest.approx(20037508.342789244, abs=1e-6)
    assert float(y) == pytest.approx(0.0, abs=1e-9)
    # y at the web cutoff closes the square tile: y(max_lat) == x(180)
    _, ytop = proj.merc_forward(0.0, proj.MERC_MAX_LAT)
    assert float(ytop) == pytest.approx(20037508.342789244, abs=1e-3)


def test_authalic_radius_anchor():
    r_auth = proj._A * math.sqrt(proj._QP / 2.0)
    assert r_auth == pytest.approx(6371007.1810, abs=1e-3)


def test_ease_grid2_extent_anchor():
    x, _ = proj.cea_forward(180.0, 0.0)
    assert float(x) == pytest.approx(17367530.44, abs=0.5)


def test_round_trips():
    rng = np.random.RandomState(7)
    lon = rng.uniform(-179.9, 179.9, 500)
    lat = rng.uniform(-89.9, 89.9, 500)
    for epsg in (6933, 3857):
        la = lat if epsg == 6933 else np.clip(lat, -85.0, 85.0)
        x, y = proj.transform_xy(lon, la, 4326, epsg)
        lon2, lat2 = proj.transform_xy(x, y, epsg, 4326)
        np.testing.assert_allclose(lon2, lon, atol=1e-9)
        np.testing.assert_allclose(lat2, la, atol=1e-7)
    # cross-CRS route through the 4326 hub
    la = np.clip(lat, -85.0, 85.0)
    x, y = proj.transform_xy(lon, la, 4326, 6933)
    mx, my = proj.transform_xy(x, y, 6933, 3857)
    emx, emy = proj.merc_forward(lon, la)
    np.testing.assert_allclose(mx, emx, atol=1e-6)
    np.testing.assert_allclose(my, emy, atol=1e-4)


def test_domain_errors():
    with pytest.raises(ValueError, match="undefined beyond"):
        proj.merc_forward(0.0, 89.0)
    with pytest.raises(ValueError, match="unsupported CRS"):
        proj.transform_xy(0.0, 0.0, 4326, 32633)


def test_column_exprs_match_numpy(spark):
    """The JVM-side Column expressions are the numpy kernels' hot-path
    twins: same numbers to float64 noise on a lon/lat grid."""
    import pandas as pd
    from pyspark.sql import functions as F

    rng = np.random.RandomState(11)
    pdf = pd.DataFrame(
        {
            "lon": rng.uniform(-179.0, 179.0, 200),
            "lat": rng.uniform(-84.0, 84.0, 200),
        }
    )
    df = spark.createDataFrame(pdf)
    got = (
        df.select(
            "lon",
            "lat",
            proj.cea_x_expr(F.col("lon")).alias("cx"),
            proj.cea_y_expr(F.col("lat")).alias("cy"),
            proj.merc_x_expr(F.col("lon")).alias("mx"),
            proj.merc_y_expr(F.col("lat")).alias("my"),
        )
        .toPandas()
        .sort_values("lon")
    )
    cx, cy = proj.cea_forward(got["lon"].values, got["lat"].values)
    mx, my = proj.merc_forward(got["lon"].values, got["lat"].values)
    np.testing.assert_allclose(got["cx"].values, cx, atol=1e-6)
    np.testing.assert_allclose(got["cy"].values, cy, atol=1e-6)
    np.testing.assert_allclose(got["mx"].values, mx, atol=1e-6)
    np.testing.assert_allclose(got["my"].values, my, atol=1e-6)


def _square_wkb(lon0, lat0, d=1.0):
    ring = [
        (lon0, lat0),
        (lon0 + d, lat0),
        (lon0 + d, lat0 + d),
        (lon0, lat0 + d),
        (lon0, lat0),
    ]
    return encode_polygon([ring])


def test_wkb_transform_and_area_m2():
    """Equal-area check with an independent implementation: the 6933
    planar area of a projected cell vs the existing SPHERICAL shoelace
    (wkb_area_km2).  Sphere vs ellipsoid agree to ~0.3%; the equal-area
    projection must land inside that envelope everywhere."""
    for lon0, lat0 in [(0.0, 0.0), (10.0, 45.0), (-120.0, -60.0), (170.0, 80.0)]:
        wkb = _square_wkb(lon0, lat0)
        m2 = proj.wkb_area_m2(wkb)
        km2_sphere = wkb_area_km2(wkb)
        # sphere-vs-ellipsoid area difference grows toward the poles
        # (~0.9% at lat 80), plus straight-chord shoelace error
        assert m2 / 1e6 == pytest.approx(km2_sphere, rel=1.2e-2), (lon0, lat0)
    # 1 deg x 1 deg at the equator is ~12300 km2 (order-of-magnitude pin)
    eq = proj.wkb_area_m2(_square_wkb(0.0, 0.0)) / 1e6
    assert 12100 < eq < 12500
    # already-projected input short-circuits; other CRS refuses
    wkb6933 = proj.transform_wkb(_square_wkb(0.0, 0.0), 4326, 6933)
    assert proj.wkb_area_m2(wkb6933, src_epsg=6933) == pytest.approx(
        proj.wkb_area_m2(_square_wkb(0.0, 0.0))
    )
    with pytest.raises(ValueError, match="expects 4326 or 6933"):
        proj.wkb_area_m2(_square_wkb(0.0, 0.0), src_epsg=3857)


def test_spark_geometry_operators(spark):
    """with_transformed + with_area_m2 over the production polygonize
    output: every area positive, metric, and consistent with the
    spherical with_area_km2 twin."""
    from pyspark.sql import functions as F

    from species_range_data_pipeline_spark.operators.polygonize import (
        polygonize,
        with_area_km2,
        with_area_m2,
        with_transformed,
    )

    cells = spark.createDataFrame(
        [("a", r, c) for r in range(3) for c in range(3) if (r, c) != (1, 1)],
        "species string, row int, col int",
    )
    geo = polygonize(cells, ["species"])
    both = with_area_m2(with_area_km2(geo)).select("area_km2", "area_m2").first()
    assert both.area_m2 > 0
    assert both.area_m2 / 1e6 == pytest.approx(both.area_km2, rel=7e-3)

    merc = with_transformed(geo, 4326, 3857).select("geometry").first()
    from species_range_data_pipeline_spark.functions.wkb import decode

    _, polys = decode(bytes(merc.geometry))
    xs = [p[0] for rings in polys for ring in rings for p in ring]
    assert max(abs(x) for x in xs) > 100000  # meters now, not degrees

    with pytest.raises(ValueError, match="unsupported CRS"):
        with_transformed(geo, 4326, 999)
