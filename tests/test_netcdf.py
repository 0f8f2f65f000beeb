"""Classic NetCDF raster lane: encode/parse round-trips, georeference
and orientation conventions, loud gates, fuzz contract, and the pipeline
running over a zip of .nc members alongside the other raster formats."""

from __future__ import annotations

import random
import struct
import zipfile

import numpy as np
import pytest

from species_range_data_pipeline_spark.pipeline.netcdf import (
    encode_netcdf,
    parse_netcdf,
)

HDR = {
    "ncols": 8, "nrows": 6, "xllcorner": -100.0, "yllcorner": 40.0,
    "cellsize": 0.5, "nodata_value": -9999.0,
}


def _grid(seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    g = rng.rand(6, 8).round(2)
    g[0, 0] = -9999.0
    return g


def _cells(g: np.ndarray):
    return [
        (r, c, float(g[r, c]))
        for r in range(g.shape[0])
        for c in range(g.shape[1])
        if g[r, c] != -9999.0
    ]


def test_roundtrip_cells_and_georeference():
    g = _grid(2)
    h, cells = parse_netcdf(encode_netcdf(HDR, _cells(g)))
    assert (h["ncols"], h["nrows"]) == (8.0, 6.0)
    assert h["xllcorner"] == pytest.approx(-100.0)
    assert h["yllcorner"] == pytest.approx(40.0)
    assert h["cellsize"] == pytest.approx(0.5)
    assert h["nodata_value"] == -9999.0
    assert sorted(cells) == sorted(_cells(g))


def test_row0_is_top_row():
    """The stored y-ascending grid must come back top-down — the cell
    contract all three raster lanes share."""
    g = np.full((3, 2), -9999.0)
    g[0, 0] = 7.0  # TOP-left in the cell convention
    h, cells = parse_netcdf(encode_netcdf(HDR | {"ncols": 2, "nrows": 3}, _cells(g)))
    assert cells == [(0, 0, 7.0)]


def test_gates():
    with pytest.raises(ValueError, match="magic"):
        parse_netcdf(b"not a netcdf at all")
    with pytest.raises(NotImplementedError, match="HDF5"):
        parse_netcdf(b"\x89HDF\r\n\x1a\n" + b"\x00" * 64)
    with pytest.raises(NotImplementedError, match="CDF-5"):
        parse_netcdf(b"CDF\x05" + b"\x00" * 64)
    blob = bytearray(encode_netcdf(HDR, _cells(_grid(1))))
    struct.pack_into(">I", blob, 4, 3)  # numrecs != 0 -> record vars
    with pytest.raises(NotImplementedError, match="record"):
        parse_netcdf(bytes(blob))


def test_fuzz_contract():
    blob = encode_netcdf(HDR, _cells(_grid(1)))
    rng = random.Random(9)
    for _ in range(150):
        try:
            parse_netcdf(blob[: rng.randrange(len(blob))])
        except (ValueError, NotImplementedError):
            pass
        mb = bytearray(blob)
        for _ in range(rng.randrange(1, 6)):
            mb[rng.randrange(len(mb))] = rng.randrange(256)
        try:
            parse_netcdf(bytes(mb))
        except (ValueError, NotImplementedError):
            pass


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=30, deadline=None)
@given(
    nrows=st.integers(1, 12),
    ncols=st.integers(1, 12),
    seed=st.integers(0, 2**31 - 1),
    cs=st.sampled_from([0.25, 0.5, 1.0, 2.0]),
    xll=st.floats(-180.0, 180.0, allow_nan=False),
    yll=st.floats(-90.0, 90.0, allow_nan=False),
)
def test_three_raster_lanes_decode_identically(nrows, ncols, seed, cs, xll, yll):
    """The format-interchangeability property: the SAME logical raster
    encoded as ASCII grid, GeoTIFF, and NetCDF must parse to the same
    georeference and the same cell set — the contract that lets
    decode_raster_members sniff freely.  (A 1x1 grid carries no spacing
    information in coordinate-variable georeferencing, so at least one
    axis must have two samples.)"""
    from hypothesis import assume

    assume(nrows > 1 or ncols > 1)
    from species_range_data_pipeline_spark.pipeline.geotiff import (
        encode_geotiff,
        parse_geotiff,
    )
    from species_range_data_pipeline_spark.pipeline.raster import parse_ascii_grid

    rng = np.random.RandomState(seed)
    g = rng.rand(nrows, ncols).round(3)
    g[rng.rand(nrows, ncols) < 0.2] = -9999.0
    hdr = {
        "ncols": ncols, "nrows": nrows, "xllcorner": round(xll, 3),
        "yllcorner": round(yll, 3), "cellsize": cs, "nodata_value": -9999.0,
    }
    cells = [
        (r, c, float(g[r, c]))
        for r in range(nrows)
        for c in range(ncols)
        if g[r, c] != -9999.0
    ]
    asc = "\n".join(
        [f"ncols {ncols}", f"nrows {nrows}", f"xllcorner {hdr['xllcorner']}",
         f"yllcorner {hdr['yllcorner']}", f"cellsize {cs}", "NODATA_value -9999"]
        + [" ".join(f"{v:g}" for v in row) for row in g]
    ).encode()

    parsed = {
        "asc": parse_ascii_grid(asc),
        "tif": parse_geotiff(encode_geotiff(hdr, cells, dtype="f8")),
        "nc": parse_netcdf(encode_netcdf(hdr, cells)),
    }
    for name, (h, cc) in parsed.items():
        assert float(h["ncols"]) == ncols and float(h["nrows"]) == nrows, name
        assert float(h["cellsize"]) == pytest.approx(cs), name
        assert float(h["xllcorner"]) == pytest.approx(hdr["xllcorner"], abs=1e-6), name
        assert float(h["yllcorner"]) == pytest.approx(hdr["yllcorner"], abs=1e-6), name
        assert sorted((r, c) for r, c, _ in cc) == sorted(
            (r, c) for r, c, _ in cells
        ), name
        got = {(r, c): v for r, c, v in cc}
        for r, c, v in cells:
            assert got[(r, c)] == pytest.approx(v, abs=1e-9), (name, r, c)


def test_pipeline_over_nc_members(spark, tmp_path):
    """zip of .nc members -> the SAME speciesdata the .asc lane produces
    (format must not leak into any value)."""
    from species_range_data_pipeline_spark.pipeline.species import (
        load_cells_from_zips,
        run_pipeline,
    )

    d = tmp_path / "zips"
    d.mkdir()
    with zipfile.ZipFile(d / "abies-balsamea.zip", "w") as zf:
        zf.writestr(
            "abies-balsamea__25_current.nc", encode_netcdf(HDR, _cells(_grid(1)))
        )
        zf.writestr(
            "abies-balsamea__25_gfdl_rcp45_y2080.nc",
            encode_netcdf(HDR, _cells(_grid(2))),
        )
    cells, errors = load_cells_from_zips(spark, str(d))
    assert errors.count() == 0
    out = run_pipeline(cells).collect()
    assert len(out) == 6  # 2 scenarios x 3 thresholds
    assert {(r.species, r.scenario) for r in out} == {
        ("abies-balsamea", "current"),
        ("abies-balsamea", "rcp45"),
    }
    for r in out:
        g = _grid(1 if r.scenario == "current" else 2)
        thr = int(r.threshold) / 100.0
        kept = int(((g != -9999.0) & (g >= thr)).sum())
        assert r.area == pytest.approx(kept * 0.25), (r.threshold, r.scenario)
