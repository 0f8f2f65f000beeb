"""Classic NetCDF (CDF-1/CDF-2) reader/writer for 2-D gridded rasters,
stdlib ``struct`` + numpy only.

Climate-scenario rasters — the reference's domain
(``species_range_etl.py`` ingests GFDL/RCP projection grids) — ship as
NetCDF at least as often as GeoTIFF.  The classic format (NASA/Unidata,
fully published) is a small header (dimensions, attributes, variable
table with file offsets) followed by big-endian row-major arrays, so a
struct-level parser in the ``pipeline/geotiff.py`` style covers it
without libnetcdf.

Contract: ``parse_netcdf`` returns the same ``(header, cells)`` pair as
``parse_ascii_grid`` / ``parse_geotiff``, so the three raster lanes are
interchangeable inside ``decode_raster_members``'s format sniff.
Georeferencing comes from 1-D coordinate variables when present (uniform
spacing -> cellsize + lower-left corner); NODATA from the data
variable's ``_FillValue``/``missing_value`` attribute.

Scope gates (loud, never a misdecode): CDF-5 (64-bit data), HDF5-based
NetCDF-4 (different magic), record (unlimited-dimension) variables,
and >2-D data variables.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["parse_netcdf", "encode_netcdf"]

_NC_DIMENSION = 0x0A
_NC_VARIABLE = 0x0B
_NC_ATTRIBUTE = 0x0C

#: nc_type -> (struct/numpy kind, size)
_NC_TYPES = {
    1: ("b", 1),  # byte
    2: ("c", 1),  # char
    3: ("h", 2),  # short
    4: ("i", 4),  # int
    5: ("f", 4),  # float
    6: ("d", 8),  # double
}


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def u4(self) -> int:
        (v,) = struct.unpack_from(">I", self.data, self.pos)
        self.pos += 4
        return v

    def name(self) -> str:
        n = self.u4()
        if n > len(self.data):
            raise ValueError(f"name length {n} exceeds file size")
        raw = self.data[self.pos : self.pos + n]
        self.pos += (n + 3) // 4 * 4  # padded to 4
        return raw.decode("utf-8", "replace")

    def values(self, nc_type: int, n: int):
        if nc_type not in _NC_TYPES:
            raise ValueError(f"unknown nc_type {nc_type}")
        fmt, size = _NC_TYPES[nc_type]
        total = size * n
        if total > len(self.data):
            raise ValueError(f"attribute of {total} bytes exceeds file size")
        if nc_type == 2:
            raw = self.data[self.pos : self.pos + n]
            out = raw.decode("utf-8", "replace")
        else:
            out = list(struct.unpack_from(f">{n}{fmt}", self.data, self.pos))
        self.pos += (total + 3) // 4 * 4
        return out


def _read_attrs(r: _Reader) -> dict:
    tag = r.u4()
    count = r.u4()
    if tag == 0 and count == 0:
        return {}
    if tag != _NC_ATTRIBUTE:
        raise ValueError(f"expected attribute list, got tag {tag}")
    attrs = {}
    for _ in range(min(count, 4096)):
        name = r.name()
        nc_type = r.u4()
        n = r.u4()
        attrs[name] = r.values(nc_type, n)
    return attrs


def parse_netcdf(content: bytes) -> tuple[dict, list[tuple[int, int, float]]]:
    """NetCDF bytes -> (header, [(row, col, value), ...]) — the raster-lane
    contract.  ``ValueError`` on malformed input, ``NotImplementedError``
    on NetCDF-4/CDF-5/record variables."""
    try:
        return _parse_netcdf(content)
    except (struct.error, IndexError, KeyError) as exc:
        raise ValueError(f"malformed NetCDF: {exc!r}") from exc


def _parse_netcdf(content: bytes) -> tuple[dict, list[tuple[int, int, float]]]:
    if content[:8] == b"\x89HDF\r\n\x1a\n":
        raise NotImplementedError("NetCDF-4/HDF5 not supported (classic only)")
    if content[:3] != b"CDF":
        raise ValueError("not a NetCDF file: bad magic")
    version = content[3]
    if version == 5:
        raise NotImplementedError("CDF-5 (64-bit data) not supported")
    if version not in (1, 2):
        raise ValueError(f"unknown CDF version {version}")
    offset_fmt = ">I" if version == 1 else ">Q"
    offset_size = 4 if version == 1 else 8

    r = _Reader(content)
    r.pos = 4
    numrecs = r.u4()
    if numrecs not in (0,):  # 0xFFFFFFFF = STREAMING also rejected
        raise NotImplementedError("record (unlimited) dimensions not supported")

    # dimensions
    tag, count = r.u4(), r.u4()
    dims: list[tuple[str, int]] = []
    if tag == _NC_DIMENSION:
        if count > 4096:
            raise ValueError(f"implausible dimension count {count}")
        for _ in range(count):
            dname = r.name()
            dims.append((dname, r.u4()))
    elif (tag, count) != (0, 0):
        raise ValueError(f"expected dimension list, got tag {tag}")

    _read_attrs(r)  # global attributes (unused)

    # variables
    tag, count = r.u4(), r.u4()
    if tag not in (_NC_VARIABLE, 0):
        raise ValueError(f"expected variable list, got tag {tag}")
    if count > 4096:
        raise ValueError(f"implausible variable count {count}")
    variables = []
    for _ in range(count if tag == _NC_VARIABLE else 0):
        vname = r.name()
        ndims = r.u4()
        if ndims > len(dims):
            raise ValueError(f"variable {vname} declares {ndims} dims")
        dimids = [r.u4() for _ in range(ndims)]
        attrs = _read_attrs(r)
        nc_type = r.u4()
        r.u4()  # vsize (padded; recomputed below)
        (begin,) = struct.unpack_from(offset_fmt, content, r.pos)
        r.pos += offset_size
        variables.append(
            {"name": vname, "dimids": dimids, "attrs": attrs,
             "type": nc_type, "begin": begin}
        )

    def read_array(var) -> np.ndarray:
        fmt, size = _NC_TYPES[var["type"]]
        shape = [dims[d][1] for d in var["dimids"]]
        n = int(np.prod(shape)) if shape else 1
        end = var["begin"] + n * size
        if end > len(content):
            raise ValueError(f"variable {var['name']} data exceeds file size")
        kind = {"b": "i1", "c": "S1", "h": ">i2", "i": ">i4",
                "f": ">f4", "d": ">f8"}[fmt]
        return np.frombuffer(content, dtype=kind, count=n,
                             offset=var["begin"]).reshape(shape)

    # the data variable: first 2-D non-coordinate variable
    data_var = next(
        (v for v in variables
         if len(v["dimids"]) == 2 and v["type"] != 2), None
    )
    if data_var is None:
        raise ValueError("no 2-D data variable in NetCDF")
    grid = read_array(data_var).astype("f8")
    nrows, ncols = grid.shape
    if nrows * ncols > 1 << 28:
        raise ValueError(f"implausible raster dimensions {ncols}x{nrows}")

    header: dict[str, float] = {"ncols": float(ncols), "nrows": float(nrows)}
    # georeference from 1-D coordinate variables matching the data dims
    by_dim = {
        v["dimids"][0]: v
        for v in variables
        if len(v["dimids"]) == 1 and v["dimids"][0] in data_var["dimids"]
        and v["type"] != 2
    }
    ydim, xdim = data_var["dimids"]
    csx = csy = 1.0
    xll = yll = 0.0
    if xdim in by_dim and ydim in by_dim:
        xs = read_array(by_dim[xdim]).astype("f8")
        ys = read_array(by_dim[ydim]).astype("f8")
        # per-axis spacing, as a MAGNITUDE: coordinates may descend
        # (common for latitude), and x/y spacing may differ.  A
        # single-element axis carries no spacing information — assume
        # square cells and borrow the sibling axis (a 1x1 grid has no
        # spacing info at all and keeps the default 1.0).
        if len(xs) > 1:
            csx = abs(float(xs[1] - xs[0]))
        if len(ys) > 1:
            csy = abs(float(ys[1] - ys[0]))
        if len(xs) <= 1 < len(ys):
            csx = csy
        if len(ys) <= 1 < len(xs):
            csy = csx
        # coordinates are cell CENTERS; ASCII headers carry the corner
        xll = float(xs.min()) - csx / 2 if len(xs) else 0.0
        yll = float(ys.min()) - csy / 2 if len(ys) else 0.0
    header["cellsize"] = csx
    if csy != csx:
        header["cellsize_y"] = csy  # anisotropic grids surface both
    header["xllcorner"] = xll
    header["yllcorner"] = yll

    attrs = data_var["attrs"]
    nodata = None
    for key in ("_FillValue", "missing_value"):
        if key in attrs and attrs[key]:
            nodata = float(attrs[key][0])
            header["nodata_value"] = nodata
            break

    # NetCDF convention: row 0 at the SOUTH edge when y ascends; the
    # cell contract wants row 0 at the TOP.  Flip when y is ascending.
    if ydim in by_dim:
        ys = read_array(by_dim[ydim]).astype("f8")
        if len(ys) > 1 and ys[1] > ys[0]:
            grid = grid[::-1]

    if nodata is None:
        mask = np.ones_like(grid, dtype=bool)
    elif np.isnan(nodata):
        mask = ~np.isnan(grid)
    else:
        mask = grid != nodata
    rr, cc = np.nonzero(mask)
    cells = [
        (int(a), int(b), float(v))
        for a, b, v in zip(rr.tolist(), cc.tolist(), grid[rr, cc].tolist())
    ]
    return header, cells


# ----------------------------------------------------------------- write


def _pad4(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 4)


def _w_name(s: str) -> bytes:
    raw = s.encode("utf-8")
    return struct.pack(">I", len(raw)) + _pad4(raw)


def _w_attrs(attrs: dict[str, tuple[int, list]]) -> bytes:
    if not attrs:
        return struct.pack(">II", 0, 0)
    out = struct.pack(">II", _NC_ATTRIBUTE, len(attrs))
    for name, (nc_type, vals) in attrs.items():
        fmt, size = _NC_TYPES[nc_type]
        out += _w_name(name) + struct.pack(">II", nc_type, len(vals))
        out += _pad4(struct.pack(f">{len(vals)}{fmt}", *vals))
    return out


def encode_netcdf(
    header: dict, cells: list[tuple[int, int, float]]
) -> bytes:
    """Inverse of ``parse_netcdf``: the raster-lane header + sparse cells
    -> classic CDF-1 bytes with lat/lon coordinate variables (cell-center
    convention, y ascending) and a double data variable carrying
    ``_FillValue``.  encode(parse(x)) round-trips cell-exactly."""
    ncols = int(header["ncols"])
    nrows = int(header["nrows"])
    nodata = float(header.get("nodata_value", -9999.0))
    cs = float(header.get("cellsize", 1.0))
    xll = float(header.get("xllcorner", 0.0))
    yll = float(header.get("yllcorner", 0.0))

    grid = np.full((nrows, ncols), nodata, dtype=">f8")
    for rr, cc, v in cells:
        grid[rr, cc] = v
    # stored south-up (y ascending), so flip the top-down cell grid
    stored = grid[::-1]
    lons = np.array([xll + cs / 2 + i * cs for i in range(ncols)], dtype=">f8")
    lats = np.array([yll + cs / 2 + j * cs for j in range(nrows)], dtype=">f8")

    dims = [("y", nrows), ("x", ncols)]
    dim_block = struct.pack(">II", _NC_DIMENSION, len(dims))
    for name, size in dims:
        dim_block += _w_name(name) + struct.pack(">I", size)

    # variable headers need begin offsets: lay out header first with
    # placeholders, then patch
    var_defs = [
        ("lat", [0], {}, 6, lats.tobytes()),
        ("lon", [1], {}, 6, lons.tobytes()),
        ("value", [0, 1], {"_FillValue": (6, [nodata])}, 6, stored.tobytes()),
    ]
    var_block = struct.pack(">II", _NC_VARIABLE, len(var_defs))
    bodies = []
    header_stub = (
        b"CDF\x01" + struct.pack(">I", 0) + dim_block + struct.pack(">II", 0, 0)
    )
    # first pass to measure header size
    measured = len(header_stub) + 8  # + var list tag/count
    for name, dimids, attrs, nc_type, body in var_defs:
        measured += (
            len(_w_name(name))
            + 4
            + 4 * len(dimids)
            + len(_w_attrs(attrs))
            + 4  # nc_type
            + 4  # vsize
            + 4  # begin (CDF-1)
        )
    offset = measured
    for name, dimids, attrs, nc_type, body in var_defs:
        padded = _pad4(body)
        var_block += (
            _w_name(name)
            + struct.pack(">I", len(dimids))
            + b"".join(struct.pack(">I", d) for d in dimids)
            + _w_attrs(attrs)
            + struct.pack(">II", nc_type, len(padded))
            + struct.pack(">I", offset)
        )
        bodies.append(padded)
        offset += len(padded)
    return header_stub + var_block + b"".join(bodies)
