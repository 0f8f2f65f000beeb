"""GeoTIFF lane: pure-struct encode/parse round-trip, equivalence with the
ASCII decoder on the same grid, big-endian input, the Spark mapInPandas
decode path, and the full pipeline consuming a mixed .asc/.tif archive."""

from __future__ import annotations

import struct
import zipfile

import numpy as np
import pytest

from species_range_data_pipeline_spark.pipeline.geotiff import (
    decode_geotiff_members,
    decode_raster_members,
    encode_geotiff,
    parse_geotiff,
)
from species_range_data_pipeline_spark.pipeline.raster import (
    parse_ascii_grid,
    read_binary_files,
)

from .test_pipeline import CS, NCOLS, NROWS, XLL, YLL, _asc_bytes, _grid

HEADER = {
    "ncols": NCOLS, "nrows": NROWS, "xllcorner": XLL, "yllcorner": YLL,
    "cellsize": CS, "nodata_value": -9999.0,
}


def _cells(g: np.ndarray):
    return [
        (r, c, float(g[r, c]))
        for r in range(g.shape[0])
        for c in range(g.shape[1])
        if g[r, c] != -9999.0
    ]


@pytest.mark.parametrize("dtype", ["f4", "f8", "i2"])
def test_encode_parse_roundtrip(dtype):
    g = _grid(7)
    if dtype == "i2":
        g = np.where(g == -9999.0, -9999.0, (g * 100).round())
    header, cells = dict(HEADER), _cells(g)
    got_header, got_cells = parse_geotiff(encode_geotiff(header, cells, dtype))
    assert [(r, c) for r, c, _ in got_cells] == [(r, c) for r, c, _ in cells]
    got_vals = [v for _, _, v in got_cells]
    want_vals = [v for _, _, v in cells]
    if dtype == "f4":  # float32 storage quantizes the float64 inputs
        assert got_vals == pytest.approx(want_vals, rel=1e-6)
    else:
        assert got_vals == want_vals
    for k, v in header.items():
        assert got_header[k] == pytest.approx(float(v)), k


def test_geotiff_matches_ascii_decoder_on_same_grid():
    """The two lanes are interchangeable: identical (header, cells) for the
    same raster — the T3 ASCII->GeoTIFF conversion is a no-op in this model
    (species_range_etl.py:87-92)."""
    g = _grid(3)
    ha, ca = parse_ascii_grid(_asc_bytes(g))
    # f8 samples: float64 carries the 2-decimal fixture values exactly, so
    # the comparison is == , not approx
    ht, ct = parse_geotiff(encode_geotiff(HEADER, _cells(g), dtype="f8"))
    assert ct == ca
    for k in ("ncols", "nrows", "xllcorner", "yllcorner", "cellsize"):
        assert ht[k] == pytest.approx(ha[k]), k


def test_parse_big_endian():
    """MM byte order, hand-packed: 2x2 float32 grid, one nodata cell."""
    pix = struct.pack(">4f", 1.5, -9999.0, 2.5, 3.0)
    entries = [
        (256, 3, 1, struct.pack(">H", 2) + b"\x00\x00"),   # width
        (257, 3, 1, struct.pack(">H", 2) + b"\x00\x00"),   # height
        (258, 3, 1, struct.pack(">H", 32) + b"\x00\x00"),  # bits
        (259, 3, 1, struct.pack(">H", 1) + b"\x00\x00"),   # uncompressed
        (273, 4, 1, None),                                  # strip offset (patched)
        (279, 4, 1, struct.pack(">I", len(pix))),
        (339, 3, 1, struct.pack(">H", 3) + b"\x00\x00"),   # IEEE float
        (42113, 2, 6, None),                                # "-9999" (patched)
    ]
    ifd_off = 8
    extra_off = ifd_off + 2 + 12 * len(entries) + 4
    nodata = b"-9999\x00"
    strip_off = extra_off + len(nodata)
    blob = struct.pack(">2sHI", b"MM", 42, ifd_off)
    blob += struct.pack(">H", len(entries))
    for tag, ftype, count, val in entries:
        if tag == 273:
            val = struct.pack(">I", strip_off)
        elif tag == 42113:
            val = struct.pack(">I", extra_off)
        blob += struct.pack(">HHI", tag, ftype, count) + val
    blob += struct.pack(">I", 0) + nodata + pix
    header, cells = parse_geotiff(blob)
    assert header["ncols"] == 2 and header["nrows"] == 2
    assert cells == [(0, 0, 1.5), (1, 0, 2.5), (1, 1, 3.0)]


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda b: b"XX" + b[2:], "byte-order"),
        (lambda b: b[:2] + struct.pack("<H", 43) + b[4:], "BigTIFF"),
        (lambda b: b[:300], "truncated"),  # cuts into the pixel strip
    ],
)
def test_parse_rejects_unsupported_loudly(mutate, msg):
    blob = encode_geotiff(HEADER, _cells(_grid(5)))
    with pytest.raises(ValueError, match=msg):
        parse_geotiff(mutate(blob))


def test_compressed_tiff_rejected():
    blob = bytearray(encode_geotiff(HEADER, _cells(_grid(5))))
    # flip the Compression tag value (entries are ascending; find tag 259)
    (n,) = struct.unpack_from("<H", blob, 8)
    for i in range(n):
        base = 10 + 12 * i
        (tag,) = struct.unpack_from("<H", blob, base)
        if tag == 259:
            struct.pack_into("<H", blob, base + 8, 7)  # JPEG: unsupported
    with pytest.raises(ValueError, match="compress"):
        parse_geotiff(bytes(blob))


def test_spark_decode_lane_and_error_channel(spark, tmp_path):
    g = _grid(11)
    (tmp_path / "a__25_current.tif").write_bytes(encode_geotiff(HEADER, _cells(g)))
    (tmp_path / "broken.tif").write_bytes(b"II\x2a\x00garbage")

    import pyspark.sql.functions as F

    files = read_binary_files(spark, str(tmp_path), glob="*.tif").select(
        F.col("path").alias("member"), "content"
    )
    cells = decode_geotiff_members(files)
    good = cells.where("error IS NULL").collect()
    bad = cells.where("error IS NOT NULL").collect()
    assert len(good) == NROWS * NCOLS - 1  # the one NODATA hole
    assert len(bad) == 1 and "ValueError" in bad[0].error
    vals = {(r.row, r.col): r.value for r in good}
    assert vals[(2, 3)] == pytest.approx(g[2, 3])
    assert good[0].xll == XLL and good[0].cellsize == CS


def test_pipeline_on_mixed_format_zip(spark, tmp_path):
    """A zip holding the SAME raster as .asc and as .tif (different species
    names) must produce identical per-species results downstream — the
    format-sniffing decoder feeds one pipeline."""
    from species_range_data_pipeline_spark.pipeline.species import (
        load_cells_from_zips,
        run_pipeline,
    )

    g = _grid(2)
    z = tmp_path / "mixed.zip"
    with zipfile.ZipFile(z, "w") as zf:
        zf.writestr("asc-species__25_current.asc", _asc_bytes(g))
        zf.writestr("tif-species__25_current.tif", encode_geotiff(HEADER, _cells(g)))

    cells, errors = load_cells_from_zips(spark, str(tmp_path))
    assert errors.count() == 0
    rows = run_pipeline(cells).collect()
    by_key = {}
    for r in rows:
        by_key[(r.species, r.threshold)] = (r.area, r.species_id)
    assert set(s for s, _ in by_key) == {"asc-species", "tif-species"}
    for t in ("25", "50", "75"):
        assert by_key[("asc-species", t)] == by_key[("tif-species", t)], t


# ---------------------------------------------------------------- LZW + tiles


def _pack_codes(codes, widths):
    """MSB-first bit packing of (code, width) pairs — an independent
    implementation used to pin the decoder's bit order."""
    buf = 0
    nbits = 0
    out = bytearray()
    for code, w in zip(codes, widths):
        buf = (buf << w) | code
        nbits += w
        while nbits >= 8:
            out.append((buf >> (nbits - 8)) & 0xFF)
            nbits -= 8
    if nbits:
        out.append((buf << (8 - nbits)) & 0xFF)
    return bytes(out)


def test_lzw_golden_stream():
    """Hand-packed TIFF-LZW stream: Clear, 'A', 'B', code 258 ('AB'), EOI
    -> 'ABAB'.  Pins MSB-first bit order and the KwK table discipline
    independently of our own encoder."""
    from species_range_data_pipeline_spark.pipeline.geotiff import _lzw_decode

    stream = _pack_codes([256, 65, 66, 258, 257], [9] * 5)
    assert _lzw_decode(stream, 100) == b"ABAB"


def test_lzw_roundtrip_crosses_width_boundaries():
    """Encoder/decoder stay in sync across the 9->10->11->12-bit early-change
    boundaries AND a mid-stream Clear (table full at 4094): random 4-symbol
    data grows the table fast enough to hit all of them."""
    from species_range_data_pipeline_spark.pipeline.geotiff import (
        _lzw_decode,
        _lzw_encode,
    )

    rng = np.random.default_rng(7)
    data = bytes(rng.integers(0, 4, size=120_000, dtype=np.uint8))
    enc = _lzw_encode(data)
    assert len(enc) < len(data)  # actually compresses 4-symbol data
    assert _lzw_decode(enc, len(data)) == data
    # short adversarial inputs: truncation raises or decodes a prefix,
    # never hangs or overruns the budget
    with pytest.raises(ValueError):
        _lzw_decode(enc, len(data) // 2)  # budget exceeded -> loud


def test_lzw_geotiff_roundtrip_matches_uncompressed():
    g = _grid(7)
    plain = parse_geotiff(encode_geotiff(HEADER, _cells(g)))
    lzw = parse_geotiff(encode_geotiff(HEADER, _cells(g), compression=5))
    assert lzw == plain


@pytest.mark.parametrize("compression", [1, 5, 8])
def test_tiled_geotiff_roundtrip(compression):
    """A 37x41 grid in 16x16 tiles (ragged edge tiles padded with nodata)
    decodes to exactly the same header+cells as the single-strip twin,
    under every compression scheme."""
    rng = np.random.default_rng(11)
    nrows, ncols = 37, 41
    g = np.full((nrows, ncols), -9999.0)
    mask = rng.random((nrows, ncols)) < 0.6
    g[mask] = np.round(rng.random(mask.sum()) * 10, 3)
    hdr = dict(HEADER, nrows=nrows, ncols=ncols)
    cells = _cells(g)
    plain = parse_geotiff(encode_geotiff(hdr, cells))
    tiled = parse_geotiff(
        encode_geotiff(hdr, cells, compression=compression, tile=(16, 16))
    )
    assert tiled == plain


def test_tiled_tile_count_mismatch_rejected():
    hdr = dict(HEADER, nrows=37, ncols=41)
    blob = bytearray(encode_geotiff(hdr, [], tile=(16, 16)))
    # shrink ImageWidth so the declared tile grid no longer matches
    (n,) = struct.unpack_from("<H", blob, 8)
    for i in range(n):
        base = 10 + 12 * i
        (tag,) = struct.unpack_from("<H", blob, base)
        if tag == 256:
            struct.pack_into("<I", blob, base + 8, 16)
    with pytest.raises(ValueError, match="tile count"):
        parse_geotiff(bytes(blob))


def test_lzw_final_code_on_width_boundary():
    """Streams whose final data code lands the table exactly on a
    2^n - 2 boundary used to desync at EOI (decoder widened, encoder
    didn't) — pinned across all three boundaries."""
    from species_range_data_pipeline_spark.pipeline.geotiff import (
        _lzw_decode,
        _lzw_encode,
    )

    for n in (253, 300, 765, 1789, 4000):
        data = bytes(i % 256 for i in range(n))
        assert _lzw_decode(_lzw_encode(data), n) == data, n
