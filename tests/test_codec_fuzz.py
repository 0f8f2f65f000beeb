"""Adversarial-input contract for every binary parser: truncations and
random bit flips of valid files must raise ValueError/NotImplementedError
promptly — never a raw struct/zlib/KeyError, never a hang or gigabyte
allocation from attacker-controlled counts.  (At 100 TB a corrupt file
is a certainty; the Spark lanes route these errors to side channels, and
this contract keeps the error rows meaningful.)"""

from __future__ import annotations

import random

import numpy as np
import pytest

from species_range_data_pipeline_spark.multimodal.codecs import (
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
)
from species_range_data_pipeline_spark.multimodal.gif import (
    decode_gif,
    encode_gif,
)
from species_range_data_pipeline_spark.multimodal.jpeg import (
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)
from species_range_data_pipeline_spark.multimodal.mp4 import (
    encode_mp4,
    extract_video_samples,
)
from species_range_data_pipeline_spark.pipeline.geotiff import (
    encode_geotiff,
    parse_geotiff,
)
from species_range_data_pipeline_spark.sources.shapefile import (
    encode_dbf,
    encode_shp,
    parse_dbf,
    parse_shp,
)

_IMG = np.arange(64, dtype=np.uint8).reshape(8, 8)
_HDR = {
    "ncols": 4, "nrows": 4, "xllcorner": 0.0, "yllcorner": 0.0,
    "cellsize": 1.0, "nodata_value": -9999.0,
}

from species_range_data_pipeline_spark.multimodal.codecs import (
    decode_bmp,
    encode_bmp,
)

CASES = [
    ("bmp", lambda: encode_bmp(np.dstack([_IMG] * 3)), decode_bmp),
    ("gif", lambda: encode_gif(_IMG), decode_gif),
    ("jpeg", lambda: encode_jpeg(_IMG), decode_jpeg),
    ("jpeg-prog", lambda: encode_jpeg_progressive(_IMG), decode_jpeg),
    (
        "jpeg-prog-rst",
        lambda: encode_jpeg_progressive(
            np.dstack([_IMG] * 3), subsampling=(2, 2), restart_interval=1
        ),
        decode_jpeg,
    ),
    ("mp4", lambda: encode_mp4([b"sample"], 2, 2), extract_video_samples),
    ("png", lambda: encode_png(_IMG), decode_png),
    ("png-adam7", lambda: encode_png(np.dstack([_IMG] * 3), interlace=True), decode_png),
    ("gif-interlace", lambda: encode_gif(_IMG, interlace=True), decode_gif),
    ("wav", lambda: encode_wav(np.zeros(16, dtype=np.int16), 8000), decode_wav),
    ("tif", lambda: encode_geotiff(_HDR, [(0, 0, 1.0)]), parse_geotiff),
    ("shp", lambda: encode_shp([[[[(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 0.0)]]]]), parse_shp),
    ("dbf", lambda: encode_dbf([{"a": "x"}, {"a": "yy"}]), parse_dbf),
]


@pytest.mark.parametrize("name,make,parse", CASES, ids=[c[0] for c in CASES])
def test_truncations_and_bitflips_raise_valueerror(name, make, parse):
    blob = make()
    rng = random.Random(1234)
    for _ in range(150):
        trunc = blob[: rng.randrange(len(blob))]
        try:
            parse(trunc)
        except (ValueError, NotImplementedError):
            pass
        flipped = bytearray(blob)
        for _ in range(rng.randrange(1, 6)):
            flipped[rng.randrange(len(flipped))] = rng.randrange(256)
        try:
            parse(bytes(flipped))
        except (ValueError, NotImplementedError):
            pass
        # any other exception type propagates and fails the test


def test_hostile_declared_sizes_fail_fast():
    """Corrupt counts/dims must be rejected by arithmetic, not by trying
    to allocate or loop through them."""
    import struct

    # JPEG: SOF claims 65500x65500 but almost no entropy data
    blob = bytearray(encode_jpeg(_IMG))
    i = bytes(blob).find(b"\xff\xc0")
    struct.pack_into(">HH", blob, i + 5, 65500, 65500)
    with pytest.raises(ValueError, match="blocks|entropy"):
        decode_jpeg(bytes(blob))

    # TIFF: IFD entry with a 4-billion value count
    tif = bytearray(encode_geotiff(_HDR, [(0, 0, 1.0)]))
    (n_entries,) = struct.unpack_from("<H", tif, 8)
    struct.pack_into("<I", tif, 8 + 2 + 4, 0xFFFFFFF0)  # first entry count
    with pytest.raises(ValueError):
        parse_geotiff(bytes(tif))

    # shp: polygon record declaring 2^30 points
    shp = bytearray(encode_shp([[[[(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 0.0)]]]]))
    struct.pack_into("<i", shp, 100 + 8 + 40, 1 << 30)
    with pytest.raises(ValueError, match="points"):
        parse_shp(bytes(shp))

    # dbf: zero record size would loop forever
    dbf = bytearray(encode_dbf([{"a": "x"}]))
    struct.pack_into("<H", dbf, 10, 0)
    with pytest.raises(ValueError, match="records"):
        parse_dbf(bytes(dbf))


def test_lzw_tiled_tiff_variants_survive_fuzz():
    """The LZW and tiled encodings go through the same truncation/bitflip
    gauntlet as the strip encoding: ValueError or success, never a hang,
    crash, or unbounded allocation."""
    variants = [
        encode_geotiff(_HDR, [(0, 0, 1.0), (3, 3, 2.0)], compression=5),
        encode_geotiff(
            {**_HDR, "ncols": 40, "nrows": 40},
            [(i, i, float(i)) for i in range(40)],
            compression=5,
            tile=(16, 16),
        ),
    ]
    rng = random.Random(99)
    for blob in variants:
        for _ in range(120):
            trunc = blob[: rng.randrange(len(blob))]
            try:
                parse_geotiff(trunc)
            except ValueError:
                pass
            flipped = bytearray(blob)
            for _ in range(rng.randrange(1, 6)):
                flipped[rng.randrange(len(flipped))] = rng.randrange(256)
            try:
                parse_geotiff(bytes(flipped))
            except ValueError:
                pass


def test_lzw_decoder_rejects_garbage_codes_and_bounds_output():
    from species_range_data_pipeline_spark.pipeline.geotiff import _lzw_decode

    rng = random.Random(5)
    for _ in range(200):
        junk = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 64)))
        try:
            out = _lzw_decode(junk, 4096)
            assert len(out) <= 4096
        except ValueError:
            pass


def test_warc_and_gpkg_survive_fuzz(tmp_path):
    """The r4 lanes honor the same contract: truncations and bit flips of
    valid WARC (plain + gzip) and GeoPackage inputs raise ValueError /
    NotImplementedError or succeed — never another exception type, a
    hang, or an attacker-sized allocation."""
    import gzip

    from species_range_data_pipeline_spark.functions.wkb import encode_polygon
    from species_range_data_pipeline_spark.sources.geopackage import (
        encode_gpkg_blob,
        parse_gpkg,
        parse_gpkg_blob,
        write_geopackage,
    )
    from species_range_data_pipeline_spark.sources.warc import parse_warc

    body = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p>x</p>"
    rec = (
        f"WARC/1.0\r\nWARC-Type: response\r\n"
        f"WARC-Target-URI: http://e.x/\r\nContent-Length: {len(body)}\r\n\r\n"
    ).encode() + body + b"\r\n\r\n"
    ring = [(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0), (0.0, 0.0)]
    write_geopackage([(encode_polygon([ring]), {"a": "1"})], str(tmp_path / "f.gpkg"))
    blobs = [
        (parse_warc, rec * 2),
        (parse_warc, b"".join(gzip.compress(r) for r in (rec, rec))),
        (parse_gpkg_blob, encode_gpkg_blob(encode_polygon([ring]))),
        (parse_gpkg, (tmp_path / "f.gpkg").read_bytes()),
    ]
    rng = random.Random(4321)
    for parse, blob in blobs:
        parse(blob)  # the valid form must parse
        for _ in range(120):
            trunc = blob[: rng.randrange(len(blob))]
            try:
                parse(trunc)
            except (ValueError, NotImplementedError):
                pass
            flipped = bytearray(blob)
            for _ in range(rng.randrange(1, 6)):
                flipped[rng.randrange(len(flipped))] = rng.randrange(256)
            try:
                parse(bytes(flipped))
            except (ValueError, NotImplementedError):
                pass


def test_warc_hostile_counts_fail_fast():
    """Negative declared lengths and decompression bombs are rejected by
    arithmetic, not by looping or allocating through them."""
    import gzip

    from species_range_data_pipeline_spark.sources.warc import parse_warc

    bad = (
        b"WARC/1.0\r\nWARC-Type: metadata\r\nContent-Length: -50\r\n\r\nx\r\n\r\n"
        b"WARC/1.0\r\nWARC-Type: metadata\r\nContent-Length: 1\r\n\r\ny\r\n\r\n"
    )
    with pytest.raises(ValueError, match="length"):
        parse_warc(bad)

    # a ~1 MB gzip member that expands past the 1 GiB cap — built
    # streaming so the TEST never holds the expanded form either
    import zlib as _zlib

    c = _zlib.compressobj(9, _zlib.DEFLATED, 31)
    parts = [c.compress(b"\x00" * (1 << 22)) for _ in range(300)]
    bomb = b"".join(parts) + c.flush()
    with pytest.raises(ValueError, match="bomb"):
        parse_warc(bomb)
