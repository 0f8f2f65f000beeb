"""Pure-struct PNG/WAV codec tests (multimodal/codecs.py).

The decoders are written from the file-format specs with no image/audio
library in the container, so the tests build fixtures two independent ways:
our own encoder (round-trip) and hand-assembled files exercising the parts
our encoder never emits (every PNG filter type, palette images, 8-bit and
float32 WAV).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from species_range_data_pipeline_spark.multimodal.codecs import (
    PNG_SIGNATURE,
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
)


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
    return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)


def _build_png(width, height, bit_depth, color_type, raw_scanlines, *,
               palette=None, interlace=0):
    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, color_type, 0, 0, interlace)
    out = PNG_SIGNATURE + _png_chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _png_chunk(b"PLTE", palette)
    out += _png_chunk(b"IDAT", zlib.compress(raw_scanlines))
    return out + _png_chunk(b"IEND", b"")


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip_all_color_types(channels):
    rng = np.random.RandomState(channels)
    px = rng.randint(0, 256, size=(5, 7, channels), dtype=np.uint8)
    w, h, c, got = decode_png(encode_png(px))
    assert (w, h, c) == (7, 5, channels)
    assert (got == px).all()


def test_png_grayscale_2d_input():
    px = np.arange(12, dtype=np.uint8).reshape(3, 4)
    w, h, c, got = decode_png(encode_png(px))
    assert (w, h, c) == (4, 3, 1)
    assert (got[:, :, 0] == px).all()


def _forward_filter(px: np.ndarray, ftypes: list[int]) -> bytes:
    """Reference forward PNG filter (spec §6) to build decode fixtures."""
    h, w, c = px.shape
    img = px.reshape(h, w * c).astype(np.int32)
    out = bytearray()
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        line = img[y]
        ftype = ftypes[y % len(ftypes)]
        out.append(ftype)
        for i in range(w * c):
            left = line[i - c] if i >= c else 0
            up = prev[i]
            upleft = prev[i - c] if i >= c else 0
            if ftype == 0:
                v = line[i]
            elif ftype == 1:
                v = line[i] - left
            elif ftype == 2:
                v = line[i] - up
            elif ftype == 3:
                v = line[i] - ((left + up) >> 1)
            elif ftype == 4:
                p = left + up - upleft
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - upleft)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else upleft)
                v = line[i] - pred
            out.append(v & 0xFF)
        prev = line
    return bytes(out)


@pytest.mark.parametrize("ftypes", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_all_filter_types_decode(ftypes):
    rng = np.random.RandomState(sum(ftypes))
    px = rng.randint(0, 256, size=(6, 5, 3), dtype=np.uint8)
    blob = _build_png(5, 6, 8, 2, _forward_filter(px, ftypes))
    w, h, c, got = decode_png(blob)
    assert (w, h, c) == (5, 6, 3)
    assert (got == px).all()


def test_png_palette_expands_to_rgb():
    # 3 palette entries; 2x2 indexed image
    palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    raw = b"".join(b"\x00" + row.tobytes() for row in idx)
    blob = _build_png(2, 2, 8, 3, raw, palette=palette)
    w, h, c, got = decode_png(blob)
    assert (w, h, c) == (2, 2, 3)
    assert tuple(got[0, 0]) == (255, 0, 0)
    assert tuple(got[0, 1]) == (0, 255, 0)
    assert tuple(got[1, 0]) == (0, 0, 255)


def test_png_loud_gates():
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    raw = _forward_filter(px, [0])
    # sequential-length pixel stream under an Adam7 header: stream/pass
    # size mismatch must be a loud ValueError, not a misdecode
    with pytest.raises(ValueError, match="pixel stream"):
        decode_png(_build_png(2, 2, 8, 2, raw, interlace=1))
    with pytest.raises(ValueError, match="interlace method"):
        decode_png(_build_png(2, 2, 8, 2, raw, interlace=2))
    with pytest.raises(NotImplementedError, match="bit depth"):
        decode_png(_build_png(2, 2, 3, 0, raw))  # depth 3 isn't PNG at all
    with pytest.raises(ValueError, match="illegal"):
        decode_png(_build_png(2, 2, 4, 2, raw))  # 4-bit RGB is spec-illegal
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"not a png at all")
    with pytest.raises(ValueError, match="pixel stream"):
        decode_png(_build_png(4, 4, 8, 2, raw))  # raw too short for 4x4


def test_wav_roundtrip_mono_and_stereo():
    rng = np.random.RandomState(0)
    mono = rng.randint(-32768, 32768, size=100, dtype=np.int16)
    rate, nch, got = decode_wav(encode_wav(mono, 16000))
    assert (rate, nch) == (16000, 1)
    assert (got[:, 0] == mono).all()

    stereo = rng.randint(-32768, 32768, size=(50, 2), dtype=np.int16)
    rate, nch, got = decode_wav(encode_wav(stereo, 44100))
    assert (rate, nch) == (44100, 2)
    assert (got == stereo).all()


def _build_wav(audio_format, n_channels, rate, bits, body: bytes) -> bytes:
    block_align = n_channels * (bits // 8)
    fmt = struct.pack("<HHIIHH", audio_format, n_channels, rate,
                      rate * block_align, block_align, bits)
    payload = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
               + b"data" + struct.pack("<I", len(body)) + body)
    return b"RIFF" + struct.pack("<I", len(payload)) + payload


def test_wav_8bit_recenters():
    body = bytes([0, 128, 255])
    rate, nch, got = decode_wav(_build_wav(1, 1, 8000, 8, body))
    assert (rate, nch) == (8000, 1)
    assert got[:, 0].tolist() == [(-128) << 8, 0, 127 << 8]


def test_wav_float32_scales_and_clips():
    body = np.array([0.0, 1.0, -1.0, 2.0, 0.5], dtype="<f4").tobytes()
    _, _, got = decode_wav(_build_wav(3, 1, 8000, 32, body))
    assert got[:, 0].tolist() == [0, 32767, -32767, 32767, 16383]


def test_wav_odd_chunk_padding_and_gates():
    # a 3-byte junk chunk before fmt forces the word-alignment path
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = np.array([1, -1], dtype="<i2").tobytes()
    payload = (b"WAVE" + b"junk" + struct.pack("<I", 3) + b"abc\x00"
               + b"fmt " + struct.pack("<I", len(fmt)) + fmt
               + b"data" + struct.pack("<I", len(body)) + body)
    blob = b"RIFF" + struct.pack("<I", len(payload)) + payload
    _, _, got = decode_wav(blob)
    assert got[:, 0].tolist() == [1, -1]

    with pytest.raises(NotImplementedError, match="not supported"):
        decode_wav(_build_wav(0x31, 1, 8000, 0, b"\x00\x00"))  # GSM 6.10
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"not audio")


# --------------------------------------------------------------------- BMP


def test_bmp_roundtrip_and_padding():
    """24-bit encode->decode is exact, including widths whose rows need
    4-byte padding."""
    from species_range_data_pipeline_spark.multimodal.codecs import (
        decode_bmp,
        encode_bmp,
    )

    rng = np.random.default_rng(4)
    for w in (5, 6, 7, 8):  # 5,6,7 force row padding
        px = rng.integers(0, 256, size=(9, w, 3), dtype=np.uint8)
        ww, hh, c, got = decode_bmp(encode_bmp(px))
        assert (ww, hh, c) == (w, 9, 3)
        assert np.array_equal(got, px)


def test_bmp_topdown_palette_and_gates():
    import struct as _struct

    from species_range_data_pipeline_spark.multimodal.codecs import (
        decode_bmp,
        encode_bmp,
    )

    # top-down: negate the height in a hand-patched 24-bit file and flip rows
    px = np.arange(2 * 4 * 3, dtype=np.uint8).reshape(2, 4, 3)
    blob = bytearray(encode_bmp(px[::-1]))  # encoder is bottom-up
    _struct.pack_into("<i", blob, 22, -2)  # height = -2 -> top-down
    # rows already reversed at encode: top-down read restores px as-is
    *_, got = decode_bmp(bytes(blob))
    assert np.array_equal(got, px[::-1][::-1])

    # 8-bit palette: grayscale ramp palette, identity indices
    w = h = 4
    pal = b"".join(bytes([i, i, i, 0]) for i in range(256))
    idx_rows = b"".join(bytes(range(r * w, r * w + w)) for r in range(h))
    info = _struct.pack("<IiihHIIiiII", 40, w, h, 1, 8, 0, 0, 0, 0, 256, 0)
    hdr = _struct.pack("<2sIHHI", b"BM", 0, 0, 0, 14 + 40 + len(pal))
    blob8 = hdr + info + pal + idx_rows
    ww, hh, c, got = decode_bmp(blob8)
    assert (ww, hh, c) == (4, 4, 3)
    # bottom-up: last byte row is the top pixel row; palette is gray ramp
    assert got[0, 0, 0] == 12 and got[3, 3, 2] == 3

    # loud gates: RLE compression, 1-bit depth
    rle = bytearray(encode_bmp(px))
    _struct.pack_into("<I", rle, 30, 1)  # BI_RLE8
    with pytest.raises(NotImplementedError, match="compression"):
        decode_bmp(bytes(rle))
    onebit = bytearray(encode_bmp(px))
    _struct.pack_into("<H", onebit, 28, 1)
    with pytest.raises(NotImplementedError, match="depth"):
        decode_bmp(bytes(onebit))


def test_bmp_flows_through_media_image_lane(spark):
    from species_range_data_pipeline_spark.multimodal.codecs import encode_bmp
    from species_range_data_pipeline_spark.multimodal.media import (
        MEDIA_SCHEMA,
        decode_images,
    )

    px = np.full((6, 8, 3), 7, dtype=np.uint8)
    px[2:4, 3:5] = 200
    rows = [(0, "image", encode_bmp(px), "bmp"),
            (1, "image", b"BMgarbage", "bmp")]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r for r in decode_images(media).collect()}
    assert got[0].error is None
    assert (got[0].width, got[0].height, got[0].channels) == (8, 6, 3)
    assert got[1].error is not None


def test_gif_roundtrip_and_features():
    """encode -> decode round-trips indices through a real LZW stream
    (variable width, clear-code reset path exercised by 256 distinct
    values); GCE transparency substitutes; media seam sniffs GIFs."""
    import numpy as np

    from species_range_data_pipeline_spark.multimodal.gif import (
        decode_gif,
        encode_gif,
    )
    from species_range_data_pipeline_spark.multimodal.media import (
        _decode_payload,
    )

    rng = np.random.RandomState(7)
    gray = rng.randint(0, 256, size=(23, 31), dtype=np.uint8)
    blob = encode_gif(gray)
    w, h, c, px = decode_gif(blob)
    assert (w, h, c) == (31, 23, 3)
    assert np.array_equal(px[:, :, 0], gray)  # grayscale palette: R==value
    assert np.array_equal(px[:, :, 1], gray)

    # the media decode seam dispatches on the signature
    w2, h2, c2, px2 = _decode_payload(blob)
    assert (w2, h2, c2) == (31, 23, 3) and np.array_equal(px2, px)

    # a big uniform image forces dictionary growth + width increments
    big = np.tile(np.arange(256, dtype=np.uint8), (64, 8))
    assert np.array_equal(decode_gif(encode_gif(big))[3][:, :, 2], big)


def test_gif_gates_and_transparency():
    import struct as _struct

    import numpy as np
    import pytest as _pytest

    from species_range_data_pipeline_spark.multimodal.gif import (
        decode_gif,
        encode_gif,
    )

    with _pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"NOPE" + b"\x00" * 20)
    # flipping the interlace bit on a sequential stream must decode via
    # the four-pass scatter — rows land permuted exactly per the 89a
    # pass order (a silent sequential read here would be a misdecode)
    g4 = (np.arange(4, dtype=np.uint8)[:, None] * np.ones(3, np.uint8))
    blob = bytearray(encode_gif(g4))
    idesc = 13 + 768  # image descriptor after header + 256-entry GCT
    assert blob[idesc] == 0x2C
    blob[idesc + 9] |= 0x40
    _, _, _, px = decode_gif(bytes(blob))
    # transmission rows 0,1,2,3 scatter to canvas rows 0,2,1,3
    assert [int(px[r, 0, 0]) for r in range(4)] == [0, 2, 1, 3]

    # GCE transparency: transparent index pixels become white
    g = np.zeros((2, 2), dtype=np.uint8)
    g[0, 0] = 5
    base = encode_gif(g)
    gce = b"\x21\xf9\x04\x01\x00\x00\x05\x00"  # flags=1, tindex=5
    with_gce = base[:idesc] + gce + base[idesc:]
    _, _, _, px = decode_gif(with_gce)
    assert tuple(px[0, 0]) == (255, 255, 255)
    assert tuple(px[1, 1]) == (0, 0, 0)


def test_png_adam7_roundtrip_all_channel_counts():
    """Adam7 interlaced PNGs deinterlace to the exact sequential pixels:
    every channel count, sizes straddling the 8x8 pass grid (PNG is
    lossless, so equality is exact)."""
    rng = np.random.RandomState(11)
    for h, w in [(1, 1), (3, 3), (7, 9), (8, 8), (17, 5), (40, 56)]:
        for c in (1, 2, 3, 4):
            img = rng.randint(0, 256, (h, w, c), dtype=np.uint8)
            blob = encode_png(img, interlace=True)
            assert blob != encode_png(img)  # genuinely different layout
            W, H, C, px = decode_png(blob)
            assert (W, H, C) == (w, h, c)
            assert np.array_equal(px, img), (h, w, c)


def test_gif_interlace_roundtrip():
    """Four-pass interlaced GIF decodes to the same pixels as sequential."""
    from species_range_data_pipeline_spark.multimodal.gif import (
        decode_gif,
        encode_gif,
    )

    rng = np.random.RandomState(12)
    for h, w in [(1, 1), (2, 3), (7, 5), (8, 8), (9, 17), (33, 20)]:
        img = rng.randint(0, 256, (h, w), dtype=np.uint8)
        inter = decode_gif(encode_gif(img, interlace=True))[3]
        plain = decode_gif(encode_gif(img))[3]
        assert np.array_equal(inter, plain), (h, w)
        assert np.array_equal(inter[:, :, 0], img)


def test_png_16bit_decodes_high_bytes():
    """16-bit samples (big-endian, bytewise filtering at 2 bytes/channel)
    reduce to 8-bit by keeping the high byte — sequential AND Adam7."""
    rng = np.random.RandomState(16)
    for color_type, nch in [(0, 1), (2, 3), (6, 4)]:
        v16 = rng.randint(0, 65536, (6, 5, nch), dtype=np.uint16)
        be = v16.astype(">u2").tobytes()
        rows = np.frombuffer(be, np.uint8).reshape(6, 5 * nch * 2)
        raw = b"".join(b"\x00" + r.tobytes() for r in rows)
        w, h, c, got = decode_png(_build_png(5, 6, 16, color_type, raw))
        assert (w, h, c) == (5, 6, nch)
        assert np.array_equal(got, (v16 >> 8).astype(np.uint8))
    # 16-bit + Adam7 together: pack each pass of the gray image
    v16 = rng.randint(0, 65536, (9, 7), dtype=np.uint16)
    from species_range_data_pipeline_spark.multimodal.codecs import _ADAM7

    parts = []
    for x0, xs, y0, ys in _ADAM7:
        sub = v16[y0::ys, x0::xs]
        if sub.size == 0:
            continue
        rows = np.frombuffer(sub.astype(">u2").tobytes(), np.uint8).reshape(
            sub.shape[0], sub.shape[1] * 2
        )
        parts.append(b"".join(b"\x00" + r.tobytes() for r in rows))
    blob = _build_png(7, 9, 16, 0, b"".join(parts), interlace=1)
    w, h, c, got = decode_png(blob)
    assert (w, h, c) == (7, 9, 1)
    assert np.array_equal(got[:, :, 0], (v16 >> 8).astype(np.uint8))


def test_wav_24bit_pcm():
    """24-bit PCM reassembles 3-byte LE signed samples and keeps the top
    16 bits — full-scale positive/negative/zero land exactly."""
    vals = [0x000000, 0x7FFFFF, 0x800000, 0xFFFFFF, 0x123456, 0xABCDEF]
    body = b"".join(v.to_bytes(3, "little") for v in vals)
    rate, nch, got = decode_wav(_build_wav(1, 1, 48000, 24, body))
    assert (rate, nch) == (48000, 1)

    def want(v):
        s = v - (1 << 24) if v & 0x800000 else v
        return s >> 8

    assert got[:, 0].tolist() == [want(v) for v in vals]
    # stereo framing
    rate, nch, got = decode_wav(_build_wav(1, 2, 44100, 24, body))
    assert (rate, nch) == (44100, 2) and got.shape == (3, 2)


def test_wav_extensible_format():
    """WAVE_FORMAT_EXTENSIBLE (the real-world container for multichannel
    and 24-bit PCM): the format tag lives in the SubFormat GUID; PCM and
    float32 sub-formats decode, a foreign GUID gates loudly."""
    import struct as _struct

    def build_ext(subfmt, n_ch, rate, bits, body):
        block_align = n_ch * (bits // 8)
        guid = _struct.pack("<H", subfmt) + (
            b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
        )
        fmt = _struct.pack(
            "<HHIIHHHHI", 0xFFFE, n_ch, rate, rate * block_align,
            block_align, bits, 22, bits, 0x3,
        ) + guid
        payload = (b"WAVE" + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
                   + b"data" + _struct.pack("<I", len(body)) + body)
        return b"RIFF" + _struct.pack("<I", len(payload)) + payload

    body = np.array([100, -100, 7, -7], dtype="<i2").tobytes()
    rate, nch, got = decode_wav(build_ext(1, 2, 48000, 16, body))
    assert (rate, nch) == (48000, 2)
    assert got.tolist() == [[100, -100], [7, -7]]

    # float32 subformat
    fb = np.array([0.5, -0.5], dtype="<f4").tobytes()
    _, _, got = decode_wav(build_ext(3, 1, 44100, 32, fb))
    assert got[:, 0].tolist() == [16383, -16383]

    # 24-bit PCM inside extensible (the common studio layout)
    b24 = (0x123456).to_bytes(3, "little") + (0x800000).to_bytes(3, "little")
    _, _, got = decode_wav(build_ext(1, 1, 96000, 24, b24))
    assert got[:, 0].tolist() == [0x123456 >> 8, (0x800000 - (1 << 24)) >> 8]

    # foreign subformat GUID gates
    bad = bytearray(build_ext(1, 1, 8000, 16, body))
    i = bytes(bad).find(b"\x9b\x71")
    bad[i] = 0x00
    with pytest.raises(NotImplementedError, match="subformat"):
        decode_wav(bytes(bad))


def _pack_rows(samples: np.ndarray, depth: int) -> bytes:
    """(h, w) native-depth samples -> filter-0 scanlines, MSB-first,
    rows padded to a byte boundary (the test-side packer)."""
    h, w = samples.shape
    out = bytearray()
    for row in samples:
        bits = np.zeros(w * depth, dtype=np.uint8)
        for i, v in enumerate(row):
            for b in range(depth):
                bits[i * depth + b] = (int(v) >> (depth - 1 - b)) & 1
        out.append(0)
        out += np.packbits(bits).tobytes()
    return bytes(out)


def test_png_subbyte_gray_depths():
    """1/2/4-bit grayscale decodes with exact level expansion
    (255 / (2^d - 1) is integral for all three)."""
    rng = np.random.RandomState(21)
    for depth in (1, 2, 4):
        maxv = (1 << depth) - 1
        img = rng.randint(0, maxv + 1, (5, 11), dtype=np.uint8)
        blob = _build_png(11, 5, depth, 0, _pack_rows(img, depth))
        w, h, c, got = decode_png(blob)
        assert (w, h, c) == (11, 5, 1)
        assert np.array_equal(got[:, :, 0], img * (255 // maxv)), depth


def test_png_4bit_palette():
    """4-bit palette (the classic web-icon layout): indexes unpack
    MSB-first and expand through PLTE; an index past the table is loud."""
    palette = bytes(
        v for i in range(16) for v in (i * 16, 255 - i * 16, i)
    )
    idx = np.array([[0, 15, 7], [8, 1, 14]], dtype=np.uint8)
    blob = _build_png(3, 2, 4, 3, _pack_rows(idx, 4), palette=palette)
    w, h, c, got = decode_png(blob)
    assert (w, h, c) == (3, 2, 3)
    assert tuple(got[0, 1]) == (240, 15, 15)
    assert tuple(got[1, 2]) == (224, 31, 14)

    short = palette[: 3 * 8]  # only 8 entries; index 15 must refuse
    with pytest.raises(ValueError, match="palette index"):
        decode_png(_build_png(3, 2, 4, 3, _pack_rows(idx, 4), palette=short))


def test_png_subbyte_adam7():
    """Sub-byte + Adam7 together: each pass bit-packs to its OWN row
    boundaries; 2-bit gray over a 9x9 canvas hits every pass shape."""
    from species_range_data_pipeline_spark.multimodal.codecs import _ADAM7

    rng = np.random.RandomState(22)
    img = rng.randint(0, 4, (9, 9), dtype=np.uint8)
    parts = []
    for x0, xs, y0, ys in _ADAM7:
        sub = img[y0::ys, x0::xs]
        if sub.size == 0:
            continue
        parts.append(_pack_rows(sub, 2))
    blob = _build_png(9, 9, 2, 0, b"".join(parts), interlace=1)
    w, h, c, got = decode_png(blob)
    assert (w, h, c) == (9, 9, 1)
    assert np.array_equal(got[:, :, 0], img * 85)


def test_wav_ima_adpcm_decodes():
    """IMA/DVI ADPCM (WAV format 0x11): a reference encoder (canonical
    quantize + the same predictor recurrence, written here from the IMA
    algorithm) compresses random audio; our decoder must reproduce the
    encoder's reconstruction track EXACTLY — ADPCM decode mirrors the
    encoder's internal state by construction.  Mono and stereo."""
    from species_range_data_pipeline_spark.multimodal.codecs import (
        _IMA_INDEX,
        _IMA_STEPS,
    )

    def encode_block(samples, pred, index):
        nibbles, recon = [], []
        for s in samples:
            step = _IMA_STEPS[index]
            diff = int(s) - pred
            n = 8 if diff < 0 else 0
            if diff < 0:
                diff = -diff
            if diff >= step:
                n |= 4
                diff -= step
            if diff >= step >> 1:
                n |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                n |= 1
            delta = step >> 3
            if n & 1:
                delta += step >> 2
            if n & 2:
                delta += step >> 1
            if n & 4:
                delta += step
            pred = pred - delta if n & 8 else pred + delta
            pred = max(-32768, min(32767, pred))
            index = max(0, min(88, index + _IMA_INDEX[n & 7]))
            nibbles.append(n)
            recon.append(pred)
        return nibbles, recon, pred, index

    rng = np.random.RandomState(31)
    for n_ch in (1, 2):
        # one block: 4-byte header per channel + 16 data bytes per channel
        block_align = 4 * n_ch + 16 * n_ch
        sig = np.cumsum(rng.randint(-800, 800, (33, n_ch)), axis=0)
        sig = np.clip(sig, -32768, 32767).astype(np.int16)
        body = bytearray()
        want_ch = []
        nib_ch = []
        for c in range(n_ch):
            pred, index = int(sig[0, c]), 0
            nibs, recon, _, _ = encode_block(sig[1:, c], pred, index)
            body += struct.pack("<hBB", pred, index, 0)
            want_ch.append([pred] + recon)
            nib_ch.append(nibs)
        # data: 4-byte words interleaved per channel, low nibble first
        for w in range(4):  # 32 nibbles / 8 per word
            for c in range(n_ch):
                for b in range(4):
                    lo = nib_ch[c][w * 8 + 2 * b]
                    hi = nib_ch[c][w * 8 + 2 * b + 1]
                    body.append(lo | (hi << 4))
        fmt = struct.pack(
            "<HHIIHHHH", 0x11, n_ch, 8000, 8000 * block_align // 64,
            block_align, 4, 2, 1 + 16 * 2,
        )
        payload = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                   + b"data" + struct.pack("<I", len(body)) + bytes(body))
        blob = b"RIFF" + struct.pack("<I", len(payload)) + payload
        rate, nch, got = decode_wav(blob)
        assert (rate, nch) == (8000, n_ch)
        assert got.shape == (33, n_ch)
        for c in range(n_ch):
            assert got[:, c].tolist() == want_ch[c], (n_ch, c)

    # hostile: out-of-range step index refuses
    bad = bytearray(blob)
    i = blob.find(b"data") + 8 + 2
    bad[i] = 99
    with pytest.raises(ValueError, match="step index"):
        decode_wav(bytes(bad))


def test_wav_ms_adpcm_decodes():
    """MS-ADPCM (format 0x02): reference encoder (the published
    predictor/delta adaptation) built here; decode must equal its
    reconstruction track exactly, seeds included, mono and stereo."""
    from species_range_data_pipeline_spark.multimodal.codecs import (
        _MS_ADAPT,
        _MS_COEFS,
    )

    def encode(samples, pred_idx, delta, s2, s1):
        a, b = _MS_COEFS[pred_idx]
        nibs, recon = [], []
        for s in samples:
            base = (s1 * a + s2 * b) // 256
            err = int(s) - base
            code = max(-8, min(7, int(err / delta) if delta else 0))
            nib = code & 0xF
            pred = base + code * delta
            pred = max(-32768, min(32767, pred))
            s2, s1 = s1, pred
            delta = max(16, (_MS_ADAPT[nib] * delta) // 256)
            nibs.append(nib)
            recon.append(pred)
        return nibs, recon

    rng = np.random.RandomState(41)
    for n_ch in (1, 2):
        data_bytes = 8  # 16 nibbles total across channels
        block_align = 7 * n_ch + data_bytes
        n_codes = data_bytes * 2 // n_ch
        sig = np.clip(
            np.cumsum(rng.randint(-500, 500, (n_codes, n_ch)), axis=0),
            -32768, 32767,
        )
        body = bytearray()
        nib_ch, want_ch = [], []
        for c in range(n_ch):
            s2, s1, delta, pidx = 100 * (c + 1), 300 * (c + 1), 64, 0
            nibs, recon = encode(sig[:, c], pidx, delta, s2, s1)
            nib_ch.append(nibs)
            want_ch.append([s2, s1] + recon)
        for c in range(n_ch):
            body.append(0)  # predictor index
        for c in range(n_ch):
            body += struct.pack("<h", 64)
        for c in range(n_ch):
            body += struct.pack("<h", 300 * (c + 1))  # s1 (newer)
        for c in range(n_ch):
            body += struct.pack("<h", 100 * (c + 1))  # s2 (older)
        # interleave nibbles channel-round-robin, high nibble first
        flat = []
        for i in range(n_codes):
            for c in range(n_ch):
                flat.append(nib_ch[c][i])
        for i in range(0, len(flat), 2):
            body.append((flat[i] << 4) | flat[i + 1])
        fmt = struct.pack(
            "<HHIIHHHH", 0x02, n_ch, 8000, 4000, block_align, 4, 2, 0
        )
        payload = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                   + b"data" + struct.pack("<I", len(body)) + bytes(body))
        blob = b"RIFF" + struct.pack("<I", len(payload)) + payload
        rate, nch, got = decode_wav(blob)
        assert (rate, nch) == (8000, n_ch)
        for c in range(n_ch):
            assert got[:, c].tolist() == want_ch[c], (n_ch, c)

    # hostile: predictor index past the coefficient table refuses
    bad = bytearray(blob)
    i = blob.find(b"data") + 8
    bad[i] = 9
    with pytest.raises(ValueError, match="predictor"):
        decode_wav(bytes(bad))
