"""Pure-struct PNG and WAV codecs (stdlib only: ``zlib`` + ``struct``).

The container ships no image/audio libraries, so these implement the file
formats from first principles in the same no-dependency style as
``pipeline/geotiff.py`` — real decoders, not stubs.  Coverage is the subset
a training-data pipeline actually meets in bulk:

* PNG: every spec-legal depth/color combination — 1/2/4-bit gray and
  palette, 8-bit everything, 16-bit (reduced to the high byte) —
  sequential or Adam7-interlaced; color types 0 (gray), 2 (RGB), 3
  (palette), 4 (gray+alpha), 6 (RGBA).
* WAV: RIFF/WAVE with PCM 8-bit unsigned, 16-bit signed, 24-bit signed,
  IEEE float32, IMA/DVI ADPCM, and MS-ADPCM ``data`` chunks; any
  channel count; plain and WAVE_FORMAT_EXTENSIBLE headers (format tag
  from the SubFormat GUID).  GSM/A-law/MP3-in-WAV raise loudly.

Reference parity note: the reference ETL never touches raster imagery
directly (arcpy handles its GeoTIFFs); this module serves the builder-brief
multimodal lane (decode / feature-extract / resize over opaque binary
columns), replacing the former ``NotImplementedError`` gates for PNG/WAV.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# PNG color type -> channel count (before palette expansion)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, stride: int, height: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filtering -> (height, stride) uint8 array.
    ``stride`` = filtered bytes per row; ``bpp`` = the filter's pixel
    delta in BYTES (spec: rounded up to one for sub-byte depths)."""
    if len(raw) != height * (stride + 1):
        raise ValueError(
            f"PNG pixel stream is {len(raw)} bytes; expected "
            f"{height * (stride + 1)} for {height} rows of {stride}"
        )
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1)
        pos += stride + 1
        if ftype == 0:  # None
            recon = line.copy()
        elif ftype == 2:  # Up
            recon = line + prev  # uint8 arithmetic wraps mod 256 by design
        elif ftype == 1:  # Sub: recon[x] = line[x] + recon[x-bpp]
            # group bytes into bpp-wide pixels; the recurrence is a running
            # sum down the pixel axis, which mod-256 uint8 cumsum computes
            recon = line.reshape(-1, bpp).cumsum(axis=0, dtype=np.uint8).ravel()
        elif ftype == 3:  # Average: needs left recon, sequential per pixel
            recon = np.empty(stride, dtype=np.uint8)
            for i in range(stride):
                left = int(recon[i - bpp]) if i >= bpp else 0
                recon[i] = (int(line[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            recon = np.empty(stride, dtype=np.uint8)
            for i in range(stride):
                left = int(recon[i - bpp]) if i >= bpp else 0
                upleft = int(prev[i - bpp]) if i >= bpp else 0
                recon[i] = (int(line[i]) + _paeth(left, int(prev[i]), upleft)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype} on scanline {y}")
        out[y] = recon
        prev = recon
    return out


#: Adam7 pass geometry: (x_start, x_step, y_start, y_step) per pass
_ADAM7 = [
    (0, 8, 0, 8), (4, 8, 0, 8), (0, 4, 4, 8), (2, 4, 0, 4),
    (0, 2, 2, 4), (1, 2, 0, 2), (0, 1, 1, 2),
]


def _row_bytes(width: int, nch: int, depth: int) -> int:
    return (width * nch * depth + 7) // 8


def _unpack_rows(
    rows: np.ndarray, width: int, nch: int, depth: int
) -> np.ndarray:
    """(h, row_bytes) reconstructed bytes -> (h, w, nch) raw samples:
    native gray levels / palette indexes for sub-byte depths (MSB-first
    within each byte, rows padded to a byte boundary), the high byte for
    16-bit, bytes verbatim for 8."""
    h = rows.shape[0]
    if depth == 8:
        return rows[:, : width * nch].reshape(h, width, nch)
    if depth == 16:
        return np.ascontiguousarray(
            rows[:, : width * nch * 2].reshape(h, width, nch, 2)[..., 0]
        )
    bits = np.unpackbits(rows, axis=1)[:, : width * nch * depth]
    weights = 1 << np.arange(depth - 1, -1, -1)
    return (
        (bits.reshape(h, width, nch, depth) * weights).sum(axis=3)
    ).astype(np.uint8)


def _unfilter_samples(
    raw: bytes, width: int, height: int, nch: int, depth: int
) -> np.ndarray:
    """Unfilter + unpack one (sub-)image -> (h, w, nch) raw samples."""
    stride = _row_bytes(width, nch, depth)
    bpp = max(1, nch * depth // 8)  # filter delta unit, >= 1 byte
    return _unpack_rows(
        _unfilter(raw, stride, height, bpp), width, nch, depth
    )


def _deinterlace_adam7(
    raw: bytes, width: int, height: int, nch: int, depth: int
) -> np.ndarray:
    """Adam7: the pixel stream is seven independently-filtered sub-images
    (reduced grids of the pass geometry, each bit-packed to its OWN row
    boundaries), scattered back onto the full canvas.  Empty passes (a
    dimension rounds to zero) contribute no bytes, filter bytes
    included."""
    out = np.zeros((height, width, nch), dtype=np.uint8)
    pos = 0
    for x0, xs, y0, ys in _ADAM7:
        pw = (width - x0 + xs - 1) // xs
        ph = (height - y0 + ys - 1) // ys
        if pw <= 0 or ph <= 0:
            continue
        size = ph * (_row_bytes(pw, nch, depth) + 1)
        out[y0::ys, x0::xs] = _unfilter_samples(
            raw[pos : pos + size], pw, ph, nch, depth
        )
        pos += size
    if pos != len(raw):
        raise ValueError(
            f"interlaced PNG pixel stream is {len(raw)} bytes; "
            f"expected {pos}"
        )
    return out


def decode_png(blob: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode a PNG -> (width, height, channels, uint8 array (h, w, c)).

    Palette images expand to RGB; gray+alpha and RGBA keep their alpha.
    Adam7-interlaced files deinterlace; 16-bit samples reduce to their
    high byte; 1/2/4-bit gray expands exactly (255/(2^d - 1) is
    integral) and sub-byte palette indexes unpack MSB-first.  Raises
    ``ValueError`` on malformed files (zlib/struct errors from
    truncations and bit flips normalized).
    """
    try:
        return _decode_png(blob)
    except (zlib.error, struct.error, IndexError) as exc:
        raise ValueError(f"malformed PNG: {exc}") from exc


def _decode_png(blob: bytes) -> tuple[int, int, int, np.ndarray]:
    if blob[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    palette = None
    while pos + 8 <= len(blob):
        length, ctype = struct.unpack_from(">I4s", blob, pos)
        data = blob[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError(f"truncated PNG chunk {ctype!r}")
        pos += 12 + length  # length + type + data + CRC (CRC not verified)
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if interlace not in (0, 1):
        raise ValueError(f"invalid PNG interlace method {interlace}")
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"invalid PNG color type {color_type}")
    nch = _PNG_CHANNELS[color_type]
    # spec-legal depth x color-type grid (11.2.2): sub-byte only for
    # grayscale and palette; 16-bit never for palette
    legal = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
             4: (8, 16), 6: (8, 16)}
    if bit_depth not in (1, 2, 4, 8, 16):
        raise NotImplementedError(f"PNG bit depth {bit_depth} is not supported")
    if bit_depth not in legal[color_type]:
        raise ValueError(
            f"illegal PNG depth/color combination {bit_depth}/{color_type}"
        )
    if not idat:
        raise ValueError("PNG has no IDAT data")
    raw = zlib.decompress(bytes(idat))
    if interlace == 1:
        px = _deinterlace_adam7(raw, width, height, nch, bit_depth)
    else:
        px = _unfilter_samples(raw, width, height, nch, bit_depth)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE chunk")
        idxs = px[:, :, 0]
        if int(idxs.max(initial=0)) >= len(palette):
            raise ValueError("palette index outside the PLTE table")
        return width, height, 3, palette[idxs]
    if bit_depth < 8:
        # exact expansion: 255 is divisible by 1, 3, and 15
        px = px * np.uint8(255 // ((1 << bit_depth) - 1))
    return width, height, nch, px


def encode_png(px: np.ndarray, interlace: bool = False) -> bytes:
    """Encode a uint8 array (h, w) or (h, w, c) with c in {1,2,3,4} as PNG
    (filter 0 scanlines, single zlib-compressed IDAT).  ``interlace=True``
    writes Adam7: seven filter-0 sub-images in pass order — exists so the
    deinterlacing decode path round-trips without an external codec."""
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    px = np.ascontiguousarray(px, dtype=np.uint8)
    if interlace:
        parts = []
        for x0, xs, y0, ys in _ADAM7:
            sub = px[y0::ys, x0::xs]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            lines = np.zeros((sub.shape[0], sub.shape[1] * c + 1), np.uint8)
            lines[:, 1:] = sub.reshape(sub.shape[0], -1)
            parts.append(lines.tobytes())
        raw = zlib.compress(b"".join(parts), 6)
    else:
        # prepend the filter-type-0 byte to each scanline
        lines = np.zeros((h, w * c + 1), dtype=np.uint8)
        lines[:, 1:] = px.reshape(h, w * c)
        raw = zlib.compress(lines.tobytes(), 6)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, int(interlace))
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", raw)
        + chunk(b"IEND", b"")
    )


#: IMA/DVI ADPCM step-size table (the 89-entry constant from the IMA
#: ADPCM reference algorithm, also in RFC 3551 §4.5.1)
_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ima_decode_nibbles(nibbles, pred: int, index: int, out: list[int]):
    """The IMA ADPCM inner loop: one 4-bit code -> one int16 sample."""
    for n in nibbles:
        step = _IMA_STEPS[index]
        delta = step >> 3
        if n & 1:
            delta += step >> 2
        if n & 2:
            delta += step >> 1
        if n & 4:
            delta += step
        pred = pred - delta if n & 8 else pred + delta
        pred = max(-32768, min(32767, pred))
        out.append(pred)
        index = max(0, min(88, index + _IMA_INDEX[n & 7]))
    return pred, index


def _decode_ima_adpcm(
    data: bytes, n_channels: int, block_align: int
) -> np.ndarray:
    """IMA/DVI ADPCM (WAV format 0x11) -> (n_frames, n_channels) int16.
    Per block and channel: a 4-byte header (int16 predictor, step index,
    reserved) seeds the decoder, then the channels' nibble data
    interleaves in 4-byte words."""
    if n_channels < 1 or block_align < 4 * n_channels:
        raise ValueError("implausible ADPCM block geometry")
    chans: list[list[int]] = [[] for _ in range(n_channels)]
    for base in range(0, len(data) - block_align + 1, block_align):
        block = data[base : base + block_align]
        preds, idxs = [], []
        for c in range(n_channels):
            pred = struct.unpack_from("<h", block, 4 * c)[0]
            index = block[4 * c + 2]
            if index > 88:
                raise ValueError(f"ADPCM step index {index} out of range")
            preds.append(pred)
            idxs.append(index)
            chans[c].append(pred)  # the header predictor IS sample 0
        pos = 4 * n_channels
        while pos + 4 * n_channels <= len(block):
            for c in range(n_channels):
                word = block[pos + 4 * c : pos + 4 * c + 4]
                nibbles = []
                for byte in word:  # low nibble first, per the IMA layout
                    nibbles.append(byte & 0xF)
                    nibbles.append(byte >> 4)
                preds[c], idxs[c] = _ima_decode_nibbles(
                    nibbles, preds[c], idxs[c], chans[c]
                )
            pos += 4 * n_channels
    n_frames = min(len(ch) for ch in chans)
    out = np.empty((n_frames, n_channels), dtype=np.int16)
    for c in range(n_channels):
        out[:, c] = chans[c][:n_frames]
    return out


#: MS-ADPCM adaptation table and the 7 standard predictor coefficient
#: pairs (Microsoft WAVE format 0x02 specification)
_MS_ADAPT = [230, 230, 230, 230, 307, 409, 512, 614,
             768, 614, 512, 409, 307, 230, 230, 230]
_MS_COEFS = [(256, 0), (512, -256), (0, 0), (192, 64),
             (240, 0), (460, -208), (392, -232)]


def _decode_ms_adpcm(
    data: bytes, n_channels: int, block_align: int
) -> np.ndarray:
    """MS-ADPCM (WAV format 0x02) -> (n_frames, n_channels) int16.
    Per block: one predictor index + initial delta + two seed samples
    per channel (the seeds ARE the first two output frames, newest
    second), then channel-interleaved 4-bit codes, high nibble first."""
    header = 7 * n_channels
    if n_channels < 1 or block_align <= header:
        raise ValueError("implausible MS-ADPCM block geometry")
    chans: list[list[int]] = [[] for _ in range(n_channels)]
    for base in range(0, len(data) - block_align + 1, block_align):
        block = data[base : base + block_align]
        c1, c2, delta, s1, s2 = [], [], [], [], []
        for c in range(n_channels):
            pred = block[c]
            if pred >= len(_MS_COEFS):
                raise ValueError(f"MS-ADPCM predictor {pred} out of range")
            a, b = _MS_COEFS[pred]
            c1.append(a)
            c2.append(b)
        off = n_channels
        for c in range(n_channels):
            delta.append(struct.unpack_from("<h", block, off + 2 * c)[0])
        off += 2 * n_channels
        for c in range(n_channels):
            s1.append(struct.unpack_from("<h", block, off + 2 * c)[0])
        off += 2 * n_channels
        for c in range(n_channels):
            s2.append(struct.unpack_from("<h", block, off + 2 * c)[0])
        off += 2 * n_channels
        for c in range(n_channels):  # seeds: older (s2) then newer (s1)
            chans[c] += [s2[c], s1[c]]
        nib_i = 0
        for byte in block[off:]:
            for nib in (byte >> 4, byte & 0xF):
                c = nib_i % n_channels
                nib_i += 1
                signed = nib - 16 if nib & 8 else nib
                pred = (s1[c] * c1[c] + s2[c] * c2[c]) // 256 + signed * delta[c]
                pred = max(-32768, min(32767, pred))
                s2[c], s1[c] = s1[c], pred
                delta[c] = max(16, (_MS_ADAPT[nib] * delta[c]) // 256)
                chans[c].append(pred)
    n_frames = min(len(ch) for ch in chans)
    out = np.empty((n_frames, n_channels), dtype=np.int16)
    for c in range(n_channels):
        out[:, c] = chans[c][:n_frames]
    return out


def decode_wav(blob: bytes) -> tuple[int, int, np.ndarray]:
    """Decode RIFF/WAVE -> (sample_rate, n_channels, int16 array
    (n_frames, n_channels)).

    8-bit unsigned PCM recenters to int16 (``(x-128) << 8``); 24-bit
    keeps its top 16 bits; float32 clips to [-1, 1] and scales to int16 — both keep downstream RMS/peak
    features on one scale.  Non-PCM codecs raise ``NotImplementedError``;
    malformed files raise ``ValueError`` (struct errors normalized).
    """
    try:
        return _decode_wav(blob)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"malformed WAV: {exc}") from exc


def riff_chunks(blob: bytes):
    """Yield (chunk_type, body) for each RIFF sub-chunk after the 12-byte
    RIFF/WAVE header, honoring the word-alignment padding rule.  Shared
    by the sample decoder here and the header-only metadata lane in
    ``media._audio_metadata`` so the walk exists exactly once."""
    pos = 12
    while pos + 8 <= len(blob):
        ctype, length = struct.unpack_from("<4sI", blob, pos)
        yield ctype, blob[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned


def _decode_wav(blob: bytes) -> tuple[int, int, np.ndarray]:
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    fmt = fmt_body = None
    data = None
    for ctype, body in riff_chunks(blob):
        if ctype == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
            fmt_body = body
        elif ctype == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _byte_rate, _block_align, bits = fmt
    if audio_format == 0xFFFE:
        # WAVE_FORMAT_EXTENSIBLE (how multichannel and >16-bit PCM ship
        # in practice): the real format tag is the first two bytes of the
        # SubFormat GUID, whose remaining 14 bytes must be the fixed
        # KSDATAFORMAT media-subtype suffix
        if len(fmt_body) < 40:
            raise ValueError("extensible WAV fmt chunk truncated")
        guid = fmt_body[24:40]
        if guid[4:] != b"\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71":
            raise NotImplementedError(
                f"extensible WAV with non-PCM subformat GUID {guid.hex()}"
            )
        audio_format = struct.unpack_from("<H", guid, 0)[0]
    if audio_format == 1 and bits == 16:
        samples = np.frombuffer(data, dtype="<i2")
    elif audio_format == 1 and bits == 8:
        samples = ((np.frombuffer(data, dtype=np.uint8).astype(np.int16) - 128) << 8)
    elif audio_format == 1 and bits == 24:
        # 3-byte little-endian signed PCM (the studio-master depth):
        # reassemble into int32 then keep the top 16 bits — one scale for
        # every depth keeps downstream RMS/peak features comparable
        b = np.frombuffer(data[: len(data) - len(data) % 3], dtype=np.uint8)
        b = b.reshape(-1, 3).astype(np.int32)
        v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        samples = ((v - ((v & 0x800000) << 1)) >> 8).astype(np.int16)
    elif audio_format == 3 and bits == 32:
        f = np.clip(np.frombuffer(data, dtype="<f4"), -1.0, 1.0)
        samples = (f * 32767.0).astype(np.int16)
    elif audio_format == 0x11 and bits == 4:
        frames = _decode_ima_adpcm(data, n_channels, _block_align)
        return sample_rate, n_channels, frames
    elif audio_format == 0x02 and bits == 4:
        frames = _decode_ms_adpcm(data, n_channels, _block_align)
        return sample_rate, n_channels, frames
    else:
        raise NotImplementedError(
            f"WAV format {audio_format} / {bits}-bit is not supported "
            "(PCM 8/16/24-bit, float32, IMA and MS ADPCM only)"
        )
    if n_channels < 1:
        raise ValueError("WAV with zero channels")
    n_frames = len(samples) // n_channels
    return sample_rate, n_channels, samples[: n_frames * n_channels].reshape(
        n_frames, n_channels
    )


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode an int16 array (n,) or (n_frames, n_channels) as 16-bit PCM WAV."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n_frames, n_channels = samples.shape
    body = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    block_align = n_channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, sample_rate * block_align, block_align, 16
    )
    payload = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + body
    )
    return b"RIFF" + struct.pack("<I", len(payload)) + payload


def decode_bmp(blob: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode a Windows BMP -> (width, height, channels, uint8 (h, w, c)) —
    the same contract as ``decode_png``.

    Scope: BITMAPINFOHEADER (or larger) DIBs, uncompressed (BI_RGB) 24/32
    bpp and 8-bpp palette, bottom-up or top-down row order, 4-byte row
    padding.  RLE and bitfield compression raise ``NotImplementedError``
    (loud gate); malformed input raises ``ValueError``.
    """
    try:
        return _decode_bmp(blob)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"malformed BMP: {exc}") from exc


def _decode_bmp(blob: bytes) -> tuple[int, int, int, np.ndarray]:
    if blob[:2] != b"BM":
        raise ValueError("not a BMP: bad magic")
    if len(blob) < 54:
        raise ValueError("not a BMP: truncated header")
    (data_off,) = struct.unpack_from("<I", blob, 10)
    (hdr_size,) = struct.unpack_from("<I", blob, 14)
    if hdr_size < 40:
        raise NotImplementedError(f"BMP core-header size {hdr_size} not supported")
    width, height, _planes, bpp, comp = struct.unpack_from("<iihHI", blob, 18)
    if comp != 0:
        raise NotImplementedError(f"BMP compression {comp} not supported (BI_RGB only)")
    if bpp not in (8, 24, 32):
        raise NotImplementedError(f"BMP bit depth {bpp} not supported")
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height <= 0 or width * height > 1 << 26:
        raise ValueError(f"implausible BMP dimensions {width}x{height}")
    row_bytes = (width * bpp // 8 + 3) & ~3
    need = data_off + row_bytes * height
    if need > len(blob):
        raise ValueError(f"truncated BMP pixel data: {len(blob)} < {need}")
    rows = np.frombuffer(
        blob, dtype=np.uint8, count=row_bytes * height, offset=data_off
    ).reshape(height, row_bytes)
    if not top_down:
        rows = rows[::-1]
    if bpp == 8:
        # palette sits between the info header and the pixel data
        pal_off = 14 + hdr_size
        n_colors = struct.unpack_from("<I", blob, 46)[0] or 256
        pal = np.frombuffer(
            blob, dtype=np.uint8, count=4 * n_colors, offset=pal_off
        ).reshape(-1, 4)[:, :3][:, ::-1]  # BGRX -> RGB
        idx = rows[:, :width]
        return width, height, 3, np.ascontiguousarray(pal[idx])
    c = bpp // 8
    px = rows[:, : width * c].reshape(height, width, c)
    if c == 3:
        px = px[:, :, ::-1]  # BGR -> RGB
    else:
        px = px[:, :, [2, 1, 0, 3]]  # BGRA -> RGBA
    return width, height, c, np.ascontiguousarray(px)


def encode_bmp(px: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit bottom-up BMP."""
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("encode_bmp expects an (h, w, 3) RGB array")
    h, w, _ = px.shape
    row_bytes = (w * 3 + 3) & ~3
    pad = row_bytes - w * 3
    bgr = np.ascontiguousarray(px[::-1, :, ::-1], dtype=np.uint8)  # bottom-up BGR
    if pad:
        bgr = np.concatenate(
            [bgr.reshape(h, w * 3), np.zeros((h, pad), dtype=np.uint8)], axis=1
        )
    body = bgr.tobytes()
    info = struct.pack("<IiihHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    return header + info + body
