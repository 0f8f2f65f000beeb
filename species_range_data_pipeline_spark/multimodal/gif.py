"""GIF decoder/encoder (87a/89a, first frame), stdlib-only.

GIF is still everywhere in web crawls, so the image lane sniffing a WARC
corpus will hold them; this closes the gap in the same style as the
other codecs (``codecs.py`` PNG/BMP/WAV, ``jpeg.py``, ``mp4.py``):
struct-level implementation, loud gates for the unsupported corners.

Implemented: logical screen + global/local color tables, extension-block
skipping (GCE transparency index is honored by substituting the
transparent entry — downstream features want pixels, not alpha), the
variable-width LZW stream (LSB-first bit packing, clear/EOI codes,
12-bit cap), and a real LZW ENCODER for the round-trip tests.
Interlaced frames (the GIF 89a four-pass row order) deinterlace on
decode; ``encode_gif(interlace=True)`` writes them for round-trips.
Only the FIRST image block decodes — animation frame sampling is the
video lane's job (``mp4.py``), not a still-image codec's.

Decode returns (w, h, 3, uint8 HxWx3 RGB) — the `_decode_payload` seam
contract in ``media.py``.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_SIGNATURES = (b"GIF87a", b"GIF89a")


def _read_color_table(blob: bytes, off: int, n: int) -> tuple[np.ndarray, int]:
    end = off + 3 * n
    if end > len(blob):
        raise ValueError("color table runs past end of file")
    return (
        np.frombuffer(blob, dtype=np.uint8, offset=off, count=3 * n).reshape(
            n, 3
        ),
        end,
    )


def _sub_blocks(blob: bytes, off: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks starting at ``off``; returns (data,
    offset after the block terminator)."""
    parts = []
    while True:
        if off >= len(blob):
            raise ValueError("unterminated sub-block chain")
        n = blob[off]
        off += 1
        if n == 0:
            return b"".join(parts), off
        if off + n > len(blob):
            raise ValueError("sub-block runs past end of file")
        parts.append(blob[off : off + n])
        off += n


def _lzw_decode(data: bytes, min_code_size: int, max_pixels: int) -> bytearray:
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"bad LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # bit reader: LSB-first across the byte stream
    bitpos = 0
    total_bits = 8 * len(data)

    def read_code(width: int) -> int | None:
        nonlocal bitpos
        if bitpos + width > total_bits:
            return None
        v = 0
        for i in range(width):
            byte = data[(bitpos + i) >> 3]
            if (byte >> ((bitpos + i) & 7)) & 1:
                v |= 1 << i
        bitpos += width
        return v

    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code_size + 1
    prev: bytes | None = None
    while True:
        code = read_code(width)
        if code is None:
            break  # truncated stream: emit what we have (browsers do too)
        if code == clear:
            table = table[: clear + 2]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table) and (code < clear or table[code]):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"LZW code {code} out of range")
        out += entry
        if len(out) > max_pixels:
            raise ValueError("LZW output exceeds the frame's pixel count")
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    return out


def _interlace_rows(h: int) -> np.ndarray:
    """GIF 89a four-pass interlace: the row indices in transmission order
    (pass 1: every 8th from 0; pass 2: every 8th from 4; pass 3: every
    4th from 2; pass 4: every 2nd from 1)."""
    return np.concatenate([
        np.arange(0, h, 8), np.arange(4, h, 8),
        np.arange(2, h, 4), np.arange(1, h, 2),
    ])


def decode_gif(blob: bytes) -> tuple[int, int, int, np.ndarray]:
    """First frame of a GIF -> (w, h, 3, uint8 HxWx3 RGB)."""
    if blob[:6] not in GIF_SIGNATURES:
        raise ValueError(f"not a GIF: signature {blob[:6]!r}")
    if len(blob) < 13:
        raise ValueError("GIF header truncated")
    sw, sh, packed, _bg, _aspect = struct.unpack_from("<HHBBB", blob, 6)
    off = 13
    gct = None
    if packed & 0x80:
        gct, off = _read_color_table(blob, off, 2 << (packed & 0x07))
    transparent: int | None = None
    while off < len(blob):
        marker = blob[off]
        if marker == 0x3B:  # trailer
            break
        if marker == 0x21:  # extension
            if off + 2 > len(blob):
                raise ValueError("extension header truncated")
            label = blob[off + 1]
            data, off = _sub_blocks(blob, off + 2)
            if label == 0xF9 and len(data) >= 4 and data[0] & 1:
                transparent = data[3]  # GCE transparent color index
            continue
        if marker == 0x2C:  # image descriptor
            if off + 10 > len(blob):
                raise ValueError("image descriptor truncated")
            _l, _t, w, h, ipacked = struct.unpack_from("<HHHHB", blob, off + 1)
            off += 10
            interlaced = bool(ipacked & 0x40)
            table = gct
            if ipacked & 0x80:
                table, off = _read_color_table(blob, off, 2 << (ipacked & 0x07))
            if table is None:
                raise ValueError("image has no color table")
            # the LZW bit reader is one Python iteration PER BIT: the cap
            # must reflect this decoder's cost, not the format's limit —
            # 4 MP (~1-2 s) keeps one crafted GIF from pinning a task for
            # hours (the numpy-backed BMP lane can afford 1<<26; this
            # cannot)
            if w == 0 or h == 0 or w * h > 4_000_000:
                raise ValueError(f"frame size {w}x{h} beyond the decode cap")
            if off >= len(blob):
                raise ValueError("missing LZW minimum code size")
            min_code = blob[off]
            data, off = _sub_blocks(blob, off + 1)
            idx = _lzw_decode(data, min_code, w * h)
            if len(idx) < w * h:
                idx = idx + bytearray(w * h - len(idx))  # pad truncated
            indices = np.frombuffer(bytes(idx[: w * h]), dtype=np.uint8)
            if int(indices.max(initial=0)) >= len(table):
                raise ValueError("pixel index outside the color table")
            if interlaced:
                # four-pass row order: rows arrive 0,8,16.. / 4,12.. /
                # 2,6.. / 1,3,5.. — scatter them back onto the canvas
                rows = indices.reshape(h, w)
                deint = np.empty_like(rows)
                deint[_interlace_rows(h)] = rows
                indices = deint.ravel()
            px = table[indices].reshape(h, w, 3).copy()
            if transparent is not None and transparent < len(table):
                # substitute the transparent entry with white (features
                # want pixels; alpha is out of scope for a still frame)
                px[indices.reshape(h, w) == transparent] = 255
            return int(w), int(h), 3, px
        raise ValueError(f"unknown block marker 0x{marker:02x} at byte {off}")
    raise ValueError("GIF holds no image block")


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    codes: list[tuple[int, int]] = [(clear, min_code_size + 1)]
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    run = b""
    for b in indices.tobytes():
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        codes.append((table[run], width))
        if next_code < 4096:
            table[cand] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            codes.append((clear, width))
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        run = bytes([b])
    if run:
        codes.append((table[run], width))
    codes.append((eoi, width))
    out = bytearray()
    acc = n = 0
    for code, w in codes:
        acc |= code << n
        n += w
        while n >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n -= 8
    if n:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(gray: np.ndarray, interlace: bool = False) -> bytes:
    """Single-frame GIF from a 2-D uint8 array via a 256-entry grayscale
    global palette — the test-fixture twin of ``decode_gif``.
    ``interlace=True`` transmits rows in the four-pass 89a order with the
    descriptor flag set."""
    if gray.ndim != 2 or gray.dtype != np.uint8:
        raise ValueError("encode_gif wants a 2-D uint8 array")
    h, w = gray.shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x07, 0, 0)  # 256-entry GCT
    for i in range(256):
        out += bytes([i, i, i])
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0)
    out.append(8)  # LZW minimum code size
    pixels = gray[_interlace_rows(h)] if interlace else gray
    data = _lzw_encode(pixels.reshape(-1), 8)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)
