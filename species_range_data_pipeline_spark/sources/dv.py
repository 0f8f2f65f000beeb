"""Delta Lake deletion-vector decode: Z85 text codec + the 64-bit
RoaringBitmapArray "portable" serialization + the on-disk DV file
wrapper — all pure Python/numpy, no Delta or RoaringBitmap runtime.

Everything here follows the PUBLIC Delta protocol spec (PROTOCOL.md,
"Deletion Vectors" + "Deletion Vector Format") and the RoaringBitmap
interoperable format spec (RoaringFormatSpec):

- A deletion vector marks ROW POSITIONS of a single data file as
  deleted.  The add/remove actions carry a descriptor
  ``{storageType, pathOrInlineDv, offset, sizeInBytes, cardinality}``.
- storageType ``'u'``: the DV lives in a file under the table root
  named ``deletion_vector_<uuid>.bin`` (uuid = last 20 chars of
  pathOrInlineDv, Z85-decoded to 16 bytes; any leading chars are a
  random directory prefix).  ``'p'``: absolute file path.  ``'i'``:
  the DV bytes themselves, Z85-encoded inline.
- DV FILE layout: 1 format-version byte (=1), then per stored DV:
  4-byte big-endian length, the serialized bitmap, 4-byte big-endian
  CRC-32 of the bitmap bytes.  The descriptor's ``offset`` points at
  the length field.
- Serialized bitmap = RoaringBitmapArray "portable" format: 4-byte
  little-endian magic 1681511377, 8-byte little-endian number of
  32-bit bitmaps, then each 32-bit bitmap in the standard
  RoaringFormatSpec serialization (array / bitmap / run containers;
  the array INDEX is the high-32 key of the 64-bit position).

The decoder is load-bearing (wrong decode = wrong rows), so it is
fuzz-gauntleted like the other in-tree codecs (tests/test_dv.py):
hypothesis round-trips against the encode twin below plus loud-error
checks on truncated/corrupt inputs.  The encode twin exists for tests
and emits the no-run-container cookie with array/bitmap containers
(always spec-valid, never required for reading real tables).
"""

from __future__ import annotations

import os
import struct
import uuid as _uuid
import zlib

import numpy as np

Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(Z85_ALPHABET)}

_MAGIC = 1681511377
_SERIAL_COOKIE = 12347
_SERIAL_COOKIE_NO_RUN = 12346
_MAX_ARRAY_CARD = 4096


def z85_decode(text: str) -> bytes:
    """Z85 (ZeroMQ base-85) decode: 5 chars -> 4 bytes, big-endian."""
    if len(text) % 5:
        raise ValueError(
            f"Z85 input length {len(text)} is not a multiple of 5"
        )
    out = bytearray()
    for i in range(0, len(text), 5):
        acc = 0
        for ch in text[i : i + 5]:
            try:
                acc = acc * 85 + _Z85_INDEX[ch]
            except KeyError:
                raise ValueError(f"invalid Z85 character {ch!r}") from None
        if acc > 0xFFFFFFFF:
            raise ValueError(f"Z85 group {text[i:i + 5]!r} overflows 32 bits")
        out += struct.pack(">I", acc)
    return bytes(out)


def z85_encode(data: bytes) -> str:
    """Z85 encode; input length must be a multiple of 4 (the caller
    zero-pads and records the true length, per Delta's Base85Codec)."""
    if len(data) % 4:
        raise ValueError(f"Z85 input length {len(data)} not a multiple of 4")
    out = []
    for i in range(0, len(data), 4):
        acc = struct.unpack(">I", data[i : i + 4])[0]
        grp = []
        for _ in range(5):
            acc, rem = divmod(acc, 85)
            grp.append(Z85_ALPHABET[rem])
        out.append("".join(reversed(grp)))
    return "".join(out)


def _decode_rbm32(buf: bytes, off: int) -> tuple[np.ndarray, int]:
    """One standard 32-bit RoaringBitmap at ``off`` -> (sorted uint32
    values, next offset)."""
    if off + 4 > len(buf):
        raise ValueError("roaring bitmap truncated before cookie")
    cookie = struct.unpack_from("<I", buf, off)[0]
    if (cookie & 0xFFFF) == _SERIAL_COOKIE:
        n = (cookie >> 16) + 1
        off += 4
        nrun_bytes = (n + 7) // 8
        runflags = buf[off : off + nrun_bytes]
        off += nrun_bytes
        has_offsets = n >= 4
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        if off + 8 > len(buf):
            raise ValueError("roaring bitmap truncated before size field")
        n = struct.unpack_from("<I", buf, off + 4)[0]
        off += 8
        runflags = b"\x00" * ((n + 7) // 8)
        has_offsets = True
    else:
        raise ValueError(f"bad roaring cookie {cookie} at offset {off - 4}")
    if off + 4 * n > len(buf):
        raise ValueError("roaring bitmap truncated in descriptive header")
    keys = np.frombuffer(buf, dtype="<u2", count=2 * n, offset=off)
    off += 4 * n
    if has_offsets:
        off += 4 * n  # offsets are redundant for a sequential parse
    parts = []
    for i in range(n):
        key = int(keys[2 * i])
        card = int(keys[2 * i + 1]) + 1
        base = np.uint32(key) << np.uint32(16)
        if (runflags[i // 8] >> (i % 8)) & 1:
            if off + 2 > len(buf):
                raise ValueError("run container truncated")
            nruns = struct.unpack_from("<H", buf, off)[0]
            off += 2
            if off + 4 * nruns > len(buf):
                raise ValueError("run container truncated")
            runs = np.frombuffer(buf, dtype="<u2", count=2 * nruns, offset=off)
            off += 4 * nruns
            vals = (
                np.concatenate(
                    [
                        np.arange(
                            int(runs[2 * r]),
                            int(runs[2 * r]) + int(runs[2 * r + 1]) + 1,
                            dtype=np.uint32,
                        )
                        for r in range(nruns)
                    ]
                )
                if nruns
                else np.empty(0, np.uint32)
            )
        elif card > _MAX_ARRAY_CARD:
            if off + 8192 > len(buf):
                raise ValueError("bitmap container truncated")
            words = np.frombuffer(buf, dtype=np.uint8, count=8192, offset=off)
            off += 8192
            bits = np.unpackbits(words, bitorder="little")
            vals = np.nonzero(bits)[0].astype(np.uint32)
            if len(vals) != card:
                raise ValueError(
                    f"bitmap container cardinality mismatch: header {card},"
                    f" decoded {len(vals)}"
                )
        else:
            if off + 2 * card > len(buf):
                raise ValueError("array container truncated")
            vals = np.frombuffer(
                buf, dtype="<u2", count=card, offset=off
            ).astype(np.uint32)
            off += 2 * card
        parts.append(vals + base)
    vals32 = np.concatenate(parts) if parts else np.empty(0, np.uint32)
    return vals32, off


def decode_rbm_array(data: bytes) -> np.ndarray:
    """Serialized 64-bit RoaringBitmapArray -> sorted uint64 positions."""
    if len(data) < 12:
        raise ValueError(f"RoaringBitmapArray too short ({len(data)} bytes)")
    magic, nbm = struct.unpack_from("<iq", data, 0)
    if magic != _MAGIC:
        raise ValueError(f"bad RoaringBitmapArray magic {magic}")
    if nbm < 0:
        raise ValueError(f"negative bitmap count {nbm}")
    off = 12
    parts = []
    for high in range(nbm):
        vals32, off = _decode_rbm32(data, off)
        parts.append(vals32.astype(np.uint64) + (np.uint64(high) << np.uint64(32)))
    if off != len(data):
        raise ValueError(
            f"{len(data) - off} trailing bytes after RoaringBitmapArray"
        )
    return (
        np.concatenate(parts) if parts else np.empty(0, np.uint64)
    )


def encode_rbm_array(positions) -> bytes:
    """Test twin: sorted distinct positions -> the portable
    serialization (no-run cookie; array/bitmap containers)."""
    pos = np.array(sorted({int(p) for p in positions}), dtype=np.uint64)
    if len(pos) and int(pos[-1]) >> 32 >= 2**31:
        raise ValueError("position exceeds the format's 63-bit range")
    nbm = 0 if not len(pos) else (int(pos[-1]) >> 32) + 1
    out = [struct.pack("<iq", _MAGIC, nbm)]
    for high in range(nbm):
        low = (pos[(pos >> np.uint64(32)) == high] & np.uint64(0xFFFFFFFF)).astype(
            np.uint32
        )
        keys = sorted({int(v) >> 16 for v in low})
        conts = []
        for key in keys:
            sub = low[(low >> np.uint32(16)) == key] & np.uint32(0xFFFF)
            conts.append((key, sub.astype("<u2")))
        n = len(conts)
        out.append(struct.pack("<II", _SERIAL_COOKIE_NO_RUN, n))
        for key, sub in conts:
            out.append(struct.pack("<HH", key, len(sub) - 1))
        # offset header (required with the no-run cookie)
        pos_off = 8 + 4 * n + 4 * n
        for _key, sub in conts:
            out.append(struct.pack("<I", pos_off))
            pos_off += 8192 if len(sub) > _MAX_ARRAY_CARD else 2 * len(sub)
        for _key, sub in conts:
            if len(sub) > _MAX_ARRAY_CARD:
                words = np.zeros(8192, dtype=np.uint8)
                idx = sub.astype(np.uint32)
                # ufunc.at, not a vectorized |=: several values share one
                # byte and fancy-indexed |= keeps only the last write
                np.bitwise_or.at(
                    words,
                    (idx >> np.uint32(3)).astype(np.int64),
                    (np.uint8(1) << (idx & np.uint32(7)).astype(np.uint8)),
                )
                out.append(words.tobytes())
            else:
                out.append(sub.tobytes())
    return b"".join(out)


def write_dv_file(path: str, bitmaps: list[bytes]) -> list[tuple[int, int]]:
    """Test twin: write a spec-shaped DV FILE (format-version byte +
    per-DV [len BE][data][crc32 BE]) and return each DV's
    (offset, sizeInBytes) for descriptor construction."""
    spans = []
    with open(path, "wb") as fh:
        fh.write(b"\x01")
        off = 1
        for bm in bitmaps:
            fh.write(struct.pack(">i", len(bm)))
            fh.write(bm)
            fh.write(struct.pack(">I", zlib.crc32(bm) & 0xFFFFFFFF))
            spans.append((off, len(bm)))
            off += 4 + len(bm) + 4
    return spans


def make_uuid_descriptor(
    table_path: str, positions, prefix: str = ""
) -> dict:
    """Test twin: store ``positions`` as a storageType='u' DV file under
    ``table_path`` and return the add-action descriptor dict."""
    bm = encode_rbm_array(positions)
    u = _uuid.uuid4()
    name = f"deletion_vector_{u}.bin"
    target_dir = os.path.join(table_path, prefix) if prefix else table_path
    os.makedirs(target_dir, exist_ok=True)
    ((off, size),) = write_dv_file(os.path.join(target_dir, name), [bm])
    return {
        "storageType": "u",
        "pathOrInlineDv": prefix + z85_encode(u.bytes),
        "offset": off,
        "sizeInBytes": size,
        "cardinality": len(set(int(p) for p in positions)),
    }


def make_inline_descriptor(positions) -> dict:
    """Test twin: inline (storageType='i') descriptor."""
    bm = encode_rbm_array(positions)
    padded = bm + b"\x00" * (-len(bm) % 4)
    return {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(padded),
        "sizeInBytes": len(bm),
        "cardinality": len(set(int(p) for p in positions)),
    }


def load_dv_bytes(table_path: str, dv: dict) -> bytes:
    """Descriptor -> the serialized RoaringBitmapArray bytes, CRC- and
    size-checked for the on-file storage types."""
    st = dv.get("storageType")
    size = dv.get("sizeInBytes")
    if st == "i":
        padded = z85_decode(dv["pathOrInlineDv"])
        if size is None or size > len(padded):
            raise ValueError(
                f"inline DV sizeInBytes {size} exceeds decoded payload"
                f" ({len(padded)} bytes)"
            )
        return padded[:size]
    if st == "u":
        enc = dv["pathOrInlineDv"]
        if len(enc) < 20:
            raise ValueError(f"storageType=u pathOrInlineDv too short: {enc!r}")
        prefix, tail = enc[:-20], enc[-20:]
        u = _uuid.UUID(bytes=z85_decode(tail))
        fpath = os.path.join(table_path, prefix, f"deletion_vector_{u}.bin")
    elif st == "p":
        fpath = dv["pathOrInlineDv"]
        if "://" in fpath:
            raise NotImplementedError(
                f"non-local DV path {fpath!r}; only filesystem paths are"
                " readable here."
            )
    else:
        raise NotImplementedError(
            f"deletion-vector storageType {st!r} is not in the spec"
            " (expected 'u', 'i', or 'p')."
        )
    with open(fpath, "rb") as fh:
        blob = fh.read()
    if not blob or blob[0] != 1:
        raise ValueError(
            f"DV file {fpath!r} has format version"
            f" {blob[0] if blob else '<empty>'}; only version 1 exists."
        )
    off = dv.get("offset", 1)
    if off + 4 > len(blob):
        raise ValueError(f"DV offset {off} out of range in {fpath!r}")
    (stored,) = struct.unpack_from(">i", blob, off)
    if size is not None and stored != size:
        raise ValueError(
            f"DV length field {stored} != descriptor sizeInBytes {size}"
            f" in {fpath!r}"
        )
    start = off + 4
    end = start + stored
    if end + 4 > len(blob):
        raise ValueError(f"DV data truncated in {fpath!r}")
    data = blob[start:end]
    (crc,) = struct.unpack_from(">I", blob, end)
    if zlib.crc32(data) & 0xFFFFFFFF != crc:
        raise ValueError(f"DV checksum mismatch in {fpath!r}")
    return data


def dv_positions(table_path: str, dv: dict) -> np.ndarray:
    """Descriptor -> sorted uint64 deleted row positions, with the
    descriptor's cardinality cross-checked (a mismatch means a corrupt
    DV — wrong rows — so it raises)."""
    pos = decode_rbm_array(load_dv_bytes(table_path, dv))
    card = dv.get("cardinality")
    if card is not None and card != len(pos):
        raise ValueError(
            f"DV cardinality mismatch: descriptor says {card}, bitmap"
            f" holds {len(pos)}"
        )
    return pos
