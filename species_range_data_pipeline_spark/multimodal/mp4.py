"""Minimal MP4 (ISO BMFF, ISO/IEC 14496-12) container codec, stdlib-only.

Video in a training corpus arrives as MP4 files; frame *sampling* — the
operator a data pipeline actually runs — is container-level work: walk the
box tree, read the sample tables (stsd/stts/stsc/stsz/stco), and slice
sample byte ranges out of ``mdat``.  None of that needs a video codec, so
it is implemented for real here.  Pixel decode of compressed bitstreams
(avc1/hev1/av01/...) stays a loud ``NotImplementedError`` gate — EXCEPT
motion-JPEG (sample entry ``jpeg``/``mjpa``), whose samples are plain
JPEG images that ``multimodal/jpeg.py`` decodes, making MJPEG-in-MP4
fully decodable end-to-end with zero external libraries.

The writer emits a minimal-but-well-formed file (ftyp | mdat | moov, one
track, one chunk) used for golden round-trip tests and as a real sink for
frame archives.

Scale note: files parse one-per-task via ``binaryFile`` + ``mapInPandas``
like every other binary lane; the sample table is tiny compared to
``mdat``, and slicing is zero-copy on the Arrow buffer.
"""

from __future__ import annotations

import struct

__all__ = ["iter_boxes", "find_box", "extract_video_samples", "encode_mp4"]

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"dinf"}

#: sample-entry fourccs whose samples are standalone JPEG images
MJPEG_FOURCCS = (b"jpeg", b"mjpa", b"mjpb")


def iter_boxes(blob: bytes, start: int = 0, end: int | None = None):
    """Yield (type, payload_start, box_end) for each box in [start, end).
    Handles 64-bit largesize and size==0 (extends to end)."""
    end = len(blob) if end is None else end
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", blob, pos)
        btype = blob[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            (size,) = struct.unpack_from(">Q", blob, pos + 8)
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError(f"malformed box {btype!r} at {pos}: size {size}")
        yield btype, pos + hdr, pos + size
        pos += size


def find_box(blob: bytes, path: list[bytes], start: int = 0, end: int | None = None):
    """Descend a box path (e.g. [b'moov', b'trak']) -> (payload_start,
    box_end) of the FIRST match, or None."""
    for btype, pstart, bend in iter_boxes(blob, start, end):
        if btype == path[0]:
            if len(path) == 1:
                return pstart, bend
            return find_box(blob, path[1:], pstart, bend)
    return None


def extract_video_samples(blob: bytes) -> dict:
    """First video track -> {codec, width, height, timescale,
    samples: [(offset, size, dts), ...]} with absolute file offsets.

    Raises ``ValueError`` on malformed files (truncations and corrupt
    tables normalized from the struct layer) or when no video track
    exists.  Compressed-codec *metadata* still extracts fine — only pixel
    decode is gated, by the caller."""
    try:
        return _extract_video_samples(blob)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"malformed MP4: {exc}") from exc


def _extract_video_samples(blob: bytes) -> dict:
    moov = find_box(blob, [b"moov"])
    if moov is None:
        raise ValueError("not an MP4: no moov box")
    for btype, tstart, tend in iter_boxes(blob, *moov):
        if btype != b"trak":
            continue
        mdia = find_box(blob, [b"mdia"], tstart, tend)
        if mdia is None:
            continue
        hdlr = find_box(blob, [b"hdlr"], *mdia)
        if hdlr is None or blob[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        mdhd = find_box(blob, [b"mdhd"], *mdia)
        if mdhd is None:
            raise ValueError("video trak missing mdhd")
        version = blob[mdhd[0]]
        if version == 1:
            (timescale,) = struct.unpack_from(">I", blob, mdhd[0] + 4 + 16)
        else:
            (timescale,) = struct.unpack_from(">I", blob, mdhd[0] + 4 + 8)
        stbl = find_box(blob, [b"minf", b"stbl"], *mdia)
        if stbl is None:
            raise ValueError("video trak missing stbl")
        return _parse_stbl(blob, stbl, timescale)
    raise ValueError("no video track in MP4")


def _parse_stbl(blob: bytes, stbl: tuple[int, int], timescale: int) -> dict:
    boxes = {btype: (s, e) for btype, s, e in iter_boxes(blob, *stbl)}
    for req in (b"stsd", b"stts", b"stsc", b"stsz"):
        if req not in boxes:
            raise ValueError(f"stbl missing {req.decode()}")
    if b"stco" not in boxes and b"co64" not in boxes:
        raise ValueError("stbl missing stco/co64")

    # stsd: first sample entry carries the codec fourcc and dimensions
    s, _ = boxes[b"stsd"]
    (n_entries,) = struct.unpack_from(">I", blob, s + 4)
    if n_entries < 1:
        raise ValueError("empty stsd")
    entry = s + 8  # version/flags + entry_count
    fourcc = blob[entry + 4 : entry + 8]
    width, height = struct.unpack_from(">HH", blob, entry + 32)

    # table counts are attacker-controlled integers: bound every loop by
    # the file size (a sample/run costs table bytes, so a count beyond
    # len(blob) is malformed, not merely large)
    limit = len(blob)

    # stsz -> sizes
    s, _ = boxes[b"stsz"]
    uniform, n_samples = struct.unpack_from(">II", blob, s + 4)
    if n_samples > limit:
        raise ValueError(f"stsz declares {n_samples} samples in a {limit}-byte file")
    if uniform:
        sizes = [uniform] * n_samples
    else:
        sizes = list(struct.unpack_from(f">{n_samples}I", blob, s + 12))

    # stts -> per-sample dts
    s, _ = boxes[b"stts"]
    (n_runs,) = struct.unpack_from(">I", blob, s + 4)
    if n_runs > limit:
        raise ValueError(f"stts declares {n_runs} runs in a {limit}-byte file")
    dts: list[int] = []
    t = 0
    off = s + 8
    for _ in range(n_runs):
        cnt, delta = struct.unpack_from(">II", blob, off)
        off += 8
        if cnt > limit or len(dts) + cnt > n_samples + limit:
            raise ValueError("stts run count exceeds plausible sample count")
        for _ in range(cnt):
            dts.append(t)
            t += delta

    # stco / co64 -> chunk offsets
    if b"stco" in boxes:
        s, _ = boxes[b"stco"]
        (n_chunks,) = struct.unpack_from(">I", blob, s + 4)
        if n_chunks > limit:
            raise ValueError(f"stco declares {n_chunks} chunks in a {limit}-byte file")
        chunk_offsets = list(struct.unpack_from(f">{n_chunks}I", blob, s + 8))
    else:
        s, _ = boxes[b"co64"]
        (n_chunks,) = struct.unpack_from(">I", blob, s + 4)
        if n_chunks > limit:
            raise ValueError(f"co64 declares {n_chunks} chunks in a {limit}-byte file")
        chunk_offsets = list(struct.unpack_from(f">{n_chunks}Q", blob, s + 8))

    # stsc runs -> samples per chunk
    s, _ = boxes[b"stsc"]
    (n_runs,) = struct.unpack_from(">I", blob, s + 4)
    runs = [
        struct.unpack_from(">III", blob, s + 8 + 12 * i)[:2] for i in range(n_runs)
    ]

    samples: list[tuple[int, int, int]] = []
    si = 0
    for ci, chunk_off in enumerate(chunk_offsets, start=1):
        per_chunk = 0
        for first, count in runs:
            if first <= ci:
                per_chunk = count
        pos = chunk_off
        for _ in range(per_chunk):
            if si >= n_samples:
                break
            samples.append((pos, sizes[si], dts[si] if si < len(dts) else 0))
            pos += sizes[si]
            si += 1
    if si != n_samples:
        raise ValueError(f"sample tables inconsistent: {si} placed, {n_samples} declared")
    return {
        "codec": fourcc,
        "width": int(width),
        "height": int(height),
        "timescale": timescale,
        "samples": samples,
    }


# ----------------------------------------------------------------- write


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + btype + payload


def _fullbox(btype: bytes, payload: bytes, version: int = 0, flags: int = 0) -> bytes:
    return _box(btype, struct.pack(">B", version) + flags.to_bytes(3, "big") + payload)


def encode_mp4(
    samples: list[bytes],
    width: int,
    height: int,
    fps: int = 10,
    codec: bytes = b"jpeg",
) -> bytes:
    """Frame payloads -> minimal single-track MP4 (ftyp | mdat | moov, one
    chunk).  With the default ``jpeg`` fourcc and JPEG-encoded samples the
    result is an MJPEG video this module's reader + ``jpeg.decode_jpeg``
    fully decode."""
    if not samples:
        raise ValueError("encode_mp4 needs at least one sample")
    timescale = fps * 100
    delta = 100
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mdat_payload = b"".join(samples)
    mdat = _box(b"mdat", mdat_payload)
    data_offset = len(ftyp) + 8  # first sample: right after mdat header
    duration = delta * len(samples)

    def matrix() -> bytes:
        return struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)

    mvhd = _fullbox(
        b"mvhd",
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">iHH", 0x00010000, 0x0100, 0)
        + b"\x00" * 8
        + matrix()
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    tkhd = _fullbox(
        b"tkhd",
        struct.pack(">IIIII", 0, 0, 1, 0, duration)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + matrix()
        + struct.pack(">II", width << 16, height << 16),
        flags=3,
    )
    mdhd = _fullbox(
        b"mdhd",
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = _fullbox(
        b"hdlr", struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"VideoHandler\x00"
    )
    entry = _box(
        codec,
        b"\x00" * 6
        + struct.pack(">H", 1)
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)
        + struct.pack(">IH", 0, 1)
        + b"\x00" * 32
        + struct.pack(">Hh", 24, -1),
    )
    stsd = _fullbox(b"stsd", struct.pack(">I", 1) + entry)
    stts = _fullbox(b"stts", struct.pack(">III", 1, len(samples), delta))
    stsc = _fullbox(b"stsc", struct.pack(">IIII", 1, 1, len(samples), 1))
    stsz = _fullbox(
        b"stsz",
        struct.pack(">II", 0, len(samples))
        + struct.pack(f">{len(samples)}I", *(len(sm) for sm in samples)),
    )
    stco = _fullbox(b"stco", struct.pack(">II", 1, data_offset))
    dref = _fullbox(b"dref", struct.pack(">I", 1) + _fullbox(b"url ", b"", flags=1))
    vmhd = _fullbox(b"vmhd", struct.pack(">HHHH", 0, 0, 0, 0), flags=1)
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + _box(b"dinf", dref) + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
