"""MP3 (MPEG-1/2/2.5 audio) FRAME-HEADER metadata, stdlib-only.

Full Layer-III sample decode needs a polyphase filterbank + Huffman
stack this container can't justify, and ``media._decode_audio`` keeps
its loud gate for it.  But corpus curation rarely needs samples from
every file — it needs DURATION, sample rate, channel count, and bitrate
to filter/bucket/price an audio crawl, and all of that lives in the
32-bit frame headers (ISO 11172-3 / 13818-3) plus the Xing/Info VBR tag.
This module parses exactly that: ID3v2 skip, frame-sync walk, per-frame
header fields, Xing/VBRI frame counts, CBR/VBR duration.

Hostile-input contract matches the other codecs: ``ValueError`` on
anything malformed, never a hang (every accepted frame advances the
cursor by a positive computed length; frame count is capped).
"""

from __future__ import annotations

import struct

__all__ = ["parse_mp3_metadata", "encode_mp3_frames"]

#: bitrate tables in kbps, indexed [version_group][layer][bitrate_index];
#: index 0 ("free") and 15 are invalid for this parser's purposes
_BITRATES = {
    # MPEG-1
    (1, 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (1, 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (1, 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    # MPEG-2 / 2.5
    (2, 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    (2, 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (2, 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}

#: sample rates by version id (bits 19-20): 0=MPEG2.5, 2=MPEG2, 3=MPEG1
_RATES = {
    3: [44100, 48000, 32000],
    2: [22050, 24000, 16000],
    0: [11025, 12000, 8000],
}

_MAX_FRAMES = 1 << 20  # ~6 h of 22 ms frames; a hostile stream stops here


def _id3v2_size(blob: bytes) -> int:
    """Bytes to skip for a leading ID3v2 tag (syncsafe 28-bit size)."""
    if blob[:3] != b"ID3" or len(blob) < 10:
        return 0
    b = blob[6:10]
    if any(x & 0x80 for x in b):
        raise ValueError("ID3v2 size bytes must be syncsafe")
    return 10 + ((b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3])


def _parse_frame_header(blob: bytes, pos: int):
    """(frame_len, version_id, layer, bitrate_kbps, rate, channels,
    samples_per_frame) or None when ``pos`` holds no valid frame sync."""
    if pos + 4 > len(blob):
        return None
    h = struct.unpack_from(">I", blob, pos)[0]
    if (h >> 21) & 0x7FF != 0x7FF:
        return None
    version_id = (h >> 19) & 3  # 0=2.5, 1=reserved, 2=MPEG2, 3=MPEG1
    layer_id = (h >> 17) & 3  # 1=III, 2=II, 3=I
    bitrate_idx = (h >> 12) & 0xF
    rate_idx = (h >> 10) & 3
    padding = (h >> 9) & 1
    channel_mode = (h >> 6) & 3
    if version_id == 1 or layer_id == 0 or bitrate_idx in (0, 15) or rate_idx == 3:
        return None
    layer = 4 - layer_id  # 1, 2, 3
    vgroup = 1 if version_id == 3 else 2
    bitrate = _BITRATES[(vgroup, layer)][bitrate_idx] * 1000
    rate = _RATES[version_id][rate_idx]
    if layer == 1:
        spf = 384
        frame_len = (12 * bitrate // rate + padding) * 4
    elif layer == 2:
        spf = 1152
        frame_len = 144 * bitrate // rate + padding
    else:  # Layer III: 1152 samples for MPEG-1, 576 for MPEG-2/2.5
        spf = 1152 if version_id == 3 else 576
        frame_len = (144 if version_id == 3 else 72) * bitrate // rate + padding
    if frame_len < 4:
        return None
    channels = 1 if channel_mode == 3 else 2
    return frame_len, version_id, layer, bitrate // 1000, rate, channels, spf


def _xing_frames(blob: bytes, pos: int, version_id: int, channels: int):
    """Frame count from a Xing/Info (or VBRI) tag in the first frame, or
    None.  Xing sits after the Layer-III side info; VBRI at a fixed +36."""
    side = 32 if channels == 2 else 17
    if version_id != 3:
        side = 17 if channels == 2 else 9
    off = pos + 4 + side
    if blob[off : off + 4] in (b"Xing", b"Info"):
        flags = struct.unpack_from(">I", blob, off + 4)[0]
        if flags & 1:  # FRAMES field present
            return struct.unpack_from(">I", blob, off + 8)[0], blob[
                off : off + 4
            ] == b"Xing"
        return None
    if blob[pos + 4 + 32 : pos + 4 + 36] == b"VBRI":
        return struct.unpack_from(">I", blob, pos + 4 + 32 + 14)[0], True
    return None


def parse_mp3_metadata(blob: bytes) -> dict:
    """MP3 bytes -> {container, mpeg_version, layer, sample_rate,
    channels, n_frames, duration_s, bitrate_kbps, vbr}.

    Duration comes from the Xing/Info/VBRI frame count when present
    (the only correct answer for VBR); otherwise from walking every
    COMPLETE frame header (exact for CBR, exact-by-enumeration for
    unheadered VBR; a final frame truncated mid-body does not count).
    ``bitrate_kbps`` is the stream average.
    """
    try:
        return _parse_mp3_metadata(blob)
    except (struct.error, IndexError) as exc:
        # truncation inside a Xing/VBRI tag or frame header: the
        # hostile-input contract is ValueError, same as every codec
        raise ValueError(f"malformed MP3: {exc}") from exc


def _parse_mp3_metadata(blob: bytes) -> dict:
    skip = _id3v2_size(blob)
    pos = skip
    # resync: tolerate junk between the tag and the first frame, bounded
    limit = min(len(blob), pos + 65536)
    first = None
    while pos + 4 <= limit:
        first = _parse_frame_header(blob, pos)
        if first is not None:
            break
        pos += 1
    if first is None:
        raise ValueError("no MPEG audio frame sync found")
    _, version_id, layer, _, rate, channels, spf = first
    tag = _xing_frames(blob, pos, version_id, channels) if layer == 3 else None
    if tag is not None:
        n_frames, vbr = tag
        end = len(blob)
        # trailing ID3v1 (fixed 128B "TAG") / APE footer aren't audio —
        # counting them would inflate the VBR-tag-path average bitrate
        if end - pos >= 128 and blob[end - 128 : end - 125] == b"TAG":
            end -= 128
        if end - pos >= 32 and blob[end - 32 : end - 24] == b"APETAGEX":
            ape_size = struct.unpack_from("<I", blob, end - 20)[0]
            # APEv2: the size field EXCLUDES the 32-byte header; when the
            # footer flags' header-present bit (bit 31) is set, those 32
            # bytes are tag, not audio
            ape_flags = struct.unpack_from("<I", blob, end - 12)[0]
            if ape_flags & 0x80000000:
                ape_size += 32
            if 32 <= ape_size <= end - pos:
                end -= ape_size
        audio_bytes = end - pos
    else:
        n_frames = 0
        bitrates = set()
        audio_start = pos
        while pos + 4 <= len(blob) and n_frames < _MAX_FRAMES:
            fr = _parse_frame_header(blob, pos)
            if fr is None or pos + fr[0] > len(blob):
                break  # trailing tag (ID3v1/APE) or truncated final frame
            n_frames += 1
            bitrates.add(fr[3])
            pos += fr[0]
        if n_frames == 0:
            raise ValueError("no complete MPEG audio frame")
        vbr = len(bitrates) > 1
        audio_bytes = pos - audio_start
    duration = n_frames * spf / rate
    avg_kbps = (
        round(audio_bytes * 8 / duration / 1000, 1) if duration > 0 else 0.0
    )
    return {
        "container": "mp3",
        "mpeg_version": {3: 1, 2: 2, 0: 2.5}[version_id],
        "layer": layer,
        "sample_rate": rate,
        "channels": channels,
        "n_frames": int(n_frames),
        "duration_s": round(duration, 3),
        "bitrate_kbps": avg_kbps,
        "vbr": bool(vbr),
    }


def encode_mp3_frames(
    n_frames: int,
    bitrate_kbps: int = 128,
    sample_rate: int = 44100,
    channels: int = 2,
    id3: bytes | None = None,
    xing_frames: int | None = None,
) -> bytes:
    """Structurally valid MPEG-1 Layer III CBR frames with zeroed audio
    payloads — silence to a real decoder, fully parseable headers to
    this module.  The test-fixture twin of ``parse_mp3_metadata`` (we
    cannot synthesize real compressed audio, and header parsing never
    looks at the payload).  ``xing_frames`` writes a Xing tag into the
    first frame claiming that count."""
    idx = _BITRATES[(1, 3)].index(bitrate_kbps)
    ridx = _RATES[3].index(sample_rate)
    mode = 3 if channels == 1 else 0
    h = (
        (0x7FF << 21) | (3 << 19) | (1 << 17) | (idx << 12)
        | (ridx << 10) | (mode << 6)
    )
    frame_len = 144 * bitrate_kbps * 1000 // sample_rate
    frame = bytearray(struct.pack(">I", h)) + b"\x00" * (frame_len - 4)
    out = bytearray()
    if id3 is not None:
        size = len(id3)
        ss = bytes(
            [(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F, size & 0x7F]
        )
        out += b"ID3\x04\x00\x00" + ss + id3
    first = bytearray(frame)
    if xing_frames is not None:
        side = 32 if channels == 2 else 17
        off = 4 + side
        first[off : off + 4] = b"Xing"
        struct.pack_into(">II", first, off + 4, 1, xing_frames)
    out += first
    for _ in range(n_frames - 1):
        out += frame
    return bytes(out)
