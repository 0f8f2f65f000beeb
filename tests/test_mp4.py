"""MP4 container lane (multimodal/mp4.py): box walking, sample-table
extraction (incl. multi-chunk stsc/stco and co64), writer round-trips,
MJPEG-in-MP4 full pixel decode, and the Spark frame-sampling operator."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from species_range_data_pipeline_spark.multimodal.jpeg import decode_jpeg, encode_jpeg
from species_range_data_pipeline_spark.multimodal.mp4 import (
    _box,
    _fullbox,
    encode_mp4,
    extract_video_samples,
    find_box,
    iter_boxes,
)


def _jpeg_frames(n: int = 5, w: int = 32, h: int = 24) -> list[bytes]:
    yy, xx = np.mgrid[0:h, 0:w]
    return [
        encode_jpeg(((yy * (i + 1) * 5 + xx * 3) % 200 + 20).astype(np.uint8), quality=95)
        for i in range(n)
    ]


def test_box_walk_and_find():
    blob = encode_mp4([b"x" * 10], width=4, height=4)
    top = [btype for btype, _, _ in iter_boxes(blob)]
    assert top == [b"ftyp", b"mdat", b"moov"]
    assert find_box(blob, [b"moov", b"trak", b"mdia", b"minf", b"stbl"]) is not None
    assert find_box(blob, [b"moov", b"nope"]) is None


def test_writer_reader_roundtrip_samples_and_timing():
    frames = [b"frame-%d" % i * (i + 1) for i in range(4)]
    blob = encode_mp4(frames, width=8, height=6, fps=25, codec=b"jpeg")
    info = extract_video_samples(blob)
    assert (info["width"], info["height"]) == (8, 6)
    assert info["timescale"] == 2500
    assert [blob[o : o + s] for o, s, _ in info["samples"]] == frames
    # dts: uniform deltas of timescale/fps
    assert [d for _, _, d in info["samples"]] == [0, 100, 200, 300]


def test_mjpeg_in_mp4_decodes_to_pixels():
    frames = _jpeg_frames()
    blob = encode_mp4(frames, width=32, height=24)
    info = extract_video_samples(blob)
    for i, (off, size, _) in enumerate(info["samples"]):
        w, h, c, px = decode_jpeg(blob[off : off + size])
        assert (w, h, c) == (32, 24, 1)
        assert px.shape == (24, 32, 1)


def test_multi_chunk_and_co64_layouts():
    """Hand-build stbl variants the single-chunk writer never emits:
    two chunks via stsc runs, and 64-bit co64 offsets."""
    samples = [b"AAAA", b"BBBBBB", b"CC"]
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isom")
    mdat = _box(b"mdat", b"".join(samples))
    c1 = len(ftyp) + 8  # chunk 1: samples 0, 1
    c2 = c1 + 10  # chunk 2: sample 2

    def build(use_co64: bool) -> bytes:
        entry = _box(
            b"jpeg",
            b"\x00" * 8 + b"\x00" * 16 + struct.pack(">HH", 16, 9) + b"\x00" * 50,
        )
        stsd = _fullbox(b"stsd", struct.pack(">I", 1) + entry)
        stts = _fullbox(b"stts", struct.pack(">III", 1, 3, 40))
        stsc = _fullbox(
            b"stsc", struct.pack(">I", 2) + struct.pack(">IIIIII", 1, 2, 1, 2, 1, 1)
        )
        stsz = _fullbox(b"stsz", struct.pack(">II", 0, 3) + struct.pack(">III", 4, 6, 2))
        if use_co64:
            chunk = _fullbox(b"co64", struct.pack(">IQQ", 2, c1, c2))
        else:
            chunk = _fullbox(b"stco", struct.pack(">III", 2, c1, c2))
        stbl = _box(b"stbl", stsd + stts + stsc + stsz + chunk)
        mdhd = _fullbox(
            b"mdhd", struct.pack(">IIII", 0, 0, 1000, 120) + struct.pack(">HH", 0x55C4, 0)
        )
        hdlr = _fullbox(b"hdlr", struct.pack(">I", 0) + b"vide" + b"\x00" * 13)
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        moov = _box(b"moov", _box(b"trak", mdia))
        return ftyp + mdat + moov

    for use_co64 in (False, True):
        blob = build(use_co64)
        info = extract_video_samples(blob)
        assert (info["width"], info["height"]) == (16, 9)
        assert [blob[o : o + s] for o, s, _ in info["samples"]] == samples
        assert [d for _, _, d in info["samples"]] == [0, 40, 80]


def test_malformed_gates():
    with pytest.raises(ValueError, match="no moov"):
        extract_video_samples(_box(b"ftyp", b"isom") + _box(b"mdat", b"x"))
    blob = encode_mp4([b"x"], width=2, height=2)
    # truncate inside moov: malformed box size
    with pytest.raises(ValueError):
        extract_video_samples(blob[:-6])
    with pytest.raises(ValueError):
        encode_mp4([], width=2, height=2)


def test_spark_sample_frames_mixed_containers(spark):
    """sample_frames handles FAKEVID and MP4 rows in one batch; MP4 frames
    carry the sample bytes and stsd dimensions."""
    from species_range_data_pipeline_spark.multimodal.media import (
        MEDIA_SCHEMA,
        encode_fake_video,
        sample_frames,
    )

    frames = _jpeg_frames(6)
    media = spark.createDataFrame(
        [
            (1, "video", encode_fake_video(4, 8, 6, seed=1), "fakevid"),
            (2, "video", encode_mp4(frames, width=32, height=24), "mp4"),
            (3, "image", b"not-a-video", "raw"),  # filtered out by kind
        ],
        MEDIA_SCHEMA,
    )
    rows = sample_frames(media, every=2).collect()
    got = {(r.media_id, r.frame_idx): r for r in rows}
    assert set(got) == {(1, 0), (1, 2), (2, 0), (2, 2), (2, 4)}
    for idx in (0, 2, 4):
        r = got[(2, idx)]
        assert (r.width, r.height) == (32, 24)
        assert bytes(r.frame) == frames[idx]
        w, h, c, px = decode_jpeg(bytes(r.frame))
        assert (w, h) == (32, 24)


def test_corrupt_mp4_becomes_error_row_not_task_failure(spark):
    """One truncated MP4 in a batch must not kill healthy siblings — the
    same side-channel contract as decode_images."""
    from species_range_data_pipeline_spark.multimodal.media import (
        MEDIA_SCHEMA,
        sample_frames,
    )

    good = encode_mp4(_jpeg_frames(2), width=32, height=24)
    media = spark.createDataFrame(
        [
            (1, "video", good, "mp4"),
            (2, "video", good[: len(good) // 2], "mp4"),  # truncated
            (3, "video", b"???? not a container", "raw"),
        ],
        MEDIA_SCHEMA,
    )
    rows = sample_frames(media, every=1).collect()
    ok = [r for r in rows if r.error is None]
    bad = {r.media_id: r.error for r in rows if r.error is not None}
    assert {r.media_id for r in ok} == {1} and len(ok) == 2
    assert "ValueError" in bad[2]
    assert "NotImplementedError" in bad[3]
