"""Baseline JPEG codec (multimodal/jpeg.py): encode/decode round-trips
across quality levels, chroma subsampling modes, restart markers, odd
sizes; loud gates for non-baseline processes; and the Spark operator lane
over real JPEG payloads."""

from __future__ import annotations

import numpy as np
import pytest

from species_range_data_pipeline_spark.multimodal.jpeg import (
    _ZZ,
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)


def _smooth_rgb(h: int = 40, w: int = 56) -> np.ndarray:
    """Linear ramps (no 255->0 wrap): chroma subsampling stays tight."""
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            yy * 255 / (h - 1),
            xx * 255 / (w - 1),
            (yy + xx) * 255 / (h + w - 2),
        ],
        axis=-1,
    ).round().astype(np.uint8)


def test_zigzag_order_is_the_standard_one():
    """The derived traversal must match T.81's table: pin the first
    diagonal walk and the tail."""
    assert list(_ZZ[:10]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert list(_ZZ[-8:]) == [53, 60, 61, 54, 47, 55, 62, 63]
    assert sorted(_ZZ) == list(range(64))


def test_gray_gradient_roundtrip_near_exact():
    yy, xx = np.mgrid[0:40, 0:56]
    gray = ((yy * 3 + xx * 2) % 256).astype(np.uint8)
    w, h, c, px = decode_jpeg(encode_jpeg(gray, quality=95))
    assert (w, h, c) == (56, 40, 1)
    assert np.abs(px[..., 0].astype(int) - gray.astype(int)).max() <= 2


def test_rgb_roundtrip_all_subsampling_modes():
    img = _smooth_rgb()
    for subsampling, tol in [((1, 1), 4), ((2, 1), 6), ((2, 2), 8)]:
        blob = encode_jpeg(img, quality=90, subsampling=subsampling)
        w, h, c, px = decode_jpeg(blob)
        assert (w, h, c) == (56, 40, 3)
        err = np.abs(px.astype(int) - img.astype(int))
        assert err.max() <= tol, (subsampling, int(err.max()))


def test_noise_roundtrip_q100_and_odd_dims():
    """Random noise at quality 100 (quant steps ~1) survives within DCT
    rounding; 17x13 exercises the edge-padding path."""
    rng = np.random.RandomState(7)
    noise = rng.randint(0, 256, (17, 13, 3), dtype=np.uint8)
    w, h, c, px = decode_jpeg(encode_jpeg(noise, quality=100))
    assert (w, h, c) == (13, 17, 3)
    assert np.abs(px.astype(int) - noise.astype(int)).max() <= 6


def test_restart_markers_roundtrip():
    img = _smooth_rgb()
    plain = encode_jpeg(img, quality=90)
    rst = encode_jpeg(img, quality=90, restart_interval=2)
    assert b"\xff\xdd" in rst and b"\xff\xd0" in rst
    assert b"\xff\xdd" not in plain
    _, _, _, px_plain = decode_jpeg(plain)
    _, _, _, px_rst = decode_jpeg(rst)
    # restart markers change framing, not content
    assert (px_plain == px_rst).all()
    # 4:2:0 + restarts together (the common camera-output combination)
    _, _, _, px = decode_jpeg(
        encode_jpeg(img, quality=90, subsampling=(2, 2), restart_interval=3)
    )
    assert np.abs(px.astype(int) - img.astype(int)).max() <= 8


def test_quality_knob_trades_size_for_error():
    img = _smooth_rgb()
    lo, hi = encode_jpeg(img, quality=30), encode_jpeg(img, quality=95)
    assert len(lo) < len(hi)
    _, _, _, px_lo = decode_jpeg(lo)
    _, _, _, px_hi = decode_jpeg(hi)
    e_lo = np.abs(px_lo.astype(int) - img.astype(int)).mean()
    e_hi = np.abs(px_hi.astype(int) - img.astype(int)).mean()
    assert e_hi < e_lo


def test_loud_gates_and_malformed():
    gray = np.zeros((8, 8), dtype=np.uint8)
    blob = bytearray(encode_jpeg(gray))
    i = bytes(blob).find(b"\xff\xc0")
    blob[i + 1] = 0xC2  # SOF0 -> SOF2 with a baseline scan header: the
    with pytest.raises(ValueError, match="Se=0"):  # Ss=0,Se=63 combination
        decode_jpeg(bytes(blob))  # is illegal for a progressive DC scan
    blob[i + 1] = 0xC3  # lossless sequential
    with pytest.raises(NotImplementedError, match="non-baseline"):
        decode_jpeg(bytes(blob))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG....")
    with pytest.raises(ValueError, match="no SOS"):
        decode_jpeg(b"\xff\xd8\xff\xd9")  # SOI+EOI, no scan
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\x00\x00")


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    channels=st.sampled_from([1, 3]),
    seed=st.integers(0, 2**31 - 1),
    subsampling=st.sampled_from([(1, 1), (2, 1), (2, 2)]),
    restart=st.sampled_from([0, 1, 3]),
)
def test_property_roundtrip_never_crashes_and_bounds_error(
    h, w, channels, seed, subsampling, restart
):
    """Any uint8 image of any size survives encode(q=100)->decode with
    bounded error — the whole-codec property pass (entropy coding is
    lossless, so error comes only from DCT/quant rounding and, for
    subsampled chroma, the box-mean)."""
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (h, w, channels), dtype=np.uint8)
    if channels == 1:
        subsampling = (1, 1)
    blob = encode_jpeg(
        img.squeeze(-1) if channels == 1 else img,
        quality=100,
        subsampling=subsampling,
        restart_interval=restart,
    )
    W, H, C, px = decode_jpeg(blob)
    assert (W, H, C) == (w, h, channels)
    if subsampling == (1, 1):
        # luma-only error: quant steps are ~1 at q100
        assert np.abs(px.astype(int) - img.astype(int)).max() <= 8
    else:
        # chroma box-mean on noise destroys chroma by design; luma is
        # roughly preserved (exact pre-clipping — RGB clipping after
        # extreme chroma reconstruction can shift recomputed Y locally)
        want_y = (
            0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
        )
        got_y = (
            0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
        )
        assert np.abs(got_y - want_y).mean() <= 8
        assert np.abs(got_y - want_y).max() <= 64


def test_real_jpeg_through_spark_operators(spark):
    """Real baseline JPEG payloads flow through decode/ahash — the formerly
    NotImplementedError lane, now backed by multimodal/jpeg.py."""
    from species_range_data_pipeline_spark.multimodal.media import (
        MEDIA_SCHEMA,
        decode_images,
        image_ahash,
    )

    imgs = {
        0: _smooth_rgb(24, 32),
        1: 255 - _smooth_rgb(24, 32),
        2: _smooth_rgb(16, 16),
    }
    media = spark.createDataFrame(
        [(i, "image", encode_jpeg(px, quality=95), "jpeg") for i, px in imgs.items()]
        + [(9, "image", encode_jpeg(imgs[0], quality=95), "jpeg")],
        MEDIA_SCHEMA,
    )
    feats = {r.media_id: r for r in decode_images(media).collect()}
    assert all(r.error is None for r in feats.values())
    for i, px in imgs.items():
        assert (feats[i].width, feats[i].height) == (px.shape[1], px.shape[0])
        assert feats[i].channels == 3
        # lossy codec: means agree loosely, not exactly
        assert feats[i].mean_pixel == pytest.approx(float(px.mean()), abs=3.0)

    hashes = {r.media_id: r.ahash for r in image_ahash(media).collect()}
    assert hashes[0] == hashes[9]  # byte-identical payloads -> same hash
    assert hashes[0] != hashes[1]  # inverted image -> different hash


# ------------------------------------------------------------ progressive


def test_progressive_twin_is_pixel_identical_to_baseline():
    """Both encoders share the quantized coefficients and entropy coding
    is lossless, so the progressive decode (10-scan libjpeg-shaped script:
    interleaved reduced-precision DC, spectral AC bands, successive-
    approximation refinements) must reproduce the baseline twin exactly —
    across subsampling modes and with restart intervals inside scans."""
    img = _smooth_rgb()
    for kw in [
        {},
        {"subsampling": (2, 1)},
        {"subsampling": (2, 2)},
        {"restart_interval": 2},
        {"subsampling": (2, 2), "restart_interval": 3},
    ]:
        blob = encode_jpeg_progressive(img, quality=90, **kw)
        assert 0 < blob.find(b"\xff\xc2") < blob.find(b"\xff\xda")
        w, h, c, px = decode_jpeg(blob)
        assert (w, h, c) == (56, 40, 3)
        base = decode_jpeg(encode_jpeg(img, quality=90, **kw))[3]
        assert (px == base).all(), kw


def test_progressive_grayscale_and_odd_dims():
    yy, xx = np.mgrid[0:40, 0:56]
    gray = ((yy * 3 + xx * 2) % 256).astype(np.uint8)
    assert (
        decode_jpeg(encode_jpeg_progressive(gray, quality=95))[3]
        == decode_jpeg(encode_jpeg(gray, quality=95))[3]
    ).all()
    rng = np.random.RandomState(7)
    noise = rng.randint(0, 256, (17, 13, 3), dtype=np.uint8)
    w, h, c, px = decode_jpeg(encode_jpeg_progressive(noise, quality=100))
    assert (w, h, c) == (13, 17, 3)
    assert (px == decode_jpeg(encode_jpeg(noise, quality=100))[3]).all()


def test_progressive_spectral_selection_only_script():
    """A scan script with no successive approximation (Ah=Al=0 spectral
    bands only) is also valid progressive; the custom-script hook drives
    the EOB-run and band-split decoder paths without refinement scans."""
    img = _smooth_rgb(24, 32)
    blob = encode_jpeg_progressive(
        img,
        quality=92,
        script=[
            ((0, 1, 2), 0, 0, 0, 0),
            ((0,), 1, 9, 0, 0),
            ((1,), 1, 63, 0, 0),
            ((2,), 1, 63, 0, 0),
            ((0,), 10, 63, 0, 0),
        ],
    )
    assert (
        decode_jpeg(blob)[3] == decode_jpeg(encode_jpeg(img, quality=92))[3]
    ).all()


@settings(max_examples=15, deadline=None)
@given(
    h=st.integers(1, 33),
    w=st.integers(1, 33),
    channels=st.sampled_from([1, 3]),
    seed=st.integers(0, 2**31 - 1),
    subsampling=st.sampled_from([(1, 1), (2, 2)]),
    restart=st.sampled_from([0, 2]),
)
def test_property_progressive_equals_baseline(
    h, w, channels, seed, subsampling, restart
):
    """For ANY image the progressive twin decodes pixel-identically to the
    baseline twin — the full-pipeline equivalence property."""
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (h, w, channels), dtype=np.uint8)
    if channels == 1:
        img, subsampling = img.squeeze(-1), (1, 1)
    kw = dict(quality=85, subsampling=subsampling, restart_interval=restart)
    assert (
        decode_jpeg(encode_jpeg_progressive(img, **kw))[3]
        == decode_jpeg(encode_jpeg(img, **kw))[3]
    ).all()


def test_progressive_hostile_dims_fail_fast():
    """A corrupt SOF2 declaring a huge image must be rejected before the
    coefficient buffers are allocated (EOB runs make entropy length
    useless as a plausibility bound, so the cap is at allocation)."""
    import struct as _struct

    blob = bytearray(encode_jpeg_progressive(np.zeros((8, 8), np.uint8)))
    i = bytes(blob).find(b"\xff\xc2")
    _struct.pack_into(">HH", blob, i + 5, 65500, 65500)
    with pytest.raises(ValueError, match="blocks"):
        decode_jpeg(bytes(blob))


@settings(max_examples=20, deadline=None)
@given(seed=st.integers(0, 2**31 - 1))
def test_property_random_progressive_scan_scripts(seed):
    """Twin identity must hold for ANY valid progression, not just the
    libjpeg-shaped default: random spectral-band partitions per
    component, random successive-approximation depth (DC and AC), random
    scan interleavings — the decoder may receive coefficients in any
    spec-legal order and must reconstruct the exact baseline pixels."""
    import random as _random

    rng = _random.Random(seed)
    h, w = rng.randint(1, 25), rng.randint(1, 25)
    img = np.random.RandomState(seed).randint(0, 256, (h, w, 3), np.uint8)

    # random spectral partition of 1..63 per component
    def bands():
        cuts = sorted(rng.sample(range(2, 63), rng.randint(0, 3)))
        edges = [1, *cuts, 64]
        return [(edges[i], edges[i + 1] - 1) for i in range(len(edges) - 1)]

    dc_al = rng.randint(0, 2)
    script = [((0, 1, 2), 0, 0, 0, dc_al)]
    ac_scans = []
    for ci in range(3):
        al = rng.randint(0, 2)
        for ss, se in bands():
            ac_scans.append(((ci,), ss, se, 0, al))
        # refinement chain al -> 0 over the whole band
        for a in range(al, 0, -1):
            ac_scans.append(((ci,), 1, 63, a, a - 1))
    rng.shuffle(ac_scans)  # scan order across components is free
    # refinements of one component must stay in decreasing-Ah order and
    # after that component's first scans; shuffling preserves this only
    # per-component, so re-stabilize: firsts (any order) then refinements
    firsts = [s for s in ac_scans if s[3] == 0]
    refines = sorted(
        (s for s in ac_scans if s[3] != 0), key=lambda s: -s[3]
    )
    script += firsts + refines
    for a in range(dc_al, 0, -1):
        script.append(((0, 1, 2), 0, 0, a, a - 1))

    blob = encode_jpeg_progressive(img, quality=88, script=script)
    assert (
        decode_jpeg(blob)[3] == decode_jpeg(encode_jpeg(img, quality=88))[3]
    ).all()


def test_12bit_precision_twins_and_16bit_dqt():
    """12-bit extended-sequential (SOF1) and 12-bit progressive both
    decode pixel-identically to their 8-bit twins: the encoder scales
    samples and quantization tables by 16 (entropy stream unchanged,
    emitted through 16-bit pq=1 DQT segments), the decoder divides the
    tables back down."""
    img = _smooth_rgb()
    for kw in [{}, {"subsampling": (2, 2), "restart_interval": 2}]:
        b8 = decode_jpeg(encode_jpeg(img, quality=90, **kw))[3]
        blob = encode_jpeg(img, quality=90, precision=12, **kw)
        assert b"\xff\xc1" in blob  # extended sequential frame
        i = blob.find(b"\xff\xdb")
        assert blob[i + 4] & 0x10  # pq=1: 16-bit quant entries
        assert (decode_jpeg(blob)[3] == b8).all(), kw
        prog = encode_jpeg_progressive(img, quality=90, precision=12, **kw)
        assert (decode_jpeg(prog)[3] == b8).all(), kw

    with pytest.raises(ValueError, match="precision"):
        encode_jpeg(img, precision=10)
    # hostile: a 14-bit SOF still gates loudly
    blob = bytearray(encode_jpeg(img))
    i = bytes(blob).find(b"\xff\xc0")
    blob[i + 4] = 14
    with pytest.raises(NotImplementedError, match="14-bit"):
        decode_jpeg(bytes(blob))


def test_jpeg_is_progressive_walks_segments_not_bytes():
    """The frame-kind probe must walk marker segments: FF C2 inside a
    pre-SOS payload (marker payloads are NOT byte-stuffed) is data, not
    a frame marker."""
    from species_range_data_pipeline_spark.multimodal.jpeg import (
        jpeg_is_progressive,
    )

    img = _smooth_rgb(16, 16)
    base = encode_jpeg(img)
    prog = encode_jpeg_progressive(img)
    assert not jpeg_is_progressive(base)
    assert jpeg_is_progressive(prog)
    # inject an APP1 segment whose payload contains FF C2 right after SOI
    app1 = b"\xff\xe1" + (6).to_bytes(2, "big") + b"\xff\xc2\x00\x00"
    spiked = base[:2] + app1 + base[2:]
    assert not jpeg_is_progressive(spiked)
    assert (decode_jpeg(spiked)[3] == decode_jpeg(base)[3]).all()
