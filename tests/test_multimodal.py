"""Multimodal plumbing tests: fake codec decodes for real, real formats stub
cleanly, and the Spark-side batch shapes hold."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from species_range_data_pipeline_spark.multimodal.media import (
    _decode_payload,
    decode_images,
    encode_fake_image,
    make_media_table,
    resize_images,
    sample_frames,
)


def test_fake_image_roundtrip():
    blob = encode_fake_image(4, 3, 3, seed=42)
    w, h, c, px = _decode_payload(blob)
    assert (w, h, c) == (4, 3, 3)
    assert px.shape == (3, 4, 3)
    rng = np.random.RandomState(42)
    assert (px.ravel() == rng.randint(0, 256, size=36, dtype=np.uint8)).all()


def test_png_and_jpeg_decode_for_real():
    # both real image formats decode through the seam (PNG losslessly,
    # baseline JPEG within lossy tolerance — see test_codecs/test_jpeg)
    from species_range_data_pipeline_spark.multimodal.codecs import encode_png
    from species_range_data_pipeline_spark.multimodal.jpeg import encode_jpeg

    px = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    w, h, c, got = _decode_payload(encode_png(px))
    assert (w, h, c) == (4, 2, 3) and (got == px).all()

    smooth = np.tile(np.arange(0, 160, 10, dtype=np.uint8), (12, 1))
    w, h, c, got = _decode_payload(encode_jpeg(smooth, quality=95))
    assert (w, h, c) == (16, 12, 1)
    assert np.abs(got[..., 0].astype(int) - smooth.astype(int)).max() <= 4


def test_decode_images_features(spark):
    media = make_media_table(spark, n=16)
    feats = decode_images(media).orderBy("media_id")
    rows = feats.collect()
    assert len(rows) == 8  # 16 minus every 4th (video) and every 4th+2 (audio)
    for r in rows:
        assert r.error is None
        assert len(r.channel_means) == r.channels == 3
        # mean of per-channel means == overall mean
        assert np.mean(r.channel_means) == pytest.approx(r.mean_pixel)
        # independently recompute from the seed
        w, h, c, px = _decode_payload(
            encode_fake_image(8 + r.media_id % 5, 6 + r.media_id % 3, 3, seed=r.media_id)
        )
        assert r.mean_pixel == pytest.approx(float(px.mean()))


def test_decode_error_channel(spark):
    bad = spark.createDataFrame(
        [(99, "image", b"\xff\xd8\xff\xe0 jpeg bytes", "jpeg")],
        "media_id long, kind string, payload binary, format string",
    )
    rows = decode_images(bad).collect()
    assert len(rows) == 1
    assert "ValueError" in rows[0].error  # truncated JPEG: malformed, not gated


def test_resize_images(spark):
    media = make_media_table(spark, n=8)
    small = resize_images(media, 4, 2).orderBy("media_id").collect()
    for r in small:
        w, h, c, px = _decode_payload(bytes(r.payload))
        assert (w, h, c) == (4, 2, 3)


def test_sample_frames(spark):
    media = make_media_table(spark, n=16)
    frames = sample_frames(media, every=2).collect()
    assert frames
    for r in frames:
        assert r.frame_idx % 2 == 0
        assert len(bytes(r.frame)) == r.width * r.height


def test_extract_audio_features(spark):
    import numpy as np
    import struct as _struct

    from species_range_data_pipeline_spark.multimodal.media import (
        extract_audio_features,
        make_media_table,
    )

    media = make_media_table(spark, 16)
    feats = {r.media_id: r for r in extract_audio_features(media).collect()}
    assert feats, "no audio rows in the media table"
    for mid, r in feats.items():
        assert r.error is None
        assert r.sample_rate == 16000
        assert r.duration_s == round(r.n_samples / 16000, 6)
        # recompute rms/peak from the payload
        blob = bytes(
            media.where(f"media_id = {mid}").select("payload").first()[0]
        )
        rate, n = _struct.unpack_from("<II", blob, 7)
        samples = np.frombuffer(blob, dtype=np.int16, offset=15)
        assert r.peak == int(np.abs(samples.astype(np.int32)).max())
        assert abs(r.rms - float(np.sqrt(np.mean(samples.astype(np.float64) ** 2)))) < 1e-9


def test_audio_real_codec_is_stubbed(spark):
    from species_range_data_pipeline_spark.multimodal.media import (
        MEDIA_SCHEMA,
        extract_audio_features,
    )

    fake_mp3 = spark.createDataFrame(
        [(99, "audio", b"ID3\x04\x00rubbish", "mp3")], MEDIA_SCHEMA
    )
    rows = extract_audio_features(fake_mp3).collect()
    assert len(rows) == 1 and "NotImplementedError" in rows[0].error


def test_real_png_through_spark_operators(spark):
    """Real PNG payloads flow through decode/ahash/resize — the formerly
    NotImplementedError lane, now backed by multimodal/codecs.py."""
    from species_range_data_pipeline_spark.multimodal.codecs import (
        decode_png,
        encode_png,
    )
    from species_range_data_pipeline_spark.multimodal.media import (
        MEDIA_SCHEMA,
        image_ahash,
    )

    rng = np.random.RandomState(11)
    pixels = {
        i: rng.randint(0, 256, size=(12, 16, 3), dtype=np.uint8) for i in range(3)
    }
    media = spark.createDataFrame(
        [(i, "image", encode_png(px), "png") for i, px in pixels.items()]
        + [(9, "image", encode_png(pixels[0]), "png")],  # byte-identical dup of 0
        MEDIA_SCHEMA,
    )

    feats = {r.media_id: r for r in decode_images(media).collect()}
    assert all(r.error is None for r in feats.values())
    for i, px in pixels.items():
        assert (feats[i].width, feats[i].height, feats[i].channels) == (16, 12, 3)
        assert feats[i].mean_pixel == pytest.approx(float(px.mean()))

    hashes = {r.media_id: r.ahash for r in image_ahash(media).collect()}
    assert hashes[0] == hashes[9]  # identical pixels -> identical hash
    assert hashes[0] != hashes[1]

    small = {r.media_id: r for r in resize_images(media, 8, 6).collect()}
    assert all(r.format == "png" for r in small.values())
    w, h, c, got = decode_png(bytes(small[0].payload))
    assert (w, h, c) == (8, 6, 3)
    # nearest-neighbor: every output pixel exists in the source image
    yi = (np.arange(6) * 12 // 6).astype(int)
    xi = (np.arange(8) * 16 // 8).astype(int)
    assert (got == pixels[0][np.ix_(yi, xi)]).all()


def test_real_wav_through_spark_operators(spark):
    from species_range_data_pipeline_spark.multimodal.codecs import encode_wav
    from species_range_data_pipeline_spark.multimodal.media import (
        MEDIA_SCHEMA,
        extract_audio_features,
    )

    rng = np.random.RandomState(5)
    mono = rng.randint(-20000, 20000, size=1600, dtype=np.int16)
    stereo = rng.randint(-20000, 20000, size=(800, 2), dtype=np.int16)
    media = spark.createDataFrame(
        [(0, "audio", encode_wav(mono, 16000), "wav"),
         (1, "audio", encode_wav(stereo, 8000), "wav")],
        MEDIA_SCHEMA,
    )
    feats = {r.media_id: r for r in extract_audio_features(media).collect()}
    assert all(r.error is None for r in feats.values())
    assert feats[0].sample_rate == 16000 and feats[0].n_samples == 1600
    assert feats[0].duration_s == pytest.approx(0.1)
    assert feats[0].rms == pytest.approx(
        float(np.sqrt(np.mean(mono.astype(np.float64) ** 2)))
    )
    assert feats[1].sample_rate == 8000 and feats[1].n_samples == 800
    assert feats[1].peak == int(np.abs(stereo.astype(np.int32)).max())


def test_image_ahash_deterministic_and_dedups(spark):
    from species_range_data_pipeline_spark.multimodal.media import (
        MEDIA_SCHEMA,
        encode_fake_image,
        image_ahash,
        make_media_table,
    )

    media = make_media_table(spark, 16)
    hashes = {r.media_id: r.ahash for r in image_ahash(media).collect()}
    assert hashes and all(r is not None for r in hashes.values())
    assert all(len(h) == 16 for h in hashes.values())

    # identical pixels -> identical hash; different seed -> different hash
    a = encode_fake_image(16, 12, 3, seed=7)
    dup = spark.createDataFrame(
        [(0, "image", a, "fakeimg"), (1, "image", a, "fakeimg"),
         (2, "image", encode_fake_image(16, 12, 3, seed=8), "fakeimg")],
        MEDIA_SCHEMA,
    )
    got = {r.media_id: r.ahash for r in image_ahash(dup).collect()}
    assert got[0] == got[1] != got[2]


def test_audio_metadata_header_only_lane(spark):
    """audio_metadata reads headers only: FAKEAUD/WAV report exact
    duration math, MP3 works THROUGH the lane (sample decode still
    gates in extract_audio_features), garbage routes to the error
    column."""
    import numpy as np

    from species_range_data_pipeline_spark.multimodal.codecs import encode_wav
    from species_range_data_pipeline_spark.multimodal.media import (
        MEDIA_SCHEMA,
        audio_metadata,
        encode_fake_audio,
        extract_audio_features,
    )
    from species_range_data_pipeline_spark.multimodal.mp3 import (
        encode_mp3_frames,
    )

    wav = encode_wav(np.zeros(32000, dtype=np.int16), 16000)
    mp3_cbr = encode_mp3_frames(100, bitrate_kbps=128, sample_rate=44100)
    mp3_xing = encode_mp3_frames(3, xing_frames=500, id3=b"\x00" * 64)
    media = spark.createDataFrame(
        [
            (0, "audio", encode_fake_audio(16000, 8000, seed=1), "fakeaud"),
            (1, "audio", wav, "wav"),
            (2, "audio", mp3_cbr, "mp3"),
            (3, "audio", mp3_xing, "mp3"),
            (4, "audio", b"\x00garbage\x00" * 8, "???"),
        ],
        MEDIA_SCHEMA,
    )
    got = {r.media_id: r for r in audio_metadata(media).collect()}
    assert got[0].container == "fakeaud" and got[0].duration_s == 0.5
    assert got[1].container == "wav" and got[1].duration_s == 2.0
    assert got[1].sample_rate == 16000 and got[1].bitrate_kbps == 256.0
    assert got[2].container == "mp3" and got[2].sample_rate == 44100
    assert abs(got[2].duration_s - 100 * 1152 / 44100) < 0.01
    assert abs(got[2].bitrate_kbps - 128) < 2
    assert got[3].duration_s == round(500 * 1152 / 44100, 3)  # Xing count
    assert got[4].error is not None

    # the SAMPLE lane still gates MP3 loudly — metadata is the softening
    feats = {r.media_id: r for r in extract_audio_features(media).collect()}
    assert feats[2].error is not None and "NotImplementedError" in feats[2].error
    assert feats[1].error is None


def test_mp3_metadata_hostile_inputs():
    """Truncations/bitflips of valid MP3 streams raise ValueError or
    parse — never hang or another exception type (frame walk always
    advances; frame count capped)."""
    import random

    from species_range_data_pipeline_spark.multimodal.mp3 import (
        encode_mp3_frames,
        parse_mp3_metadata,
    )

    blob = encode_mp3_frames(20, id3=b"\x00" * 40, xing_frames=None)
    rng = random.Random(77)
    for _ in range(150):
        trunc = blob[: rng.randrange(len(blob))]
        try:
            parse_mp3_metadata(trunc)
        except ValueError:
            pass
        flipped = bytearray(blob)
        for _ in range(rng.randrange(1, 6)):
            flipped[rng.randrange(len(flipped))] = rng.randrange(256)
        try:
            parse_mp3_metadata(bytes(flipped))
        except ValueError:
            pass


def test_mp3_truncation_contract_fixes():
    """Review regressions: truncation inside the Xing tag is ValueError
    (not struct.error), and a final frame cut mid-body is NOT counted
    toward duration/bitrate."""
    import pytest as _pytest

    from species_range_data_pipeline_spark.multimodal.mp3 import (
        encode_mp3_frames,
        parse_mp3_metadata,
    )

    xing = encode_mp3_frames(3, xing_frames=500)
    cut = xing.find(b"Xing") + 4  # right after the marker
    with _pytest.raises(ValueError, match="malformed MP3"):
        parse_mp3_metadata(xing[:cut])

    blob = encode_mp3_frames(10)
    whole = parse_mp3_metadata(blob)
    clipped = parse_mp3_metadata(blob[:-200])  # last frame loses its body
    assert whole["n_frames"] == 10
    assert clipped["n_frames"] == 9
    assert clipped["duration_s"] < whole["duration_s"]


def test_advice_r5_fixes():
    """Round-5 review regressions: (1) ADPCM WAV duration scales by
    samples-per-block; (2) Xing-path bitrate excludes trailing ID3v1/APE
    tags; (3) subtitle millis are positional; (4) JPEG marker walks skip
    FF fill bytes."""
    import struct

    import pytest as _pytest

    from species_range_data_pipeline_spark.multimodal.media import _audio_metadata
    from species_range_data_pipeline_spark.multimodal.mp3 import (
        encode_mp3_frames,
        parse_mp3_metadata,
    )
    from species_range_data_pipeline_spark.sources.subtitles import _ts_ms

    def wav_header(tag, nch, rate, block_align, n_blocks, bits):
        fmt = struct.pack(
            "<HHIIHH", tag, nch, rate, rate * block_align, block_align, bits
        )
        body = b"\x00" * (block_align * n_blocks)
        payload = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                   + b"data" + struct.pack("<I", len(body)) + body)
        return b"RIFF" + struct.pack("<I", len(payload)) + payload

    # IMA ADPCM mono, block_align=20: (20-4)*2+1 = 33 samples/block
    m = _audio_metadata(wav_header(0x11, 1, 8000, 20, 5, 4))
    assert m["duration_s"] == round(5 * 33 / 8000, 3)
    # MS-ADPCM mono, block_align=32: (32-7)*2+2 = 52 samples/block
    m = _audio_metadata(wav_header(0x02, 1, 8000, 32, 4, 4))
    assert m["duration_s"] == round(4 * 52 / 8000, 3)
    # PCM unchanged: block == frame
    m = _audio_metadata(wav_header(1, 2, 8000, 4, 800, 16))
    assert m["duration_s"] == 0.1
    # unknown compressed format refuses rather than mis-reporting
    with _pytest.raises(ValueError, match="frames-per-block"):
        _audio_metadata(wav_header(0x55, 1, 8000, 144, 3, 0))

    # Xing-path bitrate must not count a trailing ID3v1 / APE tag
    xing = encode_mp3_frames(6, xing_frames=6)
    clean = parse_mp3_metadata(xing)
    with_id3v1 = parse_mp3_metadata(xing + b"TAG" + b"\x00" * 125)
    ape = (b"APETAGEX" + struct.pack("<I", 2000) + struct.pack("<I", 64)
           + b"\x00" * 16)
    with_ape = parse_mp3_metadata(xing + b"\x00" * 32 + ape)
    assert with_id3v1["bitrate_kbps"] == clean["bitrate_kbps"]
    assert with_ape["bitrate_kbps"] == clean["bitrate_kbps"]

    # positional millis: fewer digits mean higher units
    assert _ts_ms("00:00:01,5") == 1500
    assert _ts_ms("00:00:01,50") == 1500
    assert _ts_ms("00:00:01,500") == 1500
    assert _ts_ms("0:00:01.05") == 1050

    # JPEG: FF fill bytes before a marker are spec-legal padding
    import numpy as np

    from species_range_data_pipeline_spark.multimodal.jpeg import (
        decode_jpeg,
        encode_jpeg,
        jpeg_is_progressive,
    )

    img = np.full((16, 16, 1), 128, dtype=np.uint8)
    blob = encode_jpeg(img, quality=90)
    sos = blob.find(b"\xff\xda")
    padded = blob[:sos] + b"\xff\xff\xff" + blob[sos:]
    assert not jpeg_is_progressive(padded)
    w, h, c, _ = decode_jpeg(padded)
    assert (w, h, c) == (16, 16, 1)


def test_advice_r6_fixes():
    """Round-6 review items: (1) A-law/mu-law WAVs report duration via
    the one-block-per-frame branch instead of raising; (2) malformed
    ADPCM headers with block_align below the per-channel preamble raise
    the codecs.py-style geometry error instead of a negative duration;
    (3) the Xing-path APE subtraction honors the header-present flag
    (APEv2 size excludes the 32-byte header)."""
    import struct

    import pytest as _pytest

    from species_range_data_pipeline_spark.multimodal.media import _audio_metadata
    from species_range_data_pipeline_spark.multimodal.mp3 import (
        encode_mp3_frames,
        parse_mp3_metadata,
    )

    def wav_header(tag, nch, rate, block_align, n_blocks, bits):
        fmt = struct.pack(
            "<HHIIHH", tag, nch, rate, rate * block_align, block_align, bits
        )
        body = b"\x00" * (block_align * n_blocks)
        payload = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                   + b"data" + struct.pack("<I", len(body)) + body)
        return b"RIFF" + struct.pack("<I", len(payload)) + payload

    # A-law (6) / mu-law (7): one byte per sample per channel, block==frame
    m = _audio_metadata(wav_header(6, 1, 8000, 1, 800, 8))
    assert m["duration_s"] == 0.1
    m = _audio_metadata(wav_header(7, 2, 8000, 2, 1600, 8))
    assert m["duration_s"] == 0.2

    # block_align below the per-channel preamble: loud geometry error,
    # never a negative samples-per-block
    with _pytest.raises(ValueError, match="implausible ADPCM"):
        _audio_metadata(wav_header(0x11, 2, 8000, 6, 3, 4))
    with _pytest.raises(ValueError, match="implausible MS-ADPCM"):
        _audio_metadata(wav_header(0x02, 2, 8000, 10, 3, 4))

    # APEv2 tag WITH header: size field covers items+footer only; the
    # header-present flag (bit 31) means 32 more non-audio bytes
    xing = encode_mp3_frames(6, xing_frames=6)
    clean = parse_mp3_metadata(xing)
    flags = 0xA0000000  # header present + this-is-the-footer variants
    items = b"\x00" * 32
    size = struct.pack("<I", 32 + len(items))  # items + footer, no header
    header = (b"APETAGEX" + struct.pack("<I", 2000) + size
              + struct.pack("<I", 0) + struct.pack("<I", flags | 0x20000000)
              + b"\x00" * 8)
    footer = (b"APETAGEX" + struct.pack("<I", 2000) + size
              + struct.pack("<I", 0) + struct.pack("<I", flags)
              + b"\x00" * 8)
    with_ape_hdr = parse_mp3_metadata(xing + header + items + footer)
    assert with_ape_hdr["bitrate_kbps"] == clean["bitrate_kbps"]
