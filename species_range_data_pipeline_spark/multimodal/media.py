"""Multimodal media operators over opaque binary columns.

Payload format (deterministic fake codec, documented so tests and the
synthetic generator agree):

  FAKEIMG | uint16 width | uint16 height | uint8 channels | pixels (w*h*c bytes)
  FAKEVID | uint16 n_frames | uint16 width | uint16 height | frames (n*w*h bytes)
  FAKEAUD | uint32 sample_rate | uint32 n_samples | samples (int16 LE)

Real PNG and WAV decode via the pure-struct codecs in
``multimodal/codecs.py`` (stdlib ``zlib`` + ``struct``), real JPEG (baseline and
progressive) via ``multimodal/jpeg.py`` (T.81 Huffman + DCT from the
public spec), and real MP4 container parsing via ``multimodal/mp4.py`` (ISO
BMFF sample tables; MJPEG tracks decode all the way to pixels) — no
image/audio/video library needed.  MP3 audio and compressed video
bitstream decode (H.264/HEVC/AV1) still raise ``NotImplementedError`` in
the codec seams, and everything around the seams (schemas, mapInPandas
batching, metadata structs, partition behavior) is production-shaped
either way.

Scale notes: payloads stay in executor memory one Arrow batch at a time
(``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds it); decode output
drops the payload column as early as possible (column pruning does the rest)
so only features/metadata shuffle.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from species_range_data_pipeline_spark.multimodal import codecs, gif, jpeg, mp4

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("format", T.StringType()),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_pixel", T.DoubleType()),
        T.StructField("channel_means", T.ArrayType(T.DoubleType())),
        T.StructField("error", T.StringType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("error", T.StringType()),
    ]
)


def encode_fake_image(width: int, height: int, channels: int, seed: int) -> bytes:
    rng = np.random.RandomState(seed)
    pixels = rng.randint(0, 256, size=width * height * channels, dtype=np.uint8)
    return b"FAKEIMG" + struct.pack("<HHB", width, height, channels) + pixels.tobytes()


def encode_fake_video(n_frames: int, width: int, height: int, seed: int) -> bytes:
    rng = np.random.RandomState(seed)
    frames = rng.randint(0, 256, size=n_frames * width * height, dtype=np.uint8)
    return b"FAKEVID" + struct.pack("<HHH", n_frames, width, height) + frames.tobytes()


def encode_fake_audio(sample_rate: int, n_samples: int, seed: int) -> bytes:
    rng = np.random.RandomState(seed)
    samples = rng.randint(-32768, 32768, size=n_samples, dtype=np.int16)
    return b"FAKEAUD" + struct.pack("<II", sample_rate, n_samples) + samples.tobytes()


def make_media_table(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table (the fixture tables carry no
    binary column; seed-stable so tests are reproducible).

    Coalesced to 8 partitions: ``createDataFrame`` slices local rows
    across every core (32 partitions of 2 rows here), and each
    downstream mapInPandas lane then pays ~32 Python task launches to
    decode 64 tiny payloads — task overhead, not decode work, was the
    whole cost.  A real corpus arrives via a binaryFile scan whose
    partitioning follows file sizes instead."""
    rows = []
    for i in range(n):
        if i % 4 == 3:
            payload = encode_fake_video(4 + i % 3, 8, 6, seed=i)
            rows.append((i, "video", payload, "fakevid"))
        elif i % 4 == 2:
            payload = encode_fake_audio(16000, 800 + 100 * (i % 5), seed=i)
            rows.append((i, "audio", payload, "fakeaud"))
        else:
            payload = encode_fake_image(8 + i % 5, 6 + i % 3, 3, seed=i)
            rows.append((i, "image", payload, "fakeimg"))
    return spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(8)


def sniff_image_format(payload: bytes) -> str | None:
    """Signature-based image format sniff — the ONE place the dispatch
    lives (``_decode_payload`` and the ``probe`` CLI both route through
    it, so a new codec wires in once)."""
    if payload[:7] == b"FAKEIMG":
        return "fakeimg"
    if payload[:8] == codecs.PNG_SIGNATURE:
        return "png"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:6] in gif.GIF_SIGNATURES:
        return "gif"
    return None


def _decode_payload(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """The image codec seam: FAKEIMG, real PNG, and real JPEG (baseline
    and progressive) all decode via ``jpeg.decode_jpeg``.

    Always returns a (h, w, c) uint8 array with c >= 1 so every downstream
    feature kernel (means, aHash, resize) sees one shape regardless of
    source format.
    """
    fmt = sniff_image_format(payload)
    if fmt == "fakeimg":
        w, h, c = struct.unpack_from("<HHB", payload, 7)
        px = np.frombuffer(payload, dtype=np.uint8, offset=12)
        return w, h, c, px.reshape(h, w, c)
    if fmt == "png":
        return codecs.decode_png(payload)
    if fmt == "jpeg":
        return jpeg.decode_jpeg(payload)
    if fmt == "bmp":
        return codecs.decode_bmp(payload)
    if fmt == "gif":
        return gif.decode_gif(payload)
    raise ValueError(
        "unrecognized image payload (not FAKEIMG/PNG/JPEG/BMP/GIF)"
    )


def _decode_audio(payload: bytes) -> tuple[int, int, np.ndarray]:
    """The audio codec seam -> (sample_rate, n_frames, int16 samples).

    FAKEAUD and real RIFF/WAVE decode; MP3/FLAC gate loudly.  Samples come
    back 1-D for mono FAKEAUD and (n_frames, n_channels) for WAV — the
    feature kernels reduce over all samples either way.
    """
    if payload[:7] == b"FAKEAUD":
        rate, n = struct.unpack_from("<II", payload, 7)
        samples = np.frombuffer(payload, dtype=np.int16, offset=15)
        return rate, int(n), samples
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        rate, _n_channels, frames = codecs.decode_wav(payload)
        return rate, frames.shape[0], frames
    if payload[:3] == b"ID3" or (
        len(payload) > 1 and payload[0] == 0xFF and payload[1] & 0xE0 == 0xE0
    ):
        raise NotImplementedError(
            "MP3 SAMPLE decode needs a real codec this container doesn't "
            "ship (header-level metadata works via audio_metadata / "
            "multimodal/mp3.py; WAV decodes for real via codecs.py)"
        )
    raise ValueError("unrecognized audio payload (not FAKEAUD/WAV/MP3)")


def decode_images(media: DataFrame) -> DataFrame:
    """Image decode + feature extraction: mean pixel, per-channel means.

    mapInPandas so one Arrow batch of payloads is decoded per call; decode
    failures become error rows (never swallowed)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    w, h, c, px = _decode_payload(bytes(payload))
                    out.append(
                        {
                            "media_id": mid,
                            "width": w,
                            "height": h,
                            "channels": c,
                            "mean_pixel": float(px.mean()),
                            "channel_means": [float(m) for m in px.mean(axis=(0, 1))],
                            "error": None,
                        }
                    )
                except Exception as exc:
                    out.append(
                        {"media_id": mid, "width": None, "height": None,
                         "channels": None, "mean_pixel": None,
                         "channel_means": None,
                         "error": f"{type(exc).__name__}: {exc}"}
                    )
            yield pd.DataFrame(out, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields])

    return (
        media.where(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(fn, IMAGE_FEATURES_SCHEMA)
    )


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("ahash", T.StringType()),
        T.StructField("error", T.StringType()),
    ]
)


def image_ahash(media: DataFrame, grid: int = 8) -> DataFrame:
    """Perceptual average-hash per image: grayscale -> nearest-neighbor
    resize to grid x grid -> threshold at the mean -> 64-bit hex string.

    The multimodal twin of the text fingerprints: near-duplicate images
    (crops aside) agree on most bits, so dedup = group on the hash (exact)
    or band the bits like SimHash for Hamming-tolerant candidates."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    w, h, c, px = _decode_payload(bytes(payload))
                    gray = px.astype(np.float64).mean(axis=2)
                    yi = (np.arange(grid) * h // grid).astype(int)
                    xi = (np.arange(grid) * w // grid).astype(int)
                    small = gray[np.ix_(yi, xi)]
                    bits = (small >= small.mean()).astype(np.uint8).ravel()
                    val = 0
                    for b in bits:
                        val = (val << 1) | int(b)
                    out.append(
                        {"media_id": mid, "ahash": f"{val:016x}", "error": None}
                    )
                except Exception as exc:
                    out.append(
                        {"media_id": mid, "ahash": None,
                         "error": f"{type(exc).__name__}: {exc}"}
                    )
            yield pd.DataFrame(out, columns=[f.name for f in PHASH_SCHEMA.fields])

    return (
        media.where(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(fn, PHASH_SCHEMA)
    )


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize, re-encoded in the source format (PNG in ->
    PNG out via the pure-struct encoder; FAKEIMG in -> FAKEIMG out)."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("format", T.StringType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                w, h, c, px = _decode_payload(raw)
                yi = (np.arange(out_h) * h // out_h).astype(int)
                xi = (np.arange(out_w) * w // out_w).astype(int)
                resized = np.ascontiguousarray(px[np.ix_(yi, xi)], dtype=np.uint8)
                if raw[:8] == codecs.PNG_SIGNATURE:
                    blob, fmt = codecs.encode_png(resized), "png"
                else:
                    blob = (
                        b"FAKEIMG"
                        + struct.pack("<HHB", out_w, out_h, resized.shape[2])
                        + resized.tobytes()
                    )
                    fmt = "fakeimg"
                out.append({"media_id": mid, "payload": blob, "format": fmt})
            yield pd.DataFrame(out, columns=["media_id", "payload", "format"])

    return (
        media.where(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(fn, schema)
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.IntegerType()),
        T.StructField("error", T.StringType()),
    ]
)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Audio feature extraction: duration, RMS level, peak amplitude.

    Same mapInPandas shape as decode_images; FAKEAUD and real WAV decode
    via ``_decode_audio`` and failures are error rows."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    rate, n, samples = _decode_audio(bytes(payload))
                    out.append(
                        {
                            "media_id": mid,
                            "sample_rate": rate,
                            "n_samples": int(n),
                            "duration_s": round(n / rate, 6),
                            "rms": float(np.sqrt(np.mean(samples.astype(np.float64) ** 2))),
                            "peak": int(np.abs(samples.astype(np.int32)).max()),
                            "error": None,
                        }
                    )
                except Exception as exc:
                    out.append(
                        {"media_id": mid, "sample_rate": None, "n_samples": None,
                         "duration_s": None, "rms": None, "peak": None,
                         "error": f"{type(exc).__name__}: {exc}"}
                    )
            yield pd.DataFrame(out, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields])

    return (
        media.where(F.col("kind") == "audio")
        .select("media_id", "payload")
        .mapInPandas(fn, AUDIO_FEATURES_SCHEMA)
    )


AUDIO_METADATA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("container", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("bitrate_kbps", T.DoubleType()),
        T.StructField("error", T.StringType()),
    ]
)


def _audio_metadata(payload: bytes) -> dict:
    """Header-only audio metadata — the curation-stats lane that works
    even where SAMPLE decode gates (MP3): FAKEAUD / WAV headers are
    arithmetic; MP3 goes through the frame-header walker in ``mp3.py``.
    Never materializes samples."""
    if payload[:7] == b"FAKEAUD":
        rate, n = struct.unpack_from("<II", payload, 7)
        return {
            "container": "fakeaud", "sample_rate": int(rate), "channels": 1,
            "duration_s": round(n / rate, 3) if rate else 0.0,
            "bitrate_kbps": round(rate * 16 / 1000, 1),
        }
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        fmt, fmt_body, data_len = None, None, None
        for ctype, body in codecs.riff_chunks(payload):
            if ctype == b"fmt ":
                fmt = struct.unpack_from("<HHIIHH", body, 0)
                fmt_body = body
            elif ctype == b"data":
                data_len = len(body)
        if fmt is None or data_len is None:
            raise ValueError("WAV missing fmt/data chunk")
        tag, nch, rate, byte_rate, block_align, _ = fmt
        if nch < 1 or block_align < 1 or rate < 1:
            raise ValueError("WAV header with zero channels/rate")
        if tag == 0xFFFE and len(fmt_body) >= 40:
            # WAVE_FORMAT_EXTENSIBLE: real tag leads the SubFormat GUID
            tag = struct.unpack_from("<H", fmt_body, 24)[0]
        # data_len/block_align counts BLOCKS; for PCM/float/A-law/mu-law a
        # block is one frame, but ADPCM packs many samples per block —
        # duration must scale by samples-per-block or compressed WAVs
        # underreport ~20x.
        if tag in (1, 3, 6, 7):
            frames = data_len // block_align
        elif tag == 0x11:  # IMA ADPCM: 4B/ch header word + 4-bit nibbles
            if block_align < 4 * nch:
                # mirror codecs.py: a block smaller than its per-channel
                # preamble would yield NEGATIVE samples-per-block
                raise ValueError("implausible ADPCM block geometry")
            frames = (data_len // block_align) * (
                (block_align - 4 * nch) * 2 // nch + 1
            )
        elif tag == 0x02:  # MS-ADPCM: 7B/ch preamble holds 2 samples
            if block_align < 7 * nch:
                raise ValueError("implausible MS-ADPCM block geometry")
            frames = (data_len // block_align) * (
                (block_align - 7 * nch) * 2 // nch + 2
            )
        else:
            raise ValueError(f"WAV format 0x{tag:02x}: unknown frames-per-block")
        return {
            "container": "wav", "sample_rate": int(rate), "channels": int(nch),
            "duration_s": round(frames / rate, 3),
            "bitrate_kbps": round(byte_rate * 8 / 1000, 1),
        }
    if payload[:3] == b"ID3" or (
        len(payload) > 1 and payload[0] == 0xFF and payload[1] & 0xE0 == 0xE0
    ):
        from species_range_data_pipeline_spark.multimodal import mp3

        m = mp3.parse_mp3_metadata(payload)
        return {
            "container": "mp3", "sample_rate": m["sample_rate"],
            "channels": m["channels"], "duration_s": m["duration_s"],
            "bitrate_kbps": m["bitrate_kbps"],
        }
    raise ValueError("unrecognized audio payload (not FAKEAUD/WAV/MP3)")


def audio_metadata(media: DataFrame) -> DataFrame:
    """Duration / rate / channels / bitrate per audio payload from
    HEADERS only (no sample decode, so MP3 works here even though
    ``extract_audio_features`` gates on it).  Same mapInPandas +
    error-side-channel shape as every media operator."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    out.append(
                        {"media_id": mid, **_audio_metadata(bytes(payload)),
                         "error": None}
                    )
                except Exception as exc:
                    out.append(
                        {"media_id": mid, "container": None,
                         "sample_rate": None, "channels": None,
                         "duration_s": None, "bitrate_kbps": None,
                         "error": f"{type(exc).__name__}: {exc}"}
                    )
            yield pd.DataFrame(
                out, columns=[f.name for f in AUDIO_METADATA_SCHEMA.fields]
            )

    return (
        media.where(F.col("kind") == "audio")
        .select("media_id", "payload")
        .mapInPandas(fn, AUDIO_METADATA_SCHEMA)
    )


def sample_frames(media: DataFrame, every: int = 2) -> DataFrame:
    """Video frame sampling: one output row per kept frame (UDTF shape).

    Frame sampling is CONTAINER-level work, so it is real for MP4: the box
    tree and sample tables come from ``multimodal/mp4.py`` and each kept
    frame is that sample's byte range (for MJPEG tracks the bytes are a
    standalone JPEG that ``decode_images`` fully decodes; for compressed
    codecs they are the access unit a downstream decoder consumes).
    FAKEVID frames stay raw grayscale pixels.  Other containers gate."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    blob = bytes(payload)
                    if blob[:7] == b"FAKEVID":
                        n, w, h = struct.unpack_from("<HHH", blob, 7)
                        frames = np.frombuffer(
                            blob, dtype=np.uint8, offset=13
                        ).reshape(n, h, w)
                        for idx in range(0, n, every):
                            out.append(
                                {"media_id": mid, "frame_idx": idx,
                                 "frame": frames[idx].tobytes(),
                                 "width": w, "height": h, "error": None}
                            )
                    elif blob[4:8] == b"ftyp":
                        info = mp4.extract_video_samples(blob)
                        for idx in range(0, len(info["samples"]), every):
                            off, size, _dts = info["samples"][idx]
                            out.append(
                                {"media_id": mid, "frame_idx": idx,
                                 "frame": blob[off : off + size],
                                 "width": info["width"],
                                 "height": info["height"], "error": None}
                            )
                    else:
                        raise NotImplementedError(
                            "unrecognized video container "
                            "(FAKEVID and MP4 supported)"
                        )
                except Exception as exc:
                    # one corrupt payload must not kill the batch: error
                    # row, same side-channel contract as decode_images
                    out.append(
                        {"media_id": mid, "frame_idx": None, "frame": None,
                         "width": None, "height": None,
                         "error": f"{type(exc).__name__}: {exc}"}
                    )
            yield pd.DataFrame(out, columns=[f.name for f in FRAME_SCHEMA.fields])

    return (
        media.where(F.col("kind") == "video")
        .select("media_id", "payload")
        .mapInPandas(fn, FRAME_SCHEMA)
    )
