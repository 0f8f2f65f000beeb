"""Spectral audio features, numpy-only DSP.

The feature set an audio-corpus pipeline computes per clip for quality
filtering and dataset curation: spectral centroid / rolloff / bandwidth
(framed Hann-windowed rFFT) and zero-crossing rate.  Pure vectorized
numpy — one Arrow batch of payloads in, one feature row per clip out,
through the same mapInPandas + error-side-channel shape as the image
lane.  Decode comes from ``media._decode_audio`` (FAKEAUD + real WAV;
MP3 gates loudly there).

Scale note: cost is O(n log n) per clip in the executor, zero shuffle;
feature rows are a few doubles, so only KBs move after the scan.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SPECTRAL_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("centroid_hz", T.DoubleType()),
        T.StructField("rolloff_hz", T.DoubleType()),
        T.StructField("bandwidth_hz", T.DoubleType()),
        T.StructField("zcr_per_s", T.DoubleType()),
        T.StructField("error", T.StringType()),
    ]
)

_FRAME = 512
_HOP = 256


def spectral_features(samples: np.ndarray, rate: int) -> dict[str, float]:
    """One clip -> {centroid_hz, rolloff_hz (85%), bandwidth_hz,
    zcr_per_s}.  Multi-channel input is averaged to mono first."""
    x = samples.astype(np.float64)
    if x.ndim == 2:
        x = x.mean(axis=1)
    # ZCR over the REAL samples before any framing pad: padding zeros
    # would inflate the duration and under-report the rate on short clips
    n_real = max(1, len(x))
    crossings = np.count_nonzero(np.diff(np.signbit(x)))
    dur = n_real / rate
    if len(x) < _FRAME:
        x = np.pad(x, (0, _FRAME - len(x)))
    n_frames = 1 + (len(x) - _FRAME) // _HOP
    idx = np.arange(_FRAME)[None, :] + _HOP * np.arange(n_frames)[:, None]
    frames = x[idx] * np.hanning(_FRAME)[None, :]
    mag = np.abs(np.fft.rfft(frames, axis=1))
    freqs = np.fft.rfftfreq(_FRAME, d=1.0 / rate)
    power = mag.sum(axis=1)
    power = np.where(power == 0.0, 1.0, power)  # silent frames -> centroid 0
    centroid = (mag * freqs[None, :]).sum(axis=1) / power
    cum = np.cumsum(mag, axis=1)
    roll_idx = np.argmax(cum >= 0.85 * cum[:, -1:], axis=1)
    rolloff = freqs[roll_idx]
    bandwidth = np.sqrt(
        (mag * (freqs[None, :] - centroid[:, None]) ** 2).sum(axis=1) / power
    )
    return {
        "centroid_hz": float(centroid.mean()),
        "rolloff_hz": float(rolloff.mean()),
        "bandwidth_hz": float(bandwidth.mean()),
        "zcr_per_s": float(crossings / dur),
    }


def extract_spectral_features(media: DataFrame) -> DataFrame:
    """Audio rows -> spectral feature rows (error side-channel, same
    contract as ``media.extract_audio_features``)."""
    from .media import _decode_audio

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    rate, _n, samples = _decode_audio(bytes(payload))
                    feats = spectral_features(samples, rate)
                    out.append(
                        {"media_id": mid, "sample_rate": rate,
                         **{k: round(v, 3) for k, v in feats.items()},
                         "error": None}
                    )
                except Exception as exc:
                    out.append(
                        {"media_id": mid, "sample_rate": None,
                         "centroid_hz": None, "rolloff_hz": None,
                         "bandwidth_hz": None, "zcr_per_s": None,
                         "error": f"{type(exc).__name__}: {exc}"}
                    )
            yield pd.DataFrame(
                out, columns=[f.name for f in SPECTRAL_SCHEMA.fields]
            )

    return (
        media.where(F.col("kind") == "audio")
        .select("media_id", "payload")
        .mapInPandas(fn, SPECTRAL_SCHEMA)
    )


def resample_audio(
    samples: np.ndarray, src_rate: int, dst_rate: int
) -> np.ndarray:
    """Linear-interpolation resample to ``dst_rate`` — the corpus
    normalization step (e.g. everything -> 16 kHz mono-friendly rates)
    before feature extraction or training.

    Deterministic and vectorized: output sample k sits at source time
    k * src/dst and is interpolated from its two neighbors (np.interp).
    Input (n,) or (n, channels) int16/float; output matches the input
    dtype (integer outputs use round-half-to-even, numpy's rint).  Anti-alias filtering is
    intentionally out of scope for the corpus-stats use case and
    documented here so nobody mistakes this for a DSP-grade decimator.
    """
    if src_rate <= 0 or dst_rate <= 0:
        raise ValueError("rates must be positive")
    x = samples.astype(np.float64)
    mono_in = x.ndim == 1
    if mono_in:
        x = x[:, None]
    n_in = x.shape[0]
    if n_in == 0:
        return samples.copy()
    n_out = max(1, int(round(n_in * dst_rate / src_rate)))
    t_out = np.arange(n_out) * (src_rate / dst_rate)
    t_in = np.arange(n_in, dtype=np.float64)
    out = np.stack(
        [np.interp(t_out, t_in, x[:, ch]) for ch in range(x.shape[1])], axis=1
    )
    if mono_in:
        out = out[:, 0]
    if np.issubdtype(samples.dtype, np.integer):
        return np.clip(np.rint(out), -32768, 32767).astype(samples.dtype)
    return out.astype(samples.dtype)


RESAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("error", T.StringType()),
    ]
)


def resample_clips(media: DataFrame, dst_rate: int = 16_000) -> DataFrame:
    """Normalize every audio clip to ``dst_rate``, re-encoded as WAV —
    the standard rate-normalization pass over a mixed-rate corpus, in the
    same mapInPandas + error-side-channel shape as the other media lanes
    (decode failures become error rows, never task failures)."""
    from . import media as media_mod
    from .codecs import encode_wav

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    rate, _n, samples = media_mod._decode_audio(bytes(payload))
                    res = resample_audio(samples, rate, dst_rate)
                    out.append(
                        {
                            "media_id": mid,
                            "payload": encode_wav(
                                res.astype(np.int16), dst_rate
                            ),
                            "sample_rate": dst_rate,
                            "n_samples": int(np.atleast_2d(res.T).shape[-1]),
                            "error": None,
                        }
                    )
                except Exception as exc:
                    out.append(
                        {
                            "media_id": mid, "payload": None,
                            "sample_rate": None, "n_samples": None,
                            "error": f"{type(exc).__name__}: {exc}",
                        }
                    )
            yield pd.DataFrame(
                out, columns=[f.name for f in RESAMPLE_SCHEMA.fields]
            )

    return media.where(F.col("kind") == "audio").select(
        "media_id", "payload"
    ).mapInPandas(fn, RESAMPLE_SCHEMA)
