"""Spectral audio features: closed-form signals (pure tones, two-tone
mixes, white noise) pin the DSP against physics, and the Spark lane runs
real WAV payloads through the error-channel contract."""

from __future__ import annotations

import numpy as np
import pytest

from species_range_data_pipeline_spark.multimodal.audio_dsp import (
    extract_spectral_features,
    spectral_features,
)

RATE = 16000


def _sine(f: float, seconds: float = 1.0, amp: float = 12000.0) -> np.ndarray:
    t = np.arange(int(RATE * seconds)) / RATE
    return (amp * np.sin(2 * np.pi * f * t)).astype(np.int16)


def test_pure_tone_centroid_rolloff_zcr():
    feats = spectral_features(_sine(1000.0), RATE)
    # all spectral mass sits in the 1 kHz bin (±1 bin = 31.25 Hz)
    assert feats["centroid_hz"] == pytest.approx(1000.0, abs=40.0)
    assert feats["rolloff_hz"] == pytest.approx(1000.0, abs=40.0)
    assert feats["bandwidth_hz"] < 100.0
    # a sine crosses zero twice per cycle
    assert feats["zcr_per_s"] == pytest.approx(2000.0, rel=0.01)


def test_two_tone_centroid_between_and_rolloff_at_upper():
    x = (_sine(500.0).astype(np.int32) + _sine(3000.0).astype(np.int32)) // 2
    feats = spectral_features(x.astype(np.int16), RATE)
    assert 600.0 < feats["centroid_hz"] < 2900.0
    # 85% rolloff must reach into the upper tone (each tone holds ~50%)
    assert feats["rolloff_hz"] == pytest.approx(3000.0, abs=60.0)
    assert feats["bandwidth_hz"] > 500.0


def test_white_noise_is_broadband():
    rng = np.random.RandomState(3)
    x = rng.randint(-20000, 20000, RATE, dtype=np.int16)
    feats = spectral_features(x, RATE)
    # flat-ish spectrum: centroid near nyquist/2, rolloff near 0.85*nyquist
    assert feats["centroid_hz"] == pytest.approx(RATE / 4, rel=0.15)
    assert feats["rolloff_hz"] == pytest.approx(0.85 * RATE / 2, rel=0.1)
    assert feats["bandwidth_hz"] > 1500.0


def test_silence_and_short_clip_are_defined():
    feats = spectral_features(np.zeros(100, dtype=np.int16), RATE)
    assert feats["centroid_hz"] == 0.0 and feats["zcr_per_s"] == 0.0
    # stereo input averages to mono
    stereo = np.stack([_sine(1000.0), _sine(1000.0)], axis=1)
    feats = spectral_features(stereo, RATE)
    assert feats["centroid_hz"] == pytest.approx(1000.0, abs=40.0)


def test_spark_lane_over_real_wav_and_error_channel(spark):
    from species_range_data_pipeline_spark.multimodal.codecs import encode_wav
    from species_range_data_pipeline_spark.multimodal.media import MEDIA_SCHEMA

    media = spark.createDataFrame(
        [
            (1, "audio", encode_wav(_sine(1000.0), RATE), "wav"),
            (2, "audio", encode_wav(_sine(4000.0), RATE), "wav"),
            (3, "audio", b"ID3 not-really-an-mp3", "mp3"),
            (4, "image", b"ignored", "raw"),
        ],
        MEDIA_SCHEMA,
    )
    rows = {r.media_id: r for r in extract_spectral_features(media).collect()}
    assert set(rows) == {1, 2, 3}  # kind == audio only
    assert rows[1].error is None and rows[2].error is None
    assert rows[1].centroid_hz == pytest.approx(1000.0, abs=40.0)
    assert rows[2].centroid_hz == pytest.approx(4000.0, abs=40.0)
    assert rows[2].zcr_per_s == pytest.approx(8000.0, rel=0.01)
    assert "NotImplementedError" in rows[3].error


# ----------------------------------------------------------------- resample


def test_resample_matches_interp_closed_form():
    from species_range_data_pipeline_spark.multimodal.audio_dsp import (
        resample_audio,
    )

    x = (np.sin(2 * np.pi * 440 * np.arange(4410) / 44100) * 20000).astype(
        np.int16
    )
    y = resample_audio(x, 44100, 22050)
    assert y.dtype == np.int16
    assert len(y) == 2205
    # closed form: every output sample interpolates its two neighbors
    t_out = np.arange(2205) * 2.0
    want = np.interp(t_out, np.arange(4410, dtype=float), x.astype(float))
    assert np.max(np.abs(y.astype(float) - want)) <= 0.5  # rounding only

    # upsample round trip preserves length arithmetic and stays bounded
    up = resample_audio(y, 22050, 44100)
    assert len(up) == 4410 and np.max(np.abs(up.astype(int))) <= 20000 + 1


def test_resample_preserves_tone_frequency():
    from species_range_data_pipeline_spark.multimodal.audio_dsp import (
        resample_audio,
        spectral_features,
    )

    rate, f0 = 32000, 1000.0
    x = (np.sin(2 * np.pi * f0 * np.arange(16000) / rate) * 16000).astype(
        np.int16
    )
    y = resample_audio(x, rate, 16000)
    feats = spectral_features(y, 16000)
    assert abs(feats["centroid_hz"] - f0) < 40.0
    # stereo path: per-channel identical to the mono path
    st = resample_audio(np.stack([x, x], axis=1), rate, 16000)
    assert st.shape == (len(y), 2)
    assert np.array_equal(st[:, 0], y)


def test_resample_clips_spark_lane(spark):
    from species_range_data_pipeline_spark.multimodal.audio_dsp import (
        resample_clips,
    )
    from species_range_data_pipeline_spark.multimodal.codecs import decode_wav
    from species_range_data_pipeline_spark.multimodal.media import (
        make_media_table,
    )

    media = make_media_table(spark, n=16)
    out = resample_clips(media, dst_rate=8000).collect()
    assert len(out) == 4  # the audio quarter of the table
    for r in out:
        assert r.error is None and r.sample_rate == 8000
        rate, n_channels, samples = decode_wav(bytes(r.payload))
        assert rate == 8000 and n_channels == 1
        assert samples.shape[0] == r.n_samples > 0
