"""Evidence for the pure-stdlib WAV codec (operators/audio.py).

WAVs are written with the stdlib ``wave`` writer and decoded back; the
assertions check SIGNAL-LEVEL properties (sine frequency → correct
spectral band and zero-crossing rate, phase cancellation on downmix,
8-bit bias handling) that would catch a wrong decode even though reader
and writer share the stdlib container parser.
"""

from __future__ import annotations

import io
import wave

import numpy as np
import pytest

from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.operators.audio import (
    audio_features,
    decode_wav,
    is_wav,
)
from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_audio,
)


def make_wav(samples: np.ndarray, rate: int = 8000, width: int = 2) -> bytes:
    """float samples in [-1, 1], shape (n,) or (n, ch) → WAV bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n_ch = samples.shape[1]
    if width == 1:
        data = (samples * 127.0 + 128.0).clip(0, 255).astype(np.uint8)
    elif width == 2:
        data = (samples * 32767.0).clip(-32768, 32767).astype("<i2")
    else:
        data = (samples * (2**31 - 1)).astype("<i4")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_ch)
        w.setsampwidth(width)
        w.setframerate(rate)
        w.writeframes(data.tobytes())
    return buf.getvalue()


def sine(freq: float, rate: int = 8000, seconds: float = 1.0) -> np.ndarray:
    t = np.arange(int(rate * seconds)) / rate
    return 0.8 * np.sin(2 * np.pi * freq * t)


def test_is_wav():
    assert is_wav(make_wav(sine(440)))
    assert not is_wav(b"RIFFxxxxNOPE")
    assert not is_wav(b"\x89PNG\r\n\x1a\n")
    assert not is_wav(None)


@pytest.mark.parametrize("width", [1, 2, 4])
def test_decode_round_trip_amplitude(width):
    x = sine(440)
    samples, rate = decode_wav(make_wav(x, width=width))
    assert rate == 8000
    assert samples.shape == (len(x), 1)
    # quantization-limited reconstruction (8-bit is coarse)
    tol = {1: 2e-2, 2: 1e-3, 4: 1e-6}[width]
    assert float(np.abs(samples[:, 0] - x).max()) < tol


def test_low_freq_sine_lands_in_bottom_band():
    feats = audio_features(*decode_wav(make_wav(sine(200.0))))
    assert feats.shape == (FEATURE_DIM,)
    bands = feats[8:12]
    # 200 Hz of a 4 kHz Nyquist → bottom band (0-500 Hz)
    assert bands[0] > 0.95 and bands[3] < 0.01
    # zcr of a sine = 2f/rate
    assert feats[5] == pytest.approx(2 * 200.0 / 8000, abs=0.01)
    assert feats[12] == pytest.approx(200.0 / 4000.0, abs=0.02)  # centroid


def test_high_freq_sine_lands_in_top_band():
    feats = audio_features(*decode_wav(make_wav(sine(3500.0))))
    bands = feats[8:12]
    # 3500 Hz of a 4 kHz Nyquist → top band (2000-4000 Hz)
    assert bands[3] > 0.95 and bands[0] < 0.01
    assert feats[5] == pytest.approx(2 * 3500.0 / 8000, abs=0.01)


def test_silence_and_amplitude_stats():
    feats = audio_features(*decode_wav(make_wav(np.zeros(4000))))
    assert feats[3] == 0.0  # rms
    assert feats[4] == 0.0  # peak
    assert feats[7] == 1.0  # silence fraction
    loud = audio_features(*decode_wav(make_wav(sine(440))))
    assert loud[3] == pytest.approx(0.8 / np.sqrt(2), abs=1e-2)  # sine rms
    assert loud[4] == pytest.approx(0.8, abs=1e-2)
    assert loud[7] < 0.05


def test_stereo_downmix_phase_cancellation():
    x = sine(440)
    stereo = np.stack([x, -x], axis=1)  # out of phase → mono mix ≈ 0
    feats = audio_features(*decode_wav(make_wav(stereo)))
    assert feats[2] == 2.0  # n_channels
    assert feats[3] < 1e-3  # rms of the cancelled downmix
    in_phase = audio_features(*decode_wav(make_wav(np.stack([x, x], axis=1))))
    assert in_phase[3] > 0.5


def test_eight_bit_bias_is_centered():
    """8-bit WAV stores unsigned samples biased at 128 — a decoder that
    forgets the bias reads silence as a massive DC offset."""
    samples, _ = decode_wav(make_wav(np.zeros(1000), width=1))
    assert float(np.abs(samples).max()) < 1e-2


def test_duration_and_rate_features():
    feats = audio_features(*decode_wav(make_wav(sine(440, rate=16000, seconds=2.0), rate=16000)))
    assert feats[0] == pytest.approx(np.log1p(2.0), abs=1e-3)
    assert feats[1] == pytest.approx(np.log1p(16000), abs=1e-3)


def test_rejections():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"not audio")
    with pytest.raises(ValueError):
        decode_wav(make_wav(sine(440))[:-100] + b"x")  # corrupt tail length


def test_decode_audio_dispatch():
    wav = make_wav(sine(440))
    feats = decode_audio(wav)
    assert feats.shape == (FEATURE_DIM,)
    np.testing.assert_array_equal(feats, decode_audio(wav))  # deterministic
    with pytest.raises(NotImplementedError, match="compressed-audio"):
        decode_audio(b"ID3\x04mp3-ish bytes")
    assert decode_audio(b"anything", fake=True).shape == (FEATURE_DIM,)


# ---------------------------------------------------------------------
# property-based round trips (hypothesis)
# ---------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-1.0, max_value=1.0, allow_nan=False, width=32),
        min_size=1,
        max_size=2048,
    ),
    st.sampled_from([1, 2]),
    st.sampled_from([8000, 16000, 44100]),
)
def test_property_wav_round_trip(vals, n_ch, rate):
    x = np.array(vals, dtype=np.float64)
    x = np.stack([x] * n_ch, axis=1)
    samples, got_rate = decode_wav(make_wav(x, rate=rate, width=2))
    assert got_rate == rate and samples.shape == x.shape
    assert float(np.abs(samples - np.clip(x, -1, 32767 / 32768)).max()) < 1e-3


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-1.0, max_value=1.0, allow_nan=False, width=32),
        min_size=1,
        max_size=1024,
    )
)
def test_property_audio_features_finite_and_deterministic(vals):
    x = np.array(vals, dtype=np.float64)
    samples, rate = decode_wav(make_wav(x))
    f = audio_features(samples, rate)
    assert f.shape == (FEATURE_DIM,) and np.all(np.isfinite(f))
    np.testing.assert_array_equal(f, audio_features(samples, rate))
