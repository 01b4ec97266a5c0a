"""Round-trip and dispatch tests for the REAL pure-Python media codecs
(PPM image, WAV audio) in operators/multimodal.py."""

from __future__ import annotations

import numpy as np
import pytest

from weather_analysis_bigdata__spark.operators.multimodal import (
    decode_image,
    decode_ppm,
    decode_wav_pcm16,
    encode_ppm,
    encode_wav_pcm16,
    extract_audio_features,
    synth_ppm_payload,
    synth_wav_payload,
)


def test_ppm_roundtrip_exact():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=3 * 5 * 4, dtype=np.uint8)
    payload = encode_ppm(5, 4, px)
    w, h, arr = decode_ppm(payload)
    assert (w, h) == (5, 4)
    assert arr.shape == (4, 5, 3)
    assert np.array_equal(arr.reshape(-1), px)


def test_ppm_header_with_comments():
    # Comments between header tokens are legal P6 (same raster as above)
    px = np.arange(3 * 2 * 2, dtype=np.uint8)
    body = px.tobytes()
    payload = b"P6\n# a comment\n2 # trailing\n2\n# another\n255\n" + body
    w, h, arr = decode_ppm(payload)
    assert (w, h) == (2, 2)
    assert np.array_equal(arr.reshape(-1), px)


def test_ppm_rejects_non_p6():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\n....")


def test_wav_roundtrip_exact():
    samples = np.array([0, 1, -1, 32767, -32768, 1234], dtype=np.int16)
    payload = encode_wav_pcm16(samples, 8000)
    assert payload[:4] == b"RIFF" and len(payload) == 44 + 2 * len(samples)
    sr, back = decode_wav_pcm16(payload)
    assert sr == 8000
    assert np.array_equal(back, samples)


def test_wav_features_exact_energy():
    samples = np.array([3, -4], dtype=np.int16)
    feats = extract_audio_features(encode_wav_pcm16(samples, 16000))
    assert feats == {
        "sample_rate": 16000,
        "n_samples": 2,
        "s_min": -4,
        "s_max": 3,
        "s_sum": -1,
        "s_sumsq": 25,
    }


def test_wav_rejects_non_riff():
    with pytest.raises(NotImplementedError):
        extract_audio_features(b"OggS....")


def test_synth_payloads_match_closed_form():
    # The synthetic generators must agree with the oracle's closed form.
    w, h, arr = decode_ppm(synth_ppm_payload(123))
    assert (w, h) == (4 + 123 % 5, 3 + 123 % 4)
    i = np.arange(3 * w * h)
    assert np.array_equal(arr.reshape(-1), (123 + i) % 256)

    sr, s = decode_wav_pcm16(synth_wav_payload(123))
    n = 50 + 123 % 50
    k = np.arange(n)
    assert sr == 8000 and np.array_equal(s, ((123 * 7 + k * 13) % 2001 - 1000))
