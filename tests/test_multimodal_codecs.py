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


def test_y4m_roundtrip_exact():
    import numpy as np

    from weather_analysis_bigdata__spark.operators.multimodal import (
        decode_y4m,
        encode_y4m,
    )

    rng = np.random.default_rng(11)
    frames = [
        rng.integers(0, 256, size=6 * 4 * 3 // 2, dtype=np.uint8)
        for _ in range(3)
    ]
    payload = encode_y4m(6, 4, frames, fps=(30, 1))
    w, h, fps, back = decode_y4m(payload)
    assert (w, h, fps) == (6, 4, (30, 1))
    assert len(back) == 3
    for a, b in zip(frames, back):
        assert np.array_equal(a, b)


def test_y4m_frame_params_tolerated():
    """FRAME lines may carry parameters (e.g. interlacing hints) — the
    parser must skip to the newline, not assume a bare marker."""
    import numpy as np

    from weather_analysis_bigdata__spark.operators.multimodal import decode_y4m

    frame = bytes(range(4 * 4 * 3 // 2)) * 1
    payload = (
        b"YUV4MPEG2 W4 H4 F25:1 Ip A0:0 C420jpeg\n"
        + b"FRAME Xcustom=1\n"
        + frame
    )
    w, h, _fps, frames = decode_y4m(payload)
    assert (w, h) == (4, 4) and len(frames) == 1
    assert np.array_equal(frames[0], np.frombuffer(frame, dtype=np.uint8))


def test_video_sampler_rejects_compressed():
    import pytest as _pytest

    from weather_analysis_bigdata__spark.operators.multimodal import (
        sample_video_frames,
    )

    with _pytest.raises(NotImplementedError):
        sample_video_frames(b"\x00\x00\x00 ftypisom....")  # MP4 magic


def test_sample_video_frames_every_n():
    import numpy as np

    from weather_analysis_bigdata__spark.operators.multimodal import (
        sample_video_frames,
        synth_y4m_payload,
    )

    payload = synth_y4m_payload(7)  # nf = 2 + 7%4 = 5 frames
    sampled = sample_video_frames(payload, every_n=2)
    assert len(sampled) == 3  # frames 0, 2, 4
    w, h = 4 + 2 * (7 % 3), 4 + 2 * (7 % 2)
    j = np.arange(w * h * 3 // 2)
    assert np.array_equal(sampled[1], (7 + 7 * 2 + j) % 256)


def test_resize_nearest_geometry_and_values():
    """resize_nearest keeps exactly every factor-th row/col from (0,0):
    ceil-division output dims and value identity for all small rasters."""
    import numpy as np

    from weather_analysis_bigdata__spark.operators.multimodal import (
        resize_nearest,
    )

    for h in range(1, 8):
        for w in range(1, 8):
            arr = np.arange(h * w * 3, dtype=np.int64).reshape(h, w, 3)
            small = resize_nearest(arr, 2)
            assert small.shape == ((h + 1) // 2, (w + 1) // 2, 3)
            for r in range((h + 1) // 2):
                for c in range((w + 1) // 2):
                    assert (small[r, c] == arr[2 * r, 2 * c]).all()
