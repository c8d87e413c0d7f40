"""Real (dependency-free) audio decode path: the RIFF/PCM WAV codec
and the AudioFeatureExtractor actor stage."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from deduper_ray.functions.audiocodec import (
    decode_wav,
    encode_wav,
    frame_features,
)


def _sine(freq: float, n: int, rate: int = 8000, channels: int = 1):
    t = np.arange(n, dtype=np.float64) / rate
    mono = (np.sin(2 * np.pi * freq * t) * 20000).astype(np.int16)
    if channels == 1:
        return mono[:, None]
    return np.stack([mono] * channels, axis=1)


def test_wav_roundtrip_int16_mono_and_stereo():
    for ch in (1, 2):
        s = _sine(440, 800, channels=ch)
        arr, rate = decode_wav(encode_wav(s, 8000))
        assert rate == 8000
        assert arr.shape == (800, ch)
        assert np.array_equal(arr, s)


def test_wav_roundtrip_float32():
    s = (np.linspace(-1, 1, 321, dtype=np.float32))[:, None]
    arr, rate = decode_wav(encode_wav(s, 16000))
    assert arr.dtype == np.float32 and np.array_equal(arr, s)
    assert rate == 16000


def test_wav_rejects_non_wav():
    with pytest.raises(ValueError, match="RIFF/WAVE"):
        decode_wav(b"\x89PNG not audio at all....")


def test_frame_features_shape_and_determinism():
    s = _sine(220, 4000)
    f1 = frame_features(s, num_frames=8)
    f2 = frame_features(s, num_frames=8)
    assert f1.shape == (8, 2)
    assert np.array_equal(f1, f2)
    assert (f1[:, 0] > 0).all()  # sine has energy in every frame
    assert (f1[:, 1] > 0).all()  # and crosses zero


def test_audio_feature_extractor_wav_actor_pool():
    from deduper_ray.stages.multimodal import AudioFeatureExtractor

    n = 24
    payloads = [
        encode_wav(_sine(200 + 25 * i, 1600 + 40 * i), 8000)
        for i in range(n)
    ]
    t = pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "mime": pa.array(["audio/wav"] * n),
            "payload": pa.array(payloads, type=pa.large_binary()),
        }
    )
    out = (
        rd.from_arrow(t)
        .repartition(4)
        .map_batches(
            AudioFeatureExtractor,
            fn_constructor_kwargs={"num_frames": 8, "decoder": "wav"},
            batch_format="pyarrow",
            batch_size=8,
            concurrency=2,
        )
        .to_pandas()
        .sort_values("media_id")
    )
    assert len(out) == n
    feats = np.stack(out["feature"].to_numpy())
    assert feats.shape == (n, 16)
    # real decoded energy, deterministic: recompute one row by hand
    expected = frame_features(
        decode_wav(payloads[0])[0], num_frames=8
    ).reshape(-1).astype(np.float32)
    np.testing.assert_array_equal(feats[0], expected)
