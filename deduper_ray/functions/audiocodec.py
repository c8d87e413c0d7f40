"""Pure-python/numpy audio codec for RIFF/WAVE PCM.

The audio counterpart of functions/imagecodec.py: ffmpeg is absent in
this sandbox, so a dependency-free WAV codec gives the multimodal
stages one fully REAL audio decode/feature path that runs and is
tested here. Supports the canonical PCM WAVE container: 8-bit
unsigned, 16/32-bit signed little-endian integer, and 32-bit float
samples, any channel count (decoded to (frames, channels)).

Format notes (RIFF spec): "RIFF" <size> "WAVE", then chunks —
"fmt " carries (audio_format, channels, sample_rate, ..., bits);
"data" carries the interleaved sample plane. Chunks are word-aligned
(odd sizes padded by one byte).
"""

from __future__ import annotations

import struct

import numpy as np

_PCM_DTYPES = {8: np.uint8, 16: np.dtype("<i2"), 32: np.dtype("<i4")}


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → ((frames, channels) sample array, sample_rate).
    Integer samples keep their dtype; float WAVs decode to float32."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError(
            f"not a RIFF/WAVE payload (magic {data[:4]!r}/{data[8:12]!r})"
        )
    pos = 12
    fmt = None
    plane = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_format, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            fmt = (audio_format, channels, rate, bits)
        elif cid == b"data":
            plane = body
        pos += 8 + size + (size & 1)  # word alignment
    if fmt is None or plane is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, rate, bits = fmt
    if audio_format == 1:  # integer PCM
        dtype = _PCM_DTYPES.get(bits)
        if dtype is None:
            raise ValueError(f"unsupported PCM bit depth {bits}")
    elif audio_format == 3 and bits == 32:  # IEEE float
        dtype = np.dtype("<f4")
    else:
        raise ValueError(
            f"unsupported WAV format {audio_format} ({bits}-bit); "
            "only integer PCM and float32 are supported"
        )
    samples = np.frombuffer(plane, dtype=dtype)
    n = (samples.size // channels) * channels
    return samples[:n].reshape(-1, channels), rate


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(frames[, channels]) int16 / float32 array → WAV bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.dtype == np.float32:
        audio_format, bits = 3, 32
        plane = samples.astype("<f4").tobytes()
    else:
        audio_format, bits = 1, 16
        plane = samples.astype("<i2").tobytes()
    channels = samples.shape[1]
    block = channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", audio_format, channels, sample_rate,
        sample_rate * block, block, bits,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(plane)) + plane
        + (b"\x00" if len(plane) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def frame_features(
    samples: np.ndarray, *, num_frames: int = 16
) -> np.ndarray:
    """Deterministic per-frame features over the mono mix: RMS energy
    and zero-crossing rate for ``num_frames`` equal slices —
    (num_frames, 2) float64, fully vectorized."""
    if samples.ndim == 2:
        mono = samples.astype(np.float64).mean(axis=1)
    else:
        mono = samples.astype(np.float64)
    n = mono.size
    out = np.zeros((num_frames, 2), dtype=np.float64)
    if n == 0:
        return out
    step = max(1, n // num_frames)
    for f in range(num_frames):
        seg = mono[f * step : (f + 1) * step]
        if seg.size == 0:
            break
        out[f, 0] = float(np.sqrt(np.mean(seg * seg)))
        if seg.size > 1:
            out[f, 1] = float(np.mean(np.signbit(seg[1:]) != np.signbit(seg[:-1])))
    return out
