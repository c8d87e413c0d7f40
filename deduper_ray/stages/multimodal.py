"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata
(mime, width/height/duration). The Ray-side plumbing — schema, actor
pools, batch sizing, output layout — is real and tested; the actual
codec work is STUBBED (pillow/ffmpeg are not in this container):
``decoder="fake"`` produces deterministic features from the payload
bytes, ``decoder="real"`` raises NotImplementedError at the exact
point a codec library would be called.

Scale notes baked into the defaults: media rows are large, so the
stages use SMALL batch sizes (32) and ``batch_format="pyarrow"``
(binary columns round-trip zero-copy through Arrow; pandas would box
them as Python bytes objects).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("mime", pa.string()),
        ("payload", pa.large_binary()),
        ("meta_width", pa.int32()),
        ("meta_height", pa.int32()),
        ("meta_duration_ms", pa.int32()),
    ]
)

DEFAULT_MEDIA_BATCH_SIZE = 32  # large binary rows → small batches


class ImageFeatureExtractor:
    """Actor-pool stage: payload bytes → fixed-dim feature vector.

    __init__ is where a real model/codec would load ONCE per actor.
    ``decoder="fake"``: deterministic pseudo-features = normalized
    sha256-seeded vector (stable across runs, suitable for testing the
    plumbing + downstream ANN). ``decoder="real"``: NotImplementedError
    until an image library is available.
    """

    def __init__(self, *, dim: int = 64, decoder: str = "fake"):
        self.dim = dim
        self.decoder = decoder
        if decoder not in ("fake", "real"):
            raise ValueError(f"unknown decoder {decoder!r}")

    def _features(self, payload: bytes) -> np.ndarray:
        if self.decoder == "real":
            raise NotImplementedError(
                "real image decode requires pillow/opencv — not in this "
                "container; plug the codec call here"
            )
        seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
        rng = np.random.RandomState(seed % (2**32))
        v = rng.standard_normal(self.dim)
        return v / np.linalg.norm(v)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"]
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        feats = np.stack(
            [self._features(p.as_py() or b"") for p in payloads]
        ).astype(np.float32)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "mime": batch["mime"],
                "feature": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.reshape(-1), type=pa.float32()), self.dim
                ),
            }
        )


class ImageResizer:
    """Actor-pool stage: resize plumbing — emits updated metadata and a
    (stub-)transformed payload. Fake mode passes payload through and
    rewrites meta_width/meta_height; real mode raises at the codec
    boundary."""

    def __init__(self, *, width: int, height: int, decoder: str = "fake"):
        self.width = width
        self.height = height
        self.decoder = decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decoder == "real":
            raise NotImplementedError("real resize requires an image codec")
        n = batch.num_rows
        batch = batch.set_column(
            batch.column_names.index("meta_width"),
            "meta_width",
            pa.array(np.full(n, self.width, dtype=np.int32)),
        )
        return batch.set_column(
            batch.column_names.index("meta_height"),
            "meta_height",
            pa.array(np.full(n, self.height, dtype=np.int32)),
        )


class FrameSampler:
    """Actor-pool stage: video payload → k evenly-spaced 'frames'
    (stub: deterministic byte slices standing in for decoded frames).
    Emits one row per (media_id, frame_idx) — a flat_map-shaped
    explosion done vectorized inside map_batches."""

    def __init__(self, *, num_frames: int = 4, decoder: str = "fake"):
        self.num_frames = num_frames
        self.decoder = decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decoder == "real":
            raise NotImplementedError("real frame decode requires ffmpeg")
        ids, idxs, frames = [], [], []
        payloads = batch["payload"]
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        for mid, p in zip(batch["media_id"].to_pylist(), payloads.to_pylist()):
            p = p or b""
            step = max(1, len(p) // self.num_frames)
            for f in range(self.num_frames):
                ids.append(mid)
                idxs.append(f)
                frames.append(p[f * step : (f + 1) * step])
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "frame_idx": pa.array(idxs, type=pa.int32()),
                "frame": pa.array(frames, type=pa.large_binary()),
            }
        )


def make_fake_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic synthetic media table matching MEDIA_SCHEMA."""
    rng = np.random.RandomState(seed)
    payloads = [rng.bytes(rng.randint(200, 2000)) for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "mime": pa.array(
                [["image/png", "image/jpeg", "video/mp4"][i % 3] for i in range(n)]
            ),
            "payload": pa.array(payloads, type=pa.large_binary()),
            "meta_width": pa.array(
                rng.randint(64, 4096, n).astype(np.int32)
            ),
            "meta_height": pa.array(
                rng.randint(64, 4096, n).astype(np.int32)
            ),
            "meta_duration_ms": pa.array(
                rng.randint(0, 60000, n).astype(np.int32)
            ),
        }
    )
