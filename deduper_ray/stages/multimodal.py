"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata
(mime, width/height/duration). The Ray-side plumbing — schema, actor
pools, batch sizing, output layout — is real and tested. Three decoder
tiers:

- ``decoder="pnm"``: a REAL dependency-free decode path — the
  numpy PNM codec (functions/imagecodec.py, PPM P6 / PGM P5) decodes,
  resizes and re-encodes actual image payloads; runs and is tested in
  this container.
- ``decoder="real"``: IMPORT-GUARDED pillow (images) / ffmpeg (video)
  for the richer formats; raises NotImplementedError with a clear
  message when the codec is absent (skip-marked tests here).
- ``decoder="fake"``: deterministic payload-derived stand-in for
  plumbing tests with arbitrary bytes.

Scale notes baked into the defaults: media rows are large, so the
stages use SMALL batch sizes (32) and ``batch_format="pyarrow"``
(binary columns round-trip zero-copy through Arrow; pandas would box
them as Python bytes objects).
"""

from __future__ import annotations

import hashlib
import io

import numpy as np
import pyarrow as pa


def _try_import_pil():
    """PIL.Image or None — resolved once per process."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def _find_ffmpeg() -> str | None:
    import shutil

    return shutil.which("ffmpeg")


def _require_real(component, name: str):
    if component is None:
        raise NotImplementedError(
            f"decoder='real' requires {name}, which is not available in "
            "this environment; use decoder='fake' for plumbing tests"
        )
    return component

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

    __init__ is where the codec loads ONCE per actor.
    ``decoder="fake"``: deterministic pseudo-features = normalized
    sha256-seeded vector (stable across runs, suitable for testing the
    plumbing + downstream ANN). ``decoder="real"``: pillow decode →
    grayscale thumbnail → normalized pixel vector of length ``dim``;
    raises NotImplementedError only when pillow is not importable.
    """

    def __init__(self, *, dim: int = 64, decoder: str = "fake"):
        self.dim = dim
        self.decoder = decoder
        if decoder not in ("fake", "real", "pnm"):
            raise ValueError(f"unknown decoder {decoder!r}")
        if decoder in ("real", "pnm"):
            # square thumbnail whose pixel count covers dim
            self._side = int(np.ceil(np.sqrt(dim)))
        if decoder == "real":
            self._pil = _require_real(_try_import_pil(), "pillow")

    def _pixel_features(self, px: np.ndarray) -> np.ndarray:
        px = px.astype(np.float64).reshape(-1)[: self.dim]
        if px.size < self.dim:
            px = np.pad(px, (0, self.dim - px.size))
        norm = np.linalg.norm(px)
        return px / norm if norm else px

    def _features(self, payload: bytes) -> np.ndarray:
        if self.decoder == "real":
            img = self._pil.open(io.BytesIO(payload)).convert("L")
            img = img.resize((self._side, self._side))
            return self._pixel_features(np.asarray(img))
        if self.decoder == "pnm":
            from deduper_ray.functions.imagecodec import (
                decode_pnm,
                resize_nearest,
                to_gray,
            )

            px = resize_nearest(
                to_gray(decode_pnm(payload)), self._side, self._side
            )
            return self._pixel_features(px)
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


class AudioFeatureExtractor:
    """Actor-pool stage: audio payload → flattened per-frame
    (RMS, zero-crossing-rate) feature vector of length
    ``num_frames * 2``.

    ``decoder="wav"``: REAL dependency-free RIFF/PCM decode
    (functions/audiocodec.py) — runs and is tested in this container.
    ``decoder="fake"``: sha256-seeded stand-in for arbitrary bytes.
    """

    def __init__(self, *, num_frames: int = 16, decoder: str = "fake"):
        self.num_frames = num_frames
        self.decoder = decoder
        if decoder not in ("fake", "wav"):
            raise ValueError(f"unknown decoder {decoder!r}")

    def _features(self, payload: bytes) -> np.ndarray:
        if self.decoder == "wav":
            from deduper_ray.functions.audiocodec import (
                decode_wav,
                frame_features,
            )

            samples, _rate = decode_wav(payload)
            return frame_features(
                samples, num_frames=self.num_frames
            ).reshape(-1)
        seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
        rng = np.random.RandomState(seed % (2**32))
        return rng.standard_normal(self.num_frames * 2)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"]
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        feats = np.stack(
            [self._features(p.as_py() or b"") for p in payloads]
        ).astype(np.float32)
        dim = self.num_frames * 2
        return pa.table(
            {
                "media_id": batch["media_id"],
                "mime": batch["mime"],
                "feature": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.reshape(-1), type=pa.float32()), dim
                ),
            }
        )


class ImageResizer:
    """Actor-pool stage: resize — emits updated metadata and the
    transformed payload. Fake mode passes payload through and rewrites
    meta_width/meta_height; real mode decodes with pillow, resizes,
    and re-encodes PNG (raises only when pillow is unavailable)."""

    def __init__(self, *, width: int, height: int, decoder: str = "fake"):
        self.width = width
        self.height = height
        self.decoder = decoder
        if decoder not in ("fake", "real", "pnm"):
            raise ValueError(f"unknown decoder {decoder!r}")
        if decoder == "real":
            self._pil = _require_real(_try_import_pil(), "pillow")

    def _resize_payload(self, p: bytes) -> bytes:
        if self.decoder == "real":
            img = self._pil.open(io.BytesIO(p))
            img = img.resize((self.width, self.height))
            buf = io.BytesIO()
            img.save(buf, format="PNG")
            return buf.getvalue()
        from deduper_ray.functions.imagecodec import (
            decode_pnm,
            encode_pnm,
            resize_nearest,
        )

        return encode_pnm(
            resize_nearest(decode_pnm(p), self.width, self.height)
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if self.decoder in ("real", "pnm"):
            payloads = batch["payload"]
            if isinstance(payloads, pa.ChunkedArray):
                payloads = payloads.combine_chunks()
            out = [self._resize_payload(p or b"") for p in payloads.to_pylist()]
            batch = batch.set_column(
                batch.column_names.index("payload"),
                "payload",
                pa.array(out, type=pa.large_binary()),
            )
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
    """Actor-pool stage: video payload → k evenly-spaced 'frames'.
    Fake mode: deterministic byte slices standing in for decoded
    frames. Real mode: ffmpeg subprocess extracts k JPEG frames
    (raises only when no ffmpeg binary is on PATH). Emits one row per
    (media_id, frame_idx) — a flat_map-shaped explosion done
    vectorized inside map_batches."""

    def __init__(self, *, num_frames: int = 4, decoder: str = "fake"):
        self.num_frames = num_frames
        self.decoder = decoder
        if decoder == "real":
            self._ffmpeg = _require_real(_find_ffmpeg(), "ffmpeg on PATH")

    def _real_frames(self, payload: bytes) -> list[bytes]:
        """One ffmpeg invocation per media row: decode the first k
        frames to JPEG files in a scratch dir. Runs inside the actor —
        parallelism comes from the pool, not from ffmpeg threads."""
        import os
        import subprocess
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            src = os.path.join(d, "in.bin")
            with open(src, "wb") as f:
                f.write(payload)
            pattern = os.path.join(d, "f%04d.jpg")
            subprocess.run(
                [
                    self._ffmpeg, "-y", "-loglevel", "error", "-i", src,
                    "-frames:v", str(self.num_frames), pattern,
                ],
                check=True, capture_output=True,
            )
            out = []
            for i in range(1, self.num_frames + 1):
                p = os.path.join(d, f"f{i:04d}.jpg")
                out.append(open(p, "rb").read() if os.path.exists(p) else b"")
            return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decoder == "real":
            ids, idxs, frames = [], [], []
            payloads = batch["payload"]
            if isinstance(payloads, pa.ChunkedArray):
                payloads = payloads.combine_chunks()
            for mid, p in zip(
                batch["media_id"].to_pylist(), payloads.to_pylist()
            ):
                for f, frame in enumerate(self._real_frames(p or b"")):
                    ids.append(mid)
                    idxs.append(f)
                    frames.append(frame)
            return pa.table(
                {
                    "media_id": pa.array(ids, type=pa.int64()),
                    "frame_idx": pa.array(idxs, type=pa.int32()),
                    "frame": pa.array(frames, type=pa.large_binary()),
                }
            )
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
