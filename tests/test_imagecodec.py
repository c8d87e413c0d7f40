"""Real (dependency-free) image decode path: the numpy PNM codec and
the multimodal stages running it through Ray actor pools — the
un-skipped counterpart of the pillow/ffmpeg-guarded tests."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from deduper_ray.functions.imagecodec import (
    decode_pnm,
    encode_pnm,
    resize_nearest,
    to_gray,
)


def _gradient_rgb(w: int, h: int) -> np.ndarray:
    x = np.arange(w, dtype=np.int64)
    y = np.arange(h, dtype=np.int64)[:, None]
    r = (x * 255 // max(w - 1, 1)) * np.ones((h, 1), dtype=np.int64)
    g = (y * 255 // max(h - 1, 1)) * np.ones((1, w), dtype=np.int64)
    b = np.full((h, w), 7, dtype=np.int64)
    return np.stack([r, g, b], axis=2).astype(np.uint8)


def test_pnm_roundtrip_p6_and_p5():
    img = _gradient_rgb(17, 9)
    assert np.array_equal(decode_pnm(encode_pnm(img)), img)
    gray = to_gray(img)
    assert np.array_equal(decode_pnm(encode_pnm(gray)), gray)


def test_pnm_header_comments_and_16bit():
    img = _gradient_rgb(4, 3)
    payload = encode_pnm(img)
    # inject a comment into the header — spec-legal, must parse
    commented = payload.replace(b"P6\n", b"P6\n# a comment\n", 1)
    assert np.array_equal(decode_pnm(commented), img)
    wide = (img.astype(np.uint16) * 257)
    rt = decode_pnm(encode_pnm(wide, maxval=65535))
    assert rt.dtype == np.uint16 and np.array_equal(rt, wide)


def test_pnm_rejects_non_pnm():
    with pytest.raises(ValueError, match="not a binary PNM"):
        decode_pnm(b"\x89PNG\r\n\x1a\n....")


def test_resize_nearest_exact_math():
    img = np.arange(16, dtype=np.uint8).reshape(4, 4)
    out = resize_nearest(img, 2, 2)
    # rows/cols 0 and 2 survive under the floor mapping
    assert out.tolist() == [[0, 2], [8, 10]]


def _pnm_media_table(n: int) -> pa.Table:
    payloads = [
        encode_pnm(_gradient_rgb(8 + i % 5, 6 + i % 3)) for i in range(n)
    ]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "mime": pa.array(["image/x-portable-pixmap"] * n),
            "payload": pa.array(payloads, type=pa.large_binary()),
            "meta_width": pa.array(
                np.array([8 + i % 5 for i in range(n)], dtype=np.int32)
            ),
            "meta_height": pa.array(
                np.array([6 + i % 3 for i in range(n)], dtype=np.int32)
            ),
            "meta_duration_ms": pa.array(np.zeros(n, dtype=np.int32)),
        }
    )


def test_image_feature_extractor_pnm_actor_pool():
    from deduper_ray.stages.multimodal import (
        DEFAULT_MEDIA_BATCH_SIZE,
        ImageFeatureExtractor,
    )

    ds = rd.from_arrow(_pnm_media_table(40)).repartition(4)
    out = ds.map_batches(
        ImageFeatureExtractor,
        fn_constructor_kwargs={"dim": 16, "decoder": "pnm"},
        batch_format="pyarrow",
        batch_size=DEFAULT_MEDIA_BATCH_SIZE,
        concurrency=2,
    ).to_pandas()
    assert len(out) == 40
    feats = np.stack(out["feature"].to_numpy())
    assert feats.shape == (40, 16)
    # unit-norm real pixel features, deterministic across runs
    np.testing.assert_allclose(np.linalg.norm(feats, axis=1), 1.0, rtol=1e-6)
    # identical payloads → identical features
    t2 = ds.map_batches(
        ImageFeatureExtractor,
        fn_constructor_kwargs={"dim": 16, "decoder": "pnm"},
        batch_format="pyarrow",
        concurrency=2,
    ).to_pandas()
    np.testing.assert_array_equal(
        np.stack(t2.sort_values("media_id")["feature"].to_numpy()),
        np.stack(out.sort_values("media_id")["feature"].to_numpy()),
    )


def test_image_resizer_pnm_actor_pool():
    from deduper_ray.stages.multimodal import ImageResizer

    ds = rd.from_arrow(_pnm_media_table(12)).repartition(4)
    out = ds.map_batches(
        ImageResizer,
        fn_constructor_kwargs={"width": 5, "height": 4, "decoder": "pnm"},
        batch_format="pyarrow",
        concurrency=2,
    ).to_pandas()
    assert (out["meta_width"] == 5).all() and (out["meta_height"] == 4).all()
    for p in out["payload"]:
        arr = decode_pnm(p)
        assert arr.shape == (4, 5, 3)
    # pixel-exact: resizing the gradient by hand matches the stage
    src = _gradient_rgb(8, 6)
    expected = resize_nearest(src, 5, 4)
    got = decode_pnm(
        out.loc[out["media_id"] == 0, "payload"].iloc[0]
    )
    assert np.array_equal(got, expected)
