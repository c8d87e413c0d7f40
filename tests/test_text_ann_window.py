"""Tests: text analysis, ANN search, windowed aggregates, multimodal
plumbing (over the driver-provided testdata tables where applicable)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from deduper_ray.functions.text import (
    LangIdScorer,
    add_fingerprint,
    add_quality_scores,
    add_token_count,
)
from deduper_ray.stages.ann import brute_force_topk, embedding_neardup
from deduper_ray.stages.multimodal import (
    FrameSampler,
    ImageFeatureExtractor,
    ImageResizer,
    make_fake_media_table,
)
from deduper_ray.stages.window import (
    session_windows,
    sliding_aggregate,
    tumbling_aggregate,
)


# ---------------- text ----------------

def test_token_count():
    t = pa.table({"text": ["hello world", "a_b c3 d!", ""]})
    out = add_token_count(t)
    assert out["n_tokens"].to_pylist() == [2, 3, 0]


def test_quality_scores():
    t = pa.table({"text": ["The cat and the dog!! 42"]})
    out = add_quality_scores(t)
    r = out.to_pylist()[0]
    assert r["n_chars_q"] == 24
    assert r["n_digit"] == 2
    assert r["n_punct"] == 2
    assert r["n_stopwords"] == 2  # 'the' + 'and' ("The" is case-sensitive-missed)
    assert 0 < r["alpha_ratio"] < 1


def test_lang_id():
    scorer = LangIdScorer()
    t = pa.table(
        {
            "text": [
                "the cat and the dog is in that house for now",
                "der hund und die katze ist nicht mit der maus",
                "le chat et la maison est pour les amis dans que",
                "xyzzy plugh 12345",
            ]
        }
    )
    out = scorer(t)
    assert out["lang_pred"].to_pylist() == ["en", "de", "fr", "unknown"]


def test_fingerprint():
    import hashlib

    t = pa.table({"text": ["abc"]})
    out = add_fingerprint(t)
    assert out["fingerprint"][0].as_py() == hashlib.md5(b"abc").hexdigest()[:16]


# ---------------- ANN ----------------

def _toy_embeddings(n=100, d=16, seed=0):
    rng = np.random.RandomState(seed)
    m = rng.standard_normal((n, d)).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(m.reshape(-1), type=pa.float32()), d
            ),
        }
    ), m


def test_brute_force_topk_matches_numpy():
    tbl, m = _toy_embeddings()
    ds = rd.from_arrow(tbl)
    qids = np.array([0, 5], dtype=np.int64)
    out = brute_force_topk(ds, qids, m[qids], k=5).to_pandas()
    # numpy oracle (float64, matching the engine's internal precision)
    m = m.astype(np.float64)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    for qid in qids:
        sims = mn @ mn[qid]
        sims[qid] = -np.inf  # exclude self
        expect = np.lexsort((np.arange(len(sims)), -sims))[:5]
        got = out[out["query_id"] == qid].sort_values("rank")["neighbor_id"].values
        assert list(got) == list(expect)


def test_embedding_neardup_finds_planted_pair():
    tbl, m = _toy_embeddings(n=60, d=16)
    # plant: vec 59 = vec 3 + tiny noise
    m2 = m.copy()
    m2[59] = m2[3] + 0.001
    t2 = pa.table(
        {
            "vec_id": pa.array(np.arange(60, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(m2.reshape(-1), type=pa.float32()), 16
            ),
        }
    )
    out = embedding_neardup(
        rd.from_arrow(t2), dim=16, cosine_threshold=0.95
    ).to_pandas()
    pairs = set(zip(out["id_a"], out["id_b"]))
    assert (3, 59) in pairs
    assert out[out["id_a"] == 3]["cosine"].iloc[0] > 0.999


# ---------------- windows ----------------

def _events(n=1000):
    rng = np.random.RandomState(1)
    ts = pa.array(
        (np.sort(rng.randint(0, 86400, n)) * 1_000_000).astype("int64"),
        type=pa.int64(),
    )
    return rd.from_arrow(
        pa.table(
            {
                "ts": pc.cast(ts, pa.timestamp("us")),
                "user_id": pa.array(rng.randint(0, 20, n), type=pa.int64()),
                "event_type": pa.array(
                    [["click", "view", "buy"][i % 3] for i in range(n)]
                ),
                "value": pa.array(rng.random(n), type=pa.float64()),
            }
        )
    )


def test_tumbling_counts_total():
    ev = _events()
    out = tumbling_aggregate(
        ev, keys=["event_type"], window_sec=3600
    ).to_pandas()
    assert out["n_events"].sum() == 1000
    assert (out["window_start"] % (3600 * 1_000_000) == 0).all()


def test_sliding_multiplicity():
    ev = _events(200)
    out = sliding_aggregate(
        ev, keys=["event_type"], window_sec=3600, step_sec=900
    ).to_pandas()
    # each event lands in exactly window/step = 4 windows
    assert out["n_events"].sum() == 200 * 4


def test_session_windows_gap():
    t = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 2], type=pa.int64()),
            "ts": pc.cast(
                pa.array(
                    [0, 60 * 1_000_000, 10_000 * 1_000_000, 0], type=pa.int64()
                ),
                pa.timestamp("us"),
            ),
        }
    )
    out = session_windows(
        rd.from_arrow(t), key="user_id", gap_sec=1800
    ).to_pandas()
    u1 = out[out["user_id"] == 1]
    assert len(u1) == 2  # 10000s gap splits the session
    assert len(out[out["user_id"] == 2]) == 1


# ---------------- multimodal ----------------

def test_media_plumbing():
    tbl = make_fake_media_table(20)
    ds = rd.from_arrow(tbl)
    feats = ds.map_batches(
        ImageFeatureExtractor,
        fn_constructor_kwargs={"dim": 32},
        batch_format="pyarrow",
        batch_size=8,
        concurrency=2,
    ).to_pandas()
    assert len(feats) == 20
    assert len(feats["feature"].iloc[0]) == 32
    # determinism: same payload → same features
    f2 = ImageFeatureExtractor(dim=32)(tbl.slice(0, 5))
    f1 = ImageFeatureExtractor(dim=32)(tbl.slice(0, 5))
    assert f1["feature"].to_pylist() == f2["feature"].to_pylist()


def test_media_resize_and_frames():
    tbl = make_fake_media_table(6)
    resized = ImageResizer(width=224, height=224)(tbl)
    assert set(resized["meta_width"].to_pylist()) == {224}
    frames = FrameSampler(num_frames=4)(tbl)
    assert frames.num_rows == 24
    assert set(frames["frame_idx"].to_pylist()) == {0, 1, 2, 3}


def test_media_real_decoder_raises_without_libs():
    """decoder='real' is import-guarded: in a container WITHOUT pillow
    it raises at construction; WITH pillow the real path runs (covered
    by the skip-marked tests below)."""
    import pytest

    from deduper_ray.stages.multimodal import _try_import_pil

    if _try_import_pil() is not None:
        pytest.skip("pillow available — guarded raise not applicable")
    with pytest.raises(NotImplementedError):
        ImageFeatureExtractor(decoder="real")


def test_media_real_image_path():
    """Real pillow decode path — skipped where pillow is absent."""
    import pytest

    pytest.importorskip("PIL")
    import io as _io

    from PIL import Image

    imgs = []
    for i in range(3):
        buf = _io.BytesIO()
        Image.new("RGB", (32, 32), color=(i * 40, 10, 200)).save(
            buf, format="PNG"
        )
        imgs.append(buf.getvalue())
    tbl = pa.table(
        {
            "media_id": pa.array(range(3), type=pa.int64()),
            "mime": pa.array(["image/png"] * 3),
            "payload": pa.array(imgs, type=pa.large_binary()),
            "meta_width": pa.array([32] * 3, type=pa.int32()),
            "meta_height": pa.array([32] * 3, type=pa.int32()),
            "meta_duration_ms": pa.array([0] * 3, type=pa.int32()),
        }
    )
    feats = ImageFeatureExtractor(dim=16, decoder="real")(tbl)
    assert len(feats["feature"][0].as_py()) == 16
    resized = ImageResizer(width=8, height=8, decoder="real")(tbl)
    assert set(resized["meta_width"].to_pylist()) == {8}
    out = Image.open(_io.BytesIO(resized["payload"][0].as_py()))
    assert out.size == (8, 8)


def test_media_real_frames_path():
    """Real ffmpeg frame extraction — skipped where ffmpeg is absent."""
    import pytest

    from deduper_ray.stages.multimodal import _find_ffmpeg

    if _find_ffmpeg() is None:
        pytest.skip("no ffmpeg on PATH")
    sampler = FrameSampler(num_frames=2, decoder="real")
    assert sampler._ffmpeg


def test_ivf_topk_matches_bruteforce_with_full_probes():
    """Probing every cell must reproduce exact brute-force ranking;
    partial probes on clustered data keep high recall."""
    import numpy as np

    from deduper_ray.stages.ann import brute_force_topk, ivf_topk

    rng = np.random.RandomState(9)
    centers = rng.standard_normal((8, 24)) * 3
    vecs = np.concatenate(
        [c + rng.standard_normal((40, 24)) for c in centers]
    ).astype(np.float32)
    n = len(vecs)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), type=pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.reshape(-1), type=pa.float32()), 24
            ),
        }
    )
    qids = np.array([0, 41, 100])
    qmat = vecs[qids].astype(np.float64)
    ds = rd.from_arrow(tbl)
    exact = brute_force_topk(ds, qids, qmat, k=10).to_pandas()
    full = ivf_topk(
        ds, qids, qmat, k=10, n_cells=16, n_probe=16, sample_mod=1
    ).to_pandas()
    import pandas.testing as pdt

    pdt.assert_frame_equal(exact, full)

    part = ivf_topk(
        ds, qids, qmat, k=10, n_cells=16, n_probe=4, sample_mod=1
    ).to_pandas()
    # recall@10 with 4/16 probes on well-separated clusters
    got = set(zip(part["query_id"], part["neighbor_id"]))
    want = set(zip(exact["query_id"], exact["neighbor_id"]))
    assert len(got & want) / len(want) >= 0.9


def test_ivf_index_persisted_matches_inline(tmp_path):
    """r3: the persisted IVF index (build once, read only probed cells)
    reproduces inline ivf_topk exactly — same deterministic centroids,
    same scoring — and full probes equal brute force."""
    import numpy as np

    from deduper_ray.stages.ann import (
        brute_force_topk,
        build_ivf_index,
        ivf_index_topk,
        ivf_topk,
    )

    rng = np.random.RandomState(4)
    centers = rng.standard_normal((6, 16)) * 3
    vecs = np.concatenate(
        [c + rng.standard_normal((50, 16)) for c in centers]
    ).astype(np.float32)
    n = len(vecs)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), type=pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.reshape(-1), type=pa.float32()), 16
            ),
        }
    )
    ds = rd.from_arrow(tbl).repartition(4)
    qids = np.array([0, 77, 222])
    qmat = vecs[qids].astype(np.float64)

    idx = str(tmp_path / "ivf")
    meta = build_ivf_index(
        ds, idx, n_cells=6, sample_mod=2, seed=7
    )
    assert meta["rows"] == n
    inline = ivf_topk(
        ds, qids, qmat, k=5, n_cells=6, n_probe=3, sample_mod=2, seed=7
    ).to_pandas()
    persisted = ivf_index_topk(idx, qids, qmat, k=5, n_probe=3).to_pandas()
    assert inline.values.tolist() == persisted.values.tolist()

    # full probes == exact brute force (ranking; scores may differ in
    # the last ulp from summation order)
    bf = brute_force_topk(ds, qids, qmat, k=5).to_pandas()
    full = ivf_index_topk(idx, qids, qmat, k=5, n_probe=6).to_pandas()
    cols = ["query_id", "neighbor_id"]
    assert bf[cols].values.tolist() == full[cols].values.tolist()
    assert np.allclose(bf["score"], full["score"], atol=1e-12)


def test_session_windows_bucketed_many_keys():
    """10^5 distinct keys, bucket backend: output matches a pandas
    oracle, and the per-bucket dispatch invariant holds — map_groups
    invokes the session fn once per distinct ``_bucket`` value, and
    _group_buckets assigns ≤ num_partitions distinct buckets, so
    #Python-dispatches = #buckets (16 here), not #keys (10^5)."""
    import numpy as np

    from deduper_ray.stages.relational import _group_buckets

    n_keys = 100_000
    rng = np.random.default_rng(7)
    keys = np.repeat(np.arange(n_keys, dtype=np.int64), 2)
    # per key: two events either within the gap (one session) or
    # beyond it (two sessions)
    gaps = rng.integers(1, 4000, size=n_keys)
    ts = np.zeros(2 * n_keys, dtype=np.int64)
    ts[1::2] = gaps * 1_000_000
    t = pa.table(
        {
            "user_id": pa.array(keys),
            "ts": pc.cast(pa.array(ts), pa.timestamp("us")),
        }
    )
    # dispatch invariant: every row's bucket id < nparts → map_groups
    # fires at most nparts session-fn calls for the whole table
    tagged = _group_buckets(t, ["user_id"], 16)
    n_buckets = len(pc.unique(tagged["_bucket"]))
    assert n_buckets <= 16
    out = (
        session_windows(
            rd.from_arrow(t), key="user_id", gap_sec=1800, num_partitions=16
        )
        .to_pandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    split = gaps > 1800
    assert len(out) == n_keys + split.sum()
    per_key = out.groupby("user_id").size()
    assert (per_key.loc[np.flatnonzero(split)] == 2).all()
    assert (per_key.loc[np.flatnonzero(~split)] == 1).all()
    one = out[out["user_id"] == 0]
    assert one["n_events"].sum() == 2
