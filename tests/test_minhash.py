"""Unit tests: shingle/MinHash/SimHash/LSH math vs brute force
(SURVEY.md §5.2a)."""

import numpy as np
import pyarrow as pa

from deduper_ray.stages.lsh import BandExploder, band_keys
from deduper_ray.stages.minhash import (
    MinHashSigner,
    exact_jaccard,
    shingle_hashes,
)


def test_shingle_hashes_match_set_semantics():
    # same content → same shingle set; k-window count
    h1 = shingle_hashes(b"abcdefgh_abcdefgh", 4)
    h2 = shingle_hashes(b"abcdefgh_abcdefgh", 4)
    assert np.array_equal(h1, h2)
    # distinct 4-grams of "abcab" + dedup
    h = shingle_hashes(b"abcabcabc", 3)
    assert h.size == 3  # {abc, bca, cab}


def test_shingle_short_input():
    assert shingle_hashes(b"ab", 8).size == 1
    assert shingle_hashes(b"", 8).size == 0


def test_minhash_estimates_jaccard():
    rng = np.random.RandomState(0)
    base = "".join(rng.choice(list("abcdefgh "), 2000))
    # ~25% tail replaced → known-ish overlap
    other = base[:1500] + "".join(rng.choice(list("abcdefgh "), 500))
    true_j = exact_jaccard(base, other, 8)
    signer = MinHashSigner(num_perms=256, shingle_k=8, text_column="t", id_column="i")
    batch = pa.table({"i": [0, 1], "t": [base, other]})
    out = signer(batch)
    sigs = (
        out["minhash"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
        .reshape(2, 256)
    )
    est = (sigs[0] == sigs[1]).mean()
    assert abs(est - true_j) < 0.1, (est, true_j)


def test_identical_docs_identical_signature_and_simhash():
    signer = MinHashSigner(num_perms=64, shingle_k=8, text_column="t", id_column="i")
    out = signer(pa.table({"i": [0, 1], "t": ["same text " * 50] * 2}))
    sigs = (
        out["minhash"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
        .reshape(2, 64)
    )
    assert np.array_equal(sigs[0], sigs[1])
    assert out["simhash"][0].as_py() == out["simhash"][1].as_py()


def test_simhash_only_signer_matches_full_signer():
    """emit_minhash=False: identical simhash/n_shingles, no minhash
    column (the simhash_nd consumer contract)."""
    docs = ["alpha beta gamma " * 20, "alpha beta delta " * 20, "", "xy"]
    batch = pa.table({"i": list(range(len(docs))), "t": docs})
    full = MinHashSigner(num_perms=64, shingle_k=8, text_column="t", id_column="i")
    sim = MinHashSigner(
        num_perms=64, shingle_k=8, text_column="t", id_column="i",
        emit_minhash=False,
    )
    a, b = full(batch), sim(batch)
    assert b.schema.names == ["i", "simhash", "n_shingles"]
    assert a["simhash"].equals(b["simhash"])
    assert a["n_shingles"].equals(b["n_shingles"])


def test_simhash_votes_histogram_matches_bitloop():
    """The per-byte-histogram vote kernel equals the 64-pass bit loop
    on random segmented input (including 1-shingle segments)."""
    import deduper_ray.stages.minhash as mh

    rng = np.random.RandomState(7)
    sizes = np.array([1, 5, 300, 17, 1], dtype=np.int64)
    concat = rng.randint(0, 1 << 62, size=int(sizes.sum()), dtype=np.int64
                         ).astype(np.uint64)
    seg = np.zeros(sizes.size, dtype=np.int64)
    np.cumsum(sizes[:-1], out=seg[1:])
    fast = mh._simhash_votes(concat, sizes, seg, sizes)
    orig, mh._LITTLE_ENDIAN = mh._LITTLE_ENDIAN, False
    try:
        slow = mh._simhash_votes(concat, sizes, seg, sizes)
    finally:
        mh._LITTLE_ENDIAN = orig
    assert np.array_equal(fast, slow)


def test_simhash_hamming_tracks_similarity():
    rng = np.random.RandomState(1)
    base = "".join(rng.choice(list("abcdefghij "), 3000))
    near = base[:2800] + "".join(rng.choice(list("abcdefghij "), 200))
    far = "".join(rng.choice(list("klmnopqrst "), 3000))
    signer = MinHashSigner(num_perms=64, shingle_k=8, text_column="t", id_column="i")
    out = signer(pa.table({"i": [0, 1, 2], "t": [base, near, far]}))
    s = out["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
    ham = lambda a, b: bin(int(a) ^ int(b)).count("1")
    assert ham(s[0], s[1]) < ham(s[0], s[2])


def test_band_keys_deterministic_and_band_distinct():
    sigs = np.arange(256, dtype=np.uint64).reshape(2, 128)
    k1 = band_keys(sigs, 32)
    k2 = band_keys(sigs, 32)
    assert np.array_equal(k1, k2)
    assert k1.shape == (2, 32)
    # identical signatures → identical keys in every band
    same = np.vstack([sigs[0], sigs[0]])
    ks = band_keys(same, 32)
    assert np.array_equal(ks[0], ks[1])


def test_band_exploder_shapes():
    K, bands = 128, 32
    sig = np.arange(K, dtype=np.uint64)
    batch = pa.table(
        {
            "row_id": pa.array([7], type=pa.int64()),
            "minhash": pa.FixedSizeListArray.from_arrays(
                pa.array(sig, type=pa.uint64()), K
            ),
        }
    )
    out = BandExploder(bands=bands)(batch)
    assert out.num_rows == bands
    assert set(out["row_id"].to_pylist()) == {7}
    assert len(set(out["band_key"].to_pylist())) == bands


def test_exact_jaccard_bounds():
    assert exact_jaccard("hello world " * 10, "hello world " * 10, 8) == 1.0
    j = exact_jaccard("aaaaaaaaaaaa", "zzzzzzzzzzzz", 8)
    assert j == 0.0


def test_task_pool_signer_equals_actor_pool(tmp_path):
    """The default task-pool signatures path (make_signer_fn,
    per-process cache) must be bit-identical to the explicit
    actor-pool path."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from deduper_ray.stages.minhash import MinHashSigner, make_signer_fn

    rng = np.random.default_rng(1)
    texts = [
        "".join(chr(97 + int(c)) for c in rng.integers(0, 26, int(n)))
        for n in rng.integers(0, 300, 400)
    ]
    df = pd.DataFrame({"row_id": np.arange(400), "content": texts})
    kwargs = dict(
        num_perms=64, shingle_k=8, seed=7,
        text_column="content", id_column="row_id",
    )
    task = (
        rd.from_pandas(df).repartition(4)
        .map_batches(make_signer_fn(**kwargs), batch_format="pyarrow",
                     batch_size=128)
        .to_pandas().sort_values("row_id").reset_index(drop=True)
    )
    actor = (
        rd.from_pandas(df).repartition(4)
        .map_batches(MinHashSigner, fn_constructor_kwargs=kwargs,
                     batch_format="pyarrow", batch_size=128,
                     concurrency=2)
        .to_pandas().sort_values("row_id").reset_index(drop=True)
    )
    assert task["simhash"].tolist() == actor["simhash"].tolist()
    assert all(
        np.array_equal(a, b)
        for a, b in zip(task["minhash"], actor["minhash"])
    )


def test_batched_shingle_paths_bit_identical():
    """The whole-batch shingle fast path (_batch_shingle_concat), the
    batched list path (batch_shingle_hashes) and the original per-doc
    shingle_hashes agree bit-for-bit — signatures, simhash and
    n_shingles — across mixed doc lengths (incl. < k), in-doc repeats
    and empty docs, for both schemes and several k."""
    from deduper_ray.functions.hashing import _utf8_slices
    from deduper_ray.stages import minhash as mh

    rng = np.random.RandomState(7)
    docs = [
        "".join(rng.choice(list("abc"), size=rng.randint(0, 40)))
        for _ in range(200)
    ]
    cases = [
        pa.table({"i": pa.array(range(200), type=pa.int64()),
                  "t": pa.array(docs)}),
        pa.table({"i": pa.array(range(200), type=pa.int64()),
                  "t": pa.array([d * 3 for d in docs])}),
        pa.table({"i": pa.array(range(5), type=pa.int64()),
                  "t": pa.array(["", "ab", "abcdefgh", "abcdefghi",
                                 "zzzzzzzzzzzz"])}),
        pa.table({"i": pa.array([], type=pa.int64()),
                  "t": pa.array([], type=pa.string())}),
        pa.table({"i": pa.array([0, 1], type=pa.int64()),
                  "t": pa.array(["", ""])}),
    ]
    for k in (2, 8, 9):
        for tbl in cases:
            off, buf = _utf8_slices(tbl["t"])
            off = np.asarray(off, dtype=np.int64)
            per_doc = [
                mh.shingle_hashes(buf[a:b], k)
                for a, b in zip(off, off[1:])
            ]
            listed = mh.batch_shingle_hashes(off, buf, k)
            assert all(
                np.array_equal(x, y) for x, y in zip(per_doc, listed)
            )
            fast = mh._batch_shingle_concat(off, buf, k)
            if fast is not None:
                concat, sizes = fast
                assert sizes.tolist() == [x.size for x in per_doc]
                assert np.array_equal(
                    concat,
                    np.concatenate(per_doc)
                    if per_doc
                    else np.empty(0, dtype=np.uint64),
                )
        for scheme in ("oph", "classic"):
            signer = mh.MinHashSigner(
                num_perms=64, shingle_k=k, scheme=scheme,
                text_column="t", id_column="i",
            )
            for tbl in cases:
                out_fast = signer(tbl)
                orig = mh._batch_shingle_concat
                mh._batch_shingle_concat = lambda *a, **kw: None
                try:
                    out_list = signer(tbl)
                finally:
                    mh._batch_shingle_concat = orig
                assert out_fast.equals(out_list)


def test_rolling_hashes_match_horner():
    from deduper_ray.stages import minhash as mh

    rng = np.random.RandomState(0)
    b = rng.randint(0, 256, size=3000).astype(np.uint64)
    for k in (1, 2, 3, 5, 8, 13, 16):
        m = b.size - k + 1
        ref = np.zeros(m, dtype=np.uint64)
        for j in range(k):
            ref = ref * mh._ROLL_MULT + b[j : j + m]
        assert np.array_equal(ref, mh._rolling_hashes(b, k))
