"""Shuffle dedup strategy equivalence, token shingles, property tests."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from deduper_ray.config import DedupeConfig
from deduper_ray.functions.hashing import md5_hex_array, stringify_columns
from deduper_ray.pipelines.exact_dedupe import dedupe
from deduper_ray.stages.minhash import MinHashSigner, shingle_hashes
from tests.fixtures import RE_HASH_KEYS, make_real_estate


def test_shuffle_strategy_same_target(tmp_path):
    src = str(tmp_path / "re.parquet")
    make_real_estate(src)
    r1 = dedupe(
        DedupeConfig(source=src, hash_keys=RE_HASH_KEYS,
                     target_path=str(tmp_path / "bc"))
    )
    r2 = dedupe(
        DedupeConfig(source=src, hash_keys=RE_HASH_KEYS,
                     target_path=str(tmp_path / "sh"),
                     dedupe_strategy="shuffle")
    )
    assert r1.dupe_count == r2.dupe_count == 4
    t1 = pq.read_table(str(tmp_path / "bc")).sort_by("row_id")
    t2 = pq.read_table(str(tmp_path / "sh")).sort_by("row_id")
    assert t1["row_id"].to_pylist() == t2["row_id"].to_pylist()
    assert t1["street"].to_pylist() == t2["street"].to_pylist()


def test_token_shingles_rename_insensitive():
    # token shingles see identifier RENAMES as bigger edits than char
    # shingles see whitespace noise — both must cluster trivial clones
    base = "def f(a, b):\n    return a + b\n" * 20
    spaced = base.replace("    ", "\t")  # whitespace-only change
    signer_tok = MinHashSigner(
        num_perms=128, shingle_k=3, text_column="t", id_column="i",
        use_token_shingles=True,
    )
    out = signer_tok(pa.table({"i": [0, 1], "t": [base, spaced]}))
    sigs = (
        out["minhash"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
        .reshape(2, 128)
    )
    est = (sigs[0] == sigs[1]).mean()
    assert est > 0.9  # token stream identical except whitespace tokens


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=0, max_size=300), st.integers(min_value=2, max_value=12))
def test_shingle_hashes_properties(data, k):
    h = shingle_hashes(data, k)
    # deterministic
    assert np.array_equal(h, shingle_hashes(data, k))
    # sorted unique
    assert np.all(np.diff(h.astype(np.int64)) != 0) if h.size > 1 else True
    assert np.array_equal(h, np.unique(h))
    # count bound: at most max(1, len-k+1) distinct shingles
    if len(data) == 0:
        assert h.size == 0
    else:
        assert 1 <= h.size <= max(1, len(data) - k + 1)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.one_of(st.text(max_size=12), st.none()), min_size=1, max_size=8
    )
)
def test_stringify_md5_total_function(values):
    # any mix of strings/nulls stringifies and hashes without error, and
    # equal inputs give equal hashes
    t = pa.table({"c": pa.array(values, type=pa.string())})
    joined = stringify_columns(t, ("c",))
    h1 = md5_hex_array(joined)
    h2 = md5_hex_array(stringify_columns(t, ("c",)))
    assert h1.to_pylist() == h2.to_pylist()
    assert all(len(x) == 32 and x.upper() == x for x in h1.to_pylist())


@given(
    st.lists(
        st.text(min_size=0, max_size=60), min_size=1, max_size=50
    ),
    st.booleans(),
)
@settings(max_examples=60, deadline=None)
def test_buffer_digests_match_hashlib(texts, large):
    """r3: the buffer-offset digest loops (md5/sha256/fingerprint64)
    must equal per-string hashlib over arbitrary unicode, for both
    string and large_string arrays, including sliced (offset) arrays."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    from deduper_ray.functions.hashing import (
        fingerprint64,
        md5_hex_array,
        sha256_hex_array,
    )

    typ = pa.large_string() if large else pa.string()
    arr = pa.array(texts, type=typ)
    # exercise a non-zero array offset too
    for a in (arr, arr.slice(len(texts) // 2)):
        vals = a.to_pylist()
        exp_md5 = [
            hashlib.md5(t.encode("utf-8")).hexdigest().upper() for t in vals
        ]
        exp_sha = [
            hashlib.sha256(t.encode("utf-8")).hexdigest() for t in vals
        ]
        exp_fp = [
            int.from_bytes(
                hashlib.md5(t.encode("utf-8")).digest()[:8], "big"
            )
            for t in vals
        ]
        assert md5_hex_array(a).to_pylist() == exp_md5
        assert sha256_hex_array(a).to_pylist() == exp_sha
        assert [int(x) for x in fingerprint64(a).to_pylist()] == exp_fp
