"""Exact-text verification mode + oracle-parity helpers.

Covers the round-2 oracle surface: verify_mode="exact" (pairs equal
the brute-force exact-Jaccard≥τ set when LSH recall is 1),
add_simhash_md5 (bit-exact vs an independent per-doc recompute), and
the high-recall hyperplane-LSH config (pairs equal brute-force
cosine≥τ).
"""

import hashlib
import os
import random

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from deduper_ray.config import NearDupConfig
from deduper_ray.pipelines.neardup import run_neardup
from deduper_ray.stages.minhash import exact_jaccard


def _corpus(n_groups: int = 8, variants: int = 3) -> list[str]:
    rnd = random.Random(11)
    texts = []
    alphabet = "abcdefghijklmnopqrstuvwxyz 0123456789"
    for g in range(n_groups):
        base = "".join(rnd.choice(alphabet) for _ in range(400))
        for v in range(variants):
            # small suffix edits → jaccard ≥ ~0.9 within a group
            texts.append(base + f" tail variant {v}")
    # unrelated singletons
    for s in range(6):
        texts.append("".join(rnd.choice(alphabet) for _ in range(400)))
    return texts


def test_exact_verify_matches_bruteforce(tmp_path):
    texts = _corpus()
    k, tau = 8, 0.7
    ds = rd.from_arrow(
        pa.table(
            {
                "row_id": pa.array(range(len(texts)), type=pa.int64()),
                "content": texts,
            }
        )
    )
    # collapse_identical=False: with collapse on, pairs are a
    # connectivity-preserving SUBSET (identity edges to the rep), so
    # full pairwise equality only holds without it; cluster equality
    # (checked below and by the driver oracle) holds either way
    cfg = NearDupConfig(
        shingle_k=k, num_perms=128, bands=32, threshold=tau,
        verify_mode="exact", collapse_identical=False,
    )
    res = run_neardup(ds, os.path.join(tmp_path, "nd"), cfg, resume=False)
    pairs = res.pairs().to_pandas()
    got = {
        (int(a), int(b))
        for a, b in zip(pairs["id_a"], pairs["id_b"])
    }
    want = set()
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            if exact_jaccard(texts[i], texts[j], k) >= tau:
                want.add((i, j))
    assert got == want
    # exact mode emits true jaccard ∈ [tau, 1]
    assert "jaccard" in pairs.columns
    assert (pairs["jaccard"] >= tau).all()
    # clusters = connected components of the exact pair graph
    cl = res.clusters().to_pandas()
    assert set(cl["row_id"]) == {i for p in want for i in p}


def test_simhash_md5_bit_exact():
    from deduper_ray.functions.text import add_simhash_md5

    texts = _corpus(3, 2) + ["", "short"]
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), type=pa.int64()),
         "text": texts}
    )
    out = add_simhash_md5(tbl, shingle_k=8)
    sims = out["simhash"].to_pylist()
    counts = out["n_shingles"].to_pylist()
    for i, s in enumerate(texts):
        data = s.encode()
        if len(data) <= 8:
            grams = {data} if data else set()
        else:
            grams = {data[j:j + 8] for j in range(len(data) - 7)}
        assert counts[i] == len(grams)
        if not grams:
            assert sims[i] == 0
            continue
        ones = [0] * 64
        for g in grams:
            hv = int.from_bytes(hashlib.md5(g).digest()[8:16], "little")
            for b in range(64):
                ones[b] += (hv >> b) & 1
        val = 0
        for b in range(64):
            if 2 * ones[b] > len(grams):
                val |= 1 << b
        # int64 bit-view
        if val >= 1 << 63:
            val -= 1 << 64
        assert sims[i] == val


def test_embedding_neardup_high_recall_matches_bruteforce():
    from deduper_ray.stages.ann import embedding_neardup

    rng = np.random.RandomState(3)
    centers = rng.standard_normal((6, 32))
    vecs = np.concatenate(
        [c + rng.standard_normal((8, 32)) * 0.35 for c in centers]
    )
    n = len(vecs)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), type=pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.reshape(-1).astype(np.float32),
                         type=pa.float32()), 32
            ),
        }
    )
    tau = 0.6
    got = embedding_neardup(
        rd.from_arrow(tbl), dim=32, cosine_threshold=tau,
        bits=256, bands=64, max_pairs_per_bucket=n * n,
    ).to_pandas()
    got_pairs = {(int(a), int(b)) for a, b in zip(got["id_a"], got["id_b"])}
    m = vecs.astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    want = {
        (i, j)
        for i in range(n) for j in range(i + 1, n)
        if sims[i, j] >= tau
    }
    assert want, "test data must contain pairs above the threshold"
    assert got_pairs == want


def test_embedding_neardup_hot_cluster_needs_allpairs_cap():
    """Round-5 regression (caught by the sf0.1 sweep): clustered
    embeddings concentrate in few 4-bit band buckets, so a FIXED
    per-bucket candidate cap silently truncates pairs once one
    cluster's C(m,2) exceeds it — embedding_neardup_pairs returned
    41/144 pairs at sf0.1 with the old hardcoded 200k cap. The
    oracle-checked wrapper now derives the cap from the table's
    all-pairs bound n(n-1)/2; this pins both halves: the all-pairs
    cap reaches exact brute-force parity on a hot cluster, and an
    undersized cap demonstrably drops pairs (fails loud here rather
    than silently at the next scale factor)."""
    from deduper_ray.stages.ann import embedding_neardup

    rng = np.random.RandomState(11)
    center = rng.standard_normal(16)
    m = 300  # one hot cluster: C(300,2) = 44,850 pairs in its buckets
    vecs = center + rng.standard_normal((m, 16)) * 0.05
    tbl = pa.table(
        {
            "vec_id": pa.array(range(m), type=pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.reshape(-1).astype(np.float32),
                         type=pa.float32()), 16
            ),
        }
    )
    tau = 0.9
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = norm @ norm.T
    want = {
        (i, j)
        for i in range(m) for j in range(i + 1, m)
        if sims[i, j] >= tau
    }
    assert len(want) > 10_000, "cluster must exceed any small fixed cap"

    full = embedding_neardup(
        rd.from_arrow(tbl), dim=16, cosine_threshold=tau,
        bits=256, bands=64, max_pairs_per_bucket=m * (m - 1) // 2,
    ).to_pandas()
    full_pairs = {(int(a), int(b))
                  for a, b in zip(full["id_a"], full["id_b"])}
    assert full_pairs == want

    capped = embedding_neardup(
        rd.from_arrow(tbl), dim=16, cosine_threshold=tau,
        bits=256, bands=64, max_pairs_per_bucket=500,
    ).to_pandas()
    assert len(capped) < len(want), (
        "undersized cap should visibly truncate on a hot cluster"
    )
