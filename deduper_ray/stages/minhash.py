"""Shingling + MinHash signatures + SimHash fingerprints.

The reference engine's identity notion is exact MD5 equality
(Deduper.kt:201); the north rule generalizes it to NEAR-duplicate
identity. This stage turns each document into three narrow artifacts:

  minhash   fixed_size_list<uint64, K>  — K-permutation MinHash of the
                                          doc's k-shingle set
  simhash   uint64                      — 64-bit SimHash fingerprint
  n_shingles int64                      — |shingle set| (containment est)

Design notes (scale):
- Runs as an ACTOR POOL ``map_batches`` stage: the permutation
  coefficients (K×2 random 31-bit ints) and byte-power tables are
  built once per actor in ``__init__``, never per batch.
- All inner math is numpy over uint64 with wraparound — no Python
  loop over shingles; the only per-doc loop is the O(docs-per-batch)
  outer loop, each iteration fully vectorized.
- The wide ``content`` column is DROPPED here: everything downstream
  (banding, grouping, verification) moves ≤ ~1 KB/row no matter how
  large the documents are (SURVEY.md §4.2 "project narrow early").
- MinHash math: shingles are folded to 31 bits so that
  (a·x + b) mod p with p = 2^31-1 stays inside uint64 — the classic
  Broder-style construction (see PAPERS.md MinHash/LSH references).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MERSENNE31 = np.uint64((1 << 31) - 1)
_ROLL_MULT = np.uint64(1099511628211)  # FNV-ish odd multiplier


def shingle_hashes(data: bytes, k: int) -> np.ndarray:
    """Unique 64-bit rolling hashes of all k-byte shingles, vectorized:
    k shifted multiply-adds over the byte array (no per-shingle loop)."""
    b = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    n = b.size
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if n <= k:
        h = np.uint64(0)
        for v in b:
            h = h * _ROLL_MULT + v
        return np.array([h], dtype=np.uint64)
    m = n - k + 1
    h = np.zeros(m, dtype=np.uint64)
    for j in range(k):
        h = h * _ROLL_MULT + b[j : j + m]
    return np.unique(h)


def token_shingle_hashes(data: bytes, k: int, token_pattern) -> np.ndarray:
    """Unique hashes of k-grams of word tokens (BPE-ish regex tokens);
    the token stream is re-hashed with the same rolling scheme."""
    toks = token_pattern.findall(data)
    if not toks:
        return np.empty(0, dtype=np.uint64)
    th = np.fromiter(
        (hashless(t) for t in toks), dtype=np.uint64, count=len(toks)
    )
    if th.size <= k:
        h = np.uint64(0)
        for v in th:
            h = h * _ROLL_MULT + v
        return np.array([h], dtype=np.uint64)
    m = th.size - k + 1
    h = np.zeros(m, dtype=np.uint64)
    for j in range(k):
        h = h * _ROLL_MULT + th[j : j + m]
    return np.unique(h)


def hashless(token: bytes) -> int:
    """Stable 64-bit FNV-1a of a token (no Python hash() salt)."""
    h = 0xCBF29CE484222325
    for c in token:
        h = ((h ^ c) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


class MinHashSigner:
    """Actor-pool stage: (row_id, text) batches → (row_id, minhash,
    simhash, n_shingles) batches. Permutation state built once per actor.
    """

    def __init__(
        self,
        *,
        num_perms: int = 128,
        shingle_k: int = 8,
        seed: int = 42,
        text_column: str = "content",
        id_column: str = "row_id",
        use_token_shingles: bool = False,
        keep_columns: tuple[str, ...] = (),
    ):
        rng = np.random.RandomState(seed)
        # a ∈ [1, p), b ∈ [0, p) — 31-bit universal hashing coefficients
        self.a = rng.randint(1, int(MERSENNE31), size=num_perms).astype(np.uint64)
        self.b = rng.randint(0, int(MERSENNE31), size=num_perms).astype(np.uint64)
        self.k = shingle_k
        self.K = num_perms
        self.text_column = text_column
        self.id_column = id_column
        self.keep_columns = keep_columns
        self.bit_idx = np.arange(64, dtype=np.uint64)
        if use_token_shingles:
            import re

            self.token_pattern = re.compile(rb"[A-Za-z0-9_]+|[^\sA-Za-z0-9_]")
        else:
            self.token_pattern = None

    def _signature(self, sh: np.ndarray) -> np.ndarray:
        if sh.size == 0:
            return np.full(self.K, int(MERSENNE31), dtype=np.uint64)
        s31 = sh % MERSENNE31  # fold to 31 bits: products fit in uint64
        vals = (self.a[:, None] * s31[None, :] + self.b[:, None]) % MERSENNE31
        return vals.min(axis=1)

    def _simhash(self, sh: np.ndarray) -> np.uint64:
        if sh.size == 0:
            return np.uint64(0)
        bits = (sh[:, None] >> self.bit_idx[None, :]) & np.uint64(1)
        votes = bits.sum(axis=0, dtype=np.int64) * 2 - sh.size
        return np.uint64(
            ((votes > 0).astype(np.uint64) << self.bit_idx).sum(dtype=np.uint64)
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_column].to_pylist()
        n = len(texts)
        sigs = np.empty((n, self.K), dtype=np.uint64)
        simhashes = np.empty(n, dtype=np.uint64)
        n_shingles = np.empty(n, dtype=np.int64)
        for i, t in enumerate(texts):
            data = (t or "").encode("utf-8", "surrogatepass")
            if self.token_pattern is not None:
                sh = token_shingle_hashes(data, self.k, self.token_pattern)
            else:
                sh = shingle_hashes(data, self.k)
            sigs[i] = self._signature(sh)
            simhashes[i] = self._simhash(sh)
            n_shingles[i] = sh.size
        cols = {
            self.id_column: batch[self.id_column],
            # uint32: MinHash values are < 2^31 by construction (mod
            # Mersenne-31); half the bytes in the parquet checkpoint,
            # the LSH shuffle and the verify gather
            "minhash": pa.FixedSizeListArray.from_arrays(
                pa.array(sigs.reshape(-1).astype(np.uint32), type=pa.uint32()),
                self.K,
            ),
            "simhash": pa.array(simhashes, type=pa.uint64()),
            "n_shingles": pa.array(n_shingles, type=pa.int64()),
        }
        for c in self.keep_columns:
            cols[c] = batch[c]
        return pa.table(cols)


def exact_jaccard(a: bytes | str, b: bytes | str, k: int) -> float:
    """Brute-force k-shingle Jaccard — the test oracle for recall
    measurement (SURVEY.md §5.2c), also usable as a final verify."""
    if isinstance(a, str):
        a = a.encode("utf-8", "surrogatepass")
    if isinstance(b, str):
        b = b.encode("utf-8", "surrogatepass")
    sa = set(shingle_hashes(a, k).tolist())
    sb = set(shingle_hashes(b, k).tolist())
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)
