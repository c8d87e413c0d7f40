"""Bloom filter — approximate membership for broadcast semi/anti-joins.

When the seen-hash set (SURVEY S3) outgrows a comfortable broadcast
(~10^9 hashes × 32 B ≈ 32 GB as raw strings), a Bloom filter carries
the same membership test in m/8 bytes with a tunable false-positive
rate (ray_guide "Semi / anti join: broadcast the key set (or a Bloom
filter of it)").

Semantics caveat, stated loudly: false positives mark NEVER-SEEN rows
as seen (they are dropped as dupes). That is an approximation the
exact reference semantics do not allow — so this is an opt-in scale
mode (``SeenHashMarker(mode="bloom")``), default off, with the FP rate
chosen at build time.

Construction: double hashing (Kirsch–Mitzenmacher) over two 64-bit
halves of the MD5 the engine already computes — g_i(x) = h1 + i·h2
(mod m) — vectorized with numpy, no per-key Python in add or query.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa


class BloomFilter:
    __slots__ = ("m", "k", "bits")

    def __init__(self, capacity: int, fp_rate: float = 0.001,
                 bits: np.ndarray | None = None, k: int | None = None,
                 m: int | None = None):
        if bits is not None:
            self.bits = bits
            self.m = m if m is not None else bits.size * 8
            self.k = k if k is not None else 7
            return
        m_exact = -capacity * math.log(fp_rate) / (math.log(2) ** 2)
        self.m = max(64, 1 << int(math.ceil(math.log2(m_exact))))
        self.k = max(1, round(self.m / max(1, capacity) * math.log(2)))
        self.bits = np.zeros(self.m // 8, dtype=np.uint8)

    @staticmethod
    def _h1_h2(hashes_hex: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """Two independent 64-bit values from the 128-bit MD5 hex the
        engine already carries (no re-hashing)."""
        h1 = np.fromiter(
            (int(h[:16], 16) for h in hashes_hex), dtype=np.uint64,
            count=len(hashes_hex),
        )
        h2 = np.fromiter(
            (int(h[16:32], 16) for h in hashes_hex), dtype=np.uint64,
            count=len(hashes_hex),
        )
        return h1, h2 | np.uint64(1)  # odd h2 → full-cycle stride

    def _positions(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        mask = np.uint64(self.m - 1)  # m is a power of two
        idx = np.empty((self.k, h1.size), dtype=np.uint64)
        for i in range(self.k):
            idx[i] = (h1 + np.uint64(i) * h2) & mask
        return idx

    def add_hex(self, hashes_hex: list[str]) -> None:
        if not hashes_hex:
            return
        h1, h2 = self._h1_h2(hashes_hex)
        pos = self._positions(h1, h2).reshape(-1)
        np.bitwise_or.at(
            self.bits, (pos >> np.uint64(3)).astype(np.int64),
            (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)),
        )

    def contains_hex(self, hashes_hex: list[str]) -> np.ndarray:
        if not hashes_hex:
            return np.zeros(0, dtype=bool)
        h1, h2 = self._h1_h2(hashes_hex)
        pos = self._positions(h1, h2)  # (k, n)
        byte_idx = (pos >> np.uint64(3)).astype(np.int64)
        bit = (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
        hit = (self.bits[byte_idx] & bit) != 0
        return hit.all(axis=0)

    def contains_arrow(self, arr: pa.Array | pa.ChunkedArray) -> pa.Array:
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        return pa.array(self.contains_hex(arr.to_pylist()))
