"""Mergeable sketches — approximate aggregates over Datasets.

The reference has no sketch/approx operators (SURVEY.md §2.5
"Sketches"); MinHash/SimHash live in stages/minhash.py. This module
adds HyperLogLog approximate distinct-count in the canonical Ray
shape: one sketch PARTIAL per batch inside map_batches (each partial
is a 2^p-byte register array), merged associatively on the driver —
the shuffle carries #batches rows, not #values
(ray_guide "Aggregation at scale": sketches are designed to be
mergeable).

HLL per Flajolet et al. 2007 (+ small-range linear counting
correction). p=12 → 4096 registers → ~1.6% standard error.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd


class HyperLogLog:
    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 12, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = (
            registers
            if registers is not None
            else np.zeros(self.m, dtype=np.uint8)
        )

    @staticmethod
    def _hash64(values: list) -> np.ndarray:
        """Stable 64-bit hashes (md5-derived — no process-salted hash())."""
        return np.fromiter(
            (
                int.from_bytes(
                    hashlib.md5(str(v).encode("utf-8", "surrogatepass")).digest()[:8],
                    "big",
                )
                for v in values
            ),
            dtype=np.uint64,
            count=len(values),
        )

    def add_array(self, arr: pa.Array | pa.ChunkedArray | np.ndarray) -> None:
        if isinstance(arr, (pa.Array, pa.ChunkedArray)):
            values = arr.drop_null().to_pylist()
        else:
            values = list(arr)
        if not values:
            return
        h = self._hash64(values)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h << np.uint64(self.p)  # remaining 64-p bits, left-aligned
        # rank = position of leftmost 1-bit in rest (1-based), capped
        nbits = 64 - self.p
        lz = np.full(h.size, nbits, dtype=np.uint8)
        found = np.zeros(h.size, dtype=bool)
        for bit in range(nbits):
            mask = ~found & (
                (rest >> np.uint64(63 - bit)) & np.uint64(1) == 1
            )
            lz[mask] = bit
            found |= mask
        rank = (lz + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if other.p != self.p:
            raise ValueError("cannot merge HLLs of different precision")
        return HyperLogLog(
            self.p, np.maximum(self.registers, other.registers)
        )

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        inv_sum = np.sum(2.0 ** -self.registers.astype(np.float64))
        raw = alpha * m * m / inv_sum
        zeros = int(np.count_nonzero(self.registers == 0))
        if raw <= 2.5 * m and zeros:
            return m * np.log(m / zeros)  # linear counting
        return raw

    def serialize(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def deserialize(cls, data: bytes) -> "HyperLogLog":
        p = data[0]
        return cls(p, np.frombuffer(data[1:], dtype=np.uint8).copy())


def approx_distinct(
    ds: rd.Dataset, column: str, *, p: int = 12
) -> float:
    """Distributed approximate distinct count: HLL partial per batch
    (map_batches), merge on the driver."""

    def _partial(t: pa.Table) -> pa.Table:
        hll = HyperLogLog(p)
        hll.add_array(t[column])
        return pa.table(
            {"sketch": pa.array([hll.serialize()], type=pa.binary())}
        )

    from deduper_ray.functions.util import dataset_to_table

    partials = dataset_to_table(
        ds.map_batches(_partial, batch_format="pyarrow")
    )
    merged = HyperLogLog(p)
    for s in partials["sketch"].to_pylist():
        merged = merged.merge(HyperLogLog.deserialize(s))
    return merged.estimate()
