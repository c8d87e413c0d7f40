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


class KLLSketch:
    """Mergeable streaming quantile sketch (KLL-style, Karnin-Lang-
    Liberty 2016 family): level i holds items of weight 2^i; a level
    past ``k`` items compacts — sort, keep alternating items from a
    seeded offset, promote to level i+1. One pass per block, merges by
    buffer concatenation + re-compaction — the shape a 100-TB
    reduction needs (each block sketches independently, partials merge
    associatively on the driver or in a tree).

    Rank error: this fixed-capacity-per-level variant guarantees
    |est_rank - true_rank| ≤ n · eps with eps ≈ 1.5 · levels / k
    (each compaction at level i perturbs ranks by ≤ 2^i/2 and level i
    compacts ≤ n/(k·2^i) times → total ≤ n·levels/(2k) per side;
    the 1.5 factor covers merge-time re-compaction). Determinism: the
    alternation offset comes from a counter-seeded RNG, so identical
    input order → identical sketch; Ray block order varies, so treat
    estimates as reproducible only for a fixed merge order (the test
    asserts the BOUND, not a byte-identical sketch).
    """

    __slots__ = ("k", "seed", "levels", "n", "_compactions")

    def __init__(self, k: int = 256, seed: int = 1):
        self.k = int(k)
        self.seed = int(seed)
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0
        self._compactions = 0

    def update_many(self, values: np.ndarray) -> "KLLSketch":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return self
        self.n += int(v.size)
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compact()
        return self

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for i, buf in enumerate(other.levels):
            if buf.size:
                self.levels[i] = np.concatenate([self.levels[i], buf])
        self.n += other.n
        self._compact()
        return self

    def _compact(self) -> None:
        i = 0
        while i < len(self.levels):
            buf = self.levels[i]
            if buf.size > self.k:
                buf = np.sort(buf)
                rng = np.random.RandomState(
                    (self.seed * 0x9E3779B1 + self._compactions) & 0x7FFFFFFF
                )
                self._compactions += 1
                off = int(rng.randint(2))
                promoted = buf[off::2]
                self.levels[i] = np.empty(0, dtype=np.float64)
                if i + 1 == len(self.levels):
                    self.levels.append(np.empty(0, dtype=np.float64))
                self.levels[i + 1] = np.concatenate(
                    [self.levels[i + 1], promoted]
                )
            i += 1

    def quantile(self, q: float) -> float:
        """Weighted-rank select: the smallest retained item whose
        cumulative weight reaches ceil(q·n)."""
        items, weights = [], []
        for i, buf in enumerate(self.levels):
            if buf.size:
                items.append(buf)
                weights.append(np.full(buf.size, 1 << i, dtype=np.int64))
        if not items:
            raise ValueError("empty sketch")
        x = np.concatenate(items)
        w = np.concatenate(weights)
        order = np.argsort(x, kind="stable")
        x, w = x[order], w[order]
        cum = np.cumsum(w)
        target = max(1, int(np.ceil(q * cum[-1])))
        return float(x[np.searchsorted(cum, target, side="left")])

    @property
    def eps(self) -> float:
        return 1.5 * max(1, len(self.levels)) / self.k

    def serialize(self) -> bytes:
        import pickle

        return pickle.dumps(
            {
                "k": self.k, "seed": self.seed, "n": self.n,
                "c": self._compactions, "levels": self.levels,
            }
        )

    @classmethod
    def deserialize(cls, data: bytes) -> "KLLSketch":
        import pickle

        d = pickle.loads(data)
        s = cls(k=d["k"], seed=d["seed"])
        s.n = d["n"]
        s._compactions = d["c"]
        s.levels = d["levels"]
        return s


def approx_quantiles(
    ds, value_column: str, quantiles: list[float], *, k: int = 256,
    seed: int = 1,
):
    """Distributed approximate quantiles: one KLL partial per block
    (serialized through Arrow), merged on the driver. Returns
    (estimates list, merged sketch)."""
    import ray.data as rd  # noqa: F401 — type context

    def _partial(t: pa.Table) -> pa.Table:
        s = KLLSketch(k=k, seed=seed)
        s.update_many(
            t[value_column].to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {"sketch": pa.array([s.serialize()], type=pa.large_binary())}
        )

    merged = KLLSketch(k=k, seed=seed)
    for b in ds.map_batches(_partial, batch_format="pyarrow").iter_batches(
        batch_size=None, batch_format="pyarrow"
    ):
        for raw in b["sketch"]:
            merged.merge(KLLSketch.deserialize(raw.as_py()))
    return [merged.quantile(q) for q in quantiles], merged


def grouped_approx_quantiles(
    ds,
    *,
    key: str,
    value_column: str,
    quantiles: list[float],
    k: int = 256,
    seed: int = 1,
):
    """Per-group approximate quantiles in ONE pass: each block builds a
    KLL partial PER KEY it contains (vectorized split via np.unique),
    partials merge by key on the driver. Driver state is
    O(#keys × k) floats — the runscan-style moderate-key-cardinality
    regime; for corpus-scale key cardinality hash-bucket the rows by
    key and run this per bucket. Returns a pandas DataFrame
    (key, n, q<pct>..., eps)."""
    import pandas as pd

    def _partial(t: pa.Table) -> pa.Table:
        kv = t[key].to_numpy(zero_copy_only=False)
        vv = t[value_column].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(kv, return_inverse=True)
        keys_out, blobs = [], []
        for i, kk in enumerate(uniq):
            s = KLLSketch(k=k, seed=seed)
            s.update_many(vv[inv == i])
            keys_out.append(kk)
            blobs.append(s.serialize())
        return pa.table(
            {
                "key": pa.array([str(x) for x in keys_out]),
                "sketch": pa.array(blobs, type=pa.large_binary()),
            }
        )

    merged: dict[str, KLLSketch] = {}
    for b in ds.map_batches(_partial, batch_format="pyarrow").iter_batches(
        batch_size=None, batch_format="pyarrow"
    ):
        for kk, raw in zip(b["key"].to_pylist(), b["sketch"].to_pylist()):
            s = KLLSketch.deserialize(raw)
            if kk in merged:
                merged[kk].merge(s)
            else:
                merged[kk] = s
    rows = []
    for kk in sorted(merged):
        s = merged[kk]
        row = {"key": kk, "n": s.n, "eps": s.eps}
        for q in quantiles:
            row[f"q{int(round(q * 100))}"] = s.quantile(q)
        rows.append(row)
    return pd.DataFrame(rows)
