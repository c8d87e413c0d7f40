"""Bloom filter: no false negatives, bounded false positives, and the
bloom-mode seen-hash marker."""

import hashlib

import numpy as np
import pyarrow as pa

from deduper_ray.functions.bloom import BloomFilter
from deduper_ray.stages.seen import SEEN_FLAG


def _hexes(start: int, n: int) -> list[str]:
    return [hashlib.md5(str(i).encode()).hexdigest().upper() for i in range(start, start + n)]


def test_no_false_negatives():
    added = _hexes(0, 20_000)
    bf = BloomFilter(capacity=20_000, fp_rate=0.001)
    bf.add_hex(added)
    assert bf.contains_hex(added).all()


def test_false_positive_rate_bounded():
    bf = BloomFilter(capacity=20_000, fp_rate=0.001)
    bf.add_hex(_hexes(0, 20_000))
    probes = _hexes(1_000_000, 50_000)  # disjoint
    fp = bf.contains_hex(probes).mean()
    assert fp < 0.005, fp  # 5× the target rate as a loose bound


def test_empty_and_small():
    bf = BloomFilter(capacity=1, fp_rate=0.01)
    assert bf.contains_hex([]).size == 0
    bf.add_hex(_hexes(5, 1))
    assert bf.contains_hex(_hexes(5, 1)).all()


def test_seen_marker_bloom_mode():
    import ray

    seen = _hexes(0, 500)
    unseen = _hexes(10_000, 500)
    seen_ref = ray.put(pa.array(seen, type=pa.string()))
    from deduper_ray.stages.seen import SeenHashMarker

    marker = SeenHashMarker(seen_ref, hash_col="row_md5", mode="bloom")
    batch = pa.table({"row_md5": pa.array(seen + unseen, type=pa.string())})
    out = marker(batch)
    flags = np.asarray(out[SEEN_FLAG].to_pylist())
    assert flags[:500].all()  # no false negatives
    assert flags[500:].mean() < 0.02  # few false positives
