"""HyperLogLog sketch tests: accuracy, mergeability, serialization."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from deduper_ray.functions.sketches import HyperLogLog, approx_distinct


def test_hll_accuracy():
    true_n = 50_000
    hll = HyperLogLog(p=12)
    hll.add_array(np.arange(true_n))
    est = hll.estimate()
    assert abs(est - true_n) / true_n < 0.05  # ~1.6% stderr at p=12


def test_hll_merge_equals_union():
    a, b = HyperLogLog(12), HyperLogLog(12)
    a.add_array(np.arange(0, 30_000))
    b.add_array(np.arange(20_000, 50_000))  # overlapping ranges
    merged = a.merge(b)
    both = HyperLogLog(12)
    both.add_array(np.arange(0, 50_000))
    assert np.array_equal(merged.registers, both.registers)


def test_hll_duplicates_dont_inflate():
    hll = HyperLogLog(12)
    for _ in range(5):
        hll.add_array(np.arange(1000))
    est = hll.estimate()
    assert abs(est - 1000) / 1000 < 0.05


def test_hll_serialize_roundtrip():
    hll = HyperLogLog(12)
    hll.add_array(np.arange(777))
    again = HyperLogLog.deserialize(hll.serialize())
    assert again.estimate() == hll.estimate()


def test_approx_distinct_dataset():
    n = 20_000
    ds = rd.from_arrow(
        pa.table({"v": pa.array(np.arange(n) % 5000, type=pa.int64())})
    ).repartition(8)
    est = approx_distinct(ds, "v")
    assert abs(est - 5000) / 5000 < 0.05
