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


def test_kll_rank_error_bound_and_merge():
    """r3: KLL quantile sketch — rank error within eps after heavy
    compaction; merge(a, b) ≈ sketch(a ∪ b); serde round-trips."""
    import numpy as np

    from deduper_ray.functions.sketches import KLLSketch

    rng = np.random.RandomState(8)
    data = np.concatenate(
        [rng.standard_normal(60000) * 5, rng.exponential(2.0, 40000)]
    )
    s = KLLSketch(k=200, seed=3)
    for chunk in np.array_split(data, 37):
        s.update_many(chunk)
    srt = np.sort(data)
    n = len(data)
    for q in (0.01, 0.25, 0.5, 0.9, 0.99):
        est = s.quantile(q)
        rank = np.searchsorted(srt, est, side="right")
        assert abs(rank / n - q) <= s.eps + 1e-9, (q, rank / n, s.eps)

    # mergeability
    a, b = KLLSketch(k=200, seed=3), KLLSketch(k=200, seed=4)
    a.update_many(data[: n // 2])
    b.update_many(data[n // 2 :])
    a.merge(b)
    assert a.n == n
    est = a.quantile(0.5)
    rank = np.searchsorted(srt, est, side="right")
    assert abs(rank / n - 0.5) <= a.eps + 1e-9

    # serde
    r = KLLSketch.deserialize(s.serialize())
    assert r.quantile(0.5) == s.quantile(0.5)


def test_approx_quantiles_distributed():
    """r3: per-block KLL partials merged on the driver stay within the
    sketch's rank-error bound on a multi-block Dataset."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from deduper_ray.functions.sketches import approx_quantiles

    rng = np.random.RandomState(9)
    vals = rng.gamma(3.0, 10.0, 50000)
    ds = rd.from_arrow(pa.table({"v": vals})).repartition(16)
    ests, sketch = approx_quantiles(ds, "v", [0.1, 0.5, 0.95], k=256)
    srt = np.sort(vals)
    for q, est in zip((0.1, 0.5, 0.95), ests):
        rank = np.searchsorted(srt, est, side="right")
        assert abs(rank / len(vals) - q) <= sketch.eps + 1e-9


def test_grouped_approx_quantiles_within_bound():
    """r3: per-key KLL partials merged across blocks stay within eps of
    each group's exact quantiles."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from deduper_ray.functions.sketches import grouped_approx_quantiles

    rng = np.random.RandomState(12)
    n = 60000
    keys = rng.choice(["a", "b", "c"], n)
    vals = np.where(
        keys == "a", rng.standard_normal(n) * 4, rng.exponential(3.0, n)
    )
    ds = rd.from_arrow(
        pa.table({"k": pa.array(keys), "v": pa.array(vals)})
    ).repartition(12)
    out = grouped_approx_quantiles(
        ds, key="k", value_column="v", quantiles=[0.25, 0.9], k=256
    ).set_index("key")
    import pandas as pd

    df = pd.DataFrame({"k": keys, "v": vals})
    for kk, g in df.groupby("k"):
        srt = np.sort(g["v"].to_numpy())
        eps = out.loc[kk, "eps"]
        assert out.loc[kk, "n"] == len(srt)
        for q, col in ((0.25, "q25"), (0.9, "q90")):
            est = out.loc[kk, col]
            rank = np.searchsorted(srt, est, side="right")
            assert abs(rank / len(srt) - q) <= eps + 1e-9, (kk, col)
