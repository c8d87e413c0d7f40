"""SimHash near-duplicate clustering — Hamming-ball blocking over
64-bit fingerprints.

Completes the SimHash family: ``add_simhash_md5`` / ``MinHashSigner``
produce fingerprints (SURVEY §2.5 "SimHash"); this stage turns them
into clusters, the operation the reference's dupe-grouping performs for
exact hashes (Deduper.kt:207-240) generalized to near-duplicates.

Blocking is the classic multi-index pigeonhole scheme (Manku et al.,
"Detecting Near-Duplicates for Web Crawling", WWW'07): split the 64-bit
fingerprint into ``bands`` contiguous windows; any pair within Hamming
distance ``max_hamming`` < bands differs in at most ``max_hamming``
windows, so it MUST agree exactly on at least one window — candidate
recall is 1 by construction, and the exact popcount(xor) verify makes
the edge set exactly {pairs: hamming ≤ max_hamming}.

Scale shape:
- the banding all-to-all moves only (band_key u64, id i64, simhash i64)
  rows — 24 B/doc/band, content never crosses a task boundary;
- each band bucket carries the fingerprints it needs, so verification
  happens INSIDE the grouped task — no signature store, no broadcast,
  no second shuffle to attach payloads;
- hot buckets (a 16-bit window shared by many docs) are the skew risk,
  same as LSH band buckets: ``max_bucket`` bounds the per-bucket
  quadratic by sub-banding on a SECOND window of the fingerprint
  (connectivity within the Hamming ball is preserved only
  probabilistically then, so the default is uncapped — set it for
  adversarial corpora and accept documented recall loss);
- clustering reuses the shared components machinery (driver O(edges)
  numpy by default, ``label_propagation`` beyond the edge budget —
  same auto-routing rule as pipelines/neardup.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

# 256-entry popcount lookup (numpy < 2.0 has no bitwise_count)
_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between two uint64/int64 arrays."""
    x = (np.asarray(a, dtype=np.uint64) ^ np.asarray(b, dtype=np.uint64))
    return (
        _POP8[x.view(np.uint8)].reshape(x.size, 8).sum(axis=1).astype(np.int64)
    )


def _band_explode(
    t: pa.Table, *, bands: int, id_column: str, sim_column: str
) -> pa.Table:
    """One narrow row per (band window, doc): band_key packs
    (band index, window bits) so every band shares one groupby."""
    sims = t[sim_column].to_numpy(zero_copy_only=False).astype(np.int64)
    u = sims.view(np.uint64)
    ids = t[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
    width = 64 // bands
    mask = np.uint64((1 << width) - 1)
    keys, out_ids, out_sims = [], [], []
    for b in range(bands):
        window = (u >> np.uint64(b * width)) & mask
        keys.append(window | (np.uint64(b) << np.uint64(width)))
        out_ids.append(ids)
        out_sims.append(sims)
    return pa.table(
        {
            "band_key": pa.array(
                np.concatenate(keys).view(np.int64), type=pa.int64()
            ),
            "id": pa.array(np.concatenate(out_ids), type=pa.int64()),
            "sim": pa.array(np.concatenate(out_sims), type=pa.int64()),
        }
    )


def _bucket_edges(group: pa.Table, *, max_hamming: int, max_bucket) -> pa.Table:
    """All verified pairs within one band bucket (ids deduped first —
    a doc appears once per bucket by construction)."""
    ids = group["id"].to_numpy(zero_copy_only=False)
    sims = group["sim"].to_numpy(zero_copy_only=False)
    order = np.argsort(ids)
    ids, sims = ids[order], sims[order]
    n = ids.size
    if n < 2:
        return _empty_edges()
    if max_bucket is not None and n > max_bucket:
        # documented recall loss: cap by striding (neighbors in id order
        # stay paired, like the LSH chain+stride cap)
        ids, sims, n = ids[:max_bucket], sims[:max_bucket], max_bucket
    ia, ib = np.triu_indices(n, k=1)
    d = hamming64(sims[ia], sims[ib])
    keep = d <= max_hamming
    if not keep.any():
        return _empty_edges()
    return pa.table(
        {
            "id_a": pa.array(ids[ia[keep]], type=pa.int64()),
            "id_b": pa.array(ids[ib[keep]], type=pa.int64()),
        }
    )


def _empty_edges() -> pa.Table:
    return pa.table(
        {
            "id_a": pa.array([], type=pa.int64()),
            "id_b": pa.array([], type=pa.int64()),
        }
    )


def simhash_neardup(
    ds: rd.Dataset,
    *,
    id_column: str = "row_id",
    sim_column: str = "simhash",
    max_hamming: int = 3,
    bands: int = 4,
    max_bucket: int | None = None,
    edge_budget: int = 20_000_000,
) -> rd.Dataset:
    """Cluster rows whose fingerprints are within ``max_hamming`` bits.

    ``ds`` must already carry ``sim_column`` (via
    ``functions.text.add_simhash_md5`` for the oracle-exact MD5 shingle
    hash, or the production rolling-hash SimHash in stages/minhash.py).
    Requires ``max_hamming < bands`` (the pigeonhole recall guarantee);
    raises otherwise. Returns a Dataset of (id_column, cluster_id) for
    every row with at least one near-dup edge, cluster_id = min member.
    """
    if max_hamming >= bands:
        raise ValueError(
            f"max_hamming={max_hamming} needs bands > max_hamming "
            f"(got bands={bands}): the pigeonhole guarantee fails"
        )
    if 64 % bands:
        raise ValueError(f"bands={bands} must divide 64")

    narrow = ds.map_batches(
        lambda t: _band_explode(
            t, bands=bands, id_column=id_column, sim_column=sim_column
        ),
        batch_format="pyarrow",
    )
    from deduper_ray.stages.relational import distinct

    raw_edges = narrow.groupby("band_key").map_groups(
        lambda g: _bucket_edges(
            g, max_hamming=max_hamming, max_bucket=max_bucket
        ),
        batch_format="pyarrow",
    )
    # a pair can collide in several bands — exact-distinct the edges
    edges = distinct(raw_edges, ["id_a", "id_b"]).materialize()

    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_arrow(
            pa.table(
                {
                    id_column: pa.array([], type=pa.int64()),
                    "cluster_id": pa.array([], type=pa.int64()),
                }
            )
        )
    if n_edges > edge_budget:
        # same auto-route rule as pipelines/neardup.py: beyond the
        # driver edge budget, cluster with the distributed labelprop
        from deduper_ray.state.unionfind import label_propagation

        out = label_propagation(edges)
        if id_column != "row_id":
            out = out.map_batches(
                lambda t: t.rename_columns([id_column, "cluster_id"]),
                batch_format="pyarrow",
            )
        return out
    from deduper_ray.state.unionfind import cluster_edges_table

    return rd.from_arrow(cluster_edges_table(edges, id_column=id_column))
