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
- hot buckets (a 16-bit window shared by many docs — SimHash windows
  are skewed because majority-vote bits correlate on templated
  corpora) are handled EXACTLY by two mechanisms: identical
  fingerprints collapse to one representative before banding, and
  oversized buckets recurse with pigeonhole refinement over their
  free bits (``_bucket_pairs``); ``max_bucket`` remains only as an
  optional lossy truncation for pathological inputs;
- edge dedup + clustering are adaptive: below ``edge_budget`` the rep
  edges collect to one driver numpy dedup/components pass, above it
  distributed distinct + ``label_propagation`` (the
  pipelines/neardup.py auto-routing rule).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
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


_SPLIT_THRESHOLD = 512


def _bucket_pairs(
    ids: np.ndarray,
    sims: np.ndarray,
    *,
    max_hamming: int,
    max_bucket,
    free_bits: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Verified (id_a < id_b) pairs within one band bucket — EXACT at
    any bucket size via recursive pigeonhole refinement.

    SimHash band windows are NOT uniform (majority-vote bits correlate
    across a templated corpus — unlike crypto-hashed MinHash band
    keys), so a hot 16-bit window can hold 10^4-10^5 rows and the
    naive all-pairs verify goes quadratic (measured 84 s at 1M docs).
    Refinement (Manku et al. §3, the multi-table probe): rows in this
    bucket already agree on the banded window; a qualifying pair's
    ≤ max_hamming differing bits lie in the remaining ``free_bits``,
    so splitting those into max_hamming+1 sub-windows guarantees
    agreement on at least one — recurse per sub-window until buckets
    reach the all-pairs threshold. Fingerprints are collapse-distinct,
    so n ≤ 2^|free_bits| and the recursion always terminates before
    free_bits run out."""
    order = np.argsort(ids)
    ids, sims = ids[order], sims[order]
    n = ids.size
    if max_bucket is not None and n > max_bucket:
        # documented recall loss: cap by truncation in id order (the
        # clustering closure recovers connectivity for identical sims)
        ids, sims, n = ids[:max_bucket], sims[:max_bucket], max_bucket
    if n < 2:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    if free_bits is None:
        free_bits = np.arange(64, dtype=np.int64)
    if n <= _SPLIT_THRESHOLD or free_bits.size <= max_hamming + 1:
        ia, ib = np.triu_indices(n, k=1)
        keep = hamming64(sims[ia], sims[ib]) <= max_hamming
        return ids[ia[keep]], ids[ib[keep]]
    parts = np.array_split(free_bits, max_hamming + 1)
    u = sims.astype(np.uint64)
    acc_a: list[np.ndarray] = []
    acc_b: list[np.ndarray] = []
    for part in parts:
        if part.size == 0:
            continue
        key = np.zeros(n, dtype=np.uint64)
        for j, p in enumerate(part):
            key |= ((u >> np.uint64(p)) & np.uint64(1)) << np.uint64(j)
        order2 = np.argsort(key, kind="stable")
        ks = key[order2]
        change = np.nonzero(ks[1:] != ks[:-1])[0] + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [n]))
        rem = np.setdiff1d(free_bits, part, assume_unique=True)
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            sel = order2[s:e]
            a, b = _bucket_pairs(
                ids[sel], sims[sel],
                max_hamming=max_hamming, max_bucket=None, free_bits=rem,
            )
            acc_a.append(a)
            acc_b.append(b)
    if not acc_a:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    from deduper_ray.stages.verify import dedup_pairs_arrays

    return dedup_pairs_arrays(
        np.concatenate(acc_a), np.concatenate(acc_b)
    )


def _band_free_bits(band_key: int, bands: int) -> np.ndarray:
    """Bits OUTSIDE the window this bucket already agrees on."""
    width = 64 // bands
    b = int(band_key) >> width
    agreed = np.arange(b * width, (b + 1) * width, dtype=np.int64)
    return np.setdiff1d(
        np.arange(64, dtype=np.int64), agreed, assume_unique=True
    )


def _scan_sorted_block(
    t: pa.Table, *, max_hamming: int, max_bucket, bands: int = 4
) -> pa.Table:
    """Vectorized run scan over one band_key-sorted block: interior
    runs → verified pairs emitted inline (the fingerprints ride with
    the rows, so NO store/broadcast/second shuffle); first/last runs →
    fragment rows (kind=1) for stitching, exactly the stages/lsh.py
    pattern (a bucket split across blocks is resolved once from its
    boundary fragments — on the driver under ``frag_driver_budget``
    rows, else via a distributed grouped pass, since a hot band window
    makes fragment volume O(hot-bucket size), not O(blocks))."""
    keys = t["band_key"].to_numpy(zero_copy_only=False)
    ids = t["id"].to_numpy(zero_copy_only=False)
    sims = t["sim"].to_numpy(zero_copy_only=False)
    n = keys.size
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    frag_slices: list[tuple[int, int]] = []
    if n:
        change = np.nonzero(keys[1:] != keys[:-1])[0] + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [n]))
        n_runs = starts.size
        frag_slices.append((starts[0], ends[0]))
        if n_runs > 1:
            frag_slices.append((starts[-1], ends[-1]))
        lens = ends - starts
        interior = (np.arange(n_runs) > 0) & (np.arange(n_runs) < n_runs - 1)
        # len==2 runs fully vectorized: one gather + hamming + min/max
        two = np.nonzero(interior & (lens == 2))[0]
        if two.size:
            x, y = ids[starts[two]], ids[starts[two] + 1]
            ok = (
                hamming64(sims[starts[two]], sims[starts[two] + 1])
                <= max_hamming
            ) & (x != y)
            out_a.append(np.minimum(x[ok], y[ok]))
            out_b.append(np.maximum(x[ok], y[ok]))
        for i in np.nonzero(interior & (lens >= 3))[0]:
            s, e = starts[i], ends[i]
            a, b = _bucket_pairs(
                ids[s:e], sims[s:e],
                max_hamming=max_hamming, max_bucket=max_bucket,
                free_bits=_band_free_bits(keys[s], bands),
            )
            out_a.append(a)
            out_b.append(b)
    a = np.concatenate(out_a) if out_a else np.empty(0, dtype=np.int64)
    b = np.concatenate(out_b) if out_b else np.empty(0, dtype=np.int64)
    if a.size:
        from deduper_ray.stages.verify import dedup_pairs_arrays

        a, b = dedup_pairs_arrays(a, b)
    fs = (
        np.concatenate([np.arange(s, e) for s, e in frag_slices])
        if frag_slices
        else np.empty(0, dtype=np.int64)
    )
    kind = np.concatenate(
        [np.zeros(a.size, dtype=np.int8), np.ones(fs.size, dtype=np.int8)]
    )
    return pa.table(
        {
            "kind": pa.array(kind),
            "id_a": pa.array(
                np.concatenate([a, keys[fs]]), type=pa.int64()
            ),
            "id_b": pa.array(np.concatenate([b, ids[fs]]), type=pa.int64()),
            "sim": pa.array(
                np.concatenate([np.zeros(a.size, np.int64), sims[fs]]),
                type=pa.int64(),
            ),
        }
    )


def _collapse_sims(narrow_in: rd.Dataset) -> rd.Dataset:
    """(id, sim) rows → one (sim, rep_id=min id, n) row per distinct
    fingerprint — sort + vectorized run scan with driver-stitched
    boundary runs (the stages/exact.py group_stats shape; Ray's
    sort-based groupby().aggregate measured ~3× slower for this
    high-cardinality key at 10^6 rows)."""

    def _scan(t: pa.Table) -> pa.Table:
        sims = t["sim"].to_numpy(zero_copy_only=False)
        ids = t["id"].to_numpy(zero_copy_only=False)
        n = sims.size
        if n == 0:
            return pa.table(
                {
                    "kind": pa.array([], type=pa.int8()),
                    "sim": pa.array([], type=pa.int64()),
                    "rep_id": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        change = np.nonzero(sims[1:] != sims[:-1])[0] + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [n]))
        rep = np.minimum.reduceat(ids, starts)
        cnt = (ends - starts).astype(np.int64)
        kinds = np.zeros(starts.size, dtype=np.int8)
        kinds[0] = 1
        kinds[-1] = 1
        return pa.table(
            {
                "kind": pa.array(kinds),
                "sim": pa.array(sims[starts], type=pa.int64()),
                "rep_id": pa.array(rep, type=pa.int64()),
                "n": pa.array(cnt, type=pa.int64()),
            }
        )

    scanned = (
        narrow_in.sort("sim")
        .map_batches(_scan, batch_format="pyarrow", batch_size=None)
        .materialize()
    )
    interior = scanned.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], 0)).drop_columns(["kind"]),
        batch_format="pyarrow",
    )
    frags = scanned.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], 1)).drop_columns(["kind"]),
        batch_format="pyarrow",
    ).to_pandas()
    if not len(frags):
        return interior
    agg = (
        frags.groupby("sim")
        .agg(rep_id=("rep_id", "min"), n=("n", "sum"))
        .reset_index()
    )
    stitched = pa.table(
        {
            "sim": pa.array(agg["sim"], type=pa.int64()),
            "rep_id": pa.array(agg["rep_id"], type=pa.int64()),
            "n": pa.array(agg["n"], type=pa.int64()),
        }
    )
    return interior.union(rd.from_arrow(stitched)).materialize()


def simhash_neardup(
    ds: rd.Dataset,
    *,
    id_column: str = "row_id",
    sim_column: str = "simhash",
    max_hamming: int = 3,
    bands: int = 4,
    max_bucket: int | None = None,
    edge_budget: int = 20_000_000,
    frag_driver_budget: int = 262_144,
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

    # -- identical-fingerprint collapse (the stages/collapse.py move):
    # clone families share one fingerprint, so banding the RAW rows
    # makes every band bucket quadratic in clone-family size (measured
    # 5.4k files/s at 1M docs vs 18k at 100k). One rep per distinct
    # fingerprint (min id) enters the banding; members rejoin at the
    # end via the expansion map. Exactly equivalent: identical
    # fingerprints are Hamming 0, and any edge of a rep is an edge of
    # every member.
    def _to_narrow(t: pa.Table) -> pa.Table:
        # reinterpret the fingerprint BITS as int64 (uint64 inputs from
        # the production signer exceed int64 range — a numeric cast
        # overflows; the bit pattern is what Hamming cares about)
        sims = (
            t[sim_column]
            .to_numpy(zero_copy_only=False)
            .astype(np.uint64)
            .view(np.int64)
        )
        return pa.table(
            {
                "id": pc.cast(t[id_column], pa.int64()),
                "sim": pa.array(sims, type=pa.int64()),
            }
        )

    # narrow_in and reps are each consumed TWICE (collapse + the final
    # expansion; rep points + the expansion map). Materialize the
    # 16 B/row projections ONCE so a lazy expensive upstream (e.g. the
    # MinHash/SimHash signer over raw content) never re-executes —
    # unmaterialized, the 1M-doc bench re-ran the 18 s signer twice
    # (53-62 s total vs 35 s materialized).
    narrow_in = ds.map_batches(_to_narrow, batch_format="pyarrow").materialize()
    reps = _collapse_sims(narrow_in).materialize()
    rep_pts = reps.map_batches(
        lambda t: pa.table({"id": t["rep_id"], "sim": t["sim"]}),
        batch_format="pyarrow",
    )

    narrow = rep_pts.map_batches(
        lambda t: _band_explode(
            t, bands=bands, id_column="id", sim_column="sim"
        ),
        batch_format="pyarrow",
    )
    from deduper_ray.stages.relational import distinct

    # sort + vectorized run scan (NOT groupby().map_groups — a Python
    # call per bucket at ~256k buckets measured 26 s on 100k docs where
    # this formulation takes ~4 s); edge runs stitch on the driver
    scanned = (
        narrow.sort("band_key")
        .map_batches(
            lambda t: _scan_sorted_block(
                t, max_hamming=max_hamming, max_bucket=max_bucket,
                bands=bands,
            ),
            batch_format="pyarrow",
            batch_size=None,
        )
        .materialize()
    )
    interior = scanned.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], 0)).select(["id_a", "id_b"]),
        batch_format="pyarrow",
    )
    frag_ds = scanned.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], 1)),
        batch_format="pyarrow",
    ).materialize()
    stitch_a: list[np.ndarray] = []
    stitch_b: list[np.ndarray] = []
    # fragment volume is ≤2 RUNS per sorted block, but a hot band
    # window spanning blocks makes whole blocks single runs — fragment
    # ROW volume is then O(hot-bucket size), not O(blocks). Above the
    # budget, resolve fragments with a second DISTRIBUTED grouped pass
    # (one task per boundary bucket) instead of driver numpy.
    n_frag_rows = frag_ds.count()
    if n_frag_rows > frag_driver_budget:
        def _pair_boundary_bucket(g: pa.Table) -> pa.Table:
            uniq, idx = np.unique(
                g["id_b"].to_numpy(zero_copy_only=False), return_index=True
            )
            sims_g = g["sim"].to_numpy(zero_copy_only=False)[idx]
            key = g["id_a"][0].as_py()
            a, b = _bucket_pairs(
                uniq, sims_g,
                max_hamming=max_hamming, max_bucket=max_bucket,
                free_bits=_band_free_bits(key, bands),
            )
            return pa.table(
                {
                    "id_a": pa.array(a, type=pa.int64()),
                    "id_b": pa.array(b, type=pa.int64()),
                }
            )

        interior = interior.union(
            frag_ds.groupby("id_a").map_groups(
                _pair_boundary_bucket, batch_format="pyarrow"
            )
        )
        frags = pd.DataFrame()
    else:
        frags = frag_ds.to_pandas()
    if len(frags):
        # fragments of one bucket share id_a (=band_key)
        fkeys = frags["id_a"].to_numpy()
        fids = frags["id_b"].to_numpy()
        fsims = frags["sim"].to_numpy()
        order = np.argsort(fkeys, kind="stable")
        fkeys, fids, fsims = fkeys[order], fids[order], fsims[order]
        change = np.nonzero(fkeys[1:] != fkeys[:-1])[0] + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [fkeys.size]))
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            uniq, idx = np.unique(fids[s:e], return_index=True)
            a, b = _bucket_pairs(
                uniq, fsims[s:e][idx],
                max_hamming=max_hamming, max_bucket=max_bucket,
                free_bits=_band_free_bits(fkeys[s], bands),
            )
            stitch_a.append(a)
            stitch_b.append(b)
    sa = np.concatenate(stitch_a) if stitch_a else np.empty(0, np.int64)
    sb = np.concatenate(stitch_b) if stitch_b else np.empty(0, np.int64)

    # a pair can collide in several bands — dedup the edge set. Below
    # the budget: collect to driver numpy and dedup/cluster in one
    # vectorized pass (a Ray groupby's fixed sort/sample floor measured
    # 8 s on a 30k-edge set — 8× the whole scan stage). Above it:
    # distributed distinct + labelprop, no driver residency (the
    # pipelines/neardup.py auto-route rule).
    n_interior = interior.count()
    if n_interior + sa.size > edge_budget:
        # beyond the driver edge budget: distributed distinct +
        # labelprop over REP edges (no driver residency for the graph;
        # the expansion map below still collects labeled reps, bounded
        # by clustered-rep volume — the same bound callers accept by
        # consuming the clusters output)
        raw_edges = interior
        if sa.size:
            raw_edges = raw_edges.union(
                rd.from_arrow(
                    pa.table(
                        {
                            "id_a": pa.array(sa, type=pa.int64()),
                            "id_b": pa.array(sb, type=pa.int64()),
                        }
                    )
                )
            )
        edges = distinct(raw_edges, ["id_a", "id_b"])
        from deduper_ray.state.unionfind import label_propagation

        lbl = label_propagation(edges)
        nparts, lparts = [], []
        for batch in lbl.iter_batches(
            batch_size=262144, batch_format="pyarrow"
        ):
            nparts.append(batch["row_id"].to_numpy(zero_copy_only=False))
            lparts.append(
                batch["cluster_id"].to_numpy(zero_copy_only=False)
            )
        nodes = (
            np.concatenate(nparts) if nparts else np.empty(0, np.int64)
        )
        labels = (
            np.concatenate(lparts) if lparts else np.empty(0, np.int64)
        )
    else:
        parts_a, parts_b = [sa], [sb]
        for batch in interior.iter_batches(
            batch_size=262144, batch_format="pyarrow"
        ):
            parts_a.append(batch["id_a"].to_numpy(zero_copy_only=False))
            parts_b.append(batch["id_b"].to_numpy(zero_copy_only=False))
        a = np.concatenate(parts_a).astype(np.int64)
        b = np.concatenate(parts_b).astype(np.int64)
        if a.size:
            from deduper_ray.stages.verify import dedup_pairs_arrays
            from deduper_ray.state.unionfind import (
                connected_components_arrays,
            )

            a, b = dedup_pairs_arrays(a, b)
            nodes, labels = connected_components_arrays(a, b)
        else:
            nodes = labels = np.empty(0, dtype=np.int64)

    # -- expansion map: a doc belongs to the output iff its fingerprint
    # group has n >= 2 (Hamming-0 partners) OR its rep has an edge.
    # Map volume is bounded by duplicated-fingerprint + clustered-rep
    # counts — the dupe-volume bound of the exact-dedup drop set.
    rep_label = dict(zip(nodes.tolist(), labels.tolist()))
    map_sims: list[np.ndarray] = []
    map_labels: list[np.ndarray] = []
    labeled_ref = ray.put(np.sort(nodes))

    def _interesting(t: pa.Table) -> pa.Table:
        lab = ray.get(labeled_ref)
        rid = t["rep_id"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        hit = n >= 2
        if lab.size:
            pos = np.minimum(np.searchsorted(lab, rid), lab.size - 1)
            hit = hit | (lab[pos] == rid)
        return t.filter(pa.array(hit))

    for batch in reps.map_batches(
        _interesting, batch_format="pyarrow"
    ).iter_batches(batch_size=262144, batch_format="pyarrow"):
        s = batch["sim"].to_numpy(zero_copy_only=False)
        r = batch["rep_id"].to_numpy(zero_copy_only=False)
        map_sims.append(s)
        map_labels.append(
            np.array(
                [rep_label.get(int(x), int(x)) for x in r], dtype=np.int64
            )
        )
    if not map_sims:
        return rd.from_arrow(
            pa.table(
                {
                    id_column: pa.array([], type=pa.int64()),
                    "cluster_id": pa.array([], type=pa.int64()),
                }
            )
        )
    ms = np.concatenate(map_sims)
    ml = np.concatenate(map_labels)
    order = np.argsort(ms)
    expand_ref = ray.put({"sims": ms[order], "labels": ml[order]})

    def _expand(t: pa.Table) -> pa.Table:
        m = ray.get(expand_ref)
        sims = t["sim"].to_numpy(zero_copy_only=False)
        pos = np.minimum(
            np.searchsorted(m["sims"], sims), m["sims"].size - 1
        )
        hit = m["sims"][pos] == sims
        out_ids = t["id"].to_numpy(zero_copy_only=False)[hit]
        return pa.table(
            {
                id_column: pa.array(out_ids, type=pa.int64()),
                "cluster_id": pa.array(
                    m["labels"][pos[hit]], type=pa.int64()
                ),
            }
        )

    return narrow_in.map_batches(_expand, batch_format="pyarrow")
