"""Identical-signature collapse — exact dedup BEFORE near-dup banding.

Exact-duplicate groups (identical shingle sets → identical MinHash
signature + SimHash) are the densest LSH buckets: a group of g
identical docs lands together in EVERY band and contributes O(g²)
candidate pairs × bands. Collapsing each identical-signature group to
one representative before banding removes that quadratic term — the
standard production layout (exact dedup, then near-dup on distinct
content) — while keeping the SAME final clusters: the collapsed
members are re-attached as (rep, member) edges with Jaccard 1.0, and
union-find transitivity restores full groups.

Same sort + run-scan + boundary-stitch machinery as the LSH and
group-stats stages; the sort key is a 64-bit linear hash of the K
signature slots mixed with the simhash — one vectorized pass per
batch (the earlier per-row MD5 hexdigest loop + 32-char STRING sort
cost ~19 s at 10^6 docs; the numeric key cut the stage to ~1/4).
Collision probability for two NON-identical signatures landing on the
same key is ~n²/2^64 (~10⁻⁷ at 10^6 docs) — a false collapse merges
two docs whose 128-slot signatures were already near-identical.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _add_sig_key(batch: pa.Table, id_column: str) -> pa.Table:
    n = batch.num_rows
    K = batch["minhash"].type.list_size
    flat = batch["minhash"].combine_chunks().flatten().to_numpy(
        zero_copy_only=False
    )
    sigs = flat.reshape(n, K).astype(np.uint64)
    simhash = batch["simhash"].to_numpy(zero_copy_only=False).astype(
        np.uint64
    )
    # per-slot odd multipliers (deterministic), wrapping mod 2^64
    coef = (np.arange(1, K + 1, dtype=np.uint64) * _GOLD) | np.uint64(1)
    key = (sigs * coef[None, :]).sum(axis=1, dtype=np.uint64)
    key = (key ^ simhash) * _GOLD
    key ^= key >> np.uint64(29)
    return pa.table(
        {
            # int64 bit-view: Ray's sort boxes uint64 > 2^63 (see
            # BandExploder note); signed view preserves equality
            "sig_key": pa.array(key.view(np.int64), type=pa.int64()),
            id_column: batch[id_column],
        }
    )


def _scan_key_block(t: pa.Table, id_column: str) -> pa.Table:
    """Runs of equal sig_key → (rep=min id, member) edges; first/last
    runs → fragments (kind=1: sig_key + row_id) for driver stitching.
    Python loop touches ONLY multi-row runs (runs are overwhelmingly
    singletons — one distinct signature per doc)."""
    n = t.num_rows
    empty = pa.table(
        {
            "kind": pa.array([], type=pa.int8()),
            "sig_key": pa.array([], type=pa.int64()),
            "id_a": pa.array([], type=pa.int64()),
            "id_b": pa.array([], type=pa.int64()),
        }
    )
    if n == 0:
        return empty
    keys = t["sig_key"].to_numpy(zero_copy_only=False)
    ids = t[id_column].to_numpy(zero_copy_only=False)
    change = np.nonzero(keys[1:] != keys[:-1])[0] + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [n]))
    n_runs = starts.size
    ea_parts, eb_parts = [], []
    fkey_parts = [keys[starts[0]:ends[0]]]
    fid_parts = [ids[starts[0]:ends[0]]]
    if n_runs > 1:
        fkey_parts.append(keys[starts[-1]:ends[-1]])
        fid_parts.append(ids[starts[-1]:ends[-1]])
    lens = ends - starts
    multi = np.nonzero(lens >= 2)[0]
    multi = multi[(multi > 0) & (multi < n_runs - 1)]
    for i in multi:
        grp = np.sort(ids[starts[i]:ends[i]])
        ea_parts.append(np.full(grp.size - 1, grp[0], dtype=np.int64))
        eb_parts.append(grp[1:])
    ea = (
        np.concatenate(ea_parts) if ea_parts else np.empty(0, dtype=np.int64)
    )
    eb = (
        np.concatenate(eb_parts) if eb_parts else np.empty(0, dtype=np.int64)
    )
    fk = np.concatenate(fkey_parts)
    fi = np.concatenate(fid_parts)
    kind = np.concatenate(
        [np.zeros(ea.size, dtype=np.int8), np.ones(fk.size, dtype=np.int8)]
    )
    return pa.table(
        {
            "kind": pa.array(kind),
            "sig_key": pa.array(
                np.concatenate([np.zeros(ea.size, dtype=np.int64), fk]),
                type=pa.int64(),
            ),
            "id_a": pa.array(
                np.concatenate([ea, np.zeros(fk.size, dtype=np.int64)]),
                type=pa.int64(),
            ),
            "id_b": pa.array(np.concatenate([eb, fi]), type=pa.int64()),
        }
    )


def _collapse_driver(
    keyed: rd.Dataset, id_column: str
) -> pa.Table:
    """Driver-side resolution for corpora below the collect threshold:
    the keyed rows are 16 B each, so one lexsort on the driver beats a
    distributed sort's ~8 s fixed cost (sample, partition, aggregator
    actors) by an order of magnitude at ≤10^7 rows."""
    from deduper_ray.functions.util import dataset_to_table

    tbl = dataset_to_table(
        keyed,
        pa.schema([("sig_key", pa.int64()), (id_column, pa.int64())]),
    )
    keys = tbl["sig_key"].to_numpy(zero_copy_only=False)
    ids = tbl[id_column].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, keys))
    ks, iss = keys[order], ids[order]
    n = ks.size
    ea_parts, eb_parts = [], []
    if n:
        change = np.nonzero(ks[1:] != ks[:-1])[0] + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [n]))
        lens = ends - starts
        for i in np.nonzero(lens >= 2)[0]:
            s, e = starts[i], ends[i]
            ea_parts.append(np.full(e - s - 1, iss[s], dtype=np.int64))
            eb_parts.append(iss[s + 1:e])
    return pa.table(
        {
            "id_a": pa.array(
                np.concatenate(ea_parts)
                if ea_parts else np.empty(0, dtype=np.int64),
                type=pa.int64(),
            ),
            "id_b": pa.array(
                np.concatenate(eb_parts)
                if eb_parts else np.empty(0, dtype=np.int64),
                type=pa.int64(),
            ),
        }
    )


def collapse_identical(
    signatures: rd.Dataset,
    *,
    id_column: str = "row_id",
    collect_threshold: int = 10_000_000,
) -> tuple[rd.Dataset, pa.Table]:
    """Returns (representative-only signatures, identity edges).

    Identity edges are (id_a=rep, id_b=member) rows for every collapsed
    duplicate — Jaccard-1.0 by construction; feed them to union-find
    alongside verified near-dup pairs.

    Adaptive resolution (same switch as the candidate-pair stage):
    below ``collect_threshold`` rows the 16 B/row keyed projection
    collects to the driver for one in-memory lexsort (~160 MB at the
    threshold); above it, the distributed sort + run-scan +
    boundary-stitch path runs — nothing driver-resident but the
    fragments.
    """
    import ray

    keyed = signatures.map_batches(
        lambda t: _add_sig_key(t, id_column), batch_format="pyarrow"
    )
    n_rows = signatures.count()
    if n_rows <= collect_threshold:
        edges = _collapse_driver(keyed, id_column)
        drop_ref = ray.put(
            pa.array(
                np.sort(edges["id_b"].to_numpy(zero_copy_only=False)),
                type=pa.int64(),
            )
        )

        def _reps_small(t: pa.Table) -> pa.Table:
            return t.filter(
                pc.invert(
                    pc.is_in(t[id_column], value_set=ray.get(drop_ref))
                )
            )

        return signatures.map_batches(
            _reps_small, batch_format="pyarrow"
        ), edges
    scanned = (
        keyed.sort("sig_key")
        .map_batches(
            lambda t: _scan_key_block(t, id_column),
            batch_format="pyarrow",
            batch_size=None,
        )
        .materialize()
    )
    from deduper_ray.functions.util import dataset_to_table

    tbl = dataset_to_table(
        scanned,
        pa.schema(
            [
                ("kind", pa.int8()),
                ("sig_key", pa.int64()),
                ("id_a", pa.int64()),
                ("id_b", pa.int64()),
            ]
        ),
    )
    kind = tbl["kind"].to_numpy(zero_copy_only=False)
    ea = [tbl["id_a"].to_numpy(zero_copy_only=False)[kind == 0]]
    eb = [tbl["id_b"].to_numpy(zero_copy_only=False)[kind == 0]]
    # stitch boundary fragments (≤2 runs per block)
    frag = tbl.filter(pa.array(kind == 1))
    if frag.num_rows:
        fkeys = frag["sig_key"].to_numpy(zero_copy_only=False)
        fids = frag["id_b"].to_numpy(zero_copy_only=False)
        order = np.argsort(fkeys, kind="stable")
        fkeys, fids = fkeys[order], fids[order]
        change = np.nonzero(fkeys[1:] != fkeys[:-1])[0] + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [fkeys.size]))
        for s, e in zip(starts, ends):
            grp = np.unique(fids[s:e])
            if grp.size < 2:
                continue
            ea.append(np.full(grp.size - 1, grp[0], dtype=np.int64))
            eb.append(grp[1:])
    edges = pa.table(
        {
            "id_a": pa.array(np.concatenate(ea), type=pa.int64()),
            "id_b": pa.array(np.concatenate(eb), type=pa.int64()),
        }
    )
    # representative filter: drop collapsed members (broadcast anti-set;
    # bound = exact-dup count, the same bound exact dedup accepts)
    drop_ref = ray.put(pa.array(np.sort(edges["id_b"].to_numpy(zero_copy_only=False)), type=pa.int64()))

    def _reps(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.invert(pc.is_in(t[id_column], value_set=ray.get(drop_ref)))
        )

    reps = signatures.map_batches(_reps, batch_format="pyarrow")
    return reps, edges
